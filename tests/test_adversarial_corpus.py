"""Cross-engine sweep over an ADVERSARIAL documents corpus.

The sf* fixtures are all-alnum lowercase ASCII, so the registry-wide
oracle sweep can never catch divergences that only trigger on
punctuation-only / empty / non-ASCII documents (the r3 phantom-token
class: Spark split('') == [''] vs DuckDB list_filter == []). This
test materializes a small corpus full of exactly those shapes and
runs the documents-only text/mixture queries through the SAME
comparator the driver mirrors."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# tools is a package since r5 — import the comparator as the SAME
# module object tests/test_queries_oracle.py uses (a bare-path import
# would load a second copy that fixtures/monkeypatches can't see)
from tools.selfcheck import (
    canon_frame,
    oracle_frame_via_pandas,
    spark_frame_via_pandas,
)

from gmt_dbt_spark.registry import all_oracles, all_queries

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # exact dup
    "!!! ??? ...",  # punctuation-only → 0 tokens
    "",  # empty
    "   ",  # whitespace-only
    "общий текст на русском",  # non-ASCII-only → 0 tokens
    "日本語のテキストです",  # CJK → 0 tokens
    "mixed ASCII und Ümläute 42",
    "numbers 123 456 789 and words",
    "HELLO hello HeLLo case folding test",
    "a",  # single token
    "short doc",
    "the the the the repetition heavy doc doc doc",
    "unique words appear exactly once here today",
]

QUERIES = [
    "text_tokenize",
    "text_tf",
    "text_token_count",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_tfidf",
    "text_ngram_tf",
    "text_dedup_lines",
    "pipeline_text_curation",
    "sample_mixture_unimax",
    "pipeline_mixture_materialize",
    # shingle/minhash paths: empty-normalizing docs all collapse to
    # the whole-text '' shingle and must pair up IDENTICALLY on both
    # engines (sig → band → verify replay)
    "dedup_fuzzy",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_substring",
    # r7: the ExactSubstr REWRITE — empty-normalizing docs have no
    # grams and must round-trip as md5('') on both engines; the
    # repetition-heavy doc exercises overlapping within-doc spans
    "dedup_substring_rewrite",
    "text_unigram_logprob",
    "pipeline_dedup_cascade",
    # store-probe incremental family (r3): NULL-text dropped on both
    # engines, empty-normalizing docs fingerprint/signature like any
    # other content
    "dedup_incremental",
    "dedup_incremental_minhash",
    # r4 additions: bigram LM (transition stats over hostile token
    # shapes), BM25 (empty hit set on a corpus with no query term),
    # and the raw-text round-trip (non-ASCII/whitespace-only lines
    # must survive the UTF-8 write+read byte-exactly)
    "text_bigram_logprob",
    # r7: the Kneser-Ney upgrade — hostile empty-normalizing and
    # single-token docs must surface (0, NULL) on both engines; the
    # 31-bit hash reduction and the distributed ilog2 (DECIMAL div
    # vs HUGEINT //) must agree bit-exactly
    "text_kn_logprob",
    "text_bm25",
    "scan_text_lines",
    # r5: trained NB classifier — the hostile corpus cycles langs, so
    # this sweep exercises weird-token training/scoring (empty-
    # normalizing docs drop, unicode tokens hash cleanly); the
    # SINGLE-CLASS degenerate-training edge (n_neg=0, votes decided
    # purely by smoothing mass) is pinned separately by
    # test_nb_classifier_single_class_corpus below
    "text_nb_classifier",
    # r5: BPE trainer — empty-normalizing corpora yield an empty
    # word-count relation, so the argmax pair frame goes empty at
    # step 1 and the merge table must be EMPTY on both engines (the
    # pair-exhaustion edge); single-char vocabularies exhaust later
    "text_bpe_train",
    # ...and encode must keep working when training exhausted: the
    # left-join chain preserves the vocab, so per-doc budgets agree
    "text_bpe_encode",
    # r7: the unigram-LM trainer family — hostile unicode words
    # exercise char-based substr on multibyte chars through seeding,
    # both Viterbi E-steps (Spark fold vs DuckDB recursive CTE), the
    # prune, and the fixed-point score arithmetic
    "text_unigram_train",
    "text_unigram_encode",
    "text_unigram_fertility",
    # the CCNet tercile split: hostile docs include empty-normalizing
    # ones, which must band 'empty' with NULL score on both engines
    "text_ppl_filter",
    # r7: the WordPiece family — the likelihood argmax (HUGEINT vs
    # DECIMAL div cross-check) over hostile-unicode symbol counts,
    # pair exhaustion on empty-normalizing corpora, and the greedy
    # longest-match recursion (Spark fold vs DuckDB recursive CTE)
    # probing multibyte substrings under the short-tail guard
    "text_wordpiece_train",
    "text_wordpiece_encode",
    "text_wordpiece_fertility",
    # r7: group-aware split — NULL and '' texts merge into one
    # fingerprint group on both engines; triplicated hostile docs
    # must report n_group=3 and share one split
    "pipeline_group_split",
    # r7: DSIR — hostile corpus has empty-normalizing docs (0-token
    # pool rows must surface unscored with keep=false on both
    # engines) and NULL texts; the lexicographic-min target source
    # and the add-1 bucket LMs must agree bit-exactly
    "pipeline_dsir",
    # r7: PII rewrite-and-rehash — NULL texts stay NULL on both
    # engines; hostile unicode/punctuation docs must hash identically
    # through the 3-stage redaction (ASCII-subset patterns cannot
    # match multibyte chars, so the hash pins no-op redactions too)
    "text_pii_redact",
    # artifact round-trip under hostile unicode pieces/merges: the
    # reloaded-parquet fingerprints must equal the replay's
    "sink_tokenizer_artifacts",
    # r8: the three decode round-trips — hostile unicode words force
    # multibyte piece concatenation through decode on all three
    # families (BPE via the RELOADED merge table, unigram via the
    # Viterbi segmentation, WordPiece via the reloaded-vocab greedy
    # accumulator); empty-normalizing docs must rebuild to '' with
    # ok=true on both engines
    "text_bpe_roundtrip",
    "text_unigram_roundtrip",
    "text_wordpiece_roundtrip",
    # r5: readability — sentence runs counted on RAW text (hostile
    # punctuation-only docs have sentences but zero tokens → dropped
    # by the n_words gate on both engines), vowel groups on the
    # normalized text
    "text_readability",
    # r5: pack layout — under the splits+1 whitespace proxy an empty
    # doc carries tok=1 and a whitespace-only doc tok=n_spaces+1, so
    # hostile docs pack like any other (NULL text is filtered on both
    # engines — the empty-string_agg asymmetry); boundary
    # serialization must agree exactly
    "pack_attention_layout",
    # r5: WARC round-trip — non-ASCII payloads must survive the
    # UTF-8 record framing byte-exactly (content_length is the BYTE
    # count while the slice is chars; md5 catches any drift), and
    # newline-bearing docs are excluded identically on both engines
    "scan_warc",
    # r6: the gzipped variant — the same unicode payloads must
    # survive the codec round-trip byte-exactly too
    "scan_warc_gz",
    # the grand composite: on this corpus every source is an eval
    # source (src0-3 ⊂ EVAL_SRC), so the train side is EMPTY — the
    # empty-funnel edge must agree on both engines
    "pipeline_pretrain_corpus",
    # r6: windowed n-gram decontamination — same all-eval corpus, so
    # the train gram side is EMPTY and the report must be empty on
    # both engines; short docs exercise the whole-text-window
    # fallback (incl. the '' window from empty-normalizing docs)
    "pipeline_decontaminate",
    # r6: type-token ratio — hostile empty-normalizing docs drop on
    # both engines; the repetition-heavy doc must band low
    "text_ttr",
    # r6: per-lang fertility — the lang cycle tags hostile tokens;
    # empty-normalizing docs contribute no words on either engine
    "text_bpe_fertility",
    # r6: concat-and-chunk spans — hostile docs pack under the
    # splits+1 proxy like any other (the pack_sequences rule)
    "pack_concat_chunk",
    # r7: the no-split NFD audit — NULL texts excluded by spec on
    # both engines; the applyInPandas fold and the recursive-CTE
    # replay must agree on every (bins, waste) pair
    "pack_nfd_audit",
    # r8: token-distribution entropy — hostile repeated docs band
    # low, empty-normalizing docs surface NULL entropy on both
    # engines; the ilog2 fixed point must agree through unicode-
    # stripped token counts
    "text_token_entropy",
    # r8: the two C4-recipe filters — hostile empty-normalizing docs
    # have zero lines/tokens (keep=false, md5('') on both engines);
    # multibyte tokens exercise the marker/blocklist membership and
    # the line-slice rewrite hash through unicode
    "text_c4_line_filter",
    "text_badwords_filter",
    # r8: the composed C4 funnel — triplicated hostile docs must
    # dedup on CLEANED text identically; all-empty sources must
    # report zero survivors on both engines
    "pipeline_c4_reproduce",
    # r8: the source-overlap matrix — triplicated hostile docs land
    # in all four sources, so every pair overlaps; <3-token and
    # empty-normalizing docs must contribute no shingles on either
    # engine (full-3-gram gating)
    "pipeline_source_overlap",
    # r8: streaming KMV running-distinct — triplicated hostile texts
    # land in different arrival shards, so the cumulative sketch must
    # dedup them across micro-batches; the tiny corpus keeps the
    # sketch NON-FULL, exercising the exact (est == truth) branch
    "stream_kmv_distinct",
    # r6: token accounting — empty-normalizing docs count 0 tokens
    # but real chars, identically on both engines
    "pipeline_token_budget",
    # r6: rare-token density — the hostile corpus's unicode/numeric
    # one-off tokens are exactly the rare class; triplicated TEXTS
    # keep every repeated doc's tokens at corpus frequency ≥ 3
    "text_rare_token_ratio",
    # r6: the two payload-fingerprint dedups — payloads derive from
    # doc_id (not text), so this corpus exercises the SMALL-SLICE
    # edge: 42 ids → sparser banding buckets, same full replay
    "multimodal_phash_dedup",
    "multimodal_audio_fingerprint",
    # r6: epoch reshuffle audit — id-keyed, text-independent; the
    # small corpus exercises sparse shards (empty shards must be
    # absent, not zero-rows, on both engines)
    "sample_epoch_shuffle",
    # r9: the unicode opt-in — on THIS corpus the Russian/CJK docs
    # finally tokenize to real tokens (the ASCII twin sees none);
    # triplicated non-ASCII docs must collapse under the unicode
    # fingerprint on both engines, and the planted literal rows ride
    # along in every run
    "text_tokenize_unicode",
    "text_token_count_unicode",
    "dedup_exact_unicode",
    # r9 late additions: the unicode MinHash chain (hostile CJK/
    # Russian docs finally shingle; triplicated docs must pair
    # identically on both engines) and the script router (NULL/
    # empty/emoji rows must land 'none'/NULL identically)
    "dedup_fuzzy_unicode",
    "text_langid_script",
    # the hostile CJK/kana rows produce real bigram grams; empty/
    # punctuation/Latin-only rows produce none — identically
    "text_tokenize_cjk_bigram",
    # the composed funnel: triplicated hostile docs dedup on the
    # unicode fingerprint; Russian/CJK docs route to their scripts
    # and PASS the length gate they failed under ASCII
    "pipeline_multilingual_curation",
    # the NFC seam over hostile rows: unicodedata vs utf8proc must
    # hash-agree on every normalization (NULL/empty included)
    "text_nfc_audit",
    # bigram-grain near-dup: the triplicated CJK doc must self-pair
    # at jaccard 1.0 on both engines; ASCII-only hostile docs emit
    # no grams
    "dedup_cjk_bigram_neardup",
    # the broadcast-join blocklist shape under hostile tokens (empty-
    # normalizing docs keep=false via the zero-token rule, same as
    # the literal form)
    "text_badwords_filter_bcast",
    # r10: the multilingual QUALITY gates — hostile punct-only /
    # empty / CJK / Cyrillic rows drive every census branch, the
    # zero-word-char entropy NULL, and the dominant-script run CASE;
    # the CJK LM sees the kana doc's runs (plus the planted grain)
    "text_quality_script_aware",
    "text_cjk_bigram_logprob",
    # ...and the removal gate those signals feed (hostile punct-only/
    # empty/repeat rows must drop identically on both engines)
    "pipeline_script_quality_gate",
    # r10 late: the per-script tuning loop — percentiles must agree
    # over hostile distributions (NULL-entropy docs excluded on both
    # engines, triplicated docs triple their value counts), the
    # threshold-table gate must fall back identically for 'none'
    # docs, and the stopword join must count zero hits on the CJK /
    # punct-only rows while the English dups hit 'the'/'and'
    "text_quality_percentiles_by_script",
    "pipeline_quality_gate_per_script",
    "text_stopword_ratio_table",
    # ...and the self-tuning gate: the hostile corpus is dominated by
    # triplicated docs, so its own percentile cuts land ON repeated
    # values — the exact-percentile tie handling must agree
    "pipeline_quality_gate_autotuned",
    # ...and the combined gate: the triplicated English docs clear
    # STOP_MIN_TOKENS only via 'the'-heavy rows, empty/CJK rows ride
    # the NULL sub-gate — both joins must agree over hostile shapes
    "pipeline_quality_gate_combined",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_sf")
    texts = TEXTS * 3  # enough rows for per-source stats
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": [("en", "de", "ru")[i % 3] for i in range(len(texts))],
                "source": [f"src{i % 4}" for i in range(len(texts))],
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _assert_parity(spark, sf_dir, view, name, view_sql=None):
    """Driver-mirror compare of one registered query vs its oracle on
    an adversarial table directory (the comparator itself is
    selfcheck's — one implementation, reused). ``view`` may be one
    table name or a list; ``view_sql`` lets a family state a
    catalog-level contract (e.g. the events null-ts quarantine) on
    the oracle side."""
    con = duckdb.connect()
    for v in [view] if isinstance(view, str) else view:
        body = (view_sql or "SELECT * FROM '{path}'").format(
            path=f"{sf_dir}/{v}.parquet"
        )
        con.execute(f"CREATE VIEW {v} AS {body}")
    # the driver's fetch path (r4): BOTH sides → pandas → values, and
    # since r5 the driver's order of operations (raw-frame row-sort
    # BEFORE normalization — unhashable cells crash, as on the driver)
    sdf = all_queries()[name](spark, sf_dir)
    spdf = spark_frame_via_pandas(sdf)
    opdf = oracle_frame_via_pandas(con, all_oracles()[name])
    assert sorted(spdf.columns) == sorted(opdf.columns)
    st, ot = canon_frame(spdf, "spark"), canon_frame(opdf, "oracle")
    assert len(st) == len(ot), f"{name}: {len(st)} vs {len(ot)} rows"
    for i, (a, b) in enumerate(zip(st, ot)):
        assert a == b, f"{name}: mismatch at sorted-row {i}: {a} != {b}"


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_corpus_matches_oracle(spark, adv_dir, name):
    _assert_parity(spark, adv_dir, "documents", name)


def test_simhash_bucket_cap_on_low_diversity_corpus(spark, tmp_path):
    """The r3 judge's simhash scale-killer, pinned: a boilerplate-
    heavy corpus (100 identical docs — real web crawls look like
    this) must NOT generate the ~n²/2 candidate pairs the old
    uncapped banding did. The 100-doc group's four (band, piece)
    buckets exceed SIMHASH_BUCKET_CAP and are dropped from candidate
    generation — audited via n_hot_buckets, never silent — while a
    small near-dup group (2 docs) still pairs normally. Full Spark↔
    DuckDB parity is asserted on the same corpus, so the cap is
    value-hashed too."""
    from gmt_dbt_spark.operators.dedup import SIMHASH_BUCKET_CAP

    boiler = "subscribe to our newsletter terms of service privacy policy"
    diverse = (
        "the migratory patterns of arctic terns span hemispheres each "
        "year covering astonishing distances over open ocean water"
    )
    texts = [boiler] * 100 + [diverse] * 2 + [
        "completely unrelated quarterly revenue figures for the board",
        "a second unrelated document about gardening tomatoes in clay",
    ]
    assert len(texts[:100]) > SIMHASH_BUCKET_CAP
    d = tmp_path / "hostile_simhash"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    # engine parity on the hostile corpus (driver-mirror comparator)
    _assert_parity(spark, str(d), "documents", "dedup_simhash")
    rows = all_queries()["dedup_simhash"](spark, str(d)).collect()
    # the audit sentinel (NULL ids) is ALWAYS present (r5, advisor
    # item: an all-capped corpus must not hide the loss in an empty
    # result) and carries the hot-bucket count...
    sentinels = [r for r in rows if r.id_a is None]
    assert len(sentinels) == 1 and sentinels[0].n_hot_buckets >= 4, rows[:5]
    out = [r for r in rows if r.id_a is not None]
    # ...the 100-doc boilerplate group is capped: none of its ~4,950
    # pairs may appear...
    assert not any(r.id_b < 100 for r in out), out[:5]
    # ...the loss is audited on every pair row too...
    assert all(r.n_hot_buckets >= 4 for r in out), out[:5]
    # ...and the small near-dup group still pairs normally.
    assert any(
        (r.id_a, r.id_b, r.hamming) == (100, 101, 0) for r in out
    ), out[:5]


# sim_recall_audit is deliberately absent: its oracle is a
# fixture-calibrated QUALITY floor (recall@5 >= 0.30), not an
# engine-parity statement — a 40-vector random corpus legitimately
# undershoots it. Its three underlying retrievers are all here.
EMB_QUERIES = [
    "sim_topk",
    "sim_topk_lsh",
    "sim_topk_ivf",
    # r5: MMR re-rank — duplicate vectors in the hostile corpus give
    # maxsim == rel ties everywhere; the greedy chain's integer
    # tie-breaks must agree step-by-step on both engines
    "sim_mmr_diversify",
    "dedup_embed_cosine",
    # r6: SemDeDup — exact duplicates (cos = 1) must drop with the
    # keep-lowest-id rule; sub-resolution vectors quantize to 0/-1
    # micro units
    "dedup_semdedup",
    # ^ the zero vector pins the r6 review fix: without the explicit
    # na2>0 AND nb2>0 guard the cross-multiplied gate degenerates to
    # 0 >= 0 and the zero vector pairs with its whole cluster —
    # test_semdedup_zero_vector_never_pairs asserts the semantics
    # directly; this row asserts engine parity on the guarded gate
    # r6: MRL truncation audit — duplicate vectors tie BOTH rankings
    # (neighbor_id tie-break must agree), the zero vector dots 0
    # everywhere, sub-resolution vectors quantize to 0/-1
    "embed_matryoshka_audit",
    # r7: the SQ sibling — zero vectors, sub-resolution cells, and
    # the negative floor-vs-trunc edge all coarsen identically on
    # both engines (float-divide-then-floor, power-of-two divisor)
    "embed_sq_audit",
    "embed_centroid",
    "embed_quantize",
    "embed_normalize",
    "embed_kmeans",
    "embed_pca_power",
    "embed_cosine_audit",
    "embed_pq",
    "embed_pq_adc",
    "sim_topk_ivf_pq",
]


@pytest.fixture(scope="module")
def adv_emb_dir(tmp_path_factory):
    """64-dim corpus with the vector shapes real embedding dumps
    contain and the sf fixture never does: the all-zero vector,
    EXACT duplicates (cosine ties — rank determinism), sub-micro-unit
    magnitudes (quantize to 0 / floor(-0.5) = -1 on negatives), an
    all-equal vector, and sign flips."""
    import random

    rng = random.Random(20260814)
    d = tmp_path_factory.mktemp("adv_emb")
    vecs = []
    base = [round(rng.uniform(-0.5, 0.5), 4) for _ in range(64)]
    for i in range(40):
        vecs.append([round(rng.uniform(-0.5, 0.5), 4) for _ in range(64)])
    vecs[3] = [0.0] * 64  # zero vector
    vecs[5] = list(base)  # exact duplicate pair (5, 17)
    vecs[17] = list(base)
    vecs[9] = [1e-7] * 64  # below quantization resolution
    vecs[11] = [-3e-7] * 64  # negative sub-resolution (floor ≠ trunc)
    vecs[13] = [0.25] * 64  # all-equal
    vecs[19] = [-v for v in base]  # antipode of the dup pair
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(len(vecs))),
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
                "label": [i % 10 for i in range(len(vecs))],
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embeddings_match_oracle(spark, adv_emb_dir, name):
    _assert_parity(spark, adv_emb_dir, "embeddings", name)


EVT_QUERIES = [
    # r7: CEP pattern matching — hostile ts collisions/duplicates
    # exercise the (ts, event_id) total order through three window
    # layers and the error-reset segmentation on both engines
    "events_match_recognize",
    "events_funnel",
    "events_retention",
    "events_wau_sliding",
    "events_window_funnel",
    "events_dau_mau",
    "events_growth_accounting",
    "events_sessionize",
    "events_transitions",
    "events_anomaly_zscore",
    "events_path_analysis",
    "agg_session_window",
    "events_ohlc",
    "events_gap_fill",
    "events_ema",
    "events_locf",
    "events_interarrival",
    "events_burst",
    "events_backtest_snaive",
    "win_streaks",
    "win_running_distinct",
    "win_median_sliding",
    "win_slope",
    # mergeable-sketch rollup: the all-NULL-user 'refund' type makes
    # exact_users 0 — pins the zero-guard in the bound check
    "agg_hll_sketch",
    # r6: point-in-time feature snapshot — the same-(user, ts) tie
    # is the leakage edge: a co-timestamped event must NOT enter its
    # twin's features (the RANGE frame ends at 1 µs PRECEDING), and
    # the (tsm, event_id) total order pins n_events_prior on ties
    "pipeline_feature_snapshot",
    # true streaming (micro-batch replay) over the same hostile
    # stream: caught the session-gap boundary divergence (Spark's
    # session_window MERGES at exactly prev_ts + gap; the oracle's
    # >= spelling split there — fixed to strict >)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_watermark_late",
    # custom stateful ops: caught the replay float-degradation bug
    # (null int64 -> float64 -> whole shard PERMISSIVE-nulled), the
    # pandas-sum-vs-SQL-SUM all-null divergence, the MERGE null-key
    # duplicate insert, and the sentinel filter dropping null users
    "stream_custom_state",
    "stream_transform_with_state",
    "stream_upsert_sink",
    "stream_session_timeout",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_full_outer",
]


@pytest.fixture(scope="module")
def adv_evt_dir(tmp_path_factory):
    """Event-stream shapes real telemetry contains and the generated
    fixture never does: exact-duplicate rows, same-(user, ts) ties
    with different types (window tie-break determinism), NULL
    user_id/value/type, single-event users, zero/negative values,
    and events landing exactly on day/session-gap boundaries."""
    import datetime as dt
    import random

    rng = random.Random(20260814)
    d = tmp_path_factory.mktemp("adv_evt")
    base = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []

    def add(uid, ts, etype, value, props='{"k": 1}'):
        rows.append((len(rows), ts, uid, etype, value, props))

    # ordinary activity for a handful of users across several days
    for uid in range(1, 8):
        t = base + dt.timedelta(hours=uid)
        for i in range(30):
            t += dt.timedelta(minutes=rng.randint(1, 90))
            add(uid, t, types[rng.randint(0, 4)], round(rng.uniform(0, 50), 2))
    # same-(user, ts) tie with DIFFERENT event types
    tie = base + dt.timedelta(days=1, hours=2)
    add(50, tie, "view", 1.0)
    add(50, tie, "click", 2.0)
    add(50, tie, "purchase", 3.0)
    # exact full-duplicate rows (distinct event_id only)
    dup = base + dt.timedelta(days=1, hours=3)
    add(51, dup, "click", 5.0)
    add(51, dup, "click", 5.0)
    # NULLs a real stream would carry
    # (a NULL ts exercises the catalog's event-time contract: the
    # row must be invisible on BOTH engines — see the events view
    # below, which states the same contract the catalog pushes)
    add(60, None, "view", 9.9)
    add(None, base + dt.timedelta(days=2), "view", 7.0)
    add(52, base + dt.timedelta(days=2, hours=1), None, 8.0)
    add(53, base + dt.timedelta(days=2, hours=2), "view", None)
    add(54, base + dt.timedelta(days=2, hours=3), "view", 9.0, None)
    # single-event user; zero and negative values
    add(55, base + dt.timedelta(days=3), "purchase", 0.0)
    add(56, base + dt.timedelta(days=3, hours=1), "purchase", -12.5)
    # events exactly 30 minutes apart (the canonical session gap)
    t = base + dt.timedelta(days=4)
    for i in range(4):
        add(57, t + dt.timedelta(minutes=30 * i), "view", 1.0)
    # midnight-boundary events (day-rollup edges)
    add(58, dt.datetime(2024, 1, 5, 0, 0, 0), "view", 1.0)
    add(58, dt.datetime(2024, 1, 5, 23, 59, 59, 999999), "view", 1.0)
    # an event_type whose ONLY user_id is NULL: exact distinct-user
    # count 0 — an unguarded relative-error bound check divides by
    # zero under ANSI (agg_hll_sketch review finding)
    add(None, dt.datetime(2024, 1, 5, 12, 0, 0), "refund", 3.0)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", EVT_QUERIES)
def test_adversarial_events_match_oracle(spark, adv_evt_dir, name):
    # the oracle-side statement of the catalog's event-time contract
    # (catalog.table quarantines null-ts rows at the scan; the
    # driver's generator never emits them, so its raw views satisfy
    # the contract by construction)
    _assert_parity(
        spark, adv_evt_dir, "events", name,
        view_sql="SELECT * FROM '{path}' WHERE ts IS NOT NULL",
    )


ORD_QUERIES = [
    "win_lag_lead",
    "win_frame_rows",
    "win_frame_range",
    "win_first_last",
    "win_named_window",
    "win_range_interval",
    "topk",
    "filter_pred",
    "agg_argmax",
    "agg_bool",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_histogram",
    "agg_percentile_disc",
    "agg_rollup",
    "agg_string_agg",
    "mart_gini",
    "mart_ltv",
    "mart_rfm",
    "dq_outlier_iqr",
    "dq_outlier_mad",
    "dq_benford",
    "dq_accepted_values",
    "fn_date",
    "fn_cond",
    "fn_cast",
    "fn_try",
    "cdc_diff",
    "join_null_safe",
    "sql_unpivot_syntax",
]


@pytest.fixture(scope="module")
def adv_ord_dir(tmp_path_factory):
    """Orders with the shapes a real (non-TPC-H) feed contains:
    NULL custkey/orderdate/totalprice/status/priority, duplicate
    (custkey, orderdate) pairs (window tie-breaks + NULLS FIRST-vs-
    LAST divergence bait on nullable sort keys), zero and negative
    totals, single-order customers, and repeated exact totals."""
    import datetime as dt
    import random

    rng = random.Random(20260814)
    d = tmp_path_factory.mktemp("adv_ord")
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []

    def add(key, cust, status, total, date, prio):
        rows.append((key, cust, status, total, date, prio))

    k = 0
    for cust in range(1, 15):
        for _ in range(rng.randint(2, 9)):
            add(
                k,
                cust,
                statuses[rng.randint(0, 2)],
                round(rng.uniform(900.0, 450000.0), 2),
                dt.datetime(1992 + rng.randint(0, 6), rng.randint(1, 12),
                            rng.randint(1, 28)),
                prios[rng.randint(0, 4)],
            )
            k += 1
    tie_day = dt.datetime(1995, 6, 15)
    for i in range(3):  # duplicate (custkey, orderdate), distinct totals
        # custkey 120: NO customer row exists (orders-side dangling FK)
        add(k, 120, "O", 1000.0 + i, tie_day, "2-HIGH"); k += 1
    # half-cent price: pins half-away-from-zero rounding parity (pandas
    # banker's rounding would drop a cent vs SQL ROUND)
    add(k, 121, "F", 1000.125, tie_day, "3-MEDIUM"); k += 1
    add(k, 21, "F", 5000.0, tie_day, "5-LOW"); k += 1
    add(k, 21, "F", 5000.0, tie_day, "2-HIGH"); k += 1  # exact total tie, distinct priority
    add(k, None, "O", 7777.77, dt.datetime(1996, 1, 2), "1-URGENT"); k += 1
    add(k, 22, None, 8888.88, dt.datetime(1996, 2, 3), "3-MEDIUM"); k += 1
    add(k, 23, "P", None, dt.datetime(1996, 3, 4), "4-NOT SPECIFIED"); k += 1
    add(k, 24, "F", 0.0, None, "5-LOW"); k += 1  # NULL date
    add(k, 25, "O", -120.5, dt.datetime(1997, 7, 8), None); k += 1
    add(k, 26, "F", 42.42, dt.datetime(1998, 8, 1), "1-URGENT"); k += 1
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", ORD_QUERIES)
def test_adversarial_orders_match_oracle(spark, adv_ord_dir, name):
    _assert_parity(spark, adv_ord_dir, "orders", name)


CUST_QUERIES = [
    "win_ntile",
    "win_pct_dist",
    "win_rank",
    "sort_order",
    "agg_percentile",
    "fn_hash",
    "fn_mask",
    "fn_math",
    "project_exprs",
    "sql_offset_paging",
    "sql_star_except",
    "sql_pipe_syntax",
]


@pytest.fixture(scope="module")
def adv_cust_dir(tmp_path_factory):
    """Customers with NULL balances/segments/names, exact balance
    ties (rank/ntile determinism), negative and zero balances, and
    unicode names — the dimension-table shapes TPC-H generators
    never emit."""
    import random

    rng = random.Random(20260814)
    d = tmp_path_factory.mktemp("adv_cust")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    rows = []
    for i in range(40):
        rows.append(
            (i, f"Customer#{i:09d}", i % 25,
             round(rng.uniform(-999.0, 9999.0), 2), segs[i % 5])
        )
    rows += [
        (40, "Customer#tie-a", 3, 5000.0, "BUILDING"),
        (41, "Customer#tie-b", 4, 5000.0, "BUILDING"),  # exact balance tie
        (42, None, 5, 123.45, "MACHINERY"),  # NULL name
        (43, "Customer#null-bal", 6, None, "FURNITURE"),  # NULL balance
        (44, "Customer#null-seg", 7, 777.0, None),  # NULL segment
        (45, "Cüstømer#ünïcode", 8, 0.0, "AUTOMOBILE"),
        (46, "Customer#zero", 9, 0.0, "HOUSEHOLD"),
        (47, "Customer#negative", 10, -500.5, "BUILDING"),
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_name": pa.array([r[1] for r in rows], pa.string()),
                "c_nationkey": pa.array([r[2] for r in rows], pa.int64()),
                "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", CUST_QUERIES)
def test_adversarial_customer_match_oracle(spark, adv_cust_dir, name):
    _assert_parity(spark, adv_cust_dir, "customer", name)


def test_null_event_time_is_invisible(spark, tmp_path):
    """The event-time contract: a row with NULL ts is quarantined at
    the catalog scan — otherwise Spark's event-time ops (window /
    session_window) DROP it while plain analytic windows ORDER it
    (NULLS FIRST, vs DuckDB's NULLS LAST), giving engine- and
    query-dependent placement. Pin both that the filter applies and
    that it reaches the parquet scan as a pushed filter."""
    import datetime as dt

    from gmt_dbt_spark.catalog import table as cat_table

    rows = [
        (0, dt.datetime(2024, 1, 1, 1), 1, "view", 1.0, "{}"),
        (1, None, 1, "click", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 2), 2, "view", 3.0, "{}"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    ev = cat_table(spark, str(tmp_path), "events")
    assert ev.count() == 2
    assert ev.filter("ts IS NULL").count() == 0
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(ts" in plan, plan


LI_QUERIES = [
    "agg_approx_distinct",
    "agg_bit_ops",
    "agg_collect",
    "agg_corr",
    "agg_cube",
    "agg_filter_clause",
    "agg_group",
    "agg_grouping_id",
    "agg_median",
    "agg_mode",
    "agg_multi_distinct",
    "agg_regression",
    "agg_skew",
    "agg_var_exact",
    "agg_weighted_avg",
    "fn_array_set",
    "fn_higher_order",
    "mart_abc_analysis",
    "mart_basket_lift",
    "sql_pivot_syntax",
]


@pytest.fixture(scope="module")
def adv_li_dir(tmp_path_factory):
    """Lineitem with the aggregate-breaking shapes: zero-variance
    groups (corr/regression/skew denominators), single-row groups,
    frequency TIES for mode, NULL quantities/prices/discounts/flags,
    zero and negative quantities, duplicate exact rows."""
    import datetime as dt
    import random

    rng = random.Random(20260814)
    d = tmp_path_factory.mktemp("adv_li")
    rows = []

    def add(ok, pk, sk, ln, qty, price, disc, tax, rf, ls, ship):
        rows.append((ok, pk, sk, ln, qty, price, disc, tax, rf, ls, ship))

    k = 0
    flags = [("A", "F"), ("N", "O"), ("R", "F")]
    for ok in range(1, 30):
        rf, ls = flags[ok % 3]
        for ln in range(1, rng.randint(2, 6)):
            add(ok, rng.randint(1, 40), rng.randint(1, 10), ln,
                float(rng.randint(1, 50)),
                round(rng.uniform(900.0, 90000.0), 2),
                round(rng.choice([0.0, 0.02, 0.05, 0.08, 0.1]), 2),
                round(rng.choice([0.0, 0.03, 0.06]), 2),
                rf, ls, dt.datetime(1995 + ok % 4, 1 + ok % 12, 1 + ok % 27))
            k += 1
    # zero-variance group: every value identical (corr/skew/regression
    # denominators are exactly 0)
    for ln in range(1, 5):
        add(90, 7, 7, ln, 10.0, 5000.0, 0.05, 0.0, "Z", "V", dt.datetime(1996, 5, 5))
    # single-row group (sample variance n-1 = 0)
    add(91, 8, 8, 1, 3.0, 123.45, 0.0, 0.0, "S", "1", dt.datetime(1996, 6, 6))
    # frequency tie for mode: two quantities equally common in group
    for ln in range(1, 3):
        add(92, 9, 9, ln, 11.0, 100.0, 0.0, 0.0, "T", "T", dt.datetime(1996, 7, 7))
    for ln in range(3, 5):
        add(92, 9, 9, ln, 22.0, 100.0, 0.0, 0.0, "T", "T", dt.datetime(1996, 7, 7))
    # NULLs
    add(93, 10, 10, 1, None, 500.0, 0.05, 0.0, "A", "F", dt.datetime(1996, 8, 8))
    add(93, 10, 10, 2, 5.0, None, None, None, "A", "F", dt.datetime(1996, 8, 8))
    add(94, 11, 11, 1, 5.0, 700.0, 0.02, 0.0, None, None, None)
    # zero / negative quantity (returns)
    add(95, 12, 12, 1, 0.0, 0.0, 0.0, 0.0, "R", "F", dt.datetime(1996, 9, 9))
    add(95, 12, 12, 2, -4.0, -250.0, 0.0, 0.0, "R", "F", dt.datetime(1996, 9, 9))
    # NULL partkey inside a populated flag group (COUNT(DISTINCT) and
    # the HLL sketch both ignore it — a count(*) over the distinct
    # projection would not; review finding) ...
    add(96, None, 13, 1, 2.0, 400.0, 0.0, 0.0, "A", "F", dt.datetime(1996, 10, 1))
    # ... and a flag group whose ONLY partkey is NULL: exact count 0,
    # where an unguarded |approx-exact|/exact bound check is an ANSI
    # DIVIDE_BY_ZERO crash, not just a divergence
    add(97, None, 14, 1, 1.0, 100.0, 0.0, 0.0, "X", "X", dt.datetime(1996, 10, 2))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int64()),
                "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
                "l_discount": pa.array([r[6] for r in rows], pa.float64()),
                "l_tax": pa.array([r[7] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
                "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
                "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", LI_QUERIES)
def test_adversarial_lineitem_match_oracle(spark, adv_li_dir, name):
    _assert_parity(spark, adv_li_dir, "lineitem", name)


JOIN_QUERIES = [
    "join_inner_equi",
    "join_left",
    "join_anti",
    "join_semi",
    "dq_not_null",
    "sql_exists_projection",
    "sql_not_in_nulls",
    "tpcds_count_band",
    "tpcds_multi_intersect",
    "tpcds_rollup_topk",
    "tpcds_share_rank",
    "udaf_cogrouped",
    # one-scan DQ suite (r3): NULL custkeys hit three checks at once
    # (not_null count, orphan exclusion, join-miss), dangling FKs hit
    # the orphan count
    "dq_suite_single_pass",
]


@pytest.fixture(scope="module")
def adv_join_dir(adv_ord_dir, adv_cust_dir, tmp_path_factory):
    """Two-table corpus for the join family: the hostile orders and
    customers side by side — dangling FKs both directions (orders for
    custkeys 120-121 have no customer row; customers 27-47 have no
    orders), a NULL o_custkey order, and NULL customer attributes."""
    import shutil

    d = tmp_path_factory.mktemp("adv_join")
    shutil.copy(f"{adv_ord_dir}/orders.parquet", f"{d}/orders.parquet")
    shutil.copy(f"{adv_cust_dir}/customer.parquet", f"{d}/customer.parquet")
    return str(d)


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_adversarial_joins_match_oracle(spark, adv_join_dir, name):
    _assert_parity(spark, adv_join_dir, ["orders", "customer"], name)


PART_QUERIES = [
    "fn_string",
    "fn_regexp",
    "fn_array",
    "fn_map",
    "join_fuzzy_block",
    "udf_scalar",
    "udf_sql_registered",
    "unpivot_long",
]


@pytest.fixture(scope="module")
def adv_part_dir(tmp_path_factory):
    """Parts with NULL/empty/unicode/whitespace names, NULL brands
    and types, regex metacharacters in names, zero/negative sizes
    and prices — the string-function gauntlet."""
    d = tmp_path_factory.mktemp("adv_part")
    rows = [
        (0, "small ring", "Brand#2", "ECONOMY", 11, 900.0),
        (1, "large shiny bolt", "Brand#1", "STANDARD", 5, 1200.5),
        (2, None, "Brand#3", "PROMO", 7, 333.3),          # NULL name
        (3, "", "Brand#1", "ECONOMY", 2, 10.0),            # empty name
        (4, "   ", None, "STANDARD", 3, 20.0),             # ws name, NULL brand
        (5, "ünïcode Ring Ø", "Brand#2", None, 9, 55.5),   # unicode, NULL type
        (6, "dot.star[*] (paren)+?", "Brand#4", "PROMO", 1, 7.77),  # regex metas
        (7, "tab\tand\nnewline", "Brand#4", "ECONOMY", 0, 0.0),     # ctl ws, zero
        (8, "negative", "Brand#5", "STANDARD", -3, -12.5),
        (9, "UPPER lower 123", "Brand#5", "PROMO", 42, 4242.0),
        (10, "ring ring ring", "Brand#2", "ECONOMY", 13, 130.0),
    ] * 3
    rows = [(i,) + r[1:] for i, r in enumerate(rows)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_name": pa.array([r[1] for r in rows], pa.string()),
                "p_brand": pa.array([r[2] for r in rows], pa.string()),
                "p_type": pa.array([r[3] for r in rows], pa.string()),
                "p_size": pa.array([r[4] for r in rows], pa.int64()),
                "p_retailprice": pa.array([r[5] for r in rows], pa.float64()),
            }
        ),
        str(d / "part.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", PART_QUERIES)
def test_adversarial_part_match_oracle(spark, adv_part_dir, name):
    _assert_parity(spark, adv_part_dir, "part", name)


LO_QUERIES = [
    "dq_unique",
    "graph_bfs_levels",
    "graph_pagerank",
    "join_hint_strategies",
    "tpcds_channel_rollup",
    "tpcds_cumulative_compare",
    "tpcds_frequent_buyers",
]


@pytest.fixture(scope="module")
def adv_lo_dir(adv_ord_dir, adv_li_dir, tmp_path_factory):
    """Hostile lineitem x hostile orders: the order keys only partly
    overlap (dangling FK edges for the graph builders), plus all the
    per-table NULL/tie shapes."""
    import shutil

    d = tmp_path_factory.mktemp("adv_lo")
    shutil.copy(f"{adv_ord_dir}/orders.parquet", f"{d}/orders.parquet")
    shutil.copy(f"{adv_li_dir}/lineitem.parquet", f"{d}/lineitem.parquet")
    return str(d)


@pytest.mark.parametrize("name", LO_QUERIES)
def test_adversarial_lineitem_orders_match_oracle(spark, adv_lo_dir, name):
    _assert_parity(spark, adv_lo_dir, ["orders", "lineitem"], name)


TPCH_QUERIES = [f"tpch_q{i}" for i in range(1, 23)] + [
    "flagship_revenue_by_region",
    "join_salted",
    "pivot_wide",
    "join_full",
    "join_theta",
    "join_spatial_grid",
]


@pytest.fixture(scope="module")
def adv_tpch_dir(adv_ord_dir, adv_cust_dir, adv_li_dir, adv_part_dir, tmp_path_factory):
    """The full hostile warehouse: every per-table hostile fixture
    plus small nation/region/supplier dims with NULL FKs and names.
    TPC-H ratio queries (market share, promo revenue, avg-quantity
    gates) meet empty denominators; joins meet dangling and NULL
    keys everywhere."""
    import shutil

    d = tmp_path_factory.mktemp("adv_tpch")
    for src, t in [
        (adv_ord_dir, "orders"),
        (adv_cust_dir, "customer"),
        (adv_li_dir, "lineitem"),
        (adv_part_dir, "part"),
    ]:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", None]
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(list(range(5)), pa.int64()),
                "r_name": pa.array(regions, pa.string()),
            }
        ),
        str(d / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(list(range(26)), pa.int64()),
                "n_name": pa.array(
                    [f"NATION_{i}" for i in range(25)] + [None], pa.string()
                ),
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)] + [None], pa.int64()
                ),
            }
        ),
        str(d / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(list(range(12)), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(10)] + [None, "Supplier#dup"],
                    pa.string(),
                ),
                "s_nationkey": pa.array(
                    [i % 25 for i in range(10)] + [None, 3], pa.int64()
                ),
                "s_acctbal": pa.array(
                    [round(100.0 * i - 250, 2) for i in range(10)] + [None, 0.0],
                    pa.float64(),
                ),
            }
        ),
        str(d / "supplier.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_adversarial_tpch_match_oracle(spark, adv_tpch_dir, name):
    _assert_parity(
        spark,
        adv_tpch_dir,
        ["orders", "customer", "lineitem", "part", "nation", "region", "supplier"],
        name,
    )


@pytest.fixture(scope="module")
def adv_longdoc_dir(tmp_path_factory):
    """Document-LENGTH skew the sf fixtures never have: one 50k-token
    document next to ordinary ones. Pins that per-doc work (64
    simhash sign-sums, minhash signatures, bigram streams, the
    curation funnel) is linear in doc length on BOTH engines — a
    quadratic-in-length term or a driver-side materialization would
    time out or diverge here."""
    d = tmp_path_factory.mktemp("adv_longdoc")
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(2000)]
    giant = " ".join(rng.choice(vocab) for _ in range(50_000))
    texts = [
        giant,
        "a normal document about stream processing and hash joins",
        "another ordinary document mentioning vector scans and merges",
        "a normal document about stream processing and hash joins",  # dup
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


LONGDOC_QUERIES = [
    "dedup_simhash",
    "dedup_fuzzy",
    "text_bigram_logprob",
    "text_bm25",
    "pipeline_pretrain_corpus",
]


@pytest.mark.parametrize("name", LONGDOC_QUERIES)
def test_adversarial_longdoc_matches_oracle(spark, adv_longdoc_dir, name):
    _assert_parity(spark, adv_longdoc_dir, "documents", name)


def test_nb_classifier_single_class_corpus(spark, tmp_path):
    """The degenerate-training edge the main sweep does NOT hit (its
    corpus cycles langs): an all-'en' corpus gives n_neg = 0 and
    c_neg = 0 for every token, so every vote is decided purely by
    smoothing mass — (c_pos+1)·(0+V) vs 1·(n_pos+V). Driver-mirror
    parity must hold, and every row must carry the all-positive
    label."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmt_dbt_spark.registry import all_queries

    texts = ["alpha beta gamma", "beta beta delta", "gamma alpha alpha",
             "delta epsilon", "epsilon alpha beta gamma delta"]
    d = tmp_path / "nb_single_class"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    _assert_parity(spark, str(d), "documents", "text_nb_classifier")
    rows = all_queries()["text_nb_classifier"](spark, str(d)).collect()
    assert len(rows) == len(texts)
    assert all(r.label_pos and r.evidence_neg == 0 for r in rows)


def test_scan_warc_marker_bearing_payload_excluded(spark, tmp_path):
    """The r5 self-review crash: a payload ENDING in 'WARC/1.0' plus
    the record's own trailing newline completes the lineSep marker
    mid-record, truncating it and leaving a garbage chunk whose
    Content-Length parse is '' (ANSI cast error). Marker-bearing
    payloads must be EXCLUDED by filter on both engines; the clean
    docs still round-trip."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmt_dbt_spark.registry import all_queries

    texts = [
        "a normal payload",
        "payload ending with marker WARC/1.0",
        "WARC/1.0 at the start",
        "another clean one",
    ]
    d = tmp_path / "warc_marker"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    _assert_parity(spark, str(d), "documents", "scan_warc")
    rows = all_queries()["scan_warc"](spark, str(d)).collect()
    assert {r.doc_id for r in rows} == {0, 3}
    assert all(r.length_ok for r in rows)


def test_pack_layout_null_text_corpus(spark, tmp_path):
    """The r5 review probe: a corpus containing a NULL-text doc. The
    layout filters NULL text on both engines (Spark's array_join over
    a null-skipped collect_list is '' while DuckDB's string_agg over
    all-NULLs is NULL — an asymmetric empty-serialization, the
    fn_array_set class), and filtering must leave every other doc's
    offsets unchanged (NULL tok never contributed to the running
    sum). pack_sequences (which keeps NULL rows, symmetrically) is
    parity-checked on the same corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["hello world one", None, "a b", "x", "y z w"]
    d = tmp_path / "pack_null_text"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
                "n_chars": [len(t) if t else 0 for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    _assert_parity(spark, str(d), "documents", "pack_attention_layout")
    _assert_parity(spark, str(d), "documents", "pack_sequences")
    # r6: the concat-chunk surface keeps NULL rows with NULL spans,
    # symmetrically (same contract as pack_sequences)
    _assert_parity(spark, str(d), "documents", "pack_concat_chunk")


def test_readability_oversized_doc_banded_not_wrapped(spark, tmp_path):
    """The r5 advisor's int64 wrap: the S·W cross terms leave int64
    for multi-million-word documents — Spark (non-ANSI) silently
    wraps into a wrong band while DuckDB raises, a cross-engine
    divergence. Guarded since r6: docs with sentences/words/vowel
    groups above 3·10⁶ band as 'oversized' with a NULL numerator on
    BOTH engines, and the arithmetic never evaluates for them.

    The oversized doc here maximizes the wrap per byte: every token
    'a' is one word AND one vowel group, each terminated as its own
    sentence, so S ≈ W ≈ V ≈ 3.2M and the unguarded 206835·S·W term
    would be ~2.1·10¹⁹ ≈ 2.3·(2⁶³−1) — a guaranteed wrap, not a
    maybe. Normal docs in the same corpus must band exactly as
    before."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmt_dbt_spark.registry import all_queries

    n = 3_200_001
    texts = ["a. " * n, "the quick brown fox jumps. it is easy to read.",
             "antidisestablishmentarianism polysyllabically"]
    d = tmp_path / "readability_oversized"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    _assert_parity(spark, str(d), "documents", "text_readability")
    rows = {r.doc_id: r for r in
            all_queries()["text_readability"](spark, str(d)).collect()}
    big = rows[0]
    assert big.band == "oversized" and big.flesch_milli_num is None, big
    assert big.n_words == n and big.n_sentences == n, big
    assert rows[1].band != "oversized" and rows[1].flesch_milli_num is not None


def test_semdedup_zero_vector_never_pairs(spark, adv_emb_dir):
    """The r6 review fix asserted directly: the all-zero embedding
    (vec_id 3 — a failed-encoder row in production) must appear in NO
    semdedup pair, as keeper or dropped. Cosine with a zero vector is
    undefined, not ≥ τ; before the na2>0 AND nb2>0 guard the
    cross-multiplied gate degenerated to 0 ≥ 0 and the zero vector
    paired with its entire cluster — a REMOVAL gate silently deleting
    clean documents."""
    from gmt_dbt_spark.registry import all_queries

    rows = all_queries()["dedup_semdedup"](spark, adv_emb_dir).collect()
    assert all(r.keep_id != 3 and r.drop_id != 3 for r in rows), [
        r for r in rows if 3 in (r.keep_id, r.drop_id)
    ][:5]
    # the exact-duplicate pair (5, 17) must still dedup: 17 drops to 5
    # if k-means put them in one cluster (it must — identical vectors
    # share a nearest centroid)
    assert any(r.keep_id == 5 and r.drop_id == 17 for r in rows), rows[:5]
    # the r7 hot-cluster cap's ABSOLUTE floor, pinned on the tiny
    # corpus: 40 rows can never have a hot cluster (≤40 < 64), even
    # though natural seed-skew puts >50% in one cluster here
    assert all(r.n_hot_clusters == 0 for r in rows), rows[:3]


def test_embed_cosine_zero_vector_never_pairs(spark, adv_emb_dir):
    """The r7 removal-gate sweep's REAL find (the exact hole r6 fixed
    in dedup_semdedup, alive in dedup_embed_cosine with a GREEN
    mirrored oracle): an all-zero embedding (vec 3) and a vector
    quantizing to all-zero (vec 9, 1e-7 magnitudes) paired with every
    band-mate — 21 false pairs measured — because the cosine gate's
    cross-multiplication degenerates to 0 ≥ 0. Cosine with a zero
    vector is undefined, not ≥ τ. Planted negative: neither may
    appear in any pair. Planted positive: the exact-duplicate pair
    (5, 17) must still pair with dot² = na2·nb2."""
    from gmt_dbt_spark.registry import all_queries

    rows = all_queries()["dedup_embed_cosine"](spark, adv_emb_dir).collect()
    bad = [r for r in rows if {3, 9} & {r.id_a, r.id_b}]
    assert not bad, bad[:5]
    dup = [r for r in rows if (r.id_a, r.id_b) == (5, 17)]
    assert dup and dup[0].dot_mil**2 == dup[0].na2_mil * dup[0].nb2_mil, dup


def test_semdedup_hot_cluster_cap_on_mode_collapse(spark, tmp_path):
    """The r6 VERDICT item-3 failure, pinned: a mode-collapsed
    embedder (every vector lands near one point — a real production
    encoder failure) must NOT run the within-cluster prune quadratic
    on the giant cluster. The collapsed cluster (~197 of 200 rows,
    over both the 2× balanced share AND the 64-row floor) is capped
    and AUDITED: n_hot_clusters=1 on every row plus the sentinel.
    Planted NEGATIVE (forbidden rows): the exact-dup pair (50, 51)
    sits INSIDE the collapsed cluster — it must NOT appear (the loss
    is the audit's job, not silent pruning's). Planted POSITIVE: the
    exact-dup pair (0, 1) sits in a small cold cluster — it MUST
    still dedup (1 drops to 0). Full Spark↔DuckDB parity is asserted
    on the same corpus, so the cap replay is value-hashed too."""
    import random

    rng = random.Random(20260815)
    a_pt = [0.3] * 64
    vecs = []
    for i in range(200):
        # collapse: everything near point A with tiny noise
        vecs.append([round(v + rng.uniform(-0.01, 0.01), 4) for v in a_pt])
    b_pt = [-0.4] * 64
    vecs[0] = list(b_pt)  # cold-cluster seed + planted-positive keeper
    vecs[1] = list(b_pt)  # exact dup of 0 — MUST drop to 0
    c_pt = [0.4 if i % 2 == 0 else -0.4 for i in range(64)]
    vecs[3] = list(c_pt)  # third seed, far away, alone
    vecs[51] = list(vecs[50])  # exact dup INSIDE the collapsed mass
    d = tmp_path / "mode_collapse"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(len(vecs))),
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
                "label": [i % 10 for i in range(len(vecs))],
            }
        ),
        str(d / "embeddings.parquet"),
    )
    rows = all_queries()["dedup_semdedup"](spark, str(d)).collect()
    assert all(r.n_hot_clusters == 1 for r in rows), rows[:3]
    # planted negative: the in-collapse dup pair is capped, not pruned
    assert not any(r.drop_id == 51 or r.keep_id == 51 for r in rows), [
        r for r in rows if 51 in (r.drop_id, r.keep_id)
    ]
    # planted positive: the cold-cluster dup still dedups
    assert any(r.keep_id == 0 and r.drop_id == 1 for r in rows), rows[:5]
    # sentinel always present
    assert any(r.drop_id is None for r in rows)
    # and the whole surface value-hashes against the DuckDB replay
    _assert_parity(spark, str(d), "embeddings", "dedup_semdedup")
