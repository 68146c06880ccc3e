"""Unicode text path — probe, pure-Python reference, planted gates.

Three evidence layers for the r9 unicode opt-in
(functions/unicode_text.py):

1. THE FROZEN-CONTRACT PROBE (the redact.py precedent): the 20
   hostile rows that the [\\p{L}\\p{M}\\p{N}]+ / ASCII-fold contract
   was probed on BEFORE freezing, re-run Spark-vs-DuckDB exactly —
   a Unicode-version or dialect drift in either engine fails here
   first.
2. PURE-PYTHON REFERENCE (the planted-test doctrine): the same rows
   tokenized by an INDEPENDENT implementation (the stdlib-adjacent
   `regex` module, not Java regex, not RE2, not the oracle SQL) —
   a bug mirrored into both engines cannot hide behind parity.
3. PLANTED GATE EVIDENCE for `dedup_exact_unicode` (removal class):
   planted positive (-1/-2: same CJK words, different punctuation →
   MUST collapse to one fingerprint) and planted negative (-3:
   different CJK words → must NEVER collapse), plus the explicit
   demonstration that the ASCII default WOULD spuriously collapse
   all three (the bug the unicode path exists to fix).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from gmt_dbt_spark.functions.unicode_text import PLANTED_MULTILINGUAL
from gmt_dbt_spark.operators.dedup import (
    _ASCII_LOWER,
    _ASCII_UPPER,
    UNI_TOKEN_RE,
    tokens_col,
    uni_tokens_col,
)
from gmt_dbt_spark.registry import all_queries

from tests.conftest import SF_DIR

# The probe corpus the contract was frozen on (dedup.py docstring).
HOSTILE_ROWS = [
    (1, "Hello WORLD 123"),
    (2, "İstanbul and ISTANBUL"),  # dotted capital I — the r3 trap
    (3, "中文文本处理 123"),  # CJK run + digits
    (4, "Привет мир"),  # Cyrillic
    (5, "caf\u00e9 vs cafe\u0301"),  # NFC é vs e + U+0301
    (6, "مرحبا بالعالم"),  # Arabic RTL
    (7, "straße STRASSE"),  # sharp s (no folding)
    (8, "हिन्दी भाषा"),  # Devanagari + combining marks
    (9, "１２３ fullwidth"),  # fullwidth digits (Nd)
    (10, "emoji \U0001f600 test"),  # So — excluded, splits tokens
    (11, "zero​width and zwj‍ join"),  # Cf — excluded
    (12, "한국어 테스트"),  # Hangul
    (13, "mixed中文english"),  # unbroken CJK/Latin run = ONE token
    (14, "Ελληνικά ΚΕΊΜΕΝΟ"),  # Greek (upper preserved)
    (15, None),
    (16, ""),
    (17, "   \t\n  "),
    (18, "a­b soft-hyphen"),  # soft hyphen (Cf) splits
    (19, "① circled one"),  # No is still \p{N}
    (20, "x́ marḱmid ́lead"),  # bare combining marks
    # r10 probe extension (VERDICT r9 item 8): normalization edges
    (21, "한국 jamo run"),  # NFD 한국 as conjoining jamo --
    # \p{L} letters (ONE unbroken token with the trailing latin? no:
    # space-separated), and the class NFC composes to syllables
    (22, "ạ̀ and ạ̀x stacked"),  # NFD combining stack:
    # NFC composes only a+0323 -> ạ, the grave stays combining
    # (partial composition)
    (23, "İstanbul 東京タワー ısparta"),  # dotted İ / dotless ı
    # next to a CJK run -- the casefold asymmetry vs the bigram grain
]


def _py_uni_tokens(text):
    """Independent reference tokenizer: python `regex` module (its
    own Unicode tables — neither Java regex nor RE2), same frozen
    contract: ASCII-only fold, [\\p{L}\\p{M}\\p{N}]+ runs."""
    import regex

    if text is None:
        return None
    folded = text.translate(str.maketrans(_ASCII_UPPER, _ASCII_LOWER))
    return regex.findall(UNI_TOKEN_RE, folded)


def _spark_tokens(spark, rows):
    df = spark.createDataFrame(rows, "id INT, text STRING")
    out = df.select(
        "id", uni_tokens_col(F.col("text")).alias("toks")
    ).collect()
    return {r.id: r.toks for r in out}


def test_unicode_probe_cross_engine(spark):
    """Re-run the freeze probe: Spark (Java regex) and DuckDB (RE2)
    must tokenize all 20 hostile rows IDENTICALLY."""
    spark_toks = _spark_tokens(spark, HOSTILE_ROWS)
    con = duckdb.connect()
    for i, t in HOSTILE_ROWS:
        duck = con.execute(
            "SELECT regexp_extract_all(translate(?, ?, ?), ?)",
            [t, _ASCII_UPPER, _ASCII_LOWER, UNI_TOKEN_RE],
        ).fetchone()[0]
        assert spark_toks[i] == duck, (i, t, spark_toks[i], duck)


def test_unicode_tokens_match_python_reference(spark):
    """Both the probe rows and the planted corpus must match the
    independent `regex`-module reference token-for-token (including
    order — this is a positional compare, not a multiset)."""
    rows = HOSTILE_ROWS + [(100 + k, t) for k, (_, t) in enumerate(PLANTED_MULTILINGUAL)]
    spark_toks = _spark_tokens(spark, rows)
    for i, t in rows:
        assert spark_toks[i] == _py_uni_tokens(t), (i, t, spark_toks[i])


def test_unicode_probe_pins_specific_semantics(spark):
    """Pin the contract rows that future readers will reach for:
    folding, marks, format chars, and the no-NFC rule."""
    toks = _spark_tokens(spark, HOSTILE_ROWS)
    # ASCII-only fold: ISTANBUL folds, İ is preserved.
    assert toks[2] == ["İstanbul", "and", "istanbul"]
    # No folding of ß / non-ASCII uppercase.
    assert toks[7] == ["straße", "strasse"]
    assert toks[14] == ["Ελληνικά", "ΚΕΊΜΕΝΟ"]
    # NFC and NFD spellings are distinct tokens.
    assert toks[5] == ["caf\u00e9", "vs", "cafe\u0301"]
    # Combining marks stay inside tokens; bare marks are tokens.
    assert toks[20] == ["x́", "marḱmid", "́lead"]
    # Format chars (ZWSP/ZWJ/soft hyphen) split tokens.
    assert toks[11] == ["zero", "width", "and", "zwj", "join"]
    assert toks[18] == ["a", "b", "soft", "hyphen"]
    # All Unicode numbers are tokens (fullwidth, circled).
    assert toks[9] == ["１２３", "fullwidth"]
    assert toks[19] == ["①", "circled", "one"]
    # NULL/empty/whitespace: NULL → None, others → [].
    assert toks[15] is None and toks[16] == [] and toks[17] == []
    # Unbroken mixed-script letter run is ONE token.
    assert toks[13] == ["mixed中文english"]


def _canon(text):
    """Pure-Python unicode canonical form (normalize_text twin)."""
    toks = _py_uni_tokens(text)
    return None if toks is None else " ".join(toks)


def test_dedup_exact_unicode_planted(spark):
    """Removal-gate evidence (GATES class 'removal'):

    PLANTED POSITIVE: -1 and -2 differ only in CJK punctuation → the
    unicode canonical forms are equal by construction, so they MUST
    share one fingerprint group (winner = min doc_id = -2, size 2).
    PLANTED NEGATIVE: -3 is a different CJK document → it must NEVER
    join that group.
    THE BUG BEING FIXED: under the ASCII default, -1/-2/-3 ALL
    normalize to '' (every CJK codepoint is stripped) and would
    spuriously dedup — asserted directly on the ASCII helper below.
    """
    texts = dict(PLANTED_MULTILINGUAL)
    # Construction sanity, independent of any engine:
    assert _canon(texts[-1]) == _canon(texts[-2])
    assert _canon(texts[-1]) != _canon(texts[-3])

    out = all_queries()["dedup_exact_unicode"](spark, SF_DIR)
    rows = {
        r.fp: r
        for r in out.filter(F.col("doc_id") < 0).collect()
    }
    fp_12 = hashlib.md5(_canon(texts[-1]).encode()).hexdigest()
    fp_3 = hashlib.md5(_canon(texts[-3]).encode()).hexdigest()
    assert rows[fp_12].doc_id == -2 and rows[fp_12].n_docs == 2
    assert rows[fp_3].doc_id == -3 and rows[fp_3].n_docs == 1

    # The ASCII default WOULD collapse all three (the motivating bug):
    df = spark.createDataFrame(
        [(i, texts[i]) for i in (-1, -2, -3)], "id INT, text STRING"
    )
    ascii_toks = {
        r.id: r.toks
        for r in df.select("id", tokens_col(F.col("text")).alias("toks")).collect()
    }
    assert ascii_toks == {-1: [], -2: [], -3: []}


def test_token_count_unicode_planted(spark):
    """Planted count expectations, computed by construction: the
    ASCII column counts only embedded ASCII/digit runs."""
    out = all_queries()["text_token_count_unicode"](spark, SF_DIR)
    got = {
        r.doc_id: (r.n_tokens_uni, r.n_tokens_ascii)
        for r in out.filter(F.col("doc_id") < 0).collect()
    }
    expect = {}
    for i, t in PLANTED_MULTILINGUAL:
        uni = len(_py_uni_tokens(t))
        # ASCII twin reference: strip non-alnum, split.
        ascii_n = len(
            "".join(c if c.isascii() and (c.isalnum() or c == " ") else " " for c in t)
            .lower()
            .split()
        )
        expect[i] = (uni, ascii_n)
    assert got == expect
    # And the headline asymmetries explicitly:
    assert got[-1] == (4, 0)  # pure CJK: invisible to the ASCII path
    assert got[-8][0] > got[-8][1]  # mixed doc undercounted by ASCII


def test_ascii_default_unchanged_on_ascii_corpus(spark):
    """The opt-in must not move the default: on pure-ASCII text the
    unicode tokenizer and the ASCII tokenizer agree exactly (so every
    pre-r9 frozen hash is provably untouched by this change)."""
    rows = [
        (1, "The Quick BROWN fox 42"),
        (2, "punct!!! only??? ..."),
        (3, "tabs\tand\nnewlines  collapse"),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    got = df.select(
        "id",
        tokens_col(F.col("text")).alias("a"),
        uni_tokens_col(F.col("text")).alias("u"),
    ).collect()
    for r in got:
        assert r.a == r.u, (r.id, r.a, r.u)


def test_dedup_fuzzy_unicode_planted(spark):
    """Pair-gate evidence for the deep-pipeline unicode inheritance:

    PLANTED POSITIVE: the (-11, -12) CJK pair shares the first 11 of
    12 tokens by construction → 10 shingles each, 9 common, union 11
    (jaccard 9/11 ≥ 0.6) — MUST appear with exactly those integer
    set sizes. The identical-token pair (-1, -2) must appear at
    (n_inter == n_union). PLANTED NEGATIVE: (-11, -3) share no
    vocabulary — must never pair.
    THE BUG BEING FIXED: under the ASCII default both -11 and -12
    tokenize to [] (asserted), i.e. they would collapse onto the
    whole-text '' shingle and pair spuriously at jaccard 1.0 with
    every other empty-normalizing doc."""
    out = all_queries()["dedup_fuzzy_unicode"](spark, SF_DIR)
    planted = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in out.filter(
            (F.col("id_a") < 0) & (F.col("id_b") < 0)
        ).collect()
    }
    assert planted[(-12, -11)] == (9, 11)
    ab = planted[(-2, -1)]
    assert ab[0] == ab[1]  # identical token streams
    assert (-11, -3) not in planted and (-3, -11) not in planted

    texts = dict(PLANTED_MULTILINGUAL)
    df = spark.createDataFrame(
        [(i, texts[i]) for i in (-11, -12)], "id INT, text STRING"
    )
    ascii_toks = {
        r.id: r.toks
        for r in df.select(
            "id", tokens_col(F.col("text")).alias("toks")
        ).collect()
    }
    assert ascii_toks == {-11: [], -12: []}


def test_langid_script_planted(spark):
    """Dominant-script expectations for the planted rows, by
    construction (counts are letters inside each frozen range):
    CJK rows → han, Cyrillic → cyrillic, Devanagari → devanagari,
    Latin-dominant rows → latin; the mixed row (-8) has 5 han chars
    vs 8 latin letters → latin."""
    out = all_queries()["text_langid_script"](spark, SF_DIR)
    got = {
        r.doc_id: r.script
        for r in out.filter(F.col("doc_id") < 0).collect()
    }
    assert got[-1] == "han" and got[-2] == "han" and got[-3] == "han"
    assert got[-4] == "cyrillic"
    assert got[-5] == "latin"
    assert got[-7] == "devanagari"
    assert got[-8] == "latin"
    assert got[-11] == "han" and got[-12] == "han"


def test_cjk_bigram_matches_python_reference(spark):
    """CJK char-bigram grams pinned against an independent pure-
    Python computation (regex runs + string slicing) for the planted
    corpus plus hostile rows — including single-char runs, mixed
    Latin/CJK, and kana/hangul."""
    import regex

    from gmt_dbt_spark.functions.unicode_text import CJK_RUN_RE

    rows = [(100 + k, t) for k, (_, t) in enumerate(PLANTED_MULTILINGUAL)] + [
        (1, "中文文本处理 and english 混合文本"),
        (2, "日本語テキスト"),
        (3, "한"),
        (4, ""),
        (5, None),
        (6, "abc 中 def 文本"),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    out = df.select(
        "id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(CJK_RUN_RE), F.lit(0))
        ).alias("run"),
    )
    run = F.col("run")
    grams = F.when(
        F.length(run) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(run) - 1),
            lambda i: run.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array(run))
    got = sorted(
        (r.id, r.g)
        for r in out.select("id", F.explode(grams).alias("g")).collect()
    )
    want = []
    for i, t in rows:
        if t is None:
            continue
        for r in regex.findall(CJK_RUN_RE, t):
            if len(r) >= 2:
                want += [(i, r[j : j + 2]) for j in range(len(r) - 1)]
            else:
                want.append((i, r))
    assert got == sorted(want)


def test_multilingual_curation_planted(spark):
    """Funnel expectations for the planted rows, by construction:
    -1/-2 are han-script duplicates (one survives dedup), -3 han
    distinct, -11/-12 han distinct fingerprints (near-dup, NOT
    exact-dup — both survive the EXACT gate), -5 latin passes,
    -6 latin passes, -4 cyrillic passes, -7 devanagari passes,
    -8 latin (8 latin letters vs 5 han chars) passes."""
    out = all_queries()["pipeline_multilingual_curation"](spark, SF_DIR)
    rows = {r.script: r for r in out.collect()}
    # planted han docs: -1,-2,-3,-11,-12 → all pass len, -1/-2 dedup
    # to one; fixture is pure-ASCII so han counts come ONLY from the
    # planted rows
    han = rows["han"]
    assert han.n_docs == 5 and han.n_pass_len == 5
    assert han.n_after_dedup == 4  # -1/-2 collapsed
    assert han.kept_tokens == 4 + 4 + 12 + 12  # -2(min id? no: min doc_id of {-1,-2} is -2) + -3 + -11 + -12
    assert rows["cyrillic"].n_docs == 1
    assert rows["devanagari"].n_docs == 1
    # latin = 500 fixture docs + -5, -6, -8
    assert rows["latin"].n_docs == 503


def test_nfc_probe_cross_engine_and_planted(spark):
    """The NFC freeze probe re-run (CPython unicodedata vs DuckDB
    utf8proc on hostile rows) + planted audit expectations: the -6
    row carries an NFD spelling → is_nfc false and n_chars shrinks
    by exactly the one composed accent; every other planted row is
    already NFC."""
    import unicodedata

    import duckdb

    rows = [
        "café", "café", "中文", "한국어", "가",
        "á̂", "İstanbul", "", "ascii only",
        "ﬁ ligature", "Å angstrom",
    ]
    con = duckdb.connect()
    for t in rows:
        d = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert d == unicodedata.normalize("NFC", t), repr(t)

    out = all_queries()["text_nfc_audit"](spark, SF_DIR)
    got = {
        r.doc_id: (r.is_nfc, r.n_chars_raw, r.n_chars_nfc)
        for r in out.filter(F.col("doc_id") < 0).collect()
    }
    texts = dict(PLANTED_MULTILINGUAL)
    for i, t in PLANTED_MULTILINGUAL:
        nfc = unicodedata.normalize("NFC", t)
        assert got[i] == (nfc == t, len(t), len(nfc)), (i, got[i])
    # the headline planted fact: -6 is the mixed-normalization row
    assert got[-6][0] is False and got[-6][2] == got[-6][1] - 1
    assert all(v[0] for k, v in got.items() if k != -6)


def test_cjk_bigram_neardup_planted(spark):
    """Pair-gate evidence at the bigram grain, by construction: the
    planted -11/-12 docs are space-separated single CJK chars, so
    every run has length 1 and each doc's gram set is its distinct
    CHARS — 11 shared of 13 union (12+12 tokens, 11 common) →
    jaccard 11/13 ≥ 0.6, MUST pair with exactly (11, 13). -1 and -2
    share ALL their distinct grams (same words mod punctuation) →
    pair at n_inter == n_union. Docs with no CJK (the entire ASCII
    fixture, -4, -5, -6) contribute no grams and never appear."""
    out = all_queries()["dedup_cjk_bigram_neardup"](spark, SF_DIR)
    rows = {(r.id_a, r.id_b): (r.n_inter, r.n_union) for r in out.collect()}
    assert all(a < 0 and b < 0 for a, b in rows), rows  # CJK-only corpus slice
    assert rows[(-12, -11)] == (11, 13)
    ab = rows[(-2, -1)]
    assert ab[0] == ab[1]
    for pair in rows:
        assert -4 not in pair and -5 not in pair and -6 not in pair


# --------------------------------------------------------------------
# r10 multilingual quality gates (VERDICT r9 item 3) — pure-Python
# references computed from the SAME frozen constants, independent of
# both engines and of the oracle SQL.


def _py_ilog2(x):
    """The knlm ilog2 contract, scale 4096, pure Python."""
    bl = x.bit_length()
    p = 1 << (bl - 1)
    return 4096 * (bl - 1) + ((x - p) * 4096) // p


def _py_quality(text):
    """Independent replay of text_quality_script_aware for one doc
    (python `regex` — neither Java regex nor RE2)."""
    import regex

    from gmt_dbt_spark.functions.unicode_text import (
        SCRIPT_RANGES,
        SPACE_CHAR_RE,
        WORD_CHAR_RE,
    )

    n_chars = len(text)
    n_word = len(regex.findall(WORD_CHAR_RE, text))
    n_space = len(regex.findall(SPACE_CHAR_RE, text))
    cnts = {k: len(regex.findall(p, text)) for k, p in SCRIPT_RANGES.items()}
    m = max(cnts.values())
    script = "none" if m == 0 else next(
        k for k in SCRIPT_RANGES if cnts[k] == m
    )
    if script == "none":
        n_runs, max_run = 0, 0
    else:
        runs = regex.findall(SCRIPT_RANGES[script] + "+", text)
        n_runs = len(runs)
        max_run = max((len(r) for r in runs), default=0)
    punct_milli = (
        (1000 * (n_chars - n_word - n_space)) // n_chars
        if n_chars > 0
        else None
    )
    folded = text.translate(str.maketrans(_ASCII_UPPER, _ASCII_LOWER))
    chars = regex.findall(WORD_CHAR_RE, folded)
    n = len(chars)
    if n == 0:
        return (
            script, n_chars, n_word, n_space, punct_milli, n_runs,
            max_run, 0, 0, None,
        )
    from collections import Counter

    ks = Counter(chars)
    h_fp = sum(k * (_py_ilog2(n) - _py_ilog2(k)) for k in ks.values())
    return (
        script, n_chars, n_word, n_space, punct_milli, n_runs, max_run,
        len(ks), h_fp, (h_fp * 1000) // (n * 4096),
    )


def test_quality_script_aware_matches_python_reference(spark):
    """Every planted row (both constants) pinned against the
    independent pure-Python replay — script routing, census, run
    shape, punct ratio, and the exact-integer char entropy."""
    from gmt_dbt_spark.functions.unicode_text import PLANTED_QUALITY

    out = all_queries()["text_quality_script_aware"](spark, SF_DIR)
    got = {
        r.doc_id: (
            r.script, r.n_chars, r.n_word_chars, r.n_space,
            r.punct_milli, r.n_runs, r.max_run, r.n_char_types,
            r.h_fp, r.char_entropy_milli,
        )
        for r in out.filter(F.col("doc_id") < 0).collect()
    }
    planted = dict(PLANTED_MULTILINGUAL) | dict(PLANTED_QUALITY)
    assert set(got) == set(planted)
    for i, t in planted.items():
        assert got[i] == _py_quality(t), (i, t, got[i], _py_quality(t))


def test_quality_script_aware_planted_signals(spark):
    """The headline planted facts, stated as construction-derived
    integers (not via the replay): the repeat doc (-21) has exactly
    one kana run spanning the doc and ZERO entropy; the punct-only
    doc (-23) routes 'none' with NULL entropy and punct_milli
    1000*(15-3)/15 = 800; the Latin template (-26) has char entropy
    strictly below a same-length prose doc's."""
    out = all_queries()["text_quality_script_aware"](spark, SF_DIR)
    got = {r.doc_id: r for r in out.filter(F.col("doc_id") < 0).collect()}
    r21 = got[-21]
    assert (r21.script, r21.n_runs, r21.max_run) == ("kana", 1, 9)
    assert (r21.n_char_types, r21.h_fp, r21.char_entropy_milli) == (1, 0, 0)
    r23 = got[-23]
    assert (r23.script, r23.punct_milli) == ("none", 800)
    assert r23.n_char_types == 0 and r23.char_entropy_milli is None
    assert r23.n_runs == 0 and r23.max_run == 0
    # template (-26: 3 distinct chars over 24) vs prose (-22: richer)
    assert got[-26].char_entropy_milli < got[-22].char_entropy_milli


def _py_cjk_lm(planted):
    """Independent replay of text_cjk_bigram_logprob's integer
    evidence over a corpus with no other CJK (the ASCII fixtures
    contribute no runs)."""
    import regex

    from gmt_dbt_spark.functions.unicode_text import CJK_RUN_RE

    events = {}
    for i, t in planted.items():
        for run in regex.findall(CJK_RUN_RE, t):
            if len(run) >= 3:
                grams = [run[j : j + 2] for j in range(len(run) - 1)]
                events.setdefault(i, []).extend(
                    f"{a} {b}" for a, b in zip(grams, grams[1:])
                )
    from collections import Counter

    bcnt = Counter(e for es in events.values() for e in es)
    ccnt = Counter(
        e.split(" ")[0] for es in events.values() for e in es
    )
    exp = {}
    for i, es in events.items():
        cbs = [bcnt[e] for e in es]
        exp[i] = (
            len(es),
            sum(1 for c in cbs if c == 1),
            min(cbs),
            max(cbs),
            max(ccnt[e.split(" ")[0]] for e in es),
            True,
        )
    return exp


def test_cjk_bigram_logprob_matches_python_reference(spark):
    """The CJK-grain LM's integer evidence pinned against the pure-
    Python corpus replay: only the planted docs with >=3-char runs
    appear (-20 with 16 events, the -24/-25 template pair whose 7
    shared prefix events are the non-hapax counts, -28's two short
    hangul runs); the ASCII fixture contributes nothing."""
    from gmt_dbt_spark.functions.unicode_text import (
        PLANTED_MULTILINGUAL as PM,
        PLANTED_QUALITY as PQ,
    )

    out = all_queries()["text_cjk_bigram_logprob"](spark, SF_DIR)
    got = {
        r.doc_id: (
            r.n_lm_bigrams, r.n_hapax, r.min_big_cnt, r.max_big_cnt,
            r.max_ctx_cnt, r.bound_ok,
        )
        for r in out.collect()
    }
    exp = _py_cjk_lm(dict(PM) | dict(PQ))
    assert got == exp, (got, exp)
    # construction-derived spot pins (independent of the replay)
    assert got[-20][0] == 16  # 18-char run -> 16 unit bigrams
    assert got[-24][3] == 2 and got[-25][3] == 2  # shared prefix
    assert got[-28][0] == 3  # runs of 4 and 3 chars -> 2 + 1


def test_normalization_edges_probe(spark):
    """r10 probe extension (VERDICT r9 item 8) — the normalization
    edge cases the NFC audit exposed, each pinned cross-engine AND
    against CPython unicodedata:

    1. Hangul JAMO composition: the conjoining-jamo spelling of
       한국 (row 21) is six \\p{L} letters that NFC composes to two
       precomposed syllables — n_chars shrinks 6→2 and is_nfc is
       false.
    2. Partial composition: a + U+0323 + U+0300 (row 22) NFC-composes
       only the first mark (a+0323→ạ); the grave survives as a
       combining char — 3 chars → 2, never 1.
    3. İstanbul under the CJK-bigram GRAIN (row 23): the grain
       extracts han/kana/hangul runs only, so the İ/I/ı casefold
       asymmetry (the r3 trap) is structurally INVISIBLE there —
       all case variants yield identical grams.
    """
    import unicodedata

    import duckdb

    from gmt_dbt_spark.functions.unicode_text import CJK_RUN_RE

    rows = dict(HOSTILE_ROWS)
    jamo_word = rows[21].split()[0]
    assert all(0x1100 <= ord(c) <= 0x11FF for c in jamo_word)
    nfc = unicodedata.normalize("NFC", jamo_word)
    assert len(jamo_word) == 6 and len(nfc) == 2 and nfc == "한국"
    con = duckdb.connect()
    assert con.execute(
        "SELECT nfc_normalize(?)", [jamo_word]
    ).fetchone()[0] == nfc

    stack = rows[22].split()[0]
    assert [ord(c) for c in stack] == [0x61, 0x323, 0x300]
    snfc = unicodedata.normalize("NFC", stack)
    assert len(snfc) == 2 and ord(snfc[0]) == 0x1EA1 and ord(snfc[1]) == 0x300
    assert con.execute(
        "SELECT nfc_normalize(?)", [stack]
    ).fetchone()[0] == snfc

    # the audit surface itself reports both (via a scratch corpus
    # through the registered op's expression shape): is_nfc false,
    # shrinking char counts
    df = spark.createDataFrame(
        [(1, jamo_word), (2, stack)], "doc_id BIGINT, text STRING"
    )
    from gmt_dbt_spark.functions.unicode_text import _nfc_udf

    out = {
        r.doc_id: (r.n_raw, r.n_nfc)
        for r in df.select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_raw"),
            F.length(_nfc_udf()(F.col("text"))).cast("bigint").alias("n_nfc"),
        ).collect()
    }
    assert out == {1: (6, 2), 2: (3, 2)}

    # casefold asymmetry invisible at the CJK-bigram grain
    def grams(spark_text):
        d = spark.createDataFrame([(1, spark_text)], "id INT, text STRING")
        return sorted(
            r.run
            for r in d.select(
                F.explode(
                    F.regexp_extract_all(
                        F.col("text"), F.lit(CJK_RUN_RE), F.lit(0)
                    )
                ).alias("run")
            ).collect()
        )
    base = grams("istanbul 東京タワー isparta")
    assert grams(rows[23]) == base
    assert grams("ISTANBUL 東京タワー ISPARTA") == base
    assert base == ["東京タワー"]

    # the jamo/bigram-grain hazard: the NFD spelling emits ZERO grams
    # (conjoining jamo are outside the precomposed-syllable run
    # class) while its NFC form emits one — exactly the corpus skew
    # text_nfc_audit exists to surface before the grain runs
    assert grams(jamo_word) == []
    assert grams(nfc) == ["한국"]


# --------------------------------------------------------------------
# r10 funnel drill (VERDICT r9 item 4, VERIFICATION pattern 14): the
# multilingual curation funnel's construction-derived FULL replay.
# Neither the sf fixtures nor the planted corpus contain a doc that
# FAILS the >=3-token gate or a passing dup group with asymmetric
# counts, so before this test a mirrored stage-order/transition-count
# bug (kept counted without the gate; pass counted after dedup) could
# alias through every existing pin. The scratch corpus exercises
# EVERY transition — gate fail (short/empty docs), dup-collapse among
# passers (x3 group), dup-collapse among failers (x2 group), and
# per-script splits with distinct counts — and the expectation is a
# pure-Python replay of the whole funnel (script argmax, unicode
# tokens, md5 fingerprint, (gate, fp)-partitioned keep-lowest-id),
# never the oracle SQL.


def _py_curation_funnel(rows):
    import hashlib as _h
    from collections import defaultdict

    import regex

    from gmt_dbt_spark.functions.unicode_text import SCRIPT_RANGES

    per_doc = []
    for i, t in rows:
        if t is None:
            continue
        cnts = {
            k: len(regex.findall(p, t)) for k, p in SCRIPT_RANGES.items()
        }
        m = max(cnts.values())
        script = (
            "none" if m == 0 else next(
                k for k in SCRIPT_RANGES if cnts[k] == m
            )
        )
        toks = _py_uni_tokens(t)
        fp = _h.md5(" ".join(toks).encode()).hexdigest()
        per_doc.append((i, script, len(toks), fp, len(toks) >= 3))
    first = {}
    for i, _, _, fp, p in per_doc:
        key = (p, fp)
        first[key] = min(first.get(key, i), i)
    out = defaultdict(lambda: [0, 0, 0, 0])
    for i, script, ntok, fp, p in per_doc:
        row = out[script]
        row[0] += 1
        if p:
            row[1] += 1
            if first[(p, fp)] == i:
                row[2] += 1
                row[3] += ntok
    return {s: tuple(v) for s, v in out.items()}


_FUNNEL_ROWS = [
    (1, "short doc"),                      # latin, 2 tokens -> FAIL
    (2, "短文"),                            # han, 1 token -> FAIL
    (3, "短文"),                            # ... x2: FAILING dup group
    (4, "le corpus multilingue est prêt"),  # latin pass
    (5, "le corpus multilingue est prêt"),  # x3: PASSING dup group
    (6, "le corpus multilingue est prêt"),
    (7, "Привет мир сегодня хорошо"),       # cyrillic pass
    (8, ""),                                # none, 0 tokens -> FAIL
    (9, "中文 文本 处理 测试 额外"),          # han pass, distinct
    (10, "こんにちは せかい です"),           # kana pass
]


def test_multilingual_curation_funnel_replay(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "funnel_sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in _FUNNEL_ROWS],
                "text": [r[1] for r in _FUNNEL_ROWS],
                "lang": ["xx"] * len(_FUNNEL_ROWS),
                "source": ["drill"] * len(_FUNNEL_ROWS),
                "n_chars": [len(r[1]) for r in _FUNNEL_ROWS],
            }
        ),
        str(d / "documents.parquet"),
    )
    out = all_queries()["pipeline_multilingual_curation"](spark, str(d))
    got = {
        r.script: (r.n_docs, r.n_pass_len, r.n_after_dedup, r.kept_tokens)
        for r in out.collect()
    }
    # the op unions the planted corpus onto whatever sf_dir it reads
    want = _py_curation_funnel(_FUNNEL_ROWS + PLANTED_MULTILINGUAL)
    assert got == want, (got, want)
    # construction spot-pins, independent of the replay: the x3
    # passing latin dup group collapses 3 -> 1 (n_pass_len counts all
    # three, n_after_dedup one); the failing groups never reach kept
    assert got["latin"][1] - got["latin"][2] == 2
    assert got["none"] == (1, 0, 0, 0)
    # kana: the scratch doc + no planted kana
    assert got["kana"] == (1, 1, 1, 3)


def test_script_quality_gate_planted(spark):
    """Removal-gate evidence (GATES class 'removal') for
    pipeline_script_quality_gate, by construction:

    PLANTED POSITIVES (must be dropped): -21 (single repeated kana
    char — char entropy exactly 0 < 1500), -23 (punct-only — zero
    word chars, NULL entropy, punct_milli 800 > 300), -26 (the
    'aaaa bbbb' template — 24 word chars split over 2 symbols gives
    entropy_milli exactly 1000 < 1500, failing ONLY the entropy
    sub-gate: punct/run/len all pass, so this row proves the entropy
    gate does the dropping).
    PLANTED NEGATIVES (must never be dropped): prose rows in five
    scripts (-20 kana/han, -22 cyrillic, -27 arabic, -28 hangul,
    -7 devanagari, -4 cyrillic, -1 han)."""
    from gmt_dbt_spark.registry import all_queries as _aq

    out = _aq()["pipeline_script_quality_gate"](spark, SF_DIR)
    got = {r.doc_id: r for r in out.filter(F.col("doc_id") < 0).collect()}

    assert got[-21].keep is False and got[-21].pass_entropy is False
    assert got[-23].keep is False
    assert got[-23].pass_len is False and got[-23].pass_punct is False
    assert got[-23].pass_entropy is None  # NULL entropy -> COALESCE false
    r26 = got[-26]
    assert r26.char_entropy_milli == 1000  # construction: 12a+12b
    assert (
        r26.pass_entropy, r26.pass_punct, r26.pass_run, r26.pass_len
    ) == (False, True, True, True)
    assert r26.keep is False

    for i in (-20, -22, -27, -28, -7, -4, -1):
        assert got[i].keep is True, (i, got[i])
