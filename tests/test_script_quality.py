"""Per-script quality tuning loop (functions/script_quality.py) —
planted / construction-derived / pure-Python-replay evidence for the
three r10 late additions.

Evidence layers (house doctrine):
  - percentiles: FULL pure-Python replay — signals recomputed per doc
    by `_py_quality` (python `regex`, neither Java regex nor RE2, not
    the oracle SQL), percentile contract recomputed from the sorted
    value lists, entire result set compared.
  - threshold-table gate (GATES class 'removal'): planted FLIP
    evidence on a scratch corpus — one doc each way where the table
    decides DIFFERENTLY from the global gate (looser han run budget,
    tighter latin punct budget), plus the fallback-equality pin
    (every doc whose script has no table row must decide IDENTICALLY
    to `pipeline_script_quality_gate` — the COALESCE default path).
  - stopword table: construction-derived counts for the planted
    stopword corpus (ids -40..-43) and the no-list NULL semantics on
    CJK / script-none docs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gmt_dbt_spark.functions.script_quality import (
    PLANTED_STOP,
    QG_SCRIPT_THRESHOLDS,
    STOPWORDS,
)
from gmt_dbt_spark.functions.unicode_text import (
    PLANTED_MULTILINGUAL,
    PLANTED_QUALITY,
)
from gmt_dbt_spark.registry import all_queries
from tests.conftest import SF_DIR
from tests.test_unicode_text import _py_quality


def _write_docs(tmp_path, rows):
    """Scratch documents dir: rows = [(doc_id, text)]."""
    d = tmp_path / "sq_docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["xx"] * len(rows),
                "source": ["scratch"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


# --------------------------------------------------------------------
# text_quality_percentiles_by_script — full pure-Python replay
# --------------------------------------------------------------------


def _py_percentiles(texts):
    """Replay: signals via _py_quality, then the exact contract
    p_q = smallest v with cum*1000 >= q*n over ascending values."""
    sigs = {}  # (script, signal) -> [v, ...]
    for t in texts:
        if t is None:
            continue
        (script, _nc, n_word, _ns, punct, _nr, max_run, _nt, _h, ent) = (
            _py_quality(t)
        )
        for signal, v in (
            ("punct_milli", punct),
            ("max_run", max_run),
            ("entropy_milli", ent),
            ("n_word_chars", n_word),
        ):
            if v is not None:
                sigs.setdefault((script, signal), []).append(v)
    out = {}
    for key, vs in sigs.items():
        vs.sort()
        n = len(vs)
        ps = []
        for q in (250, 500, 750, 900):
            # first index i (1-based cum) with i*1000 >= q*n
            i = -(-q * n // 1000)  # ceil
            ps.append(vs[max(i, 1) - 1])
        out[key] = (n, *ps)
    return out


def test_quality_percentiles_matches_python_reference(spark):
    docs = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    texts = docs + [t for _, t in PLANTED_MULTILINGUAL] + [
        t for _, t in PLANTED_QUALITY
    ]
    want = _py_percentiles(texts)
    out = all_queries()["text_quality_percentiles_by_script"](spark, SF_DIR)
    got = {
        (r.script, r.signal): (r.n_docs, r.p250, r.p500, r.p750, r.p900)
        for r in out.collect()
    }
    assert got == want


# --------------------------------------------------------------------
# pipeline_quality_gate_per_script — planted flips + fallback pin
# --------------------------------------------------------------------

# 50 DISTINCT han chars, no separators: one 50-char run. Entropy =
# ilog2(50)*1000/4096 = 5562 milli-bits >= the han row's 1200; run 50
# FAILS the global QG_MAX_RUN=40 but PASSES the han budget 80.
_HAN_RUN_50 = "".join(chr(0x4E00 + i) for i in range(50))

# latin prose + 7 '!': n_chars 24, word 15, space 2 -> punct_milli
# floor(7000/24) = 291 — PASSES the global 300, FAILS the latin 250.
_LATIN_PUNCT_291 = "unique words here" + "!" * 7

# fallback-script prose (cyrillic has NO table row).
_CYR_PROSE = "привет мир как дела сегодня без шума"

_FLIP_ROWS = [
    (1, _HAN_RUN_50),
    (2, _LATIN_PUNCT_291),
    (3, _CYR_PROSE),
]


def test_quality_gate_per_script_planted_flips(spark, tmp_path):
    """REMOVAL-gate evidence: the table decides differently from the
    global gate in BOTH directions, by construction; fallback scripts
    decide identically (COALESCE default path)."""
    d = _write_docs(tmp_path, _FLIP_ROWS)
    tbl = {
        r.doc_id: r
        for r in all_queries()["pipeline_quality_gate_per_script"](
            spark, d
        ).collect()
    }
    glb = {
        r.doc_id: r
        for r in all_queries()["pipeline_script_quality_gate"](
            spark, d
        ).collect()
    }
    # doc 1 — the looser-direction flip: han run budget 80.
    r1, g1 = tbl[1], glb[1]
    assert (r1.script, r1.max_run) == ("han", 50)
    assert (r1.thr_entropy, r1.thr_punct, r1.thr_run, r1.thr_len) == (
        1200, 350, 80, 2,
    )
    assert r1.char_entropy_milli == 5562  # 50 distinct chars: ilog2(50)
    assert r1.pass_run is True and r1.keep is True
    assert g1.pass_run is False and g1.keep is False
    # doc 2 — the tighter-direction flip: latin punct budget 250.
    r2, g2 = tbl[2], glb[2]
    assert (r2.script, r2.punct_milli, r2.thr_punct) == ("latin", 291, 250)
    assert r2.pass_punct is False and r2.keep is False
    assert g2.pass_punct is True and g2.keep is True
    # fallback pin: every doc (scratch AND planted) whose script has
    # no table row carries the global thresholds and the SAME verdict.
    tabled = {s for s, *_ in QG_SCRIPT_THRESHOLDS}
    fallback = [r for r in tbl.values() if r.script not in tabled]
    assert any(r.doc_id == 3 for r in fallback)  # cyrillic scratch doc
    for r in fallback:
        g = glb[r.doc_id]
        assert (r.thr_entropy, r.thr_punct, r.thr_run, r.thr_len) == (
            1500, 300, 40, 3,
        ), r
        assert (
            r.pass_entropy, r.pass_punct, r.pass_run, r.pass_len, r.keep
        ) == (
            g.pass_entropy, g.pass_punct, g.pass_run, g.pass_len, g.keep
        ), r


def test_quality_gate_per_script_table_covers_known_scripts():
    """The table's scripts are real census scripts (typo guard) and
    the two planted flips stay inside tuned rows."""
    from gmt_dbt_spark.functions.unicode_text import SCRIPT_RANGES

    assert {s for s, *_ in QG_SCRIPT_THRESHOLDS} <= set(SCRIPT_RANGES)


# --------------------------------------------------------------------
# text_stopword_ratio_table — construction-derived planted counts
# --------------------------------------------------------------------


def test_stopword_ratio_planted(spark):
    """ids -40..-43 by construction (docstring table in
    script_quality.py), plus the no-list NULL semantics on the
    r9/r10 planted CJK / punct-only rows and a folded-capital
    cross-check on the cyrillic prose row."""
    out = all_queries()["text_stopword_ratio_table"](spark, SF_DIR)
    got = {
        r.doc_id: (r.script, r.n_tokens, r.has_list, r.n_stop, r.stop_milli)
        for r in out.filter(F.col("doc_id") < 0).collect()
    }
    # the planted stopword corpus
    assert got[-40] == ("latin", 9, True, 5, 555)  # the x3 + and + on
    assert got[-41] == ("cyrillic", 6, True, 2, 333)  # и, что
    assert got[-42] == ("kana", 1, False, None, None)  # unsegmented
    assert got[-43] == ("arabic", 5, True, 2, 400)  # هذا, في
    # no-list semantics on the other planted constants
    assert got[-23] == ("none", 0, False, None, None)  # punct-only
    assert got[-20][0] == "han" and got[-20][2] is False  # CJK
    # ASCII-only fold: 'Привет' keeps its capital (token != list form)
    # but lowercase 'как' hits — 1 stop over 5 tokens = 200 milli.
    assert got[-22] == ("cyrillic", 5, True, 1, 200)
    # mixed-script key pin (drill finding, pattern 14): -44 is
    # latin-dominant (18 latin vs 4 cyrillic chars) so its 'и' must
    # NOT match the cyrillic list under the (script, token) key —
    # only 'the' counts: 1 stop over 5 tokens = 200 milli. A
    # token-only join (the planted mirrored bug) reports 2/5 = 400.
    assert got[-44] == ("latin", 5, True, 1, 200)


def test_stopword_lists_are_lowercase_single_tokens():
    """Contract guard: every list entry must be a single token under
    the frozen unicode contract (no spaces, no ASCII uppercase), or
    the broadcast join could never match it."""
    for script, words in STOPWORDS.items():
        for w in words:
            assert w == w.strip() and " " not in w, (script, w)
            assert not any("A" <= c <= "Z" for c in w), (script, w)
    # planted ids are unique and disjoint from the other constants
    ids = [i for i, _ in PLANTED_STOP]
    others = {i for i, _ in PLANTED_MULTILINGUAL} | {
        i for i, _ in PLANTED_QUALITY
    }
    assert len(set(ids)) == len(ids) and not (set(ids) & others)


# --------------------------------------------------------------------
# pipeline_quality_gate_autotuned — FULL pure-Python replay
# --------------------------------------------------------------------


def _pdisc(vs, q):
    vs = sorted(vs)
    n = len(vs)
    i = -(-q * n // 1000)  # ceil(q*n/1000)
    return vs[max(i, 1) - 1]


def test_quality_gate_autotuned_full_replay(spark):
    """REMOVAL-gate evidence: signals -> per-script percentile cuts
    -> verdict recomputed independently (python `regex` signals, the
    percentile contract, the AUTOTUNE_CUTS policy, the per-signal
    COALESCE fallback) for EVERY doc, whole verdict map compared."""
    from gmt_dbt_spark.functions.script_quality import AUTOTUNE_CUTS

    tbl = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["doc_id", "text"]
    )
    rows = list(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    rows += list(PLANTED_MULTILINGUAL) + list(PLANTED_QUALITY)
    sig = {}
    for i, t in rows:
        if t is None:
            continue
        sig[i] = _py_quality(t)
    dist = {}
    for s in sig.values():
        for signal, v in (
            ("punct_milli", s[4]),
            ("max_run", s[6]),
            ("entropy_milli", s[9]),
            ("n_word_chars", s[2]),
        ):
            if v is not None:
                dist.setdefault((s[0], signal), []).append(v)
    defaults = {"c_entropy": 1500, "c_punct": 300, "c_run": 40}
    cuts = {}
    for script in {s[0] for s in sig.values()}:
        cuts[script] = tuple(
            _pdisc(dist[(script, signal)], q)
            if (script, signal) in dist
            else defaults[name]
            for name, (signal, q) in AUTOTUNE_CUTS.items()
        )
    want = {}
    for i, s in sig.items():
        ce, cp, cr = cuts[s[0]]
        ent, punct, mr, nw = s[9], s[4], s[6], s[2]
        keep = (
            ent is not None and ent >= ce
            and punct is not None and punct <= cp
            and mr <= cr
            and nw >= 3
        )
        want[i] = (s[0], ce, cp, cr, bool(keep))
    out = all_queries()["pipeline_quality_gate_autotuned"](spark, SF_DIR)
    got = {
        r.doc_id: (r.script, r.thr_entropy, r.thr_punct, r.thr_run, r.keep)
        for r in out.collect()
    }
    assert got == want
    # the gate is RELATIVE: some doc of each populous script must
    # fall in its own bottom entropy quartile and be dropped
    assert any(not k for (_, _, _, _, k) in got.values())
    assert any(k for (_, _, _, _, k) in got.values())


# --------------------------------------------------------------------
# pipeline_quality_gate_combined — planted sub-gate evidence
# --------------------------------------------------------------------


def test_quality_gate_combined_planted(spark):
    """REMOVAL-gate evidence by construction: -45 (latin keyword
    stuffing, 20 unique commerce words, zero stopwords) passes all
    four signal sub-gates and drops ONLY via pass_stop — the doc
    class the stopword sub-gate exists for; -46 (CJK prose) has no
    list -> pass_stop NULL, keeps on the signal gates; -40 (9
    tokens) sits below STOP_MIN_TOKENS -> exempt (NULL); the
    decision matches the global signal-only gate wherever pass_stop
    is NULL (not-applicable means not-consulted)."""
    from gmt_dbt_spark.functions.script_quality import (
        STOP_MIN_HITS,
        STOP_MIN_TOKENS,
    )

    out = all_queries()["pipeline_quality_gate_combined"](spark, SF_DIR)
    got = {r.doc_id: r for r in out.filter(F.col("doc_id") < 0).collect()}
    r45 = got[-45]
    assert (r45.script, r45.n_tokens, r45.has_list) == ("latin", 20, True)
    assert r45.n_tokens >= STOP_MIN_TOKENS and r45.n_stop < STOP_MIN_HITS
    assert (
        r45.pass_entropy, r45.pass_punct, r45.pass_run, r45.pass_len
    ) == (True, True, True, True)
    assert r45.pass_stop is False and r45.keep is False
    r46 = got[-46]
    assert r46.has_list is False and r46.pass_stop is None
    assert r46.keep is True
    r40 = got[-40]
    assert r40.has_list is True and r40.n_tokens < STOP_MIN_TOKENS
    assert r40.pass_stop is None  # short-doc exemption
    # where pass_stop is NULL the combined verdict equals the pure
    # signal gate's verdict on the SAME doc (global constants)
    glb = {
        r.doc_id: r
        for r in all_queries()["pipeline_script_quality_gate"](
            spark, SF_DIR
        ).filter(F.col("doc_id") < 0).collect()
    }
    for i, r in got.items():
        if r.pass_stop is None and i in glb:
            assert r.keep == glb[i].keep, (i, r, glb[i])
