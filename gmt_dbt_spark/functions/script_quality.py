"""Per-script quality TUNING loop — round 10 closes the loop the
r10 gate opened (NOTES_r10 "for round 11": the QG_* thresholds are
frozen demo constants; "a per-script threshold TABLE (broadcast
join) is the natural next surface").

Three registered surfaces, one narrative:

  text_quality_percentiles_by_script   the TUNING pass — exact
      discrete percentiles (p25/p50/p75/p90) of every quality signal
      per script, computed WITHOUT a corpus-wide sort: percentiles
      ride the (script, signal, value) count relation, whose
      cardinality is bounded by the VALUE DOMAIN (punct/entropy are
      milli-scaled ≤ ~20k distinct; run/word-char counts ≤ max doc
      length), not by the corpus.  This is the report an operator
      reads to pick per-script thresholds.
  pipeline_quality_gate_per_script     the per-script threshold
      TABLE operationalized — the same keep/drop decision as
      `pipeline_script_quality_gate` but thresholds come from a
      small broadcast-joined relation keyed by script (CJK scripts
      tolerate longer unsegmented runs; Latin gets a TIGHTER punct
      gate), with the global QG_* constants as the fallback for
      scripts without a tuned row.
  text_stopword_ratio_table            the stopword-ratio signal
      (the classic Gopher-style gate) via a broadcast (script,
      token) stopword TABLE — the `text_badwords_filter_bcast`
      production-join shape extended to per-script lists; scripts
      with no stopword list (CJK — no word boundaries, no closed
      function-word class at token grain) surface NULL, the honest
      "this signal does not exist here" semantics rather than a
      fake 0.

One-implementation rule: the two threshold surfaces consume the
SHARED `_quality_signal_frame` (unicode_text.py) and their oracles
WRAP `_quality_script_oracle()` as a subquery — zero second copies
of the signal logic, so the driver hash pins gate ≡ signals here
exactly as it does for the r10 global gate.

Exactness: every number is integer (milli fixed point; percentile
contract = smallest v with cum_count*1000 >= q*n — percentile_disc
semantics spelled out identically on both engines, no builtin
quantile whose interpolation could differ).

Scale shape (100 TB): the percentile op shuffles only (script,
signal, value) partial counts — the window that orders values runs
over the POST-AGGREGATE bounded relation, never the corpus (the
hardened r10 plan sweep verifies every leaf-to-window path crosses
the aggregate).  Both table joins broadcast the dimension side
(5-row thresholds / ~60-row stopwords; a production 10^4-word list
still broadcasts — that is the point of the join form, per the r9
badwords lesson).  Documents never leave the scan stage; only
doc-keyed integers shuffle.

Reference parity: whitefantom00/gmt-dbt has no quality/multilingual
surface (its corpus is English Yelp JSON — main.py:314-349); this
module is part of the demanded LLM-pipeline extension (SURVEY §2.L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.functions.unicode_text import (
    _ASCII_LO,
    _ASCII_UP,
    _PLANTED_VALUES as _M_VALUES,
    _QPLANTED_VALUES as _Q_VALUES,
    _QSRC_SQL,
    _quality_script_oracle,
    _quality_signal_frame,
    _with_qplanted,
    QG_MAX_PUNCT_MILLI,
    QG_MAX_RUN,
    QG_MIN_ENTROPY_MILLI,
    QG_MIN_WORD_CHARS,
    SCRIPT_RANGES,
)
from gmt_dbt_spark.operators.dedup import UNI_TOKEN_RE
from gmt_dbt_spark.registry import query

# ---------------------------------------------------------------------------
# text_quality_percentiles_by_script
# ---------------------------------------------------------------------------

# (signal label, source column) — labels are the output vocabulary.
_SIGNALS: list[tuple[str, str]] = [
    ("punct_milli", "punct_milli"),
    ("max_run", "max_run"),
    ("entropy_milli", "char_entropy_milli"),
    ("n_word_chars", "n_word_chars"),
]

# percentile points in milli (q/1000).
_PCTS: list[int] = [250, 500, 750, 900]

_MELT_SQL = "\n  UNION ALL ".join(
    f"SELECT script, '{lbl}' AS signal, {col} AS v FROM sig"
    for lbl, col in _SIGNALS
)

_PCT_COLS_SQL = ",\n       ".join(
    f"CAST(MIN(CASE WHEN cum * 1000 >= {q} * n THEN v END) AS BIGINT)"
    f" AS p{q}"
    for q in _PCTS
)

# The melt -> count -> cumulative chain, as a CTE fragment expecting
# a relation `sig` (the signal oracle) to exist — shared verbatim by
# the percentile surface and the autotuned gate (zero second copies).
_PCT_CORE_SQL = f"""m AS (
  {_MELT_SQL}
),
f AS (
  SELECT script, signal, CAST(v AS BIGINT) AS v FROM m WHERE v IS NOT NULL
),
vc AS (
  SELECT script, signal, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM f GROUP BY 1, 2, 3
),
cum AS (
  SELECT script, signal, v, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY script, signal ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY script, signal)
              AS BIGINT) AS n
  FROM vc
),
pct AS (
  SELECT script, signal, CAST(MAX(n) AS BIGINT) AS n_docs,
       {_PCT_COLS_SQL}
  FROM cum GROUP BY 1, 2
)"""

_PCTL_ORACLE = f"""
WITH sig AS MATERIALIZED (SELECT * FROM ({_quality_script_oracle()}) q0),
{_PCT_CORE_SQL}
SELECT * FROM pct
"""


@query("text_quality_percentiles_by_script", oracle=_PCTL_ORACLE)
def text_quality_percentiles_by_script(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-script percentile summary of the quality signals — the
    TUNING pass that produces a per-script threshold table (the
    operator's answer to "the QG_* constants are frozen demo
    values": read p25 of entropy / p75 of punct / p90 of max_run
    per script, set the gate where the mass sits).

    Exact percentile_disc contract, spelled out identically on both
    engines (no builtin quantile): p_q = smallest value v whose
    cumulative doc count reaches ceil(q/1000 * n), i.e. the first v
    with cum*1000 >= q*n over the ascending distinct-value counts.
    NULL signal values (entropy of zero-word-char docs) are excluded
    and n_docs is the per-(script, signal) NON-NULL doc count, so a
    signal that does not exist for a doc never drags its percentile.

    Scale: the corpus reduces to (script, signal, value) partial
    counts at the scan-side aggregate — the cumulative window then
    orders a relation bounded by the VALUE DOMAIN (milli scales /
    doc-length), not the corpus; no global sort anywhere (the
    hardened plan sweep checks the leaf-to-window path crosses the
    aggregate).  Spark melts via `stack` in ONE pass; the oracle's
    4-way UNION melt reads a MATERIALIZED CTE (pattern 12)."""
    return _percentile_frame(spark, sf_dir)


def _percentile_frame(
    spark: SparkSession, sf_dir: str, sig: DataFrame | None = None
) -> DataFrame:
    """The shared builder behind the percentile surface and the
    autotuned gate — ONE implementation of the melt -> count ->
    cumulative -> conditional-min plan (mirrors _PCT_CORE_SQL).
    ``sig`` supplies a prebuilt (e.g. checkpointed) signal frame;
    None computes it fresh."""
    q = sig if sig is not None else _quality_signal_frame(spark, sf_dir)
    stack_args = ", ".join(f"'{lbl}', {col}" for lbl, col in _SIGNALS)
    m = q.selectExpr(
        "script",
        f"stack({len(_SIGNALS)}, {stack_args}) AS (signal, v)",
    ).filter(F.col("v").isNotNull())
    vc = m.groupBy("script", "signal", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("script", "signal")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("script", "signal")
    cum = vc.select(
        "script",
        "signal",
        "v",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n"),
    )
    pct_cols = [
        F.min(
            F.when(
                F.col("cum") * 1000 >= F.lit(q_) * F.col("n"), F.col("v")
            )
        )
        .cast("bigint")
        .alias(f"p{q_}")
        for q_ in _PCTS
    ]
    return cum.groupBy("script", "signal").agg(
        F.max("n").cast("bigint").alias("n_docs"), *pct_cols
    )


# ---------------------------------------------------------------------------
# pipeline_quality_gate_per_script
# ---------------------------------------------------------------------------

# The tuned per-script threshold table: (script, min_entropy_milli,
# max_punct_milli, max_run, min_word_chars).  CJK scripts tolerate
# long unsegmented runs (no word boundaries) and slightly more
# punctuation (fullwidth forms); Hangul segments with spaces so its
# run budget sits between; Latin gets a TIGHTER punct gate than the
# global default (boilerplate/markup is the dominant Latin failure
# mode) — deliberately, so the table is stricter in one direction
# and looser in another, and the planted flip tests pin BOTH.
# Scripts with no row (cyrillic, greek, devanagari, none) fall back
# to the global QG_* constants via LEFT JOIN + COALESCE.
QG_SCRIPT_THRESHOLDS: list[tuple[str, int, int, int, int]] = [
    ("han", 1200, 350, 80, 2),
    ("kana", 1200, 350, 80, 2),
    ("hangul", 1300, 350, 60, 2),
    ("arabic", 1400, 300, 40, 3),
    ("latin", 1500, 250, 40, 3),
]

_THR_VALUES = ", ".join(
    f"('{s}', {e}, {p}, {r}, {w})" for s, e, p, r, w in QG_SCRIPT_THRESHOLDS
)

_GATE_TBL_ORACLE = f"""
WITH thr(script, t_entropy, t_punct, t_run, t_len) AS
  (VALUES {_THR_VALUES})
SELECT q.doc_id, q.script, q.n_word_chars, q.punct_milli, q.max_run,
       q.char_entropy_milli,
       CAST(COALESCE(t.t_entropy, {QG_MIN_ENTROPY_MILLI}) AS BIGINT)
         AS thr_entropy,
       CAST(COALESCE(t.t_punct, {QG_MAX_PUNCT_MILLI}) AS BIGINT)
         AS thr_punct,
       CAST(COALESCE(t.t_run, {QG_MAX_RUN}) AS BIGINT) AS thr_run,
       CAST(COALESCE(t.t_len, {QG_MIN_WORD_CHARS}) AS BIGINT) AS thr_len,
       (q.char_entropy_milli >=
          COALESCE(t.t_entropy, {QG_MIN_ENTROPY_MILLI})) AS pass_entropy,
       (q.punct_milli <= COALESCE(t.t_punct, {QG_MAX_PUNCT_MILLI}))
         AS pass_punct,
       (q.max_run <= COALESCE(t.t_run, {QG_MAX_RUN})) AS pass_run,
       (q.n_word_chars >= COALESCE(t.t_len, {QG_MIN_WORD_CHARS}))
         AS pass_len,
       COALESCE(q.char_entropy_milli >=
                  COALESCE(t.t_entropy, {QG_MIN_ENTROPY_MILLI})
                AND q.punct_milli <= COALESCE(t.t_punct,
                  {QG_MAX_PUNCT_MILLI})
                AND q.max_run <= COALESCE(t.t_run, {QG_MAX_RUN})
                AND q.n_word_chars >= COALESCE(t.t_len,
                  {QG_MIN_WORD_CHARS}),
                FALSE) AS keep
FROM ({_quality_script_oracle()}) q
LEFT JOIN thr t ON q.script = t.script
"""


@query("pipeline_quality_gate_per_script", oracle=_GATE_TBL_ORACLE)
def pipeline_quality_gate_per_script(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-script threshold TABLE gate — the same multilingual
    removal decision as `pipeline_script_quality_gate`, but the
    thresholds come from a broadcast-joined relation keyed by the
    dominant script (QG_SCRIPT_THRESHOLDS above), with the global
    QG_* constants as the fallback row.  This is the surface a
    production deployment actually tunes: the percentile op emits
    the per-script distribution, an operator writes the table, the
    gate broadcast-joins it — no code change per retune.

    Semantics pinned by the planted flip tests (scratch corpus): a
    han doc whose 50-char unsegmented run fails the global run gate
    (40) PASSES under its tuned row (80); a latin doc at punct 28%
    passes globally (300) but FAILS the tighter latin row (250);
    fallback-script docs decide IDENTICALLY to the global gate.
    NULL-signal docs keep=false via COALESCE on both engines.

    Scale: the signal plan (2 scans + entropy aggregate) + one
    BroadcastHashJoin against the 5-row table (plan-guarded) + a
    pure projection — the per-script capability costs one broadcast,
    zero extra exchanges."""
    q = _quality_signal_frame(spark, sf_dir)
    thr = spark.createDataFrame(
        QG_SCRIPT_THRESHOLDS,
        "script STRING, t_entropy BIGINT, t_punct BIGINT,"
        " t_run BIGINT, t_len BIGINT",
    )
    j = q.join(F.broadcast(thr), "script", "left")
    te = F.coalesce("t_entropy", F.lit(QG_MIN_ENTROPY_MILLI).cast("bigint"))
    tp = F.coalesce("t_punct", F.lit(QG_MAX_PUNCT_MILLI).cast("bigint"))
    tr = F.coalesce("t_run", F.lit(QG_MAX_RUN).cast("bigint"))
    tl = F.coalesce("t_len", F.lit(QG_MIN_WORD_CHARS).cast("bigint"))
    pe = F.col("char_entropy_milli") >= te
    pp = F.col("punct_milli") <= tp
    pr = F.col("max_run") <= tr
    pl = F.col("n_word_chars") >= tl
    return j.select(
        "doc_id", "script", "n_word_chars", "punct_milli", "max_run",
        "char_entropy_milli",
        te.alias("thr_entropy"),
        tp.alias("thr_punct"),
        tr.alias("thr_run"),
        tl.alias("thr_len"),
        pe.alias("pass_entropy"),
        pp.alias("pass_punct"),
        pr.alias("pass_run"),
        pl.alias("pass_len"),
        F.coalesce(pe & pp & pr & pl, F.lit(False)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# text_stopword_ratio_table
# ---------------------------------------------------------------------------

# Per-script stopword lists (public function-word heads; lowercase —
# list matching is EXACT on the frozen unicode token contract, whose
# case fold is ASCII-only, so non-Latin sentence-initial capitals do
# not match; a production deployment extends the fold per script and
# rebuilds, same contract note as the r9 unicode opt-in).  Scripts
# absent here (han/kana/hangul — unsegmented, no closed function-word
# class at token grain; 'none') carry NO list and surface NULL.
STOPWORDS: dict[str, list[str]] = {
    "latin": [
        "the", "and", "of", "to", "in", "is", "it", "that", "for",
        "was", "on", "with", "as", "at", "by", "an", "be", "de",
        "la", "el", "le", "und", "der", "die", "et", "en",
    ],
    "cyrillic": ["и", "в", "не", "на", "я", "что", "с", "он", "как", "это"],
    "greek": ["και", "το", "του", "να", "με", "την", "της", "τα"],
    "arabic": ["في", "من", "على", "أن", "إلى", "هذا", "ما", "لا"],
    "devanagari": ["है", "और", "का", "के", "की", "में", "से"],
}

# Planted stopword corpus (ids -40..-43; the r9/r10 planted constants
# stay frozen — this op unions a THIRD constant).  Construction-derived
# expectations live in tests/test_script_quality.py:
#   -40 latin: 9 tokens, 5 list hits (the x3, and, on) -> 555 milli
#   -41 cyrillic: 6 tokens, 2 hits -> 333 milli
#   -42 kana-dominant unsegmented: 1 token, NO list -> NULLs
#   -43 arabic: 5 tokens, 2 hits -> 400 milli
PLANTED_STOP: list[tuple[int, str]] = [
    (-40, "the cat and the dog sat on the mat"),
    (-41, "привет мир и все что есть"),
    (-42, "データ処理の基盤システム"),
    (-43, "هذا كتاب جيد في المدرسة"),
    # mixed-script: latin-dominant doc carrying the CYRILLIC stopword
    # token - correct join key is (script, token), so this doc counts
    # ONLY its latin stop; a token-only join would also match the
    # cyrillic list (drill finding, VERIFICATION pattern 14)
    (-44, "the report и data analysis"),
]

_STOP_VALUES = ", ".join(
    f"('{s}', '{w}')" for s, ws in STOPWORDS.items() for w in ws
)
_SPLANTED_VALUES = ", ".join(f"({i}, '{t}')" for i, t in PLANTED_STOP)
_LISTED = ", ".join(f"'{s}'" for s in STOPWORDS)

_STOP_CNT_COLS = ",\n         ".join(
    f"len(regexp_extract_all(text, '{p}')) AS s_{k}"
    for k, p in SCRIPT_RANGES.items()
)
_STOP_MAX = "GREATEST(" + ", ".join(f"s_{k}" for k in SCRIPT_RANGES) + ")"
_STOP_WHEN = "\n              ".join(
    f"WHEN s_{k} = m THEN '{k}'" for k in SCRIPT_RANGES
)

# Default source head for the stopword oracle: a WITH chain ending
# in a CTE named src2 (doc_id, text).  The combined gate passes a
# wider union under the same CTE name.
_STOP_SRC_HEAD = f"""WITH {_QSRC_SQL},
src2 AS (
  SELECT doc_id, text FROM qsrc
  UNION ALL
  SELECT CAST(id AS BIGINT) AS doc_id, text
  FROM (VALUES {_SPLANTED_VALUES}) p(id, text)
)"""


def _stopword_oracle_sql(src_head: str = _STOP_SRC_HEAD) -> str:
    return f"""
{src_head},
base AS (
  SELECT doc_id, text,
         regexp_extract_all(translate(text, '{_ASCII_UP}', '{_ASCII_LO}'),
                            '{UNI_TOKEN_RE}') AS toks,
         {_STOP_CNT_COLS}
  FROM src2 WHERE text IS NOT NULL
),
g AS (SELECT *, {_STOP_MAX} AS m FROM base),
s AS (
  SELECT doc_id, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN m = 0 THEN 'none'
              {_STOP_WHEN}
         END AS script
  FROM g
),
tk AS (SELECT doc_id, script, unnest(toks) AS tok FROM s),
stop(script, tok) AS (VALUES {_STOP_VALUES}),
h AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM tk JOIN stop USING (script, tok) GROUP BY 1
)
SELECT s.doc_id, s.script, s.n_tokens,
       (s.script IN ({_LISTED})) AS has_list,
       CASE WHEN s.script IN ({_LISTED})
            THEN CAST(COALESCE(h.c, 0) AS BIGINT) END AS n_stop,
       CASE WHEN s.script IN ({_LISTED}) AND s.n_tokens > 0
            THEN CAST((1000 * COALESCE(h.c, 0)) // s.n_tokens AS BIGINT)
       END AS stop_milli
FROM s LEFT JOIN h USING (doc_id)
"""


_STOPWORD_ORACLE = _stopword_oracle_sql()


@query("text_stopword_ratio_table", oracle=_STOPWORD_ORACLE)
def text_stopword_ratio_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stopword-ratio quality signal via a broadcast (script, token)
    stopword TABLE — the Gopher-style "does this read like prose"
    gate, in the production join form (`text_badwords_filter_bcast`'s
    r9 lesson: a 10^4-word list belongs in a broadcast relation, not
    a compiled-in literal): unicode tokens (the frozen word-char
    class + ASCII fold contract) explode once, the stopword
    relation broadcasts, hits re-aggregate per doc.

    Per doc: dominant script (census argmax — the langid router),
    n_tokens, has_list (does a stopword list exist for this script),
    n_stop, stop_milli = floor(1000 * n_stop / n_tokens).  Scripts
    without a list surface NULL — a CJK doc has NO stopword signal
    (unsegmented, no closed function-word token class), and the
    honest NULL here is exactly the hole the entropy/run signals in
    `text_quality_script_aware` cover; a downstream gate combines
    them per script (the threshold-table surface).

    Scale: census + tokenize are one scan-side projection; only
    (doc_id, token-hit) rows shuffle into the per-doc count; the
    stopword join is a BroadcastHashJoin (plan-guarded).  Documents
    never leave the scan stage."""
    src = _with_qplanted(spark, sf_dir).unionAll(
        spark.createDataFrame(PLANTED_STOP, "doc_id BIGINT, text STRING")
    )
    return _stopword_frame(spark, src)


def _stopword_frame(spark: SparkSession, src: DataFrame) -> DataFrame:
    """The shared builder behind the stopword surface and the
    combined gate — ONE implementation of the census + tokenize +
    broadcast-join + per-doc-count plan (mirrors
    `_stopword_oracle_sql`'s body over its src2 CTE).

    r10 optimization pass (guide §2.4): ONE census+tokenize pass.
    The late-wave shape consumed the censused frame twice (the
    token-explode branch and a per-doc left join back), so every
    doc paid the script regexes + the unicode tokenizer TWICE and
    the hit counts re-attached through a doc-keyed join. Now the
    per-doc columns (script, n_tokens) ride THROUGH the explode —
    zero-token docs survive via a one-NULL-token sentinel row that
    can never match the stopword relation — the stop table
    LEFT-broadcast-joins the stream (a list word is unique per
    script, so the join never duplicates a token row), and a single
    groupBy(doc_id) recovers every doc: exchanges 4 → 1 (map-side
    partial aggregation reduces the exploded stream to ~1 row/doc
    before it), corpus scans 2 → 1, no doc-keyed join at all."""
    src = src.filter(F.col("text").isNotNull())
    cnts = [
        F.regexp_count("text", F.lit(p)).alias(f"s_{k}")
        for k, p in SCRIPT_RANGES.items()
    ]
    base = src.select(
        "doc_id",
        F.regexp_extract_all(
            F.translate("text", _ASCII_UP, _ASCII_LO),
            F.lit(UNI_TOKEN_RE),
            F.lit(0),
        ).alias("toks"),
        *cnts,
    )
    m = F.greatest(*[F.col(f"s_{k}") for k in SCRIPT_RANGES])
    dom = F.when(m == 0, F.lit("none"))
    for k in SCRIPT_RANGES:
        dom = dom.when(F.col(f"s_{k}") == m, F.lit(k))
    s = base.select(
        "doc_id",
        "toks",
        F.size("toks").cast("bigint").alias("n_tokens"),
        dom.alias("script"),
    )
    tk = s.select(
        "doc_id",
        "script",
        "n_tokens",
        F.explode(
            F.when(F.size("toks") > 0, F.col("toks")).otherwise(
                F.array(F.lit(None).cast("string"))
            )
        ).alias("tok"),
    )
    stop = spark.createDataFrame(
        [(sc, w, 1) for sc, ws in STOPWORDS.items() for w in ws],
        "script STRING, tok STRING, __hit INT",
    )
    per = (
        tk.join(F.broadcast(stop), ["script", "tok"], "left")
        .groupBy("doc_id")
        .agg(
            F.max("script").alias("script"),
            F.max("n_tokens").alias("n_tokens"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("bigint").alias("c"),
        )
    )
    has_list = F.col("script").isin(*STOPWORDS)
    n_stop = F.when(has_list, F.col("c")).cast("bigint")
    return per.select(
        "doc_id",
        "script",
        "n_tokens",
        has_list.alias("has_list"),
        n_stop.alias("n_stop"),
        F.when(
            has_list & (F.col("n_tokens") > 0),
            F.expr("(1000 * c) div n_tokens"),
        )
        .cast("bigint")
        .alias("stop_milli"),
    )


# ---------------------------------------------------------------------------
# pipeline_quality_gate_autotuned
# ---------------------------------------------------------------------------

# Which percentile of each signal's per-script distribution becomes
# the cut (the demo tuning policy, stated once and generated into
# both engines): drop the bottom entropy quartile, the top punct
# quartile, and the top run decile; the word-char floor stays the
# global constant (a floor, not a distributional quantity).
AUTOTUNE_CUTS: dict[str, tuple[str, int]] = {
    # threshold name -> (signal label, percentile point in milli)
    "c_entropy": ("entropy_milli", 250),
    "c_punct": ("punct_milli", 750),
    "c_run": ("max_run", 900),
}

_THR_PIVOT_SQL = ",\n         ".join(
    f"MAX(CASE WHEN signal = '{sig}' THEN p{q} END) AS {name}"
    for name, (sig, q) in AUTOTUNE_CUTS.items()
)

_AUTOTUNED_ORACLE = f"""
WITH sig AS MATERIALIZED (SELECT * FROM ({_quality_script_oracle()}) q0),
{_PCT_CORE_SQL},
thr AS (
  SELECT script,
         {_THR_PIVOT_SQL}
  FROM pct GROUP BY 1
)
SELECT s.doc_id, s.script, s.n_word_chars, s.punct_milli, s.max_run,
       s.char_entropy_milli,
       CAST(COALESCE(t.c_entropy, {QG_MIN_ENTROPY_MILLI}) AS BIGINT)
         AS thr_entropy,
       CAST(COALESCE(t.c_punct, {QG_MAX_PUNCT_MILLI}) AS BIGINT)
         AS thr_punct,
       CAST(COALESCE(t.c_run, {QG_MAX_RUN}) AS BIGINT) AS thr_run,
       (s.char_entropy_milli >=
          COALESCE(t.c_entropy, {QG_MIN_ENTROPY_MILLI})) AS pass_entropy,
       (s.punct_milli <= COALESCE(t.c_punct, {QG_MAX_PUNCT_MILLI}))
         AS pass_punct,
       (s.max_run <= COALESCE(t.c_run, {QG_MAX_RUN})) AS pass_run,
       (s.n_word_chars >= {QG_MIN_WORD_CHARS}) AS pass_len,
       COALESCE(s.char_entropy_milli >=
                  COALESCE(t.c_entropy, {QG_MIN_ENTROPY_MILLI})
                AND s.punct_milli <= COALESCE(t.c_punct,
                  {QG_MAX_PUNCT_MILLI})
                AND s.max_run <= COALESCE(t.c_run, {QG_MAX_RUN})
                AND s.n_word_chars >= {QG_MIN_WORD_CHARS},
                FALSE) AS keep
FROM sig s LEFT JOIN thr t ON s.script = t.script
"""


@query("pipeline_quality_gate_autotuned", oracle=_AUTOTUNED_ORACLE)
def pipeline_quality_gate_autotuned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SELF-tuning per-script gate — no frozen thresholds at
    all: pass 1 computes each script's signal percentiles (the
    shared `_percentile_frame`), the cut policy (AUTOTUNE_CUTS)
    pivots them into a per-script threshold row (keep iff entropy >=
    its script's p25, punct <= p75, max_run <= p90, word chars >=
    the global floor), and pass 2 broadcast-joins the <=8-row
    threshold relation back onto the signals.  This is the CCNet
    relative-threshold idea ("quality is relative to the corpus
    slice") applied to the script-aware signals — and it is exactly
    the 2-pass cutpoint-split shape that replaced the global-rank
    windows in VERDICT r9 item 2: statistics pass, then scan-side
    decision, never a corpus-wide sort.

    A script whose percentile row is missing for a signal (no
    non-NULL values) falls back to the global QG_* constants via
    COALESCE — the same fallback doctrine as the threshold-table
    gate.  NULL-signal docs keep=false via COALESCE.

    One implementation: signals AND percentiles are the shared
    builders; the oracle composes the SAME _PCT_CORE_SQL fragment
    and wraps the signal oracle MATERIALIZED (referenced by both
    the stats chain and the gate scan — pattern 12).

    Scale (r10 optimization pass, guide §2.4/§5): the doc-keyed
    signal relation (~80 B/doc of integers) is localCheckpoint'd
    ONCE and feeds BOTH the stats pass and the gate pass — the
    late-wave shape computed the whole census+entropy signal plan
    twice (4 corpus scans; the SCALE.md row documented this exact
    checkpoint as the production form, now implemented). The
    threshold relation is dimension-sized and broadcast; no new
    shuffle class.  Planted evidence (GATES class removal): the full
    pure-Python replay in tests/test_script_quality.py recomputes
    signals -> percentiles -> cuts -> keep for EVERY doc
    independently and compares the whole verdict map."""
    sig0 = _quality_signal_frame(spark, sf_dir).localCheckpoint(eager=True)
    pct = _percentile_frame(spark, sf_dir, sig=sig0)
    thr_cols = [
        F.max(
            F.when(F.col("signal") == sig, F.col(f"p{q}"))
        ).alias(name)
        for name, (sig, q) in AUTOTUNE_CUTS.items()
    ]
    thr = pct.groupBy("script").agg(*thr_cols)
    j = sig0.join(F.broadcast(thr), "script", "left")
    te = F.coalesce("c_entropy", F.lit(QG_MIN_ENTROPY_MILLI).cast("bigint"))
    tp = F.coalesce("c_punct", F.lit(QG_MAX_PUNCT_MILLI).cast("bigint"))
    tr = F.coalesce("c_run", F.lit(QG_MAX_RUN).cast("bigint"))
    pe = F.col("char_entropy_milli") >= te
    pp = F.col("punct_milli") <= tp
    pr = F.col("max_run") <= tr
    pl = F.col("n_word_chars") >= F.lit(QG_MIN_WORD_CHARS)
    return j.select(
        "doc_id", "script", "n_word_chars", "punct_milli", "max_run",
        "char_entropy_milli",
        te.alias("thr_entropy"),
        tp.alias("thr_punct"),
        tr.alias("thr_run"),
        pe.alias("pass_entropy"),
        pp.alias("pass_punct"),
        pr.alias("pass_run"),
        pl.alias("pass_len"),
        F.coalesce(pe & pp & pr & pl, F.lit(False)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# pipeline_quality_gate_combined
# ---------------------------------------------------------------------------

# The stopword sub-gate (Gopher's "does it read like prose" rule,
# per-script): applicable only where a stopword list EXISTS and the
# doc is long enough for the absence of function words to be signal
# rather than noise; then require at least STOP_MIN_HITS list hits.
STOP_MIN_TOKENS = 20
STOP_MIN_HITS = 2

# Planted combined-gate corpus (ids -45/-46; PLANTED_STOP stays as
# the stopword op shipped it).  Construction:
#   -45 latin keyword-stuffing: 20 unique commerce words, ZERO
#       stopwords — passes every distribution-free signal gate
#       (high entropy, no punct, short runs, plenty of word chars)
#       and is EXACTLY what the stopword sub-gate exists to drop.
#   -46 CJK prose (22 chars, one token): no stopword list exists ->
#       sub-gate NOT APPLICABLE (NULL), doc keeps on the signal
#       gates — the per-script honesty the combined gate preserves.
PLANTED_COMBINED: list[tuple[int, str]] = [
    (
        -45,
        "buy cheap watches best price quality discount offer deal"
        " sale shop today limited stock order fast free ship gift"
        " brand",
    ),
    (-46, "深層学習モデルの訓練データ品質管理手法の研究"),
]

_CPLANTED_VALUES = ", ".join(f"({i}, '{t}')" for i, t in PLANTED_COMBINED)

# The widened source (documents ∪ all four planted constants) as a
# CTE named qsrc (for the signal oracle) and as a src2 head (for the
# stopword oracle) — generate-from-constants on both engines.
_SRC3_SQL = f"""qsrc AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT CAST(id AS BIGINT) AS doc_id, text
  FROM (VALUES {_M_VALUES}) v(id, text)
  UNION ALL
  SELECT CAST(id AS BIGINT) AS doc_id, text
  FROM (VALUES {_Q_VALUES}) q(id, text)
  UNION ALL
  SELECT CAST(id AS BIGINT) AS doc_id, text
  FROM (VALUES {_SPLANTED_VALUES}) p(id, text)
  UNION ALL
  SELECT CAST(id AS BIGINT) AS doc_id, text
  FROM (VALUES {_CPLANTED_VALUES}) c(id, text)
)"""

_SRC3_STOP_HEAD = f"""WITH {_SRC3_SQL},
src2 AS (SELECT doc_id, text FROM qsrc)"""

_STOP_SUBGATE_SQL = (
    f"CASE WHEN w.has_list AND w.n_tokens >= {STOP_MIN_TOKENS}"
    f" THEN (w.n_stop >= {STOP_MIN_HITS}) END"
)

_COMBINED_ORACLE = f"""
SELECT s.doc_id, s.script, s.n_word_chars, s.punct_milli, s.max_run,
       s.char_entropy_milli, w.n_tokens, w.has_list, w.n_stop,
       (s.char_entropy_milli >= {QG_MIN_ENTROPY_MILLI}) AS pass_entropy,
       (s.punct_milli <= {QG_MAX_PUNCT_MILLI}) AS pass_punct,
       (s.max_run <= {QG_MAX_RUN}) AS pass_run,
       (s.n_word_chars >= {QG_MIN_WORD_CHARS}) AS pass_len,
       {_STOP_SUBGATE_SQL} AS pass_stop,
       COALESCE(s.char_entropy_milli >= {QG_MIN_ENTROPY_MILLI}
                AND s.punct_milli <= {QG_MAX_PUNCT_MILLI}
                AND s.max_run <= {QG_MAX_RUN}
                AND s.n_word_chars >= {QG_MIN_WORD_CHARS}
                AND COALESCE({_STOP_SUBGATE_SQL}, TRUE),
                FALSE) AS keep
FROM ({_quality_script_oracle(_SRC3_SQL)}) s
JOIN ({_stopword_oracle_sql(_SRC3_STOP_HEAD)}) w USING (doc_id)
"""


@query("pipeline_quality_gate_combined", oracle=_COMBINED_ORACLE)
def pipeline_quality_gate_combined(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The COMBINED multilingual gate — entropy/punct/run/length
    signals PLUS the stopword sub-gate where it applies: a doc whose
    script has a stopword list and >= STOP_MIN_TOKENS tokens must
    show >= STOP_MIN_HITS list hits (Gopher's prose rule — keyword
    stuffing, tag soup, and title-case link farms score HIGH on
    entropy yet carry no function words); scripts with no list (CJK)
    or short docs get pass_stop = NULL and the sub-gate is NOT
    APPLICABLE (COALESCE TRUE) — the signal gates carry them, the
    honest division of labor `text_stopword_ratio_table` documents.

    One implementation everywhere: both legs are the shared builders
    (`_quality_signal_frame(src=...)`, `_stopword_frame`) over ONE
    widened source, and the oracle composes the SAME two oracle
    builders parameterized by the source CTE — zero second copies of
    census/tokenize/entropy/join logic on either engine.

    Scale: signal plan (2 scans) + stopword plan (1 scan — the r10
    single-pass rewrite in `_stopword_frame`) joined on doc_id
    (doc-keyed integers; the stopword list broadcast); no new
    shuffle class, no corpus sort.

    Planted evidence (GATES class removal): -45 drops ONLY via
    pass_stop (all four signal sub-gates true); -46 (CJK) keeps with
    pass_stop NULL; -40 (9 tokens) is exempt below STOP_MIN_TOKENS."""
    src = (
        _with_qplanted(spark, sf_dir)
        .unionAll(
            spark.createDataFrame(PLANTED_STOP, "doc_id BIGINT, text STRING")
        )
        .unionAll(
            spark.createDataFrame(
                PLANTED_COMBINED, "doc_id BIGINT, text STRING"
            )
        )
    )
    sig = _quality_signal_frame(spark, sf_dir, src=src)
    sw = _stopword_frame(spark, src).select(
        "doc_id", "n_tokens", "has_list", "n_stop"
    )
    j = sig.join(sw, "doc_id")
    ps = F.when(
        F.col("has_list") & (F.col("n_tokens") >= STOP_MIN_TOKENS),
        F.col("n_stop") >= STOP_MIN_HITS,
    )
    pe = F.col("char_entropy_milli") >= F.lit(QG_MIN_ENTROPY_MILLI)
    pp = F.col("punct_milli") <= F.lit(QG_MAX_PUNCT_MILLI)
    pr = F.col("max_run") <= F.lit(QG_MAX_RUN)
    pl = F.col("n_word_chars") >= F.lit(QG_MIN_WORD_CHARS)
    return j.select(
        "doc_id", "script", "n_word_chars", "punct_milli", "max_run",
        "char_entropy_milli", "n_tokens", "has_list", "n_stop",
        pe.alias("pass_entropy"),
        pp.alias("pass_punct"),
        pr.alias("pass_run"),
        pl.alias("pass_len"),
        ps.alias("pass_stop"),
        F.coalesce(
            pe & pp & pr & pl & F.coalesce(ps, F.lit(True)), F.lit(False)
        ).alias("keep"),
    )
