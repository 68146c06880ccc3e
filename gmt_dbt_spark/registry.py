"""Query registry — the driver-facing inventory.

Each operator from SURVEY.md §2 registers:
  - a builder ``(spark, sf_dir) -> DataFrame`` under a stable ID, and
  - (when SQL-expressible) an equivalent DuckDB oracle SQL string.

`__spark_entry__.py` re-exports these as ``queries()`` / ``oracle_sql()``.

Hash-stability rules (the driver compares an order-insensitive value
hash, so values must match BIT-EXACTLY between Spark and DuckDB):
  - Sums of doubles are order-dependent in the last bits → aggregate
    in DECIMAL (exact, associative) and cast the result to double on
    BOTH sides: ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
  - Averages: exact decimal sum cast to double, divided by the exact
    count — double division is deterministic.
  - Avoid libm functions whose rounding is unspecified (log, exp);
    sqrt/abs/floor/ceil/round are exactly specified by IEEE-754.
  - Alias every computed column identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if qid in _QUERIES:
            raise ValueError(f"duplicate query id: {qid}")
        _QUERIES[qid] = fn
        if oracle is not None:
            _ORACLES[qid] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    order = _priority_order(_QUERIES)
    return {qid: _QUERIES[qid] for qid in order}


def all_oracles() -> dict[str, str]:
    _load_all()
    order = _priority_order(_QUERIES)
    return {qid: _ORACLES[qid] for qid in order if qid in _ORACLES}


# ---------------------------------------------------------------------------
# Driver-budget-aware ordering.
#
# The per-round correctness driver walks ``queries()`` in dict order and has
# a bounded budget (r1 covered exactly the first 50 of 229 registered IDs).
# To convert "claimed" operators into "proven" ones as fast as possible we
# return the dict ordered so that queries WITHOUT a green row in any prior
# CORRECTNESS_r*.json come first, and already-proven queries come last.
# Within the unproven set, SURVEY §2.A-K core IDs lead, then the LLM-pipeline
# extension family, then the §2.L addendum in registration order.
# ---------------------------------------------------------------------------

# §2.A-K core inventory plus this round's must-recheck IDs, in the order we
# want the driver to visit them.  IDs not present in the registry are ignored.
_CORE_FIRST = [
    # r4 array-typed-output class — raw array<int>/array<float> output
    # columns crash the driver's raw-frame pandas row-sort (unhashable
    # ndarray cells). Fixed in r5 by serializing to comma-joined
    # strings; the one sampled FAIL plus its latent twin recheck first.
    "fn_array_set",
    "multimodal_decode",
    # r3 HUGEINT oracle class — all 29 oracles whose output widened to
    # int128 under DuckDB (degrading to float64 through the driver's
    # pandas fetch). Fixed in r4 by CAST(... AS BIGINT); the 8 that the
    # r3 sample hit (all FAIL) plus the 21 latent ones recheck first.
    "multimodal_image_histogram",
    "multimodal_audio_resample",
    "pipeline_text_curation",
    "pipeline_train_test_split",
    "pipeline_dedup_cascade",
    "sample_temperature",
    "sample_mixture_unimax",
    "embed_pq",
    "embed_pq_adc",
    "win_slope",
    "scan_json_variant",
    "stream_rate_source",
    "dq_drift_tvd",
    "dq_anomaly_seasonal",
    "sql_case_pivot",
    "tpch_q12",
    "fn_variant",
    "udaf_grouped_arrow",
    "sink_posting_lists",
    "sink_compression_codecs",
    "mart_attribution",
    "mart_gini",
    "events_growth_accounting",
    "mart_ab_test",
    "events_sessionize",
    "events_anomaly_zscore",
    "agg_bool",
    "events_burst",
    "events_backtest_snaive",
    # r1 FAIL / no-comparison — fixed in r2, recheck first.
    "fn_math",
    "agg_approx_distinct",
    "agg_approx_percentile",
    # §2.K LLM-pipeline core (never driver-checked).
    "dedup_exact",
    "dedup_fuzzy",
    "sim_topk",
    "text_tokenize",
    "text_tf",
    "text_sentiment",
    "multimodal_cols",
    # §2.A scan/sink family.
    "scan_json_infer",
    "scan_json_multiline",
    "scan_csv_infer",
    "scan_explicit_schema",
    "sanitize_columns",
    "sink_overwrite",
    "sink_ctas",
    "sink_staging_temp",
    # §2.C upsert.
    "merge_upsert",
    # §2.H scalar-function families.
    "fn_cond",
    "fn_array",
    "fn_map",
    "fn_json",
    "fn_cast",
    # §2.I UDF ladder.
    "udf_scalar",
    "udaf_grouped",
    "udtf_explode",
    # §2.J streaming.
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    "stream_upsert_sink",
]

# Stub-codec variants superseded by the REAL multimodal_decode_wav/_bmp
# ops (r2 VERDICT item 3 — don't spend driver budget on stubs ahead of
# unproven real operators). Ordering: while UNPROVEN they rank tier 2.5
# — after every other unproven query, before proven re-checks (they did
# gain full sha256-replay oracles in r3, so they are worth a hash row
# once the real backlog drains); once PROVEN they rank tier 4 — dead
# last, after ordinary proven re-checks.
_TAIL = frozenset({
    # multimodal_decode left this set in r5: its array-output fix must
    # be driver-confirmed (it ranks at the head of _CORE_FIRST).
    "multimodal_resize",
    "multimodal_frame_sample",
})

# LLM-pipeline extension surface (graded as first-class): visit right after
# the core, before the §2.L addendum.
_EXT_PREFIXES = (
    "dedup_",
    "sim_",
    "text_",
    "multimodal_",
    "pipeline_",
    "embed_",
    "pack_",
    "sample_",
)


def _proven_ids(root: str | None = None) -> set[str]:
    """IDs with a green hash row (or, for rows-only queries, any recorded
    run) in any CORRECTNESS_r*.json at the repo root (overridable for
    tests)."""
    import glob
    import json
    import os

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proven: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for qid, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                proven.add(qid)
            elif (
                qid not in _ORACLES
                and row.get("spark_rows") is not None
                and row.get("err") in (None, "no_oracle")
            ):
                # Deliberately rows-only query: a clean recorded run IS
                # its strongest available signal. A row that carries an
                # execution error stays unproven and re-runs early.
                proven.add(qid)
    return proven


def _priority_order(queries: dict[str, QueryFn]) -> list[str]:
    proven = _proven_ids()

    def tier(qid: str) -> float:
        if qid in _TAIL:
            return 2.5 if qid not in proven else 4
        if qid in proven:
            return 3
        if qid in _CORE_FIRST:
            return 0
        if qid.startswith(_EXT_PREFIXES):
            return 1
        return 2

    core_rank = {qid: i for i, qid in enumerate(_CORE_FIRST)}
    reg_rank = {qid: i for i, qid in enumerate(queries)}

    def key(qid: str):
        t = tier(qid)
        return (t, core_rank.get(qid, 0) if t == 0 else reg_rank[qid])

    return sorted(queries, key=key)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    import gmt_dbt_spark.operators.relational  # noqa: F401
    import gmt_dbt_spark.operators.joins  # noqa: F401
    import gmt_dbt_spark.operators.aggregates  # noqa: F401
    import gmt_dbt_spark.operators.windows  # noqa: F401
    import gmt_dbt_spark.operators.setops  # noqa: F401
    import gmt_dbt_spark.functions.scalar  # noqa: F401
    import gmt_dbt_spark.functions.udfs  # noqa: F401
    import gmt_dbt_spark.sources.ingest_queries  # noqa: F401
    import gmt_dbt_spark.operators.upsert  # noqa: F401
    import gmt_dbt_spark.operators.dedup  # noqa: F401
    import gmt_dbt_spark.operators.similarity  # noqa: F401
    import gmt_dbt_spark.functions.text  # noqa: F401
    import gmt_dbt_spark.operators.multimodal  # noqa: F401
    import gmt_dbt_spark.streaming.windows  # noqa: F401
    import gmt_dbt_spark.streaming.stateful  # noqa: F401
    import gmt_dbt_spark.plans.queries  # noqa: F401
    import gmt_dbt_spark.operators.sql_surface  # noqa: F401
    import gmt_dbt_spark.operators.tpch_more  # noqa: F401
    import gmt_dbt_spark.operators.tpch_rest  # noqa: F401
    import gmt_dbt_spark.functions.modern  # noqa: F401
    import gmt_dbt_spark.operators.graph  # noqa: F401
    import gmt_dbt_spark.sources.zorder  # noqa: F401
    import gmt_dbt_spark.sources.files  # noqa: F401
    import gmt_dbt_spark.sources.pydatasource  # noqa: F401
    import gmt_dbt_spark.plans.snapshots  # noqa: F401
    import gmt_dbt_spark.operators.curation  # noqa: F401
    import gmt_dbt_spark.operators.stats  # noqa: F401
    import gmt_dbt_spark.sources.layout  # noqa: F401
    import gmt_dbt_spark.operators.funnel  # noqa: F401
    import gmt_dbt_spark.operators.sessions  # noqa: F401
    import gmt_dbt_spark.operators.agg_more  # noqa: F401
    import gmt_dbt_spark.functions.temporal  # noqa: F401
    import gmt_dbt_spark.operators.embeddings  # noqa: F401
    import gmt_dbt_spark.operators.tpcds_shapes  # noqa: F401
    import gmt_dbt_spark.operators.timeseries  # noqa: F401
    import gmt_dbt_spark.operators.ml_sql  # noqa: F401
    import gmt_dbt_spark.operators.spatial  # noqa: F401
    import gmt_dbt_spark.functions.tokenizer  # noqa: F401
    import gmt_dbt_spark.functions.wordpiece  # noqa: F401
    import gmt_dbt_spark.functions.redact  # noqa: F401
    import gmt_dbt_spark.functions.knlm  # noqa: F401
    import gmt_dbt_spark.functions.tokenizer_roundtrip  # noqa: F401
    import gmt_dbt_spark.functions.unicode_text  # noqa: F401
    import gmt_dbt_spark.functions.script_quality  # noqa: F401
    _LOADED = True
