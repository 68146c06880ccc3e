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
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


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
    _LOADED = True
