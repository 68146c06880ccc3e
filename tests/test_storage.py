"""Storage-efficiency evidence: compression codec choice and
in-memory rollup reuse — the knobs SCALE.md §9 prescribes for the
100 TB footprint, pinned so they keep working."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table

from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _dir_bytes(d: str) -> int:
    return sum(os.path.getsize(f) for f in glob.glob(os.path.join(d, "*.parquet")))


def test_zstd_beats_snappy_footprint(spark, tmp_path):
    """zstd parquet must be materially smaller than snappy on the
    same data (at 100 TB the delta is tens of TB of storage + the
    proportional scan I/O). Round-trip equality included — codec is
    invisible to readers."""
    li = table(spark, SF_DIR, "lineitem")
    snappy, zstd = str(tmp_path / "sn"), str(tmp_path / "zs")
    li.coalesce(1).write.option("compression", "snappy").parquet(snappy)
    li.coalesce(1).write.option("compression", "zstd").parquet(zstd)
    b_sn, b_zs = _dir_bytes(snappy), _dir_bytes(zstd)
    assert b_zs < b_sn * 0.9, (b_zs, b_sn)
    assert spark.read.parquet(zstd).count() == li.count()


def test_cached_rollup_reuses_inmemory_scan(spark):
    """A cached rollup must serve subsequent queries from
    InMemoryTableScan (columnar cache) instead of recomputing the
    aggregation — the materialized-view-style reuse pattern for hot
    dashboards over cold data."""
    rollup = (
        table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    try:
        rollup.count()  # materialize
        again = rollup.filter(F.col("n") > 0)
        plan = plan_of(again)
        assert "InMemoryTableScan" in plan
        assert "HashAggregate" not in plan.split("InMemoryTableScan")[0]
    finally:
        rollup.unpersist()
