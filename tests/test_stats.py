"""Statistics & observability operators (operators/stats.py).

Oracle tests cover maint_analyze_stats and obs_metrics via the
shared parametrized suite; here we pin the properties the oracle
can't express: CMS error bounds, sketch mergeability, and that the
catalog stats actually round-trip through ANALYZE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.operators.stats import (
    _CMS_DEPTH_SEEDS,
    _CMS_WIDTH,
    build_cms,
    cms_estimate,
)
from gmt_dbt_spark.registry import all_queries

from tests.conftest import SF_DIR


def test_cms_never_underestimates_and_bounds_error(spark):
    """CMS guarantee: estimate >= true count for EVERY key; and with
    depth 4 the min-over-rows estimate should stay within the classic
    e*N/w additive bound (loose check: 3x) for all probed keys."""
    orders = table(spark, SF_DIR, "orders")
    n_total = orders.count()
    cms = build_cms(orders, "o_custkey")
    truth = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = truth.orderBy(F.desc("true_cnt"), "o_custkey").limit(50)
    est = cms_estimate(spark, cms, probes.select("o_custkey"), "o_custkey")
    joined = est.join(truth, "o_custkey").collect()
    assert len(joined) == 50
    bound = 3.0 * 2.718 * n_total / _CMS_WIDTH
    for r in joined:
        assert r.est_count >= r.true_cnt, r
        assert r.est_count - r.true_cnt <= bound, r


def test_cms_shard_merge_equals_whole(spark):
    """The 100 TB property: sketching shards independently and
    summing cell counts must equal sketching the whole input —
    partial sketches from 1000 executors union into one."""
    orders = table(spark, SF_DIR, "orders")
    whole = build_cms(orders, "o_custkey")
    even = build_cms(orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey")
    odd = build_cms(orders.filter(F.col("o_orderkey") % 2 == 1), "o_custkey")
    merged = (
        even.unionByName(odd)
        .groupBy("depth", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_is_bounded_size(spark):
    """Sketch cardinality never exceeds depth x width, regardless of
    input rows — the whole point of the summary."""
    cms = build_cms(table(spark, SF_DIR, "orders"), "o_custkey")
    assert cms.count() <= len(_CMS_DEPTH_SEEDS) * _CMS_WIDTH


def test_analyze_stats_round_trip(spark):
    """The row counts reported by maint_analyze_stats come from the
    CATALOG (post-ANALYZE), and must equal a fresh exact count."""
    out = {
        r.table_name: r.n_rows
        for r in all_queries()["maint_analyze_stats"](spark, SF_DIR).collect()
    }
    assert out["orders"] == table(spark, SF_DIR, "orders").count()
    assert out["lineitem"] == table(spark, SF_DIR, "lineitem").count()


def test_observation_metrics_single_job(spark):
    """obs_metrics must not rescan: the observe aggregates ride the
    counting pass. We assert the metric values equal an independent
    aggregate — and that the query result is exactly one row."""
    df = all_queries()["obs_metrics"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 1
    li = table(spark, SF_DIR, "lineitem").filter(F.col("l_returnflag") == "R")
    check = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("s"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    r = rows[0]
    assert (r.n_rows, r.sum_qty, r.min_price, r.max_price) == (
        check.n, check.s, check.lo, check.hi,
    )


def test_approx_topk_exact_below_capacity(spark):
    """With |event_type| far below the sketch capacity, approx_top_k
    must return the EXACT top-5 counts (no eviction has happened) —
    the small-data anchor that the sketch plumbing is sound."""
    from gmt_dbt_spark.registry import all_queries

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r["approx_count"]
        for r in all_queries()["agg_approx_topk"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(5)
        .collect()
    }
    assert got == exact


def test_volume_drift_inclusive_boundaries(spark, tmp_path):
    """An EXACT halving or doubling must alert (inclusive contract) —
    the fixture series never lands exactly on the boundary, so pin it
    with a synthetic day series: 4 -> 2 (halved), 2 -> 4 (doubled),
    4 -> 3 (fine)."""
    import os

    from pyspark.sql import functions as F

    from gmt_dbt_spark.plans.dq import dq_volume_drift

    rows = []
    eid = 0
    for day, n in (("2020-01-01", 4), ("2020-01-02", 2), ("2020-01-03", 4),
                   ("2020-01-04", 3)):
        for _ in range(n):
            rows.append((eid, f"{day} 12:00:00", eid % 3, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(tmp_path, "events.parquet"))
    out = {str(r.day): r.drift_alert for r in dq_volume_drift(spark, str(tmp_path)).collect()}
    assert out["2020-01-01"] is False   # no previous day
    assert out["2020-01-02"] is True    # exact halving alerts
    assert out["2020-01-03"] is True    # exact doubling alerts
    assert out["2020-01-04"] is False   # 4 -> 3 is within band
