"""Statistics & observability operators.

Three capabilities a 100 TB deployment leans on that the reference
delegates wholesale to BigQuery (which auto-collects table stats and
exposes job statistics on every query — the reference reads none of
them, but any BigQuery-hosted model benefits silently):

- ``maint_analyze_stats``: ANALYZE TABLE → catalog statistics. On a
  real cluster these feed Catalyst's cost-based optimizer (join
  reordering, broadcast decisions beyond the 10 MB default guess);
  here we prove collection + readback round-trips exactly.
- ``obs_metrics``: `Observation` metrics piggybacked on a pass —
  audit counts/sums computed DURING another action's scan, zero
  extra jobs. The 100 TB way to answer "how many rows did this
  pipeline actually process" without re-scanning.
- ``agg_count_min``: count-min sketch built relationally (hash →
  cell → groupBy count). Spark's `count_min_sketch` SQL aggregate
  returns an opaque binary with no SQL-side estimate function, so we
  build the d×w cell table with built-in `xxhash64` instead: the
  sketch is itself a tiny DataFrame, mergeable by cell-wise `SUM`
  across corpus shards (the property that matters at scale), and the
  estimate is a join + `MIN`. All JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query


@query(
    "maint_analyze_stats",
    oracle="""
SELECT 'orders' AS table_name, COUNT(*) AS n_rows FROM orders
UNION ALL
SELECT 'lineitem', COUNT(*) FROM lineitem
""",
)
def maint_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE COMPUTE STATISTICS on EXTERNAL tables registered
    over the existing parquet paths, then read the row counts back
    FROM THE CATALOG (not by re-counting): the returned numbers are
    what the cost-based optimizer would plan with. Mirrors the
    auto-stats BigQuery keeps for every table the reference loads
    (`main.py:314-349` registers external tables; BQ backfills stats
    transparently).

    r1 ran this on MANAGED COPIES — a full data rewrite per ANALYZE
    (~7 s at sf0.1, a non-starter at 100 TB). External registration is
    metadata-only DDL; ANALYZE itself is one counting scan and DROP
    TABLE on an external table never touches the data files."""
    import re as _re

    rows = []
    for name in ("orders", "lineitem"):
        tbl = f"stats_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(
            f"CREATE TABLE {tbl} USING parquet LOCATION '{sf_dir}/{name}.parquet'"
        )
        try:
            spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
            detail = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
            stat_line = next(
                r.data_type for r in detail if r.col_name == "Statistics"
            )
            m = _re.search(r"(\d+) rows", stat_line)
            assert m, f"no rowCount in catalog stats: {stat_line}"
            rows.append((name, int(m.group(1))))
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return spark.createDataFrame(rows, "table_name string, n_rows bigint")


@query(
    "obs_metrics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
WHERE l_returnflag = 'R'
""",
)
def obs_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Observation` metrics collected during a single pass: the
    action is a plain count(), and the audit aggregates ride the same
    scan — no second job, no cache. Metric choice is hash-safe:
    COUNT is integer, SUM(l_quantity) sums integer-valued doubles
    (exact in any order), MIN/MAX are order-independent."""
    from pyspark.sql import Observation

    obs = Observation("lineitem_audit")
    df = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )
    df.count()  # one full pass; metrics materialize as a side effect
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["min_price"], m["max_price"])],
        "n_rows bigint, sum_qty double, min_price double, max_price double",
    )


# CMS geometry: 4 independent hash rows x 512 cells. Seeds are
# arbitrary fixed odd constants; xxhash64(col, seed) gives 4
# independent 64-bit hashes entirely inside codegen.
_CMS_DEPTH_SEEDS = (17, 31, 47, 61)
_CMS_WIDTH = 512


def build_cms(df: DataFrame, key: str) -> DataFrame:
    """Count-min sketch of `key` frequencies as a (depth, cell, cnt)
    DataFrame — at most depth×width rows regardless of input size.
    Shard-mergeable: union two sketches and SUM cnt by (depth, cell)."""
    per_depth = [
        df.select(
            F.lit(d).alias("depth"),
            F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(_CMS_WIDTH)).alias(
                "cell"
            ),
        )
        for d, seed in enumerate(_CMS_DEPTH_SEEDS)
    ]
    stacked = per_depth[0]
    for p in per_depth[1:]:
        stacked = stacked.unionByName(p)
    return stacked.groupBy("depth", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(spark: SparkSession, cms: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """Point-frequency estimates: each probe key hashes to one cell
    per depth row; the estimate is the MIN count over depths (CMS
    guarantees estimate >= true count; the min over independent rows
    bounds the overestimate). The probe side is tiny → broadcast."""
    probes = keys.select(
        F.col(key),
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(_CMS_WIDTH)).alias(
                f"cell_{d}"
            )
            for d, seed in enumerate(_CMS_DEPTH_SEEDS)
        ],
    )
    for d in range(len(_CMS_DEPTH_SEEDS)):
        row = cms.filter(F.col("depth") == d).select(
            F.col("cell").alias(f"cell_{d}"), F.col("cnt").alias(f"cnt_{d}")
        )
        probes = probes.join(F.broadcast(row), f"cell_{d}", "left")
    est = F.least(*[F.coalesce(F.col(f"cnt_{d}"), F.lit(0)) for d in range(4)])
    return probes.select(F.col(key), est.alias("est_count"))


@query(
    "agg_count_min",
    oracle="""
WITH pk AS (
  SELECT o_custkey, COUNT(*) AS true_cnt FROM orders GROUP BY o_custkey
)
SELECT o_custkey, true_cnt,
       TRUE AS never_undercounts,
       TRUE AS overestimate_bounded
FROM pk
ORDER BY true_cnt DESC, o_custkey ASC
LIMIT 5
""",
)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over orders.o_custkey: build the d×w cell
    table in one grouped pass, then estimate the frequency of the 5
    busiest customers via a broadcast probe join. The sketch is
    ~2k rows whatever the input size — the bounded-memory, mergeable
    summary that replaces exact per-key counts at 100 TB.

    DuckDB has no xxhash64 twin, so the oracle hashes the CMS
    GUARANTEES instead of the cell values: per probe key the exact
    count plus two booleans computed in-query — estimate ≥ exact
    (CMS never undercounts) and estimate ≤ exact + 2·N/width (the
    collision overestimate bound with slack) — against the oracle's
    exact counts + TRUE. Also pinned in tests/test_stats.py."""
    orders = table(spark, sf_dir, "orders")
    cms = build_cms(orders, "o_custkey")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("o_custkey"))
        .limit(5)
    )
    est = cms_estimate(spark, cms, top.select("o_custkey"), "o_custkey")
    # bound rides the plan as a single-row aggregate (no driver action)
    tot = orders.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        top.join(est, "o_custkey")
        .crossJoin(tot)
        .select(
            "o_custkey",
            "true_cnt",
            (F.col("est_count") >= F.col("true_cnt")).alias("never_undercounts"),
            (
                F.col("est_count")
                <= F.col("true_cnt") + 2.0 * F.col("n_total") / F.lit(_CMS_WIDTH)
            ).alias("overestimate_bounded"),
        )
        .orderBy(F.desc("true_cnt"), F.asc("o_custkey"))
    )


@query(
    "fn_surrogate_key",
    oracle="""
WITH k AS (
  SELECT md5(concat_ws('|', CAST(o_custkey AS VARCHAR),
                            CAST(o_orderdate AS VARCHAR),
                            o_orderpriority)) AS sk
  FROM orders
)
SELECT sk, COUNT(*) AS n_rows
FROM k
GROUP BY sk
HAVING COUNT(*) > 1
""",
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-utils-style surrogate keys: md5 over '|'-joined business
    columns — STABLE across runs and engines (unlike
    monotonically_increasing_id, which depends on partition layout
    and is different every run — the classic broken-surrogate
    anti-pattern at 100 TB). The query returns the COLLISION AUDIT:
    key groups with >1 row (duplicate business keys that would
    corrupt a merge). All codegen; grain is checked in the same pass
    that would produce the keyed table."""
    o = table(spark, sf_dir, "orders")
    sk = F.md5(
        F.concat_ws(
            "|",
            F.col("o_custkey").cast("string"),
            F.col("o_orderdate").cast("string"),
            F.col("o_orderpriority"),
        )
    )
    return (
        o.select(sk.alias("sk"))
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


@query(
    "maint_file_report",
    oracle="""
SELECT 'lineitem.parquet' AS file_name, COUNT(*) AS n_rows
FROM lineitem
""",
)
def maint_file_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout observability: rows per parquet file via
    `input_file_name()` — the report that finds small-file problems
    and row-group imbalance before they become stragglers on a
    1000-executor scan. Metadata-only grouping rides the scan
    (no extra pass); file paths normalized to basenames so the
    report is location-independent. (The fixture table is one
    physical file at every SF, so the oracle is the basename +
    total count; multi-file layouts exercise the same expression
    through sink_partitioned's round-trip tests.)"""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file_name")
        )
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "maint_skew_report",
    oracle="""
WITH per_key AS (
  SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
)
SELECT COUNT(*) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS max_rows_per_key,
       CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_rows_per_key,
       CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_rows_per_key,
       CAST(SUM(CASE WHEN c >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS heavy_keys
FROM per_key
""",
)
def maint_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis: the per-key row-count distribution
    (max / p50 / p99 / heavy-key count) for a prospective shuffle key
    — the number an operator reads BEFORE deciding between a plain
    shuffle join, AQE skew splitting, or explicit salting
    (join_salted). Two aggregate passes, both map-side partial; the
    second input is |keys| rows, never the fact table."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_rows_per_key"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("p50_rows_per_key"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("p99_rows_per_key"),
        F.sum(F.when(F.col("c") >= 5, 1).otherwise(0))
        .cast("bigint")
        .alias("heavy_keys"),
    )
