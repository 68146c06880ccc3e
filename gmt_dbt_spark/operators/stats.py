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


# ---------------------------------------------------------------------------
# KMV (bottom-k / theta-style) distinct sketches (r8). Beyer et al.
# 2007 "On Synopses for Distinct-Value Estimation Under Multiset
# Operations"; the K-Minimum-Values estimator behind DataSketches'
# theta sketch. The one capability this class adds over HLL
# (`agg_hll_sketch` / `agg_approx_distinct`): sketches INTERSECT —
# HLL unions losslessly but cannot estimate |A ∩ B|, while two KMV
# sketches yield an overlap estimate via the union sketch's Jaccard
# sample. Everything here is DETERMINISTIC (the hash is md5, shared
# by both engines), so unlike the xxhash64-based CMS the ENTIRE
# sketch — hashes, kth values, estimates — replays bit-for-bit in
# DuckDB: a full-value oracle, not a bounds oracle.
#
# Estimator (all-integer): hashes map keys to h uniform in
# [0, 2^60) (first 15 md5 hex digits). With k_used = min(K, d) kept
# minima and h_k their max, est = (K-1)·2^60 div h_k when the sketch
# is full, else exactly k_used (a non-full sketch SAW every value).
# Intersection: n_common = |union-sketch ∩ A-sketch ∩ B-sketch|,
# est_inter = n_common·est_union div k_used(union) — exact whenever
# the union sketch is not full.
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_HEX = 15  # 60-bit hash — bigint-safe, engine-neutral


def kmv_hash(col):
    """60-bit md5-derived hash as BIGINT (the epoch-shuffle idiom)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, _KMV_HEX), 16, 10
    ).cast("bigint")


_KMV_HASH_SQL = (
    "CAST('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15) AS BIGINT)"
)

_KMV_EST = (
    "CASE WHEN k_used < {K} THEN k_used "
    "ELSE CAST((CAST({K} - 1 AS HUGEINT) * (CAST(1 AS HUGEINT) << 60))"
    " // h_k AS BIGINT) END"
)


@query(
    "agg_kmv_distinct",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT o_orderpriority, o_custkey FROM orders
),
h AS (
  SELECT o_orderpriority,
         {_KMV_HASH_SQL.format(x='o_custkey')} AS h
  FROM d
),
r AS (
  SELECT o_orderpriority, h,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM h
),
sk AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(MAX(h) AS BIGINT) AS h_k
  FROM r WHERE rn <= {KMV_K}
  GROUP BY o_orderpriority
),
ex AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM d GROUP BY o_orderpriority
)
SELECT sk.o_orderpriority, sk.k_used, sk.h_k,
       CAST({_KMV_EST.format(K=KMV_K)} AS BIGINT) AS est_distinct,
       ex.exact_distinct
FROM sk JOIN ex USING (o_orderpriority)
""",
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct sketch per group: estimate distinct
    customers per order priority from the K=64 smallest 60-bit
    hashes, alongside the exact count so the surface itself shows
    estimate-vs-truth (the estimator's ~1/sqrt(K-2) ≈ 12.7% standard
    error is asserted as a 3-sigma planted bound in tests, not here —
    the registered surface stays a pure value replay).

    Scale shape: one distinct-projection shuffle, then the
    rank-then-filter compiles to WindowGroupLimit (map-side per-key
    bottom-k BEFORE the shuffle — K·|groups| rows move, the
    `sample_reservoir` shape); the sketch relation is K·|groups|
    rows total, mergeable by union + re-bottom-k (what
    `agg_kmv_intersect` does). The estimator is exact integer
    arithmetic (HUGEINT/DECIMAL(38) product-floor)."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    d = orders.select("o_orderpriority", "o_custkey").distinct()
    h = d.select(
        "o_orderpriority", kmv_hash(F.col("o_custkey")).alias("h")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.max("h").cast("bigint").alias("h_k"),
        )
    )
    ex = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_distinct")
    )
    est = F.when(F.col("k_used") < KMV_K, F.col("k_used")).otherwise(
        F.expr(
            f"CAST((CAST({KMV_K - 1} AS DECIMAL(38,0))"
            f" * CAST({1 << 60} AS DECIMAL(38,0))) div h_k AS BIGINT)"
        )
    )
    return sk.join(ex, "o_orderpriority").select(
        "o_orderpriority",
        "k_used",
        "h_k",
        est.cast("bigint").alias("est_distinct"),
        "exact_distinct",
    )


_KMV_PAIR = ("1-URGENT", "2-HIGH")


@query(
    "agg_kmv_intersect",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT o_orderpriority, o_custkey FROM orders
  WHERE o_orderpriority IN ('{_KMV_PAIR[0]}', '{_KMV_PAIR[1]}')
),
h AS (
  SELECT o_orderpriority,
         {_KMV_HASH_SQL.format(x='o_custkey')} AS h
  FROM d
),
r AS (
  SELECT o_orderpriority, h,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM h
),
sk AS (SELECT o_orderpriority, h FROM r WHERE rn <= {KMV_K}),
un AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM sk)
),
usk AS (SELECT h FROM un WHERE rn <= {KMV_K}),
ustat AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_used, CAST(MAX(h) AS BIGINT) AS h_k
  FROM usk
),
com AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common
  FROM usk
  WHERE h IN (SELECT h FROM sk WHERE o_orderpriority = '{_KMV_PAIR[0]}')
    AND h IN (SELECT h FROM sk WHERE o_orderpriority = '{_KMV_PAIR[1]}')
),
exi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
    SELECT o_custkey FROM d WHERE o_orderpriority = '{_KMV_PAIR[0]}'
    INTERSECT
    SELECT o_custkey FROM d WHERE o_orderpriority = '{_KMV_PAIR[1]}')
)
SELECT '{_KMV_PAIR[0]}' AS key_a, '{_KMV_PAIR[1]}' AS key_b,
       ustat.k_used, com.n_common,
       CAST({_KMV_EST.format(K=KMV_K)} AS BIGINT) AS est_union,
       CAST((CAST(com.n_common AS HUGEINT) *
             CAST({_KMV_EST.format(K=KMV_K)} AS HUGEINT))
            // ustat.k_used AS BIGINT) AS est_inter,
       exi.exact_inter
FROM ustat, com, exi
""",
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-INTERSECTION estimate — the theta-sketch capability HLL
    lacks: from the two priorities' K=64 KMV sketches alone, estimate
    |A ∩ B| distinct customers as n_common/k_used of the union
    sketch's distinct estimate (the union's bottom-k is a uniform
    sample of A ∪ B; membership in both input sketches marks the
    intersection — Beyer et al. 2007). Exact when the union sketch
    is not full. The exact intersection rides along so the surface
    shows estimate-vs-truth.

    Scale shape: each input sketch is K rows (map-side bottom-k as in
    `agg_kmv_distinct`); the union/merge, membership probes, and the
    estimator all operate on ≤2K-row frames (broadcast); the only
    corpus-sized work is the two distinct-projections and the exact
    audit's intersection — which a production consumer drops,
    keeping ONLY sketch-sized work after the scan."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    a, b = _KMV_PAIR
    d = (
        orders.filter(F.col("o_orderpriority").isin(a, b))
        .select("o_orderpriority", "o_custkey")
        .distinct()
    )
    h = d.select("o_orderpriority", kmv_hash(F.col("o_custkey")).alias("h"))
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("o_orderpriority", "h")
        .localCheckpoint(eager=True)  # 2K rows; read by union + both probes
    )
    usk = (
        sk.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
        .select("h")
    )
    ska = sk.filter(F.col("o_orderpriority") == a).select("h")
    skb = sk.filter(F.col("o_orderpriority") == b).select("h")
    com = (
        usk.join(F.broadcast(ska), "h", "left_semi")
        .join(F.broadcast(skb), "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    ustat = usk.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.max("h").cast("bigint").alias("h_k"),
    )
    exi = (
        d.filter(F.col("o_orderpriority") == a)
        .select("o_custkey")
        .join(
            d.filter(F.col("o_orderpriority") == b).select("o_custkey"),
            "o_custkey",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    est_union = F.when(F.col("k_used") < KMV_K, F.col("k_used")).otherwise(
        F.expr(
            f"CAST((CAST({KMV_K - 1} AS DECIMAL(38,0))"
            f" * CAST({1 << 60} AS DECIMAL(38,0))) div h_k AS BIGINT)"
        )
    )
    return (
        ustat.crossJoin(F.broadcast(com))
        .crossJoin(F.broadcast(exi))
        .withColumn("est_union", est_union.cast("bigint"))
        .select(
            F.lit(a).alias("key_a"),
            F.lit(b).alias("key_b"),
            "k_used",
            "n_common",
            "est_union",
            F.expr(
                "CAST((CAST(n_common AS DECIMAL(38,0)) * est_union)"
                " div k_used AS BIGINT)"
            ).alias("est_inter"),
            "exact_inter",
        )
    )
