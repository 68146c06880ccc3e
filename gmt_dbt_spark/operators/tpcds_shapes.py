"""TPC-DS signature query shapes over the TPC-H-ish testdata.

[ext] — the decision-support shapes TPC-DS adds beyond TPC-H
(multi-channel UNION reports, multi-period INTERSECT cohorts,
share-of-total window ranking) — the patterns a BigQuery-hosted dbt
mart like the reference's (`dbt_project.yml:11`, arbitrary model SQL)
grows into. The public TPC-DS spec defines the shapes; the testdata
lacks DS tables, so each query maps the shape onto the driver's
orders/lineitem/customer tables — same plan skeletons, same scale
hazards.

Scale notes per shape:
- channel rollup (Q5/Q77 family): a UNION ALL of per-channel fact
  projections feeding ONE ROLLUP aggregate — Catalyst plans a single
  Expand over the unioned scan, so the report costs one shuffle
  regardless of channel count (vs one job per channel + driver-side
  stitching).
- multi-period INTERSECT (Q38/Q87): INTERSECT compiles to semi-join
  chains on the grouped keys; each branch's year filter is pushed to
  the parquet scan, so the work is proportional to the filtered
  years, not the table.
- share-of-total ranking (Q67 family): two-level aggregate → window;
  the per-key aggregate shuffles once on the key, the share/rank
  window shuffles once on the (low-cardinality) group — both
  partial-aggregated map-side. Share division happens on
  exact-decimal sums cast to double (one IEEE op, hash-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.exprs import DEC, dec2dbl, dsum
from gmt_dbt_spark.registry import query


@query(
    "tpcds_channel_rollup",
    oracle="""
WITH u AS (
  SELECT 'store' AS channel, strftime(o_orderdate, '%Y') AS yr,
         o_totalprice AS amt
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
  UNION ALL
  SELECT 'web' AS channel, strftime(l_shipdate, '%Y') AS yr,
         l_extendedprice AS amt
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1997-01-01'
)
SELECT channel, yr,
       COUNT(*) AS n_sales,
       CAST(CAST(SUM(CAST(amt AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)
         AS total_amt
FROM u
GROUP BY ROLLUP (channel, yr)
""",
)
def tpcds_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q5/Q77 shape: per-channel sales unioned into one ROLLUP
    report (channel, year, channel-total, grand-total in one pass).
    The union feeds a single Expand+aggregate — one shuffle for the
    whole report; each channel's date filter is pushed to its own
    parquet scan."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    u = o.select(
        F.lit("store").alias("channel"),
        F.date_format("o_orderdate", "yyyy").alias("yr"),
        F.col("o_totalprice").alias("amt"),
    ).unionByName(
        li.select(
            F.lit("web").alias("channel"),
            F.date_format("l_shipdate", "yyyy").alias("yr"),
            F.col("l_extendedprice").alias("amt"),
        )
    )
    return u.rollup("channel", "yr").agg(
        F.count(F.lit(1)).alias("n_sales"),
        dec2dbl(F.sum(F.col("amt").cast(DEC))).alias("total_amt"),
    )


@query(
    "tpcds_multi_intersect",
    oracle="""
WITH loyal AS (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT c_mktsegment, COUNT(*) AS n_loyal
FROM loyal JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
)
def tpcds_multi_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q38/Q87 shape: the multi-period cohort — customers
    active in ALL of 1995, 1996, and 1997 via chained INTERSECT,
    rolled up by market segment. INTERSECT compiles to semi-join
    chains over the distinct key sets; each branch's year predicate
    is pushed into the scan, so cost tracks the selected years."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH loyal AS (
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          INTERSECT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          INTERSECT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        )
        SELECT c_mktsegment, COUNT(*) AS n_loyal
        FROM loyal JOIN customer ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        """
    )


@query(
    "tpcds_share_rank",
    oracle="""
WITH pc AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS sdec
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c_nationkey, c_custkey, sdec
  FROM pc JOIN customer ON c_custkey = o_custkey
),
w AS (
  SELECT c_nationkey, c_custkey,
         CAST(CAST(sdec AS VARCHAR) AS DOUBLE) AS sales,
         -- zero-total nation guard (r3): share of nothing is
         -- UNDEFINED -> NULL (Spark 4 ANSI raises on double /0)
         CASE WHEN CAST(CAST(SUM(sdec) OVER (PARTITION BY c_nationkey)
                            AS VARCHAR) AS DOUBLE) = 0 THEN NULL
              ELSE CAST(CAST(sdec AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(SUM(sdec) OVER (PARTITION BY c_nationkey)
                               AS VARCHAR) AS DOUBLE) END AS nation_share,
         RANK() OVER (PARTITION BY c_nationkey
                      ORDER BY sdec DESC, c_custkey) AS sales_rank
  FROM j
)
SELECT * FROM w WHERE sales_rank <= 10
""",
)
def tpcds_share_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 family: per-customer sales rolled up, then
    share-of-total and rank WITHIN the customer's nation, keeping
    each nation's top 10. Two shuffles total (custkey aggregate,
    nation window) both map-side partial-aggregated; the share is a
    division of two exact-decimal-sum doubles (deterministic), and
    rank ties break on the key so the top-10 cut is reproducible."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("sdec")
    )
    j = pc.join(c, pc["o_custkey"] == c["c_custkey"]).select(
        "c_nationkey", "c_custkey", "sdec"
    )
    wpart = Window.partitionBy("c_nationkey")
    worder = Window.partitionBy("c_nationkey").orderBy(
        F.desc("sdec"), F.asc("c_custkey")
    )
    w = j.select(
        "c_nationkey",
        "c_custkey",
        dec2dbl(F.col("sdec")).alias("sales"),
        # zero-total nation guard — see the oracle comment
        F.when(
            dec2dbl(F.sum("sdec").over(wpart)) != 0.0,
            dec2dbl(F.col("sdec")) / dec2dbl(F.sum("sdec").over(wpart)),
        ).alias("nation_share"),
        F.rank().over(worder).alias("sales_rank"),
    )
    return w.filter(F.col("sales_rank") <= 10)


@query(
    "tpcds_count_band",
    oracle="""
WITH freq AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
  HAVING COUNT(*) BETWEEN 12 AND 16
)
SELECT c_custkey, c_mktsegment, n_orders
FROM freq JOIN customer ON c_custkey = o_custkey
""",
)
def tpcds_count_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape: the count-BAND cohort — keys whose
    group count falls in a range (HAVING BETWEEN), joined back to the
    dimension for attributes. The aggregate prunes to the narrow band
    BEFORE the dim join, so the join probe side is the band, not the
    fact table; the dim side broadcasts."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    freq = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders").between(12, 16))
    )
    return freq.join(c, freq["o_custkey"] == c["c_custkey"]).select(
        "c_custkey", "c_mktsegment", "n_orders"
    )


@query(
    "tpcds_cumulative_compare",
    oracle="""
WITH store AS (
  -- undated rows are excluded on BOTH engines (r3): a NULL month
  -- cannot sit on the cumulative timeline, and its null-spine rows
  -- would order NULLS FIRST on Spark vs NULLS LAST on DuckDB,
  -- shifting every running total
  SELECT strftime(o_orderdate, '%Y-%m') AS mth,
         COUNT(*) AS n
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY strftime(o_orderdate, '%Y-%m')
),
web AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS mth,
         COUNT(*) AS n
  FROM lineitem WHERE l_shipdate IS NOT NULL
  GROUP BY strftime(l_shipdate, '%Y-%m')
),
j AS (
  SELECT COALESCE(s.mth, w.mth) AS mth,
         COALESCE(s.n, 0) AS store_n,
         COALESCE(w.n, 0) AS web_n
  FROM store s FULL OUTER JOIN web w ON s.mth = w.mth
)
SELECT mth,
       CAST(SUM(store_n) OVER (ORDER BY mth) AS BIGINT) AS store_cum,
       CAST(SUM(web_n) OVER (ORDER BY mth) AS BIGINT) AS web_cum,
       (SUM(store_n) OVER (ORDER BY mth)
        > SUM(web_n) OVER (ORDER BY mth)) AS store_ahead
FROM j
""",
)
def tpcds_cumulative_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape: two channels' monthly counts FULL OUTER
    joined on the month spine, then compared by CUMULATIVE totals —
    'when did web overtake store'. The channel aggregates reduce to
    |months| rows before the join and window, so the full-outer join
    and running sums cost nothing at any fact scale; the single
    unpartitioned window is bounded by the calendar, not the data."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # undated rows excluded — see the oracle comment
    store = (
        o.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("mth"))
        .agg(F.count(F.lit(1)).alias("store_n"))
    )
    web = (
        li.filter(F.col("l_shipdate").isNotNull())
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("mth"))
        .agg(F.count(F.lit(1)).alias("web_n"))
    )
    j = (
        store.join(web, "mth", "full_outer")
        .select(
            "mth",
            F.coalesce("store_n", F.lit(0)).alias("store_n"),
            F.coalesce("web_n", F.lit(0)).alias("web_n"),
        )
    )
    w = Window.orderBy("mth").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "mth",
        F.sum("store_n").over(w).cast("bigint").alias("store_cum"),
        F.sum("web_n").over(w).cast("bigint").alias("web_cum"),
        (F.sum("store_n").over(w) > F.sum("web_n").over(w)).alias("store_ahead"),
    )


@query(
    "tpcds_frequent_buyers",
    oracle="""
WITH freq_parts AS (
  SELECT l_partkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY l_partkey
  HAVING COUNT(*) >= 8
),
spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS s
  FROM orders GROUP BY o_custkey
),
best_cust AS (
  SELECT o_custkey FROM spend
  WHERE s > (SELECT MAX(s) * 0.5 FROM spend)
)
SELECT year(o_orderdate) AS yr,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE year(o_orderdate) = 1997
  AND l_partkey IN (SELECT l_partkey FROM freq_parts)
  AND o_custkey IN (SELECT o_custkey FROM best_cust)
GROUP BY year(o_orderdate)
""",
)
def tpcds_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23 shape: 1997 sales restricted to FREQUENT items
    (parts appearing ≥8 times across 1995–96) bought by BEST
    customers (lifetime spend above half the max customer's). Both
    cohorts are aggregates-turned-semi-joins; the per-customer
    `spend` aggregate is materialized ONCE (localCheckpoint — the
    dedup_fuzzy signature pattern) and read by both its consumers:
    the half-of-max threshold row and the best-customer filter.
    Verified the alternatives both re-scan orders: the SQL
    scalar-subquery spelling plans an independent aggregate, and a
    shared DataFrame does NOT hit ReuseExchange (the self-reference
    gets fresh expression ids and never canonicalizes equal). The
    checkpoint holds |customers| rows of (key, decimal) — the
    aggregate's output, not the fact table.

    Scale shape: each cohort reduces to a narrow key set BEFORE
    touching the 1997 fact slice — the fact scan is filtered by year
    at the parquet level, then semi-joined against two key lists that
    broadcast when small and shuffle when not (AQE's call). The
    half-of-max threshold compares exact decimals (no float drift).
    Ref: dbt-mart cohort models (dbt_project.yml:11) grow into
    exactly this multi-CTE cohort-intersection shape."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    freq_parts = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 8)
        .select("l_partkey")
    )
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("s"))
        .localCheckpoint(eager=True)
    )
    # SQL-literal 0.5 is DECIMAL(1,1) — the multiply stays exact
    # decimal, matching the oracle's MAX(s) * 0.5 bit-for-bit
    thr = spend.agg(F.expr("max(s) * 0.5").alias("thr"))
    best_cust = (
        spend.crossJoin(F.broadcast(thr))
        .filter(F.col("s") > F.col("thr"))
        .select("o_custkey")
    )
    fact = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.year("o_orderdate") == 1997)
        .join(freq_parts, "l_partkey", "left_semi")
        .join(best_cust, "o_custkey", "left_semi")
    )
    return fact.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_extendedprice").alias("revenue"),
    )


@query(
    "tpcds_time_band_matrix",
    oracle="""
SELECT
  COUNT(CASE WHEN h BETWEEN 8  AND 9  THEN 1 END) AS h8_10,
  COUNT(CASE WHEN h BETWEEN 10 AND 11 THEN 1 END) AS h10_12,
  COUNT(CASE WHEN h BETWEEN 12 AND 13 THEN 1 END) AS h12_14,
  COUNT(CASE WHEN h BETWEEN 14 AND 15 THEN 1 END) AS h14_16,
  COUNT(CASE WHEN h BETWEEN 16 AND 17 THEN 1 END) AS h16_18,
  COUNT(CASE WHEN h BETWEEN 18 AND 19 THEN 1 END) AS h18_20,
  COUNT(CASE WHEN h BETWEEN 20 AND 21 THEN 1 END) AS h20_22,
  COUNT(CASE WHEN h BETWEEN 22 AND 23 THEN 1 END) AS h22_24
FROM (SELECT hour(ts) AS h FROM events WHERE event_type = 'click')
""",
)
def tpcds_time_band_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape — and its rewrite lesson: the spec text is
    EIGHT scalar subqueries (one per time band) cross-joined into a
    single row, which a naive engine executes as eight scans of the
    fact table. The right plan is ONE scan with conditional
    aggregation (COUNT(CASE WHEN band)), which is what both this
    query and Catalyst's plan for it produce: one pushed-filter scan,
    one partial+final aggregate, zero joins — plan-guarded in
    tests/test_plans.py. At 100 TB that's an 8× scan reduction
    before any other optimization."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    h = F.hour("ts")
    bands = [(8, 9), (10, 11), (12, 13), (14, 15), (16, 17), (18, 19),
             (20, 21), (22, 23)]
    return ev.select(h.alias("h")).agg(
        *[
            F.count(F.when(F.col("h").between(lo, hi), 1)).alias(
                f"h{lo}_{hi + 1}"
            )
            for lo, hi in bands
        ]
    )


@query(
    "tpcds_rollup_topk",
    oracle="""
WITH cell AS (
  SELECT c_mktsegment, o_orderpriority,
         GROUPING(c_mktsegment) * 2 + GROUPING(o_orderpriority) AS gid,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS VARCHAR)
              AS DOUBLE) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY gid, c_mktsegment
           ORDER BY rev DESC, COALESCE(o_orderpriority, '')) AS rk
  FROM cell
)
SELECT c_mktsegment, o_orderpriority, gid, rev, rk
FROM ranked WHERE rk <= 3
""",
)
def tpcds_rollup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape: revenue rolled up over the
    (segment, priority) hierarchy, then top-3 rows per rollup group —
    the 'best sellers at every level of the hierarchy' report.

    Scale shape: ROLLUP expands each input row to its grouping sets
    inside ONE Expand+aggregate pass (no per-level re-scan); the
    row_number + rk<=3 filter optimizes to WindowGroupLimit
    (plan-guarded), so each partition keeps a running top-3 instead
    of fully sorting — the window input is the rolled-up cell matrix,
    dim-sized. Partitioning includes grouping_id so subtotal rows
    (NULL segment) rank in their own group, and the tiebreak
    coalesces the NULL priority of subtotal rows for a total
    deterministic order."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cell = (
        o.join(c, o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            (F.grouping("c_mktsegment") * 2 + F.grouping("o_orderpriority")).alias(
                "gid"
            ),
            dsum("o_totalprice").alias("rev"),
        )
    )
    w = Window.partitionBy("gid", "c_mktsegment").orderBy(
        F.desc("rev"), F.coalesce("o_orderpriority", F.lit(""))
    )
    return (
        cell.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "o_orderpriority", "gid", "rev", "rk")
    )
