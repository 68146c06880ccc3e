"""Window functions — SURVEY.md §2.E.

[surface] for hosting model SQL; also the building blocks for the
as-of join and dedup-keep-first operators. Every window ORDER BY
includes a unique tiebreaker key so results are deterministic (a
peer-ambiguous rank would not oracle-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.exprs import DEC, dec2dbl
from gmt_dbt_spark.registry import query


@query(
    "win_rank",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       ROW_NUMBER()  OVER w AS rn,
       RANK()        OVER w AS rnk,
       DENSE_RANK()  OVER w AS drnk,
       NTILE(4)      OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank / ntile over a
    partitioned, deterministically-ordered window."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderkey)  OVER w AS prev_order,
       LEAD(o_orderkey) OVER w AS next_order,
       date_diff('day',
                 LAG(o_orderdate) OVER w,
                 o_orderdate) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets: lag/lead + gap-in-days vs previous order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("days_since_prev"),
    )


@query(
    "win_frame_rows",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS running_spend,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS last3_spend
FROM orders
""",
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total + sliding 3-row total (exact
    decimal accumulation, deterministic order incl. tiebreaker)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast(DEC)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dec2dbl(F.sum(price).over(w.rowsBetween(Window.unboundedPreceding, 0))).alias(
            "running_spend"
        ),
        dec2dbl(F.sum(price).over(w.rowsBetween(-2, 0))).alias("last3_spend"),
    )


@query(
    "win_frame_range",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey
                  ORDER BY CAST(epoch(o_orderdate) AS BIGINT) NULLS FIRST
                  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS spend_30d
FROM orders
""",
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a 30-day trailing window keyed on epoch
    seconds — peers at the same instant are included on both engines
    by RANGE semantics, so no tiebreaker is needed."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.unix_timestamp("o_orderdate")
    ).rangeBetween(-2592000, 0)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dec2dbl(F.sum(F.col("o_totalprice").cast(DEC)).over(w)).alias("spend_30d"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a deterministic
    order; last_value uses the full-partition frame (the default
    running frame would just echo the current row)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "win_pct_dist",
    oracle="""
SELECT c_custkey, c_mktsegment,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal NULLS FIRST, c_custkey)
""",
)
def win_pct_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank family: percent_rank ((rank−1)/(n−1)) and
    cume_dist (peers≤current / n) — each a single exact integer
    division, so the doubles match the oracle bit-for-bit. The
    c_custkey tiebreak makes rank assignment total."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "win_named_window",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER wf
            AS VARCHAR) AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (SQL:2003): one window spec shared by
    several functions — both the readability idiom dbt models use
    and a single-shuffle guarantee (same partitioning/ordering →
    same Exchange+Sort, reused). Spark does NOT support SQL:2003
    per-use frame refinement (`OVER (w ROWS BETWEEN ...)` is a parse
    error — recorded in NOTES_r1.md), so the framed variant is a
    SECOND named spec `wf` sharing the same partition/order; the
    planner still reuses the single exchange."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS rn,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER wf
                    AS STRING) AS DOUBLE) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "win_range_interval",
    oracle="""
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST
                      RANGE BETWEEN INTERVAL '30 days' PRECEDING
                            AND CURRENT ROW) AS n_30d,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST
                       RANGE BETWEEN INTERVAL '30 days' PRECEDING
                             AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS sum_30d
FROM orders
""",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval RANGE frame: per-customer trailing-30-day
    order count and spend — the time-windowed running metric every
    activity dashboard needs. RANGE (value-based) over the event
    time means rows sharing a date enter the frame together —
    ROWS-frame off-by-one bugs can't happen. One shuffle on the
    partition key; frame evaluation is a per-partition sorted scan."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST
                              RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                                    AND CURRENT ROW) AS n_30d,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                         OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST
                               RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                                     AND CURRENT ROW) AS STRING) AS DOUBLE)
                 AS sum_30d
        FROM orders
        """
    )


@query(
    "win_ntile",
    oracle="""
SELECT c_custkey,
       ntile(10) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey) AS balance_decile
FROM customer
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL equi-height deciles — NTILE over an UNPARTITIONED
    window (`win_rank` pins the partitioned form). This is the shape
    analysts actually write for corpus-wide binning, and it is the
    single-giant-partition hazard pinned as a query: Spark plans
    Exchange SinglePartition + one sort on ONE task — correct, and
    fine to |rows that fit one executor|, but a straggler at 100 TB.
    The scale rewrite, documented here because the answer changes
    only at the bucket boundaries: percentile_approx the 9 cutpoints
    (mergeable sketch, map-side partial) and assign buckets with a
    scan-side CASE — same deciles to within sketch error, zero
    global sort. SQL-standard ntile (larger buckets first when
    n % tiles != 0) plus the c_custkey tiebreak make the assignment
    identical in both engines."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(10).over(w).alias("balance_decile"),
    )


@query(
    "win_running_distinct",
    oracle="""
WITH f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_types_so_far
FROM f
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which no engine
    supports directly — via the first-occurrence-flag trick: mark
    each (user, event_type)'s first row (row_number = 1), then a
    plain running SUM of the flags. Per user, 'how many distinct
    event types had this user produced as of each event' — the
    feature-store cumulative-cardinality column.

    Scale: two window passes (the naive alternative — collect_set
    over an unbounded frame — materializes a PER-ROW set whose size
    grows with history: O(rows × distinct) memory and a guaranteed
    executor OOM on power users). Both windows order by (ts,
    event_id) — total, so the running counts are reproducible; the
    flag sum is exact integers."""
    e = table(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w1) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return f.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w2).cast("bigint").alias("n_types_so_far"),
    )


@query(
    "win_median_sliding",
    oracle="""
SELECT user_id, event_id,
       CAST(CAST(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         AS DECIMAL(25,6)) AS VARCHAR) AS med10_s
FROM events
""",
)
def win_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding MEDIAN per user (last-10-event window) — the robust
    smoother a metrics pipeline uses where a rolling mean would chase
    outliers; any aggregate (here exact `percentile`) runs over a
    window frame. Compared as 6-dp decimal strings (the
    agg_percentile route) so interpolation last-ulp drift can't flip
    the hash.

    Scale: one user-keyed window shuffle; the ROWS-bounded frame
    keeps per-row state at 10 values. An UNBOUNDED median frame
    would buffer whole partitions — for cumulative medians use
    approx_percentile partials instead."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.expr("percentile(value, 0.5)")
        .over(w)
        .cast("decimal(25,6)")
        .cast("string")
        .alias("med10_s"),
    )


@query(
    "win_slope",
    oracle="""
WITH b AS (
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 - 1704067200 AS x,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
  FROM events WHERE event_type = 'view'
),
w AS (
  SELECT user_id, event_id,
         COUNT(*)  OVER win AS n,
         SUM(x)    OVER win AS sx,
         SUM(y)    OVER win AS sy,
         SUM(x*y)  OVER win AS sxy,
         SUM(x*x)  OVER win AS sxx
  FROM b
  WINDOW win AS (PARTITION BY user_id ORDER BY x, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_cps
FROM w WHERE n >= 3
""",
)
def win_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing linear trend per user: least-squares slope of the
    last 5 view values against event time — the feature-engineering
    window behind 'is this metric trending up for this user'. The
    closed form needs only running sums (Σx, Σy, Σxy, Σx², n), so it
    fits plain windowed SUMs over per-row products — no second pass,
    no UDAF, one user-keyed shuffle.

    Exactness: time is integer seconds since 2024-01-01 (bounded so
    x² sums stay far under 2⁶³), values are half-up-rounded integer
    cents, numerator/denominator are bigint cross-multiplications
    emitted alongside the deterministic double ratio (cents per
    second). Degenerate windows (n<3 or zero time variance) are
    filtered/NULLed exactly as the oracle does."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    b = ev.select(
        "user_id",
        "event_id",
        (F.expr("unix_micros(ts) div 1000000") - F.lit(1704067200)).alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("x", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    w = b.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return w.filter(F.col("n") >= 3).select(
        "user_id",
        "event_id",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "slope_cps"
        ),
    )
