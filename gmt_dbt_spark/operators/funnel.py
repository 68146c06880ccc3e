"""Event-sequence analytics: funnel + retention cohorts.

[surface]/[ext] — the standard product-analytics shapes any
BigQuery-hosted dbt project runs daily (the reference's models are
arbitrary SQL, `dbt_project.yml:11`; its events analogue is the Yelp
checkin/review time series). Both ops are ordered-sequence rollups
over the driver's `events` table.

Scale shape: each stage is a conditional MIN aggregate keyed by
user_id — partial-aggregable, one shuffle per stage on the same key
(co-partitioned, so AQE can reuse the exchange layout); no window
over the full event stream, no per-user collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.exprs import DEC, dec2dbl
from gmt_dbt_spark.registry import query


@query(
    "events_funnel",
    oracle="""
WITH v AS (SELECT user_id, MIN(ts) AS first_view
           FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_then_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view → click → purchase): each
    stage is the earliest qualifying event strictly AFTER the
    previous stage's — the order constraint is what distinguishes a
    funnel from three independent counts. Stages chain as
    conditional-MIN aggregates joined on user_id; per-stage state is
    one timestamp per user, never the event list.

    The three stage counts are cross-joined single-row aggregates in
    ONE plan (one Spark job): the shared stage subtrees produce
    identical shuffle exchanges that Catalyst's ReuseExchange rule
    dedupes, instead of the r1 shape — three driver `.count()`
    actions that re-scanned events ~6× (VERDICT r1 item 4)."""
    ev = table(spark, sf_dir, "events")

    def stage(prev: DataFrame, etype: str, prev_col: str, out_col: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = stage(v, "click", "first_view", "first_click")
    p = stage(c, "purchase", "first_click", "first_purchase")
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_then_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@query(
    "events_retention",
    oracle="""
WITH cohorts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
)
SELECT c.cohort_day,
       date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e
JOIN cohorts c ON e.user_id = c.user_id
GROUP BY c.cohort_day, date_diff('day', c.cohort_day, CAST(e.ts AS DATE))
""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen day,
    activity counted per (cohort, day-offset) cell. The cohort map is
    one row PER USER — unbounded cardinality at scale, so it must NOT
    be broadcast (r1 flagged `F.broadcast(cohorts)` here: at 100 TB
    user counts the broadcast OOMs the driver/executors). A plain
    shuffle join on user_id is co-partitioned with the groupBy that
    built the cohort map, so AQE reuses the layout; the output matrix
    is bounded by days², not events. day_offset as an integer keeps
    the grouping key engine-neutral."""
    ev = table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    return (
        ev.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "events_wau_sliding",
    oracle="""
WITH e AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS b1 FROM events),
     w AS (SELECT unnest([b1, b1 - INTERVAL '1 hour']) AS wstart, user_id FROM e)
SELECT wstart,
       wstart + INTERVAL '2 hours' AS wend,
       COUNT(DISTINCT user_id) AS active_users
FROM w
GROUP BY 1, 2
""",
)
def events_wau_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window ACTIVE USERS (2 h window, 1 h slide): the
    WAU/DAU-over-rolling-window metric. Distinct-per-window is the
    scale hazard — COUNT(DISTINCT) expands to a two-phase plan
    (dedup on (window, user) map-side, then count) so the shuffle
    carries each (window, user) pair once, never raw events; at
    100 TB swap the exact distinct for agg_bitmap_distinct partials
    keyed by window to make the per-window state storable and
    OR-mergeable (same pattern, documented trade)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "active_users",
        )
    )


@query(
    "events_window_funnel",
    oracle="""
WITH v AS (SELECT user_id, MIN(ts) AS first_view
           FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
        AND e.ts <= v.first_view + INTERVAL '24 hours'
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e
      JOIN c ON e.user_id = c.user_id
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        AND e.ts <= v.first_view + INTERVAL '24 hours'
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_then_click_24h,
       (SELECT COUNT(*) FROM p) AS n_full_funnel_24h
""",
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED funnel (the ClickHouse `windowFunnel` semantics):
    stages count only if they happen within 24 h of the user's FIRST
    VIEW — conversion analysis distinguishes 'eventually bought' from
    'bought within the attribution window'. Same scale shape as
    events_funnel (conditional-MIN chain keyed on user_id, one lazy
    plan, shared subtrees dedup through ReuseExchange); the window
    bound rides each stage's filter, anchored at the stage-1
    timestamp carried through the chain."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    deadline = F.col("first_view") + F.expr("INTERVAL 24 HOURS")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("first_view")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"), F.min(deadline).alias("deadline"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("first_click")) & (F.col("ts") <= F.col("deadline")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_then_click_24h")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel_24h")))
    )


@query(
    "mart_rfm",
    oracle="""
WITH base AS (
  SELECT o_custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   DATE '1998-12-01') AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS mdec
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(CAST(mdec AS VARCHAR) AS DOUBLE) AS monetary,
       CASE WHEN recency_days <= 180 THEN 3
            WHEN recency_days <= 540 THEN 2 ELSE 1 END AS r_score,
       CASE WHEN frequency >= 15 THEN 3
            WHEN frequency >= 8  THEN 2 ELSE 1 END AS f_score,
       CASE WHEN mdec >= 2000000 THEN 3
            WHEN mdec >= 1000000 THEN 2 ELSE 1 END AS m_score,
       CASE WHEN recency_days <= 180 THEN 3
            WHEN recency_days <= 540 THEN 2 ELSE 1 END * 100
       + CASE WHEN frequency >= 15 THEN 3
              WHEN frequency >= 8  THEN 2 ELSE 1 END * 10
       + CASE WHEN mdec >= 2000000 THEN 3
              WHEN mdec >= 1000000 THEN 2 ELSE 1 END AS rfm_code
FROM base
""",
)
def mart_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the canonical marketing mart a
    dbt project like the reference's hosts (dbt_project.yml:11):
    Recency (days since last order vs the dataset's 1998-12-01
    anchor), Frequency (order count), Monetary (exact-decimal spend),
    each banded 1–3 on FIXED thresholds and packed into a 3-digit
    rfm_code. Fixed-threshold bands (not ntile) are the
    production-stable choice: a customer's segment doesn't change
    because OTHER customers moved — and they make every output
    column integer-or-exact, so the mart hash-matches the oracle.

    Scale: one groupBy(o_custkey) aggregate — map-side partial,
    single shuffle of (key, date, count, decimal) — then scan-side
    CASE banding. Nothing downstream of the aggregate touches the
    fact table."""
    o = table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("mdec"),
    )
    r_score = (
        F.when(F.col("recency_days") <= 180, 3)
        .when(F.col("recency_days") <= 540, 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("frequency") >= 15, 3)
        .when(F.col("frequency") >= 8, 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("mdec") >= 2000000, 3)
        .when(F.col("mdec") >= 1000000, 2)
        .otherwise(1)
    )
    return base.select(
        "o_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        dec2dbl(F.col("mdec")).alias("monetary"),
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).alias("rfm_code"),
    )


@query(
    "mart_abc_analysis",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS rdec
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rdec) AS t FROM rev),
c AS (
  SELECT l_partkey, rdec,
         SUM(rdec) OVER (ORDER BY rdec DESC, l_partkey) AS cum
  FROM rev
)
SELECT l_partkey,
       CAST(CAST(rdec AS VARCHAR) AS DOUBLE) AS revenue,
       CASE WHEN cum * 100 <= t * 80 THEN 'A'
            WHEN cum * 100 <= t * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c, tot
""",
)
def mart_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis — the inventory-management classic:
    rank parts by revenue, classify by CUMULATIVE share (A = first
    80% of revenue, B = next 15%, C = tail). Class cuts are integer
    cross-multiplications on exact-decimal cumulative sums (cum·100
    ≤ total·80) — no share division anywhere, so the labels hash
    exactly; the revenue-desc order is totalized by the key.

    Scale: the cumulative window is GLOBAL by nature (one ordered
    pass over the ranked entities) — safe here because the input is
    the per-part AGGREGATE (|parts|, dimension-sized), never the
    fact table; for an unbounded entity set, bucket by revenue-range
    first (two-level cumulative) to keep any single sort partition
    bounded."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("rdec")
    )
    tot = rev.agg(F.sum("rdec").alias("t"))
    w = Window.orderBy(F.desc("rdec"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = rev.select("l_partkey", "rdec", F.sum("rdec").over(w).alias("cum"))
    return c.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        dec2dbl(F.col("rdec")).alias("revenue"),
        F.when(F.col("cum") * 100 <= F.col("t") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("t") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "events_dau_mau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
cover AS (
  SELECT DISTINCT ud.user_id,
         unnest(generate_series(ud.day, ud.day + INTERVAL '29 days',
                                INTERVAL '1 day')) AS cover_day
  FROM ud
),
mau AS (
  SELECT CAST(cover_day AS DATE) AS day, COUNT(DISTINCT user_id) AS mau
  FROM cover GROUP BY CAST(cover_day AS DATE)
)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau,
       (d.dau * 100) // m.mau AS stickiness_pct
FROM dau d JOIN mau m ON d.day = m.day
""",
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — the engagement KPI: for each active day,
    distinct daily users over distinct trailing-30-day users, as an
    exact integer percentage. The trailing-window COUNT(DISTINCT)
    (which no window frame supports) becomes an EQUI-join: each
    (user, day) activity expands into the ≤30 future days it covers
    (`sequence`, the join_range_binned trick with a fixed 30×
    blowup), then a plain distinct count per covered day — shuffles
    carry (user, day) pairs, bounded by |user-days|·30, never raw
    events. Integer division makes the ratio hash-exact."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, day + interval 29 days, interval 1 day)")
        ).alias("cover_day"),
    ).distinct()
    mau = cover.groupBy(F.col("cover_day").alias("day")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return dau.join(mau, "day").select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("mau").cast("bigint").alias("mau"),
        F.expr("(dau * 100) div mau").alias("stickiness_pct"),
    )


@query(
    "mart_attribution",
    oracle="""
WITH fp AS (
  SELECT user_id, MIN(ts) AS pts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
t AS (
  SELECT e.user_id, e.event_type AS channel, e.ts, e.event_id
  FROM events e JOIN fp ON e.user_id = fp.user_id AND e.ts < fp.pts
  WHERE e.event_type IN ('view', 'click', 'signup')
),
ranked AS (
  SELECT user_id, channel,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rrn
  FROM t
),
per_u AS (
  SELECT user_id, COUNT(*) AS n,
         MAX(CASE WHEN rn = 1 THEN channel END) AS first_ch,
         MAX(CASE WHEN rrn = 1 THEN channel END) AS last_ch
  FROM ranked GROUP BY user_id
),
per_uc AS (
  SELECT user_id, channel, COUNT(*) AS cnt FROM t GROUP BY user_id, channel
)
SELECT per_uc.channel,
       CAST(SUM(CASE WHEN per_uc.channel = per_u.first_ch THEN 1 ELSE 0 END)
         AS BIGINT) AS n_first,
       CAST(SUM(CASE WHEN per_uc.channel = per_u.last_ch THEN 1 ELSE 0 END)
         AS BIGINT) AS n_last,
       CAST(SUM(per_uc.cnt * (1000000 // per_u.n)) AS BIGINT) AS linear_micro
FROM per_uc JOIN per_u ON per_uc.user_id = per_u.user_id
GROUP BY per_uc.channel
""",
)
def mart_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: credit each touch channel
    (view/click/signup) for conversions (first purchase per user)
    under three models at once — first-touch, last-touch, linear.

    Scale shape: every stage keys on user_id — conversion times are
    a conditional MIN aggregate, the touch filter is a co-partitioned
    join, and first/last touch are MIN_BY/MAX_BY over an orderable
    (ts, event_id) struct INSIDE the per-user aggregate, so there is
    no ROW_NUMBER window over the raw event stream (the oracle uses
    one; windows sort whole partitions, min_by keeps a single running
    champion — partial-aggregable, skew-tolerant). Linear credit is
    exact integer micro-credits (1e6 div n), associative under SUM —
    no float credit drift between engines. Ties on ts break on
    event_id via the struct ordering, matching the oracle's ORDER BY
    ts, event_id."""
    ev = table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click", "signup"))
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("pts"))
        .select("user_id", F.col("event_type").alias("channel"), "ts", "event_id")
    )
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    per_u = touches.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("channel", order_key).alias("first_ch"),
        F.max_by("channel", order_key).alias("last_ch"),
    )
    per_uc = touches.groupBy("user_id", "channel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_uc.join(per_u, "user_id")
        .groupBy("channel")
        .agg(
            F.count_if(F.col("channel") == F.col("first_ch")).alias("n_first"),
            F.count_if(F.col("channel") == F.col("last_ch")).alias("n_last"),
            F.sum(F.col("cnt") * F.expr("1000000 div n")).alias("linear_micro"),
        )
    )


@query(
    "mart_ltv",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS m,
         o_totalprice
  FROM orders
),
first AS (SELECT o_custkey, MIN(m) AS cm FROM o GROUP BY o_custkey),
sizes AS (SELECT cm, COUNT(*) AS cohort_users FROM first GROUP BY cm),
cell AS (
  SELECT first.cm, o.m - first.cm AS offset_m,
         COUNT(*) AS n_orders,
         SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS rev_dec
  FROM o JOIN first ON o.o_custkey = first.o_custkey
  GROUP BY first.cm, o.m - first.cm
),
cum AS (
  SELECT cm, offset_m, n_orders, rev_dec,
         SUM(rev_dec) OVER (PARTITION BY cm ORDER BY offset_m
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_dec
  FROM cell
)
SELECT cum.cm AS cohort_m, offset_m,
       n_orders,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS rev,
       CAST(CAST(cum_dec AS VARCHAR) AS DOUBLE) AS cum_rev,
       sizes.cohort_users,
       CAST(CAST(cum_dec AS VARCHAR) AS DOUBLE) / sizes.cohort_users
         AS ltv_per_user
FROM cum JOIN sizes ON cum.cm = sizes.cm
""",
)
def mart_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by first-order
    month, revenue accumulated by month offset since cohort — the
    triangle every growth team reads. Month index is pure integer
    arithmetic (year*12+month) so cohort and offset hash exactly.

    Scale shape: cohort assignment is a MIN aggregate + co-partitioned
    join on o_custkey (same key, exchange reuse); the cumulative sum
    window runs over the AGGREGATED (cohort x offset) matrix — at most
    months² cells regardless of fact size — never over raw orders.
    Revenue goes through the DECIMAL + VARCHAR-cast route (exprs.py)
    for bit-exact cross-engine sums; LTV-per-user is a deterministic
    double division by the exact cohort size."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        "o_totalprice",
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cm"))
    sizes = first.groupBy("cm").agg(F.count(F.lit(1)).alias("cohort_users"))
    cell = (
        o.join(first, "o_custkey")
        .groupBy("cm", (F.col("m") - F.col("cm")).alias("offset_m"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
        )
    )
    w = (
        Window.partitionBy("cm")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.withColumn("cum_dec", F.sum("rev_dec").over(w))
    return cum.join(sizes, "cm").select(
        F.col("cm").alias("cohort_m"),
        "offset_m",
        "n_orders",
        dec2dbl(F.col("rev_dec")).alias("rev"),
        dec2dbl(F.col("cum_dec")).alias("cum_rev"),
        "cohort_users",
        (dec2dbl(F.col("cum_dec")) / F.col("cohort_users")).alias("ltv_per_user"),
    )


@query(
    "mart_basket_lift",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
item AS (SELECT l_partkey, COUNT(*) AS cnt FROM op GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS pair_count
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT pair.pa, pair.pb, pair.pair_count,
       ia.cnt AS cnt_a, ib.cnt AS cnt_b,
       n.n_orders,
       pair.pair_count * n.n_orders > ia.cnt * ib.cnt AS lift_gt1
FROM pair
JOIN item ia ON pair.pa = ia.l_partkey
JOIN item ib ON pair.pb = ib.l_partkey
CROSS JOIN n
""",
)
def mart_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-ordered in >= 2 orders,
    with the lift test (does the pair co-occur more than independence
    predicts) as an integer cross-multiplication —
    pair_count * n_orders > cnt_a * cnt_b — so the flag hashes
    exactly with no division.

    Scale shape: the (order, part) projection dedups first (16-byte
    keys), the pair self-join blows up per-order as lines² — bounded
    by order size, and the production guard for mega-baskets is the
    same frequency cap graph_triangles documents. The min-support
    HAVING cut runs BEFORE the item-count joins, so only surviving
    pairs join the dimension-sized item table; the global order count
    is a one-row broadcast."""
    op = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = op.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = op.toDF("okey", "pa")
    b = op.toDF("okey", "pb")
    pair = (
        a.join(b, "okey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= 2)
    )
    ia = item.toDF("pa", "cnt_a")
    ib = item.toDF("pb", "cnt_b")
    return (
        pair.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "pair_count",
            "cnt_a",
            "cnt_b",
            "n_orders",
            (F.col("pair_count") * F.col("n_orders") > F.col("cnt_a") * F.col("cnt_b")).alias(
                "lift_gt1"
            ),
        )
    )


@query(
    "mart_gini",
    oracle="""
WITH cust AS (
  -- NULL hygiene (r3 adversarial finding): unattributed orders
  -- (NULL custkey) and customers with no revenue observation
  -- (all-NULL totals -> SUM NULL) are excluded on BOTH engines —
  -- a NULL x otherwise ranks FIRST under Spark's default sort and
  -- LAST under DuckDB's, shifting every Lorenz rank by one.
  SELECT o_custkey,
         CAST(FLOOR(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                              AS VARCHAR) AS DOUBLE)) AS BIGINT) AS x
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM cust
  WHERE x IS NOT NULL
),
s AS (
  SELECT COUNT(*) AS n, SUM(x) AS total,
         SUM(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS wsum
  FROM ranked
)
SELECT n AS n_customers,
       CAST(total AS BIGINT) AS total_rev,
       CAST(CAST(2 * wsum - (n + 1) * total AS VARCHAR) AS DOUBLE) AS gini_num,
       CAST(CAST(CAST(n AS HUGEINT) * total AS VARCHAR) AS DOUBLE) AS gini_den,
       CAST(CAST(2 * wsum - (n + 1) * total AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(n AS HUGEINT) * total AS VARCHAR) AS DOUBLE) AS gini
FROM s
""",
)
def mart_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient over per-customer
    lifetime revenue — the inequality KPI behind "whale risk"
    dashboards, computed with the sorted-rank identity
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ).

    Exactness: per-customer revenue reduces in DECIMAL, surfaces
    through the VARCHAR route, and floors to whole currency units.
    The rank-weighted sum Σ i·xᵢ grows as n²·x̄ — past 2⁶³ for big
    customer counts — so it accumulates in DECIMAL(38,0) on the
    Spark side and HUGEINT in DuckDB (both exact to 10³⁸; no silent
    bigint wrap), and the numerator/denominator surface through the
    VARCHAR→DOUBLE route, which parses the same integer string to
    the same correctly-rounded double in both engines.

    Scale note: the global ROW_NUMBER is an Exchange SinglePartition
    + sort over the PER-CUSTOMER aggregate (dim-sized, like
    win_ntile's documented hazard) — at extreme customer counts the
    rewrite is the binned Lorenz-curve approximation (histogram of
    revenue deciles, same TVD-style integer machinery as
    dq_drift_tvd); exact ranks over a 100 TB fact reduce to ranks
    over |customers| rows, which a single partition of aggregates
    handles into the hundreds of millions."""
    cust = (
        table(spark, sf_dir, "orders")
        # unattributed orders and no-observation customers excluded —
        # see the oracle's NULL-hygiene comment (a NULL x ranks FIRST
        # on Spark, LAST on DuckDB)
        .filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.floor(dec2dbl(F.sum(F.col("o_totalprice").cast(DEC))))
            .cast("bigint")
            .alias("x")
        )
        .filter(F.col("x").isNotNull())
    )
    w = Window.orderBy("x", "o_custkey")
    ranked = cust.select("x", F.row_number().over(w).alias("i"))
    big = "decimal(38,0)"
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("total"),
        F.sum(F.col("i").cast(big) * F.col("x").cast(big)).alias("wsum"),
    )
    num = (
        F.lit(2).cast(big) * F.col("wsum")
        - (F.col("n") + 1).cast(big) * F.col("total").cast(big)
    )
    den = F.col("n").cast(big) * F.col("total").cast(big)
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_rev"),
        dec2dbl(num).alias("gini_num"),
        dec2dbl(den).alias("gini_den"),
        (dec2dbl(num) / dec2dbl(den)).alias("gini"),
    )


@query(
    "events_growth_accounting",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
mx AS (SELECT MAX(day) AS max_day FROM ud),
w AS (
  SELECT user_id, day,
         LAG(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM ud
),
labeled AS (
  SELECT day,
         CASE WHEN prev_day IS NULL THEN 'new'
              WHEN prev_day = day - INTERVAL 1 DAY THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM w
  UNION ALL
  SELECT day + INTERVAL 1 DAY AS day, 'churned' AS cls
  FROM w CROSS JOIN mx
  WHERE (next_day IS NULL OR next_day > day + INTERVAL 1 DAY)
    AND day + INTERVAL 1 DAY <= mx.max_day
)
SELECT CAST(day AS DATE) AS day,
       CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resurrected,
       CAST(SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned
FROM labeled
GROUP BY CAST(day AS DATE)
""",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING — the canonical DAU decomposition every
    product org reports: each active user-day classified as NEW
    (first day ever), RETAINED (active yesterday), or RESURRECTED
    (returning after a gap), plus CHURNED (active yesterday, not
    today) attributed to the day after the last active day. The
    identity DAU(d) = new + retained + resurrected and
    churned(d) = DAU(d-1) - retained(d) both hold by construction.

    Scale shape: the event stream first collapses to distinct
    (user, day) — the only full-volume pass; one user-keyed
    LAG/LEAD window over user-days (|users| x active-days rows, far
    smaller than events), a scan-side CASE label, and a day rollup.
    The churn branch reuses the SAME window pass (lead gap), so the
    whole report costs one distinct + one window + one aggregate."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    mx = ud.agg(F.max("day").alias("max_day"))
    w = Window.partitionBy("user_id").orderBy("day")
    base = ud.select(
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    labeled = base.select(
        "day",
        F.when(F.col("prev_day").isNull(), "new")
        .when(F.col("prev_day") == F.date_sub("day", 1), "retained")
        .otherwise("resurrected")
        .alias("cls"),
    ).unionByName(
        base.crossJoin(F.broadcast(mx))
        .filter(
            (
                F.col("next_day").isNull()
                | (F.col("next_day") > F.date_add("day", 1))
            )
            & (F.date_add("day", 1) <= F.col("max_day"))
        )
        .select(F.date_add("day", 1).alias("day"), F.lit("churned").alias("cls"))
    )
    return labeled.groupBy("day").agg(
        F.count_if(F.col("cls") == "new").alias("n_new"),
        F.count_if(F.col("cls") == "retained").alias("n_retained"),
        F.count_if(F.col("cls") == "resurrected").alias("n_resurrected"),
        F.count_if(F.col("cls") == "churned").alias("n_churned"),
    )


@query(
    "mart_revenue_bridge",
    oracle="""
WITH cm AS (
  SELECT o_custkey,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
  FROM orders GROUP BY o_custkey, YEAR(o_orderdate) * 12 + MONTH(o_orderdate)
),
mx AS (SELECT MAX(m) AS max_m FROM cm),
pairs AS (
  SELECT COALESCE(a.m + 1, b.m) AS t,
         COALESCE(a.rev, 0) AS prev_rev,
         COALESCE(b.rev, 0) AS cur_rev,
         a.o_custkey IS NOT NULL AS had,
         b.o_custkey IS NOT NULL AS has
  FROM cm a FULL JOIN cm b
    ON a.o_custkey = b.o_custkey AND b.m = a.m + 1
),
bridge AS (
  SELECT t,
         SUM(CASE WHEN had THEN prev_rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS base,
         SUM(CASE WHEN had AND has AND cur_rev > prev_rev
                  THEN cur_rev - prev_rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS expansion,
         SUM(CASE WHEN had AND has AND cur_rev < prev_rev
                  THEN prev_rev - cur_rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS contraction,
         SUM(CASE WHEN had AND NOT has THEN prev_rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS churned,
         SUM(CASE WHEN NOT had THEN cur_rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS new_rev,
         SUM(CASE WHEN had AND has THEN cur_rev ELSE CAST(0 AS DECIMAL(25,6)) END) AS retained_cur
  FROM pairs CROSS JOIN mx
  WHERE t <= mx.max_m
  GROUP BY t
)
SELECT t,
       CAST(CAST(base AS VARCHAR) AS DOUBLE) AS base,
       CAST(CAST(expansion AS VARCHAR) AS DOUBLE) AS expansion,
       CAST(CAST(contraction AS VARCHAR) AS DOUBLE) AS contraction,
       CAST(CAST(churned AS VARCHAR) AS DOUBLE) AS churned,
       CAST(CAST(new_rev AS VARCHAR) AS DOUBLE) AS new_rev,
       CAST(CAST(retained_cur AS VARCHAR) AS DOUBLE)
         / CAST(CAST(base AS VARCHAR) AS DOUBLE) AS nrr
FROM bridge
WHERE base > 0
""",
)
def mart_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE BRIDGE / NRR — the SaaS month-over-month revenue
    decomposition: for each month transition, prior-month base splits
    into expansion (same customers spending more), contraction
    (spending less), churned (gone), with new-customer revenue
    alongside; NRR = retained customers' current revenue / base. The
    identity base - churned - contraction + expansion = retained_cur
    holds exactly because every term accumulates in DECIMAL.

    Scale shape: one (customer x month) aggregate, then a
    SELF full-outer join keyed (custkey, adjacent months) —
    co-partitioned on custkey so it shuffles the customer-month
    matrix (dim x months), never raw orders; the bridge rollup is
    months-sized. VARCHAR-route surfacing; the only division is the
    final deterministic NRR ratio."""
    o = table(spark, sf_dir, "orders")
    cm = o.groupBy(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    mx = cm.agg(F.max("m").alias("max_m"))
    a = cm.toDF("ck", "am", "arev")
    b = cm.toDF("ck", "bm", "brev")
    pairs = a.join(
        b,
        (a["ck"] == b["ck"]) & (b["bm"] == a["am"] + 1),
        "full_outer",
    ).select(
        F.coalesce(a["am"] + 1, b["bm"]).alias("t"),
        F.coalesce(a["arev"], F.lit(0).cast(DEC)).alias("prev_rev"),
        F.coalesce(b["brev"], F.lit(0).cast(DEC)).alias("cur_rev"),
        a["ck"].isNotNull().alias("had"),
        b["ck"].isNotNull().alias("has"),
    )
    zero = F.lit(0).cast(DEC)
    bridge = (
        pairs.crossJoin(F.broadcast(mx))
        .filter(F.col("t") <= F.col("max_m"))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("had"), F.col("prev_rev")).otherwise(zero)).alias(
                "base_dec"
            ),
            F.sum(
                F.when(
                    F.col("had") & F.col("has") & (F.col("cur_rev") > F.col("prev_rev")),
                    F.col("cur_rev") - F.col("prev_rev"),
                ).otherwise(zero)
            ).alias("exp_dec"),
            F.sum(
                F.when(
                    F.col("had") & F.col("has") & (F.col("cur_rev") < F.col("prev_rev")),
                    F.col("prev_rev") - F.col("cur_rev"),
                ).otherwise(zero)
            ).alias("con_dec"),
            F.sum(
                F.when(F.col("had") & ~F.col("has"), F.col("prev_rev")).otherwise(zero)
            ).alias("chn_dec"),
            F.sum(F.when(~F.col("had"), F.col("cur_rev")).otherwise(zero)).alias(
                "new_dec"
            ),
            F.sum(
                F.when(F.col("had") & F.col("has"), F.col("cur_rev")).otherwise(zero)
            ).alias("ret_dec"),
        )
    )
    return bridge.filter(F.col("base_dec") > 0).select(
        "t",
        dec2dbl(F.col("base_dec")).alias("base"),
        dec2dbl(F.col("exp_dec")).alias("expansion"),
        dec2dbl(F.col("con_dec")).alias("contraction"),
        dec2dbl(F.col("chn_dec")).alias("churned"),
        dec2dbl(F.col("new_dec")).alias("new_rev"),
        (dec2dbl(F.col("ret_dec")) / dec2dbl(F.col("base_dec"))).alias("nrr"),
    )


@query(
    "mart_ab_test",
    oracle="""
WITH assigned AS (
  SELECT user_id,
         (((user_id % 1000000) * 2654435761) % 4294967296) // 2147483648
           AS variant
  FROM (SELECT DISTINCT user_id FROM events)
),
conv AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND value > 195
),
cells AS (
  SELECT a.variant,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS conv
  FROM assigned a LEFT JOIN conv c ON a.user_id = c.user_id
  GROUP BY a.variant
),
wide AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN conv END) AS conv_a,
    MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN conv END) AS conv_b
  FROM cells
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / n_a AS rate_a,
       CAST(conv_b AS DOUBLE) / n_b AS rate_b,
       (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) AS z_stat,
       ABS((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
FROM wide
""",
)
def mart_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned
    to two variants via the HIGH bit of the overflow-safe Knuth
    product mod 2^32 — the low bit would be plain user_id parity
    (the multiplier is odd), which correlates with anything else
    keyed on even/odd ids; the high bit actually mixes. Same
    assignment every run, any worker can answer 'which bucket is
    user X in';
    conversion = ever made a high-value purchase (value > 195, ~25%
    of users — a conversion that actually splits the population;
    'ever purchased' is ~100% here and a degenerate 0/1 pooled rate
    zeroes the variance), compared with the two-proportion
    pooled z-test. Every arithmetic step is deterministic IEEE
    (divisions in fixed order, sqrt correctly rounded), so even the
    z-statistic and the 1.96 significance flag hash exactly across
    engines — no stats library, no approximation.

    Scale shape: distinct users + distinct converters are the only
    stream passes; assignment is scan-side arithmetic; the readout
    is a 2-row cell table pivoted to one row. (On a real experiment
    the assignment hash keys on (user, experiment_salt) — same
    gate.)"""
    ev = table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assigned = users.select(
        "user_id",
        F.expr(
            "(((user_id % 1000000) * 2654435761) % 4294967296) div 2147483648"
        ).alias("variant"),
    )
    conv = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 195))
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    cells = (
        assigned.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("is_conv").alias("conv"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-class sequential pattern matching (r7) — the CEP
# operator Spark SQL lacks (Flink/Trino/Oracle have MATCH_RECOGNIZE;
# ClickHouse has sequenceMatch): find, per user, the FIRST occurrence
# of the ordered pattern VIEW → CLICK → PURCHASE with NO ERROR
# anywhere between the anchoring view and the purchase. This differs
# from the funnel family above in exactly the two ways that define
# the CEP class: an EXCLUSION event resets an in-progress match, and
# matching re-anchors after a reset (a later view can still complete)
# — `events_window_funnel` can express neither.

_MR_ORACLE = """
WITH e1 AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS seg
  FROM events
),
e2 AS (
  SELECT *,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER wsp
           AS v_before,
         MIN(CASE WHEN event_type = 'view' THEN ts END) OVER wsp AS fv_ts
  FROM e1
  WINDOW wsp AS (PARTITION BY user_id, seg ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
e3 AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'click' AND v_before >= 1
                  THEN 1 ELSE 0 END) OVER wsp AS vc_before
  FROM e2
  WINDOW wsp AS (PARTITION BY user_id, seg ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
hits AS (
  SELECT user_id, fv_ts, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM e3
  WHERE event_type = 'purchase' AND vc_before = 1
),
spine AS (SELECT DISTINCT user_id FROM events)
SELECT s.user_id,
       (h.ts IS NOT NULL) AS matched,
       h.fv_ts AS match_start_ts,
       h.ts AS match_end_ts
FROM spine s LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (user_id)
"""


@query("events_match_recognize", oracle=_MR_ORACLE)
def events_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match sequential pattern per user (header above) — NFA
    semantics, RELATIONAL plan. The state machine (anchor at the
    first view, advance on a later click, complete on a later
    purchase, RESET on error, first match wins) is re-expressed as
    windows so no per-user event array is ever materialized (the
    whale-user hazard of the collect_list formulation):

      seg       running error count → events in one (user, seg)
                segment have no error between them;
      v_before  views earlier in the segment → a click with
                v_before ≥ 1 extends a live match;
      vc_before a qualifying click earlier in the segment → a
                purchase with vc_before completes one;
      fv_ts     MIN view ts earlier in the segment = the NFA's
                anchor (the first view after the last reset);
      rn = 1    over qualifying purchases by (ts, event_id) = the
                first match (AFTER MATCH SKIP semantics).

    Equivalence to the sequential NFA is pinned by a pure-Python
    state-machine reference on randomized logs plus planted reset /
    exclusion / tie-break / re-anchor sequences. (ts, event_id)
    total-orders every window on both engines. Scale: two exchanges
    (user; user+seg — fixed-width rows), one purchase-only rank, a
    distinct-user spine left join; streaming twin would be
    applyInPandasWithState, noted for parity with the session ops."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e1 = ev.withColumn(
        "seg",
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).over(wu),
    )
    wsp = (
        Window.partitionBy("user_id", "seg")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e2 = e1.withColumn(
        "v_before",
        F.count(F.when(F.col("event_type") == "view", F.lit(1))).over(wsp),
    ).withColumn(
        "fv_ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wsp),
    )
    e3 = e2.withColumn(
        "vc_before",
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("v_before") >= 1),
                1,
            ).otherwise(0)
        ).over(wsp),
    )
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hits = (
        e3.filter(
            (F.col("event_type") == "purchase") & (F.col("vc_before") == 1)
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("user_id", "fv_ts", F.col("ts").alias("match_end_ts"))
    )
    spine = ev.select("user_id").distinct()
    return spine.join(hits, "user_id", "left").select(
        "user_id",
        F.col("match_end_ts").isNotNull().alias("matched"),
        F.col("fv_ts").alias("match_start_ts"),
        "match_end_ts",
    )
