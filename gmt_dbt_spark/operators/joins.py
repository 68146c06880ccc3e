"""Join operators — SURVEY.md §2.C.

The only join the reference *implements* is the MERGE equi-join
(`gcp_function.py:73`); the rest is the [surface] a dbt-model host
needs. Physical strategy is Catalyst/AQE's: dimension sides are
broadcast (no fact shuffle), fact-fact joins shuffle on the key and
AQE splits skewed partitions at runtime.

`join_asof` is the [ext] operator Spark lacks natively: implemented
as the scalable union+window trick (tag both sides, sort within key,
`last(..., ignorenulls)`) — one shuffle on the key, no range
cross-product, works at 100 TB where a theta-join would BNL-explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query


@query(
    "join_inner_equi",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. customer is SF-proportional, so no broadcast
    hint (a hint is honored past autoBroadcastJoinThreshold and OOMs
    the driver at the 100 TB design point — r2 VERDICT item 2): AQE
    broadcasts the filtered dim while it fits and falls back to
    shuffled SMJ when it doesn't. test_plans.py asserts BHJ is still
    chosen hint-free at test sf."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 100000
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON
    clause, not WHERE — outer semantics preserved)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 100000)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
SELECT s_suppkey, s_name, n_name
FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "nation")
        .join(
            table(spark, sf_dir, "supplier"),
            F.col("n_nationkey") == F.col("s_nationkey"),
            "right",
        )
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "join_full",
    oracle="""
SELECT c.key AS cust_nation, s.key AS supp_nation, c.n_cust, s.n_supp
FROM (SELECT c_nationkey AS key, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS key, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  ON c.key = s.key
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the decomposition MERGE needs
    (matched vs not-matched, `gcp_function.py:86-91`)."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ckey"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("skey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, F.col("ckey") == F.col("skey"), "full_outer").select(
        F.col("ckey").alias("cust_nation"),
        F.col("skey").alias("supp_nation"),
        "n_cust",
        "n_supp",
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence (EXISTS ≡ left-semi)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence (NOT EXISTS ≡ left-anti) — the MERGE
    "WHEN NOT MATCHED" branch (`gcp_function.py:89-91`)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


def join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: when one key carries a pathological
    share of the left side (beyond what AQE's skew splitting fixes),
    shard each left row into one of ``n_salts`` sub-keys and
    replicate the right side across all salts — the hot key's rows
    spread over n_salts reducers instead of one straggler.

    Left-side columns keep their names; use for fact⋈dim where the
    dim is too big to broadcast but small enough to replicate ×salts.
    """
    salted_l = left.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    )
    salted_r = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_l.join(salted_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


@query(
    "join_salted",
    oracle="""
SELECT n_name, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting pattern exercised end-to-end: orders⋈customer with
    16-way salt (identical answer to the unsalted join — salting is
    a pure physical rewrite), then the usual dim rollup."""
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("custkey"), "c_nationkey")
    )
    n = table(spark, sf_dir, "nation")
    joined = join_salted(o, c, key="custkey", n_salts=16)
    return (
        joined.join(F.broadcast(n), joined.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (bounded: 5 regions × 25 nations)."""
    return (
        table(spark, sf_dir, "region")
        .crossJoin(table(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@query(
    "join_theta",
    oracle="""
SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join. Keeps an equi component (nationkey) so
    the plan is a hash/sort-merge join with a residual range filter —
    the scalable shape — rather than a pure nested-loop
    cross-product."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    cond = (F.col("s_nationkey") == F.col("c_nationkey")) & (
        F.col("s_acctbal") < F.col("c_acctbal")
    )
    return s.join(c, cond).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


@query(
    "join_asof",
    oracle="""
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts AS click_ts,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the most recent purchase by the
    same user at-or-before the click ([ext — implied], SURVEY §2.C).

    Scalable plan: tag both sides, union, single shuffle+sort on
    (user_id, ts), then `last(purchase, ignorenulls)` carries the
    latest prior purchase forward — O(n log n) per key, no range
    cross-product. (DuckDB oracle uses its native ASOF JOIN.)
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("click_id"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("p_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(0).alias("is_left"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    unioned = clicks.unionByName(purchases)
    # Purchases sort before clicks at identical ts (is_left asc) so a
    # same-instant purchase is visible to the click (ASOF uses <=).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("purchase_id", F.last("p_event_id", ignorenulls=True).over(w))
        .withColumn("purchase_ts", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "click_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            "purchase_id",
            "purchase_ts",
        )
    )


@query(
    "join_null_safe",
    oracle="""
WITH l AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_n FROM orders),
d AS (SELECT DISTINCT NULLIF(o_orderstatus, 'P') AS status_n,
             concat('grp_', coalesce(NULLIF(o_orderstatus, 'P'), 'pending')) AS label
      FROM orders)
SELECT d.label, COUNT(*) AS n
FROM l JOIN d ON l.status_n IS NOT DISTINCT FROM d.status_n
GROUP BY d.label
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of silently dropping — the
    dimension-with-an-unknown-bucket pattern a plain equi-join gets
    wrong. Still a hash-joinable equality (null-safe equals keeps
    broadcast-hash eligibility; no fallback to nested-loop)."""
    o = table(spark, sf_dir, "orders")
    status_n = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n")
    left = o.select("o_orderkey", status_n)
    dim = (
        o.select(status_n)
        .distinct()
        .select(
            "status_n",
            F.concat(
                F.lit("grp_"), F.coalesce(F.col("status_n"), F.lit("pending"))
            ).alias("label"),
        )
    )
    return (
        left.join(F.broadcast(dim), left["status_n"].eqNullSafe(dim["status_n"]))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "join_asof_tolerance",
    oracle="""
SELECT c.event_id AS click_id,
       c.user_id,
       CASE WHEN p.ts >= c.ts - INTERVAL '30 minutes'
            THEN p.event_id ELSE NULL END AS purchase_id,
       CASE WHEN p.ts >= c.ts - INTERVAL '30 minutes'
            THEN CAST(date_diff('second', p.ts, c.ts) AS BIGINT)
            ELSE NULL END AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE (pandas merge_asof semantics):
    nearest prior purchase, but only if within 30 minutes — stale
    matches become NULL instead of silently joining. Same union +
    single-shuffle window plan as join_asof; the tolerance is one
    post-window predicate, costing nothing. The pattern for
    sensor/trade enrichment where "latest known value" has a
    freshness contract."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("p_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(0).alias("is_left"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        clicks.unionByName(purchases)
        .withColumn("m_id", F.last("p_event_id", ignorenulls=True).over(w))
        .withColumn("m_ts", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
    )
    fresh = F.col("m_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    gap = (F.unix_seconds("ts") - F.unix_seconds("m_ts")).cast("bigint")
    return matched.select(
        "click_id",
        "user_id",
        F.when(fresh, F.col("m_id")).alias("purchase_id"),
        F.when(fresh, gap).alias("gap_seconds"),
    )


@query(
    "join_asof_forward",
    oracle="""
SELECT c.event_id AS click_id,
       c.user_id,
       p.event_id AS next_purchase_id,
       p.ts AS next_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts >= c.ts
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: the first purchase at-or-after each click
    (time-to-conversion, next-reading enrichment). Mirror plan of
    join_asof with the window reversed — current row to unbounded
    FOLLOWING, `first(..., ignorenulls)` — still one shuffle on the
    key. Clicks sort before purchases at identical ts so a
    same-instant purchase stays visible (ASOF >= contract)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("p_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(2).alias("is_left"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("next_purchase_id", F.first("p_event_id", ignorenulls=True).over(w))
        .withColumn("next_purchase_ts", F.first("p_ts", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select("click_id", "user_id", "next_purchase_id", "next_purchase_ts")
    )


@query(
    "join_hint_strategies",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS VARCHAR)
            AS DOUBLE) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_hint_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control via SQL hints: SHUFFLE_HASH on
    the orders side of a fact⋈fact join. At 100 TB the planner's
    default for two large sides is sort-merge; when one side's
    PER-PARTITION slice fits in memory, a hinted shuffled-hash join
    skips both sorts — the standard lever once you know your data
    better than the size estimates do. The hint changes ONLY the
    physical strategy (plan-guarded); the answer is hint-independent,
    which is exactly what the oracle checks."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT /*+ SHUFFLE_HASH(orders) */
               o_orderpriority, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS STRING)
                    AS DOUBLE) AS total_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """
    )


@query(
    "join_asof_nearest",
    oracle="""
SELECT c.event_id AS click_id,
       c.user_id,
       (SELECT p.event_id
        FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), p.ts, p.event_id
        LIMIT 1) AS nearest_purchase_id
FROM events c
WHERE c.event_type = 'click'
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the closest purchase in EITHER direction
    (sensor alignment, closest-quote matching). Ties resolve to the
    smaller |Δt|, then the EARLIER purchase, then the lower event_id —
    the oracle's correlated ORDER BY is the spec; the distributed plan
    is the as-of family's union-window shape run BOTH ways over one
    user_id exchange (backward pass: purchases sort before same-ts
    clicks, descending event_id so `last()` lands on the LOWEST id;
    forward pass mirrored), then a scan-side |Δt| comparison picks
    the winner. Still no per-row subquery, no nested loop — two
    window sorts over one shuffle."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(False).alias("is_p"),
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(True).alias("is_p"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    u = clicks.unionByName(purchases)
    # backward: same-ts purchases visible (sort before clicks), and
    # among same-ts purchases last() must pick the LOWEST event_id →
    # order them by -p_id ascending
    back_order = [
        F.col("ts"),
        F.when(F.col("is_p"), 0).otherwise(1),
        F.when(F.col("is_p"), -F.col("p_id")).otherwise(F.lit(0)),
    ]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*back_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: same-ts purchases visible (sort after clicks), first()
    # picks the lowest event_id under ascending p_id
    fwd_order = [
        F.col("ts"),
        F.when(F.col("is_p"), 2).otherwise(1),
        F.when(F.col("is_p"), F.col("p_id")).otherwise(F.lit(0)),
    ]
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*fwd_order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    enriched = u.select(
        "user_id",
        "ts",
        "click_id",
        F.last("p_id", ignorenulls=True).over(wb).alias("back_id"),
        F.last("p_ts", ignorenulls=True).over(wb).alias("back_ts"),
        F.first("p_id", ignorenulls=True).over(wf).alias("fwd_id"),
        F.first("p_ts", ignorenulls=True).over(wf).alias("fwd_ts"),
    ).filter(F.col("click_id").isNotNull())
    d_back = F.unix_micros("ts") - F.unix_micros("back_ts")
    d_fwd = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("back_id").isNull(), F.col("fwd_id"))
        .when(F.col("fwd_id").isNull(), F.col("back_id"))
        # tie on |Δt| → earlier purchase = the backward one
        .when(d_back <= d_fwd, F.col("back_id"))
        .otherwise(F.col("fwd_id"))
    )
    return enriched.select(
        "click_id", "user_id", nearest.alias("nearest_purchase_id")
    )


@query(
    "join_fuzzy_block",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_name FROM part WHERE p_partkey < 300
),
k AS (
  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM p
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev
FROM k a JOIN k b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
""",
)
def join_fuzzy_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join with BLOCKING — the
    record-linkage primitive (Fellegi-Sunter style): candidate pairs
    come from an EQUI self-join on a cheap blocking key (first name
    token), and only candidates pay the edit-distance verify
    (levenshtein 1–3; 0 = exact dup, handled by dedup_exact).

    The blocking key is the whole point at scale: a naive fuzzy join
    is O(n²) levenshtein calls; blocked, the join is an ordinary
    hash-partitioned equi-join whose verify cost is Σ_blocks |b|² —
    governed by the largest block, which you control by key choice
    (first-token here; production uses multiple passes with
    different keys ∪'d, each still an equi-join). Run on the bounded
    id-slice as an audit (the house all-pairs-on-a-slice shape);
    the id tiebreak keeps pairs canonical."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            "p_name",
            F.split("p_name", " ").getItem(0).alias("blk"),
        )
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"),
        F.col("blk").alias("blk_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"),
        F.col("blk").alias("blk_b"),
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .filter(lev.between(1, 3))
        .select(
            "id_a", "id_b", "name_a", "name_b", lev.cast("int").alias("lev")
        )
    )


@query(
    "join_scd2_pit",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment, 1 AS version,
         TIMESTAMP '1990-01-01' AS valid_from,
         TIMESTAMP '1996-01-01' AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'UPGRADED-' || c_mktsegment AS segment, 2 AS version,
         TIMESTAMP '1996-01-01' AS valid_from,
         TIMESTAMP '9999-12-31' AS valid_to
  FROM customer
)
SELECT o_orderkey, o_custkey, d.version, d.segment
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND o.o_orderdate >= d.valid_from
          AND o.o_orderdate <  d.valid_to
""",
)
def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against an SCD2 dimension: each order picks
    the dimension VERSION that was valid at its order date
    (`valid_from <= ts < valid_to`) — the join every star schema
    with slowly-changing dimensions runs on every fact load
    (model_snapshot BUILDS these version tables; this consumes them).
    Versions here are synthesized deterministically (v1 pre-1996,
    v2 after) so the oracle replays the same dim.

    Scale shape: equi-join on the dim KEY with the validity window
    as a residual range predicate — NOT a range join: Catalyst plans
    a hash join on c_custkey (broadcast while the versioned dim
    fits; shuffled hash beyond), and the window test filters the
    ≤ |versions-per-key| matched rows. Version count per key is
    small by construction (SCD2 closes old rows), so the residual
    never explodes. A dim too hot to join this way degrades to the
    as-of union-window trick (join_asof) on (key, valid_from)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).alias("version"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.lit("1996-01-01").cast("timestamp").alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.concat(F.lit("UPGRADED-"), F.col("c_mktsegment")).alias("segment"),
        F.lit(2).alias("version"),
        F.lit("1996-01-01").cast("timestamp").alias("valid_from"),
        F.lit("9999-12-31").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    return (
        o.join(
            dim,
            (o["o_custkey"] == dim["c_custkey"])
            & (o["o_orderdate"] >= dim["valid_from"])
            & (o["o_orderdate"] < dim["valid_to"]),
        )
        .select("o_orderkey", "o_custkey", "version", "segment")
    )


@query(
    "join_interval_overlap",
    oracle="""
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MIN(ts) AS lo, MAX(ts) AS hi
  FROM events GROUP BY user_id, CAST(ts AS DATE)
)
SELECT a.day,
       COUNT(*) AS n_overlapping_pairs,
       CAST(MIN(a.user_id) AS BIGINT) AS min_user
FROM spans a JOIN spans b
  ON a.day = b.day AND a.user_id < b.user_id
 AND a.lo <= b.hi AND b.lo <= a.hi
GROUP BY a.day
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP self-join (Allen's 'overlaps' relation):
    pairs of users whose activity spans intersect, rolled up per
    day — concurrency/conflict detection (co-active sessions, room
    double-bookings, ad co-exposure). Complements join_range_binned
    (point-in-interval) with the interval×interval case.

    Scale shape: the partition key (day) acts as the bin — the join
    is a plain EQUI self-join on day with the overlap test
    (`a.lo <= b.hi AND b.lo <= a.hi`) as a residual predicate, never
    a nested loop (intervals here cannot cross the day boundary by
    construction; spans that do cross bins get exploded into one row
    per bin exactly like join_range_binned, at bounded blowup). Cost
    concentrates in the largest bin — at 100 TB that is the knob:
    shrink the bin (hour) until per-bin pair counts are tractable,
    or pre-aggregate to coarser spans as done here (|user-days|,
    not |events|, enter the join)."""
    ev = table(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    a = spans.select(
        F.col("user_id").alias("ua"), F.col("day").alias("day"),
        F.col("lo").alias("alo"), F.col("hi").alias("ahi"),
    )
    b = spans.select(
        F.col("user_id").alias("ub"), F.col("day").alias("dayb"),
        F.col("lo").alias("blo"), F.col("hi").alias("bhi"),
    )
    pairs = a.join(
        b,
        (F.col("day") == F.col("dayb"))
        & (F.col("ua") < F.col("ub"))
        & (F.col("alo") <= F.col("bhi"))
        & (F.col("blo") <= F.col("ahi")),
    )
    return pairs.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_overlapping_pairs"),
        F.min("ua").cast("bigint").alias("min_user"),
    )
