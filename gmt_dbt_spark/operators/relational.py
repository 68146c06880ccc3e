"""Projections, filters, sorts, limits — SURVEY.md §2.B and §2.F.

The reference's own models only ever do `SELECT *` passthrough
(`models/yelp/bronze_yelp_academic_dataset_business.sql:5-7`); the
rest of this surface is what hosting arbitrary dbt-model SQL requires
([surface] in SURVEY.md §2). Everything here is a declarative
DataFrame plan — Catalyst pushes the filters and prunes the columns
down to the parquet scan (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.exprs import dsum_rev
from gmt_dbt_spark.registry import query


@query(
    "scan_parquet",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base table scan — the read path under every model (the
    reference's external-table scan, `main.py:314-349`); plain
    columnar parquet read with pushdown left to Catalyst."""
    return table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "flagship_revenue_by_region",
    oracle="""
SELECT r_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY r_name
""",
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region: the M0 end-to-end slice (SURVEY.md §7).

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with a date filter,
    group-sum, and descending sort. At scale: lineitem⋈orders is the
    only big shuffle. nation (25 rows) and region (5 rows) are
    CONSTANT-cardinality — they never grow with sf, so a broadcast
    hint on them is always safe. customer grows linearly with sf
    (×150k rows per TPC-H sf ⇒ far past the 8 GB broadcast cap at the
    100 TB design point), so it carries NO hint: AQE picks
    BroadcastHashJoin while customer fits under
    autoBroadcastJoinThreshold and degrades to shuffled SMJ when it
    doesn't — a degradation a forced `F.broadcast` hint would forbid
    (hints are honored regardless of the threshold; r2 VERDICT item 2).
    test_plans.py pins both facts: BHJ chosen at small sf WITHOUT the
    hint, and the hint whitelist (region/nation only).
    """
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(dsum_rev("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc())
    )


@query("project_star", oracle="SELECT * FROM region")
def project_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT *` passthrough — the reference models' only projection
    (`bronze_yelp_academic_dataset_review.sql:6-7`)."""
    return table(spark, sf_dir, "region").select("*")


@query(
    "project_exprs",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       c_acctbal * 2.0 AS bal_x2,
       CONCAT_WS(':', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat
FROM customer
""",
)
def project_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column list + computed expressions + aliases ([surface])."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        (F.col("c_acctbal") * 2.0).alias("bal_x2"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nat"
        ),
    )


@query(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus IN ('O', 'F') AND o_totalprice BETWEEN 1000 AND 200000)
   OR (o_orderpriority LIKE '1-%' AND NOT o_orderstatus = 'P')
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN + LIKE row predicate ([surface];
    the only [ref] predicate is the MERGE ON conjunction,
    `gcp_function.py:73`)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("O", "F") & F.col("o_totalprice").between(1000, 200000))
        | (F.col("o_orderpriority").like("1-%") & ~(F.col("o_orderstatus") == "P"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "project_nested",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
""",
)
def project_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-field access: parse the JSON `props` payload into a
    struct and project a leaf — the Yelp `attributes`/`hours` nested
    struct pattern (`gcp_function.py:175-203`)."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "struct<k:bigint>"))
    return (
        parsed.select("event_id", F.col("p.k").alias("prop_k"))
        .filter(F.col("prop_k") > 50)
    )


@query(
    "sort_order",
    oracle="""
SELECT c_custkey, c_name, c_acctbal, c_mktsegment
FROM customer
ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey
""",
)
def sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort, asc/desc, nulls placement ([surface]).

    Spark plans a range-partitioned sort (sampling pass + shuffle) —
    the scalable global sort; the hash compare is order-insensitive
    but the operator is exercised for real.
    """
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey"),
        )
    )


@query(
    "sort_order_audit",
    oracle="""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment ASC NULLS LAST,
                               c_acctbal DESC NULLS LAST,
                               c_custkey ASC NULLS LAST) AS BIGINT) AS rn,
       c_custkey, c_name, c_acctbal, c_mktsegment
FROM customer
""",
)
def sort_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sort_order`'s ORDER-SENSITIVE twin (r8, VERIFICATION pattern
    13 — the driver's multiset hash cannot see row order, so the bare
    global sort's actual ordering was the one surface in the registry
    a sort-direction or nulls-placement bug could not reach): every
    row is stamped with its position under the same (segment asc,
    acctbal desc nulls last, custkey) total order, making the
    (position ↔ row) assignment part of the value hash. Nulls
    placement is explicit on every key on both engines (DuckDB's
    ASC default is configuration-dependent).

    The global rank is computed the SCALABLE way (a naive
    row_number() over the whole table is exactly the data-scale
    global window the registry-wide plan sweep bans — it banned the
    first draft of this op): a two-phase rank. Phase 1 ranks within
    each leading-key partition (segment — the partitioned window);
    phase 2 adds each segment's exclusive cumulative row count,
    computed by an aggregate whose global window is dim-sized
    (|segments| rows) and broadcast back. rn = offset + within-rank
    equals the global ROW_NUMBER exactly because the leading sort
    key IS the partition key."""
    from pyspark.sql import Window

    base = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    w_in = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc_nulls_last(),
    )
    w_off = (
        Window.orderBy(F.col("c_mktsegment").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        base.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        )
        .select(F.col("c_mktsegment").alias("__seg"), "__off")
    )
    return (
        base.join(
            F.broadcast(off),
            base["c_mktsegment"].eqNullSafe(off["__seg"]),
        )
        .withColumn(
            "rn",
            (F.col("__off") + F.row_number().over(w_in)).cast("bigint"),
        )
        .select("rn", "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    )


@query(
    "limit_n",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 100
""",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT over a deterministic order (bare LIMIT is
    row-order-dependent and would not oracle-match)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = orderBy + limit; Spark plans TakeOrderedAndProject
    (per-partition heap + single reduce — no global sort, the right
    plan at 100 TB)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )
