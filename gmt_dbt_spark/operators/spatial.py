"""Spatial join without a geo library: grid-binned neighbor search.

[ext] — the reference (whitefantom00/gmt-dbt, `main.py` /
`gcp_function.py`) delegates arbitrary SQL to BigQuery, where
ST_DWITHIN-style proximity joins are a staple of the ELT models it
hosts. Spark core has no ST_* functions, so the scalable re-expression
is the classic grid-cell trick: bin both point sets to a square grid
whose cell edge equals the search radius; every pair within the radius
then lands in the same or an adjacent cell, so a 3x3 neighbor explode
on the SMALL side turns the O(n*m) distance join into a plain
equi-join on (cell_y, cell_x) plus a residual exact-distance filter.

Scale shape (100 TB): the blowup is a bounded 9x on the small
(supplier) side only; the big side scans once with no explode. The
join shuffles on cell ids — spatially uniform data gives uniform
cells, and a skewed hot cell is exactly what AQE skew-join splitting
handles. No BroadcastNestedLoopJoin at any size (plan-guarded).

Exactness: coordinates are synthesized deterministically from the
integer keys in CENTIDEGREES and never leave integer arithmetic —
squared distance, threshold, and grid cell are all bigint ops, so the
DuckDB oracle (which runs the naive theta-join formulation) matches
bit-for-bit. Longitude wraparound at the +/-180 seam is deliberately
not modeled (documented divergence from true geodesic semantics; the
fix — a second explode of seam cells — does not change the plan
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query

# Search radius: 10 degrees = 1000 centidegrees; compare squared.
_R_CD = 1000
_R2 = _R_CD * _R_CD


@query(
    "join_spatial_grid",
    oracle=f"""
WITH cpts AS (
  SELECT c_custkey,
         (c_custkey * 7919) % 18000 - 9000  AS y,
         (c_custkey * 104729) % 36000 - 18000 AS x
  FROM customer
),
spts AS (
  SELECT s_suppkey,
         (s_suppkey * 7919 + 4321) % 18000 - 9000  AS y,
         (s_suppkey * 104729 + 12345) % 36000 - 18000 AS x
  FROM supplier
)
SELECT c.c_custkey,
       COUNT(*) AS n_nearby,
       MIN((c.y - s.y) * (c.y - s.y) + (c.x - s.x) * (c.x - s.x)) AS min_d2
FROM cpts c
JOIN spts s
  ON (c.y - s.y) * (c.y - s.y) + (c.x - s.x) * (c.x - s.x) <= {_R2}
GROUP BY c.c_custkey
""",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers within 10 degrees of any supplier site: count + min
    squared distance. Points are key-derived centidegree integers
    (lat in [-9000, 9000), lon in [-18000, 18000)); the supplier side
    explodes to its 3x3 cell neighborhood and the join is an
    equi-join on the cell pair with the exact residual predicate."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 18000 - 9000).alias("y"),
        ((F.col("c_custkey") * 104729) % 36000 - 18000).alias("x"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        ((F.col("s_suppkey") * 7919 + 4321) % 18000 - 9000).alias("sy"),
        ((F.col("s_suppkey") * 104729 + 12345) % 36000 - 18000).alias("sx"),
    )
    # Cell edge == radius: a qualifying neighbor is always within one
    # cell step, so the 3x3 explode below cannot miss a pair.  `div`
    # truncates toward zero, which would fold cells around 0 — shift
    # both axes into the positive range first for a uniform grid.
    cust = cust.withColumn("gy", F.expr(f"(y + 9000) div {_R_CD}")).withColumn(
        "gx", F.expr(f"(x + 18000) div {_R_CD}")
    )
    supp = supp.withColumn("by0", F.expr(f"(sy + 9000) div {_R_CD}")).withColumn(
        "bx0", F.expr(f"(sx + 18000) div {_R_CD}")
    )
    supp9 = (
        supp.withColumn(
            "gy", F.explode(F.array(F.col("by0") - 1, F.col("by0"), F.col("by0") + 1))
        )
        .withColumn(
            "gx", F.explode(F.array(F.col("bx0") - 1, F.col("bx0"), F.col("bx0") + 1))
        )
        .select("sy", "sx", "gy", "gx")
    )
    dy = F.col("y") - F.col("sy")
    dx = F.col("x") - F.col("sx")
    d2 = dy * dy + dx * dx
    joined = cust.join(supp9, ["gy", "gx"]).filter(d2 <= F.lit(_R2))
    return joined.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.min(d2).alias("min_d2"),
    )
