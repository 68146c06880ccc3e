"""Set operations — SURVEY.md §2.G (all [surface])."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query


def _high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_custkey")
    )


def _urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


@query(
    "set_union_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
UNION ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value(spark, sf_dir).union(_urgent(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@query(
    "set_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value(spark, sf_dir).subtract(_urgent(spark, sf_dir))


@query(
    "set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each key appears
    min(count_left, count_right) times. Spark plans it as a
    row_number-augmented join, not a distinct — the variant that
    preserves multiplicity for audit reconciliation (e.g. 'orders
    matched per customer', not 'customers matched')."""
    return _high_value(spark, sf_dir).intersectAll(_urgent(spark, sf_dir))


@query(
    "set_except_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each key keeps
    max(0, count_left - count_right) occurrences. The reconciliation
    primitive for 'which rows of batch A are not yet absorbed into
    B' when duplicates are meaningful."""
    return _high_value(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))
