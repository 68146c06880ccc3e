"""Unit tests for identifier sanitization — the exact semantics of
the reference rule (main.py:215-230, main.py:384-387)."""

from __future__ import annotations

from pyspark.sql import types as T

from gmt_dbt_spark.sources.sanitize import (
    sanitize_columns,
    sanitize_datatype,
    sanitize_name,
    sanitize_table_name,
)


def test_sanitize_name_rules():
    assert sanitize_name("delivery or takeout") == "delivery_or_takeout"
    assert sanitize_name("Call To Action enabled") == "Call_To_Action_enabled"
    assert sanitize_name("1st_case_date") == "_1st_case_date"
    assert sanitize_name("6ft rule") == "_6ft_rule"
    assert sanitize_name("_ok_name") == "_ok_name"
    assert sanitize_name("weird!@#chars") == "weird___chars"
    assert sanitize_name("ünïcode") == "_n_code"  # non-ASCII → '_', leading '_' fix


def test_sanitize_table_name_prefix():
    assert sanitize_table_name("2024_sales") == "t_2024_sales"
    assert sanitize_table_name("ok_table") == "ok_table"


def test_sanitize_datatype_recursive():
    dt = T.StructType(
        [
            T.StructField("a b", T.StringType()),
            T.StructField(
                "nest ed",
                T.StructType([T.StructField("1x", T.LongType())]),
            ),
            T.StructField(
                "arr",
                T.ArrayType(T.StructType([T.StructField("k v", T.StringType())])),
            ),
        ]
    )
    out = sanitize_datatype(dt)
    assert out.fieldNames() == ["a_b", "nest_ed", "arr"]
    assert out["nest_ed"].dataType.fieldNames() == ["_1x"]
    assert out["arr"].dataType.elementType.fieldNames() == ["k_v"]


def test_sanitize_columns_dataframe(spark):
    df = spark.createDataFrame(
        [("x", {"1st": "y"})],
        T.StructType(
            [
                T.StructField("my col", T.StringType()),
                T.StructField(
                    "s t", T.StructType([T.StructField("1st", T.StringType())])
                ),
            ]
        ),
    )
    out = sanitize_columns(df)
    assert out.columns == ["my_col", "s_t"]
    assert out.schema["s_t"].dataType.fieldNames() == ["_1st"]
    assert out.collect()[0].s_t._1st == "y"
