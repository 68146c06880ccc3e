"""File readers — SURVEY.md §2.A scan operators.

Spark analogues of the reference's BigQuery external tables
(`main.py:314-349`): schema-autodetect JSON/CSV scans, whole-file
JSON arrays, declared-schema override. Where the reference rewrites
files (array→NDJSON at `main.py:249-252`) or re-uploads sanitized
copies, we express the same result as reader options + a metadata
projection — the scan itself stays distributed and pushdown-capable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gmt_dbt_spark.session import tune


def find_files(root: str, suffix: str) -> list[str]:
    """Recursive file discovery (`main.py:58-73`). For Spark reads
    prefer passing the directory + recursiveFileLookup instead; this
    exists for registry/driver bookkeeping."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files if f.endswith(suffix))
    return sorted(out)


def detect_json_layout(path: str) -> str:
    """'ndjson' vs 'array' — the reference sniffs the first parse
    (`main.py:197-212`); we sniff the first non-whitespace byte."""
    with open(path, "rb") as f:
        while True:
            ch = f.read(1)
            if not ch:
                return "ndjson"
            if not ch.isspace():
                return "array" if ch == b"[" else "ndjson"


def scan_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool | None = None,
) -> DataFrame:
    """NDJSON / whole-file-array JSON scan with autodetect
    (`main.py:318-320`); declared schema disables inference
    (`main.py:333-335`)."""
    tune(spark)
    if multiline is None and os.path.isfile(path):
        multiline = detect_json_layout(path) == "array"
    reader = spark.read.option("multiLine", bool(multiline)).option(
        "recursiveFileLookup", "true"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def scan_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """CSV scan with the reference's external-table options
    (`main.py:321-326`): header skip (`skip_leading_rows=1`), quoted
    newlines (`allow_quoted_newlines`), jagged rows
    (`allow_jagged_rows` → PERMISSIVE null-fill), autodetect."""
    tune(spark)
    reader = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .option("recursiveFileLookup", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def schema_from_json_file(path: str, table: str) -> tuple[T.StructType, list[str]]:
    """Load a declared schema + merge keys from the registry file —
    the reference's `schema.json` contract (`gcp_function.py:47-64`:
    returns (schema, on_condition_columns))."""
    with open(path) as f:
        reg = json.load(f)
    entry = reg[table]
    return (
        T.StructType.fromJson(entry["schema"]),
        list(entry.get("on_condition_columns", [])),
    )


def append_schema_to_registry(
    path: str, table: str, schema: T.StructType, keys: list[str]
) -> None:
    """Write-back half of the registry (`gcp_function.py:225-272`
    `append_bq_schema_to_json`)."""
    reg = {}
    if os.path.exists(path):
        with open(path) as f:
            reg = json.load(f)
    reg[table] = {"schema": schema.jsonValue(), "on_condition_columns": keys}
    with open(path, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
