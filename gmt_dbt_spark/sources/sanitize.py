"""Identifier sanitization — the reference's one genuinely custom
algorithm (SURVEY.md §2.A `sanitize_columns`).

Semantics ported exactly from `main.py:215-230` (JSON keys, applied
recursively), `main.py:283-293` (CSV headers) and `main.py:384-387`
(table names, `t_` prefix fallback):
  - every char outside [A-Za-z0-9_] → '_'
  - if the first char is not a letter or '_', prefix '_'
    (table names prefix 't_' instead)

The reference rewrites whole data files line-by-line to do this
(`main.py:240-245`); on Spark it is a pure METADATA operation — we
rebuild the `StructType` with sanitized names and project/cast, so
no data is rewritten and the scan stays columnar. A strict
improvement at 100 TB: zero bytes moved.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SANITIZE_RE = re.compile(r"[^a-zA-Z0-9_]")


def sanitize_name(name: str) -> str:
    """Sanitize one identifier (field semantics: '_' prefix rule)."""
    out = _SANITIZE_RE.sub("_", name)
    if out and not (out[0].isalpha() or out[0] == "_"):
        out = "_" + out
    return out


def sanitize_table_name(name: str) -> str:
    """Table-name variant: `t_` prefix fallback (`main.py:384-387`)."""
    out = _SANITIZE_RE.sub("_", name)
    if out and not (out[0].isalpha() or out[0] == "_"):
        out = "t_" + out
    return out


def sanitize_datatype(dt: T.DataType) -> T.DataType:
    """Recursively sanitize field names inside a DataType."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    sanitize_name(f.name), sanitize_datatype(f.dataType), f.nullable, f.metadata
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(sanitize_datatype(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            sanitize_datatype(dt.keyType), sanitize_datatype(dt.valueType), dt.valueContainsNull
        )
    return dt


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column (recursively into structs/arrays) to its
    sanitized form. Nested renames ride on a struct cast, which Spark
    applies positionally — metadata-only, no shuffle, no data rewrite."""
    out = []
    for f in df.schema.fields:
        clean = sanitize_datatype(f.dataType)
        col = F.col(f"`{f.name}`")
        if clean != f.dataType:
            col = col.cast(clean)
        out.append(col.alias(sanitize_name(f.name)))
    return df.select(out)
