"""t2-style correctness: every registered query with an oracle must
match DuckDB exactly at sf0.001 (the driver runs sf0.01; this is the
fast inner loop). Mirrors the driver's compare: columns sorted by
name, rows sorted, exact values — and, since r4, the driver's FETCH
PATH on BOTH sides: Spark via `.toPandas()`, DuckDB via `.df()`.
r3 proved the old collect()/fetchall() fetch hid the asymmetric-
degradation class (8 driver FAILs, all HUGEINT→float64 on the oracle
side only, all locally green); the SYMMETRIC classes (nullable
BIGINT→float64+NaN on both engines) are driver-green (win_lag_lead,
win_first_last, scan_csv_infer r1/r2 rows prove it), so both sides
must go through pandas for local green to predict driver green.

Since r5 the canonicalizer is shared with tools/selfcheck.py and
reproduces the driver's ORDER of operations too: the raw pandas
frames are row-sorted via `sort_values` BEFORE cell normalization,
so an unhashable cell (ndarray from an array-typed output column)
crashes here exactly as it crashed the driver on r4's fn_array_set."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from gmt_dbt_spark.catalog import TABLES
from gmt_dbt_spark.registry import all_oracles, all_queries
from tools.selfcheck import canon_frame

from tests.conftest import SF_DIR

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        # events carries the engine-wide null-ts event-time contract
        # (catalog.py): state it once on BOTH engines, not just Spark.
        extra = " WHERE ts IS NOT NULL" if t == "events" else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'{extra}"
        )
    return con


def test_no_hugeint_oracle_columns(oracle_con):
    """Structurally close the r3 failure class: no oracle may emit a
    column DuckDB types beyond int64 (HUGEINT/UHUGEINT/UBIGINT) — the
    driver's pandas fetch degrades those to float64 and the value
    hash can never match Spark's bigint. SUM(BIGINT) widens in
    DuckDB, so every integer aggregate must CAST back to BIGINT."""
    bad = {}
    for qid, sql in ORACLES.items():
        rel = oracle_con.sql(sql)
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")
        ]
        if hits:
            bad[qid] = hits
    assert not bad, f"oracles with int128-class output columns: {bad}"


def test_no_complex_oracle_output_columns(oracle_con):
    """Structurally close the r4 failure class (mirror of the HUGEINT
    sweep above): no oracle may emit a top-level LIST/STRUCT/MAP
    column — the driver's canonicalizer row-sorts the raw pandas
    frame and `sort_values` cannot factorize unhashable cells
    (ndarray/dict), so any complex output column is a guaranteed
    driver err regardless of values (CORRECTNESS_r04 fn_array_set).
    Serialize instead: comma-joined strings (the agg_collect
    convention) or exploded (id, idx, value) surfaces."""
    bad = {}
    for qid, sql in ORACLES.items():
        rel = oracle_con.sql(sql)
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "[" in str(t) or str(t).startswith(("STRUCT", "MAP", "UNION"))
        ]
        if hits:
            bad[qid] = hits
    assert not bad, f"oracles with complex (unsortable) output columns: {bad}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = QUERIES[name](spark, SF_DIR)
    # Spark half of the no-complex-output sweep: a top-level
    # ARRAY/MAP/STRUCT column arrives in pandas as ndarray/dict cells
    # and crashes the driver's raw-frame sort (r4 fn_array_set).
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex top-level output columns {complex_cols} — "
        "serialize (array_join / exploded surface) before returning"
    )
    if name not in ORACLES:
        assert sdf.collect() is not None  # rows-only op: runs and returns
        return
    # The driver's fetch path on BOTH sides (engine → pandas), then
    # the driver's order of operations (raw-frame sort → normalize).
    spdf = sdf.toPandas()
    odf = oracle_con.execute(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(odf.columns)
    assert len(spdf) == len(odf)
    assert canon_frame(spdf, "spark") == canon_frame(odf, "oracle")
