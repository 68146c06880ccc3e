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
must go through pandas for local green to predict driver green."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pytest

from gmt_dbt_spark.catalog import TABLES
from gmt_dbt_spark.registry import all_oracles, all_queries

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


def _norm(v, side):
    # All three pandas missing markers (None / NaN / NaT) normalize
    # to the same null: which marker appears is a dtype artifact of
    # each engine's pandas mapping, not a value difference — see
    # tools/selfcheck.py::_norm_cell for the full rationale.
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if type(v).__name__ == "NaTType":
        return None
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        # The driver's value hash is TEXT-based: BIGINT 1863 and DOUBLE
        # 1863.0 must NOT compare equal here (r1 fn_math lesson) — repr
        # preserves the int-vs-float distinction exactly as the hash does.
        return repr(v)
    # Temporal: compare by instant. DuckDB DATE arrives as a midnight
    # pandas Timestamp while Spark collect() yields datetime.date —
    # fn_date/fn_cast are driver-green with DATE outputs, so the
    # driver compares these equal. datetime before date (subclass).
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat() + "T00:00:00"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if type(v).__name__ == "Decimal":
        # Spark-side only since the pandas fetch: the driver hashes
        # Spark decimals as exact text; DuckDB decimals became float64
        # above, so a raw decimal output column fails unless BOTH
        # engines agree on the rendering (r2 fn_cast lesson).
        return str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x, side) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalar (after ndarray!)
        return _norm(v.item(), side)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x, side)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _tbl(rows, cols, side):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i], side) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert sdf.collect() is not None  # rows-only op: runs and returns
        return
    # The driver's fetch path on BOTH sides: engine → pandas → values.
    spdf = sdf.toPandas()
    scols = list(spdf.columns)
    srows = list(spdf.itertuples(index=False, name=None))
    odf = oracle_con.execute(ORACLES[name]).df()
    ocols = list(odf.columns)
    orows = list(odf.itertuples(index=False, name=None))
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _tbl(srows, scols, "spark") == _tbl(orows, ocols, "oracle")
