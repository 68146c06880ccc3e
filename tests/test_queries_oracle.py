"""t2-style correctness: every registered query with an oracle must
match DuckDB exactly at sf0.001 (the driver runs sf0.01; this is the
fast inner loop). Mirrors the driver's compare: columns sorted by
name, rows sorted, exact values."""

from __future__ import annotations

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
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v, side):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if type(v).__name__ == "Decimal":
        # Emulate the driver ASYMMETRICALLY (r2 fn_cast lesson): the
        # driver hashes Spark decimals as their exact text
        # ('112946.260000') but fetches DuckDB results through pandas,
        # where DECIMAL becomes float64 ('112946.26').  Normalizing
        # both sides the same way (r1–r2 did str() on both) hides that
        # divergence and local green stops predicting driver green — a
        # raw decimal output column must FAIL here unless both engines
        # agree on the float rendering too.
        return str(v) if side == "spark" else repr(float(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x, side) for x in v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, (int, float)):
        # The driver's value hash is TEXT-based: BIGINT 1863 and DOUBLE
        # 1863.0 must NOT compare equal here (r1 fn_math lesson) — repr
        # preserves the int-vs-float distinction exactly as the hash does.
        return repr(v)
    return v


def _tbl(rows, cols, side):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i], side) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = QUERIES[name](spark, SF_DIR)
    srows, scols = sdf.collect(), sdf.columns
    if name not in ORACLES:
        assert srows is not None  # rows-only op: runs and returns
        return
    cur = oracle_con.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _tbl(srows, scols, "spark") == _tbl(orows, ocols, "oracle")
