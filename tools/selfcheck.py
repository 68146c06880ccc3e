"""Self-check harness mirroring the driver's t2 correctness gate.

For every registered query: run the Spark builder and the DuckDB
oracle on the same sf directory, sort columns by name, sort rows, and
compare values EXACTLY (the driver hashes values, so near-equal is
not equal). Reports per-query PASS/FAIL with a diff sample.

Usage: python tools/selfcheck.py [sf_dir] [query_id ...]
"""

from __future__ import annotations

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

    Decimals are handled ASYMMETRICALLY to mirror the driver (r2
    fn_cast lesson): Spark decimals hash as exact text, DuckDB
    decimals pass through the driver's pandas fetch and become
    float64 — so a raw decimal output column must fail here unless
    both renderings agree."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # timestamps/dates → ISO string
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if type(v).__name__ == "Decimal":
        return str(v) if side == "spark" else repr(float(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x, side) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x, side)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _table(rows, cols, side):
    """→ sorted list of tuples with columns ordered by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i], side) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = all_queries()
    oracles = all_oracles()
    names = only or sorted(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures.append(name)
            continue
        st, ot = _table(srows, scols, "spark"), _table(orows, ocols, "oracle")
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
