"""Registry-wide timing sweep — the perf-hunting companion to
selfcheck.py.

Executes every registered query at the given sf dir (noop sink — full
plan execution, nothing collected) and prints one JSON line of
per-query seconds, slowest first. Single cold pass by default; use
--min3 for warm min-of-3 on queries you are investigating (cold
numbers carry JIT/codegen/broadcast-build noise of 3-6x on
sub-second queries — r4 measured agg_approx_distinct at 7.9 s cold
vs 1.34 s warm min-of-3).

Usage:
  python tools/timing_sweep.py [sf_dir]                 # all, cold
  python tools/timing_sweep.py [sf_dir] --min3 q1 q2    # warm min-of-3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmt_dbt_spark.registry import all_queries  # noqa: E402
from gmt_dbt_spark.session import get_spark  # noqa: E402


def _run(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    min3 = "--min3" in rest
    only = [a for a in rest if not a.startswith("--")]

    spark = get_spark("timing-sweep")
    queries = all_queries()
    names = only or sorted(queries)
    res: dict[str, float | str] = {}
    for name in names:
        try:
            if min3:
                _run(queries[name], spark, sf_dir)  # warm
                res[name] = round(
                    min(_run(queries[name], spark, sf_dir) for _ in range(3)), 2
                )
            else:
                res[name] = round(_run(queries[name], spark, sf_dir), 2)
        except Exception as e:  # noqa: BLE001
            res[name] = f"ERR {str(e)[:120]}"
    ordered = dict(
        sorted(res.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9))
    )
    print(json.dumps(ordered))
    errs = [k for k, v in res.items() if isinstance(v, str)]
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
