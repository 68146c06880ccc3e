"""Dump `.explain("formatted")` for named queries to text files —
the plan-evidence companion to timing_sweep.py (r11; r10 did this ad
hoc). The dump is the PRE-execution plan (AdaptiveSparkPlan
isFinalPlan=false), which is what the committed before/after evidence
under plans/r*/ has always been.

Usage:
  python tools/plan_dump.py <outdir> <tag> <query> [query ...]
writes <outdir>/<query>_<tag>.txt for each query.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmt_dbt_spark.registry import all_queries  # noqa: E402
from gmt_dbt_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    qs = all_queries()
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
