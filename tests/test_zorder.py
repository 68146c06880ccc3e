"""Z-order layout: pruning quality pinned via parquet footer stats.
(Value correctness of the round-trip is in the parametrized oracle
test for `sink_zorder`.)"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.sources.zorder import zorder_write

from tests.conftest import SF_DIR


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per parquet file: {col: (min, max)} from footer statistics."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols if c in mins})
    return out


def _overlapping(ranges, col, lo, hi):
    return sum(1 for r in ranges if r[col][0] <= hi and r[col][1] >= lo)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """A z-ordered write must let footer stats prune point-ish range
    queries on BOTH clustered columns; a linear sort on l_partkey
    prunes only its leading column (the control: suppkey pruning is
    near-zero there). The thresholds are loose — the property under
    test is 'both dims prune', not an exact file count."""
    li = table(spark, SF_DIR, "lineitem")
    n_files = 16

    zpath = str(tmp_path / "z")
    zorder_write(li, ("l_partkey", "l_suppkey"), zpath, n_files=n_files)
    lpath = str(tmp_path / "linear")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    cols = ["l_partkey", "l_suppkey"]
    zr = _file_ranges(zpath, cols)
    lr = _file_ranges(lpath, cols)
    assert len(zr) == n_files and len(lr) == n_files

    # 5%-of-domain band per column, computed from the data itself so
    # the test is scale-factor independent.
    import pyspark.sql.functions as F

    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    # Band at 56% of the span: inside a z-quadrant, not straddling
    # the top-bit boundary at 50% (a band across it legitimately
    # touches both halves of the curve and would overstate overlap).
    pk_lo = b[0] + 56 * (b[1] - b[0]) // 100
    pk_hi = pk_lo + (b[1] - b[0]) // 40
    sk_lo = b[2] + 56 * (b[3] - b[2]) // 100
    sk_hi = sk_lo + (b[3] - b[2]) // 40

    # Control: linear layout prunes partkey hard, suppkey not at all.
    assert _overlapping(lr, "l_partkey", pk_lo, pk_hi) <= 4
    lin_sk = _overlapping(lr, "l_suppkey", sk_lo, sk_hi)
    assert lin_sk >= n_files - 1

    # Z-order: BOTH dimensions prune meaningfully (each file covers a
    # compact z-rectangle ⇒ at most ~half the files touch a narrow
    # band in either dimension), and the non-leading dimension beats
    # the linear layout outright.
    assert _overlapping(zr, "l_partkey", pk_lo, pk_hi) <= n_files // 2
    z_sk = _overlapping(zr, "l_suppkey", sk_lo, sk_hi)
    assert z_sk <= n_files // 2
    assert z_sk < lin_sk
