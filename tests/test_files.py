"""Binary scan, compaction, and the custom Python DataSource.
(Value correctness vs DuckDB is in the parametrized oracle test;
here: the file-count property and partition-parallelism contract.)"""

from __future__ import annotations

import glob
import os

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.sources.files import compact_files

from tests.conftest import SF_DIR


def _pq_files(d: str) -> list[str]:
    return glob.glob(os.path.join(d, "*.parquet"))


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    """64 fragment files → a handful of right-sized ones, zero row
    change. (The compacted count follows ceil(bytes/target): with a
    small target we get >1 file, proving it bin-packs rather than
    blindly coalescing to 1.)"""
    li = table(spark, SF_DIR, "lineitem")
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    li.repartition(64).write.parquet(frag)
    assert len(_pq_files(frag)) == 64

    total = sum(os.path.getsize(f) for f in _pq_files(frag))
    n_out = compact_files(spark, frag, out, target_bytes=max(1, total // 3))
    assert 1 < n_out <= 8
    assert len(_pq_files(out)) == n_out
    assert spark.read.parquet(out).count() == li.count()


def test_python_datasource_partition_parallelism(spark):
    """The custom source must actually split across its declared
    partitions (strided, disjoint, covering)."""
    from gmt_dbt_spark.sources.pydatasource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("n", "997")          # prime: uneven stride tails
        .option("partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    ids = [r.i for r in df.collect()]
    assert sorted(ids) == list(range(997))


def test_ndjson_writer_two_phase_commit_and_overwrite(spark, tmp_path):
    """The custom NDJSON writer must stage shards as hidden .tmp files
    and only surface them via commit()-time rename: after a write no
    tmp residue remains, every visible shard is complete, and
    overwrite mode replaces prior shards at commit time (append keeps
    them). A pre-planted stale tmp must never become visible data."""
    import glob
    import os

    from pyspark.sql import functions as F

    from gmt_dbt_spark.sources.pydatasource import NdjsonDirDataSource

    spark.dataSource.register(NdjsonDirDataSource)
    path = str(tmp_path / "nd")
    os.makedirs(path)
    # stale tmp from a hypothetical dead task: must stay invisible
    with open(os.path.join(path, ".part-99999-dead.json.tmp"), "w") as fh:
        fh.write('{"x": "truncated')

    df = spark.range(100).select(F.col("id").alias("x"))
    df.write.format("ndjson_dir").option("path", path).mode("append").save()
    first = sorted(glob.glob(os.path.join(path, "*.json")))
    assert first, "append must surface shards"
    assert spark.read.json(os.path.join(path, "*.json")).count() == 100

    # append again: old shards kept, new added
    df.write.format("ndjson_dir").option("path", path).mode("append").save()
    assert spark.read.json(os.path.join(path, "*.json")).count() == 200

    # overwrite: prior shards cleared at commit time
    spark.range(7).select(F.col("id").alias("x")).write.format(
        "ndjson_dir"
    ).option("path", path).mode("overwrite").save()
    assert spark.read.json(os.path.join(path, "*.json")).count() == 7
    # the only tmp left is the pre-planted stale one (ours are renamed)
    tmps = glob.glob(os.path.join(path, ".*.tmp"))
    assert tmps == [os.path.join(path, ".part-99999-dead.json.tmp")]
