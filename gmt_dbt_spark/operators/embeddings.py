"""Embedding-column utilities: exact per-class centroids and int8
quantization.

[ext] — BASELINE.json north star (similarity search / multimodal
columns). The `embeddings` table models the `array<float>` column a
training pipeline carries next to every document; these ops are the
two standard maintenance passes over it: class centroids (the
IVF coarse codebook / nearest-class-mean classifier input) and
symmetric int8 quantization (4× memory cut before ANN serving).

Scale shape: the centroid is a posexplode → (label, dim)-keyed
aggregate — 64 rows per input row, but the shuffle carries only
(label, dim, partial-sum) after map-side combine, i.e. |labels|×dims
cells per map task regardless of row count. Quantization is pure
scan-side lambda algebra (transform/aggregate inside codegen): zero
shuffles, no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table

from gmt_dbt_spark.registry import query

# Components are summed in integer MICRO-UNITS (floor of x·10^6 as
# bigint): float→decimal casts round the last ulp differently across
# engines (measured — Spark and DuckDB disagree on ~2% of float32
# components at scale 6), while double multiply + floor are both
# exactly specified by IEEE-754, and bigint sums are order-free.


@query(
    "embed_centroid",
    oracle="""
SELECT label,
       CAST(s.i AS INTEGER) AS dim,
       (CAST(SUM(CAST(floor(CAST(embedding[s.i + 1] AS DOUBLE) * 1000000.0)
                      AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(*) AS mean_val,
       COUNT(*) AS n_vecs
FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS i) s
GROUP BY label, s.i
""",
)
def embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label centroid: explode components to (label, dim)
    cells, sum each cell in integer micro-units (order-free — float
    sums would be shuffle-order-dependent, and float→decimal casts
    round differently across engines), divide by the class count.
    Output is |labels| × dims rows — bounded by the model, not the
    data."""
    e = table(spark, sf_dir, "embeddings")
    cells = e.select("label", F.posexplode("embedding").alias("dim", "val"))
    micro = F.floor(F.col("val").cast("double") * 1000000.0).cast("bigint")
    return cells.groupBy("label", "dim").agg(
        ((F.sum(micro).cast("double") / 1000000.0) / F.count("*")).alias("mean_val"),
        F.count("*").alias("n_vecs"),
    )


@query(
    "embed_quantize",
    oracle="""
WITH m AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS mx
  FROM embeddings
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS qv
  FROM m WHERE mx > 0
)
SELECT vec_id,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS BIGINT) AS q_min,
       CAST(list_max(qv) AS BIGINT) AS q_max
FROM q
""",
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale 127/max|x|,
    components floored to integers — floor instead of round because
    round's tie mode differs across engines while floor is exact
    IEEE. Entirely lambda algebra (transform/aggregate) inside
    whole-stage codegen: the 4× memory cut costs zero shuffles and
    never leaves the JVM. Output summarises each quantized vector
    (sum/min/max) — integer-exact on both engines."""
    e = table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast("double")
    scaled = e.select("vec_id", "embedding", mx.alias("mx")).filter(F.col("mx") > 0)
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * (F.lit(127.0) / F.col("mx"))).cast(
            "bigint"
        ),
    )
    q = scaled.select("vec_id", qv.alias("qv"))
    return q.select(
        "vec_id",
        F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, b: a + b).alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    )
