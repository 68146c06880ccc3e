"""Multimodal columns — SURVEY.md §2.K `multimodal_cols`.

Images/audio/video are opaque `binary` payload columns with a typed
metadata struct riding alongside (the Dremel nested-columnar pattern,
PAPERS.md). The Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow batch shapes through `mapInPandas` — is real
and tested; the actual codec decode is STUBBED (no image/audio libs
in this container): `decode_payload(..., stub=True)` produces a
deterministic fake feature vector, `stub=False` raises
NotImplementedError where a real decoder (PIL/librosa/ffmpeg) plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query

N_FEATURES = 8

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, width int, height int, "
    "features array<float>"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal frame: binary payload + metadata struct.

    (In production the payload column is read straight from parquet
    `binary`; here we derive it from text so fixtures stay textual.)
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            F.md5("text").alias("content_md5"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, stub: bool = True) -> dict:
    """Decode one payload → (width, height, features).

    stub=True: deterministic fake derived from the content digest —
    exercises every seam (serialization, schema, batching) without a
    codec. stub=False: REAL decode for WAV/BMP payloads (pure-Python
    parsers, operators/codecs.py — oracle-checked end-to-end by
    multimodal_decode_wav/bmp); other formats still raise
    NotImplementedError (JPEG/MP4 genuinely need PIL/ffmpeg).
    """
    if not stub:
        from gmt_dbt_spark.operators.codecs import decode_media

        d = decode_media(payload)  # raises NotImplementedError for JPEG/MP4
        if d["kind"] == "image/bmp":
            n_px = max(1, d["width"] * d["height"])  # 0×0 BMP is legal
            return {
                "width": d["width"],
                "height": d["height"],
                "features": [
                    round(d[k] / (255.0 * n_px), 6)
                    for k in ("sum_r", "sum_g", "sum_b")
                ],
            }
        return {
            "width": d["n_samples"],
            "height": 1,
            "features": [float(d["sample_rate"]), float(d["sumsq"] % 997)],
        }
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 16 + digest[0] % 64,
        "height": 16 + digest[1] % 64,
        "features": [round(b / 255.0, 6) for b in digest[:N_FEATURES]],
    }


def decode_batches(df: DataFrame, stub: bool = True) -> DataFrame:
    """mapInPandas decode: Arrow batches in, decoded features out.

    Per-partition batch iteration — the decode parallelizes with the
    scan and never gathers payloads to the driver; at 100 TB this is
    the pattern for any per-blob CPU work (resize, frame-sample,
    feature-extract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_payload(p, stub=stub) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


@query(
    "multimodal_cols",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       (doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text)))
         AS is_canonical
FROM documents
""",
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct + content-hash dedup flag.

    The payload round-trips through a real `binary` column; n_bytes
    and content_md5 are computed FROM the binary payload (not the
    source text), so the oracle match proves the binary path is
    lossless."""
    docs = table(spark, sf_dir, "documents")
    mm = attach_payload(docs)
    canon = (
        mm.groupBy(F.md5(F.decode(F.col("payload"), "UTF-8")).alias("fp"))
        .agg(F.min("doc_id").alias("cid"))
        .select("cid")
    )
    # canon is corpus-proportional (one row per distinct payload), so
    # no broadcast hint — AQE broadcasts while it fits and degrades to
    # a shuffled join at 100 TB (same rule as the customer dim,
    # r2 VERDICT item 2).
    return (
        mm.join(
            canon, mm.doc_id == F.col("cid"), "left"
        )
        .select(
            "doc_id",
            F.octet_length("payload").cast("bigint").alias("n_bytes"),
            F.md5(F.decode(F.col("payload"), "UTF-8")).alias("content_md5"),
            F.col("cid").isNotNull().alias("is_canonical"),
        )
    )


def _hexbyte(i: int) -> str:
    """SQL for byte ``i`` (0-indexed) of a sha256 hex digest held in
    column ``h`` — two hex chars parsed via strpos arithmetic (DuckDB
    1.0 has sha256(VARCHAR) but no hex→int cast)."""
    c1, c2 = 2 * i + 1, 2 * i + 2
    return (
        f"(16 * (strpos('0123456789abcdef', substr(h, {c1}, 1)) - 1)"
        f" + (strpos('0123456789abcdef', substr(h, {c2}, 1)) - 1))"
    )


def _decode_oracle() -> str:
    # Each feature is round(byte/255, 6) — re-expressed in exact
    # micro-units (×1e6, round, BIGINT) and comma-joined, because a
    # raw LIST output column crashes the driver's raw-frame row-sort
    # (the r4 fn_array_set class). The 6-dp double is within 1e-10 of
    # the integer after ×1e6; the Spark side's float32 round-trip is
    # within 0.06 — both round to the same exact integer.
    feats = " || ',' || ".join(
        f"CAST(round(round({_hexbyte(i)} / 255.0, 6) * 1000000) AS BIGINT)"
        for i in range(N_FEATURES)
    )
    return f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS h
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       'application/x-fake' AS mime,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(16 + {_hexbyte(0)} % 64 AS INTEGER) AS width,
       CAST(16 + {_hexbyte(1)} % 64 AS INTEGER) AS height,
       {feats} AS features_u6
FROM d
"""


@query("multimodal_decode", oracle=_decode_oracle())
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode pipeline with the deterministic stub
    codec: payload → (width, height, feature vector). Schema and
    batch plumbing are the real article; swap stub=False + a codec
    for production.

    ORACLE-HASHED since r3 (was rows-only): the stub derives
    everything from sha256 of the payload, and DuckDB's
    sha256(VARCHAR) over the same UTF-8 text replays the derivation
    exactly — hex-pair byte parsing for width/height, and all 256
    possible round(b/255, 6) float32 feature values verified
    bit-identical across engines. This pins the WHOLE Arrow seam:
    payload encoding, batch iteration, schema, float truncation.

    The feature vector itself crosses the seam as a real
    array<float> (decode_batches' declared schema), but the QUERY
    surface serializes it to exact micro-unit bigints joined with
    ',' — a raw array output column is a guaranteed driver err (the
    r4 fn_array_set lesson: pandas `sort_values` cannot factorize
    ndarray cells). Recovering the 6-dp decimal from float32 via
    round(x*1e6) is exact: float32 error ≤6e-8 relative → ≤0.06
    absolute after ×1e6."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    decoded = decode_batches(attach_payload(docs), stub=True)
    return decoded.select(
        "doc_id",
        "mime",
        "n_bytes",
        "width",
        "height",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.round(x.cast("double") * 1000000)
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("features_u6"),
    )


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, target_width int, target_height int, "
    "resized_bytes bigint"
)


def resize_payload(payload: bytes, target: int, stub: bool = True) -> dict:
    """Resize one image payload to fit in a target×target box,
    preserving aspect ratio. Stub codec: dimensions come from the
    content digest (same fake as decode_payload); the 'resized' byte
    size scales by pixel ratio — deterministic, codec-free."""
    if not stub:
        raise NotImplementedError("real resize needs PIL — not in this container")
    d = decode_payload(payload, stub=True)
    w, h = d["width"], d["height"]
    scale = min(target / w, target / h, 1.0)
    tw, th = max(1, int(w * scale)), max(1, int(h * scale))
    return {
        "width": w,
        "height": h,
        "target_width": tw,
        "target_height": th,
        "resized_bytes": max(1, int(len(payload) * (tw * th) / (w * h))),
    }


def resize_batches(df: DataFrame, target: int = 32, stub: bool = True) -> DataFrame:
    """mapInPandas resize: 1 row in → 1 row out per payload; batch
    shape identical to decode (the production pattern for any
    per-image transform)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs = [resize_payload(p, target, stub=stub) for p in pdf["payload"]]
            out = pd.DataFrame(rs)
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64").values)
            yield out

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms bigint, frame_hash string"


def sample_frames(payload: bytes, every_ms: int, stub: bool = True) -> list[dict]:
    """Sample frames from a video payload at a fixed interval.
    Stub codec: duration and per-frame hashes derive deterministically
    from the content digest; a real ffmpeg probe/extract plugs into
    the same signature."""
    if not stub:
        raise NotImplementedError("real frame sampling needs ffmpeg")
    digest = hashlib.sha256(payload).digest()
    hexdigest = digest.hex()
    duration_ms = 1000 + int.from_bytes(digest[2:4], "big") % 9000
    frames = []
    for i, ts in enumerate(range(0, duration_ms, every_ms)):
        # hash over (hex digest, ts) as TEXT — same determinism as the
        # old raw-bytes form, but expressible in any engine whose
        # sha256 takes strings (the DuckDB oracle replays it).
        fh = hashlib.sha256(f"{hexdigest}:{ts}".encode()).hexdigest()[:16]
        frames.append({"frame_idx": i, "frame_ts_ms": ts, "frame_hash": fh})
    return frames


def frame_sample_batches(
    df: DataFrame, every_ms: int = 1000, stub: bool = True
) -> DataFrame:
    """mapInPandas frame sampling: 1 payload row in → N frame rows
    out (table-function shape through the Arrow boundary) — the
    per-video fan-out pattern for caption/embedding pipelines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fr in sample_frames(payload, every_ms, stub=stub):
                    rows.append({"doc_id": int(doc_id), **fr})
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_hash"]
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


def _resize_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS h
  FROM documents WHERE doc_id < 100
),
wh AS (
  SELECT doc_id, n_bytes,
         16 + {_hexbyte(0)} % 64 AS w,
         16 + {_hexbyte(1)} % 64 AS hh
  FROM d
),
s AS (
  SELECT *, LEAST(32.0 / w, 32.0 / hh, 1.0) AS scale FROM wh
),
t AS (
  SELECT *,
         GREATEST(1, CAST(trunc(w * scale) AS INTEGER)) AS tw,
         GREATEST(1, CAST(trunc(hh * scale) AS INTEGER)) AS th
  FROM s
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(hh AS INTEGER) AS height,
       tw AS target_width,
       th AS target_height,
       GREATEST(1, CAST(trunc(CAST(n_bytes * (tw * th) AS DOUBLE) / (w * hh))
                        AS BIGINT)) AS resized_bytes
FROM t
"""


@query("multimodal_resize", oracle=_resize_oracle())
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize over the binary payload column via
    mapInPandas (stub codec, real plumbing). ORACLE-HASHED since r3:
    DuckDB replays the digest-derived dimensions and the
    scale/truncate arithmetic (both engines truncate doubles the
    IEEE way), pinning the mapInPandas 1-in-1-out batch seam."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return resize_batches(attach_payload(docs), target=32, stub=True)


def _frames_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id < 50
),
dur AS (
  SELECT doc_id, h,
         1000 + ({_hexbyte(2)} * 256 + {_hexbyte(3)}) % 9000 AS duration_ms
  FROM d
)
SELECT doc_id,
       CAST(ts // 1000 AS INTEGER) AS frame_idx,
       CAST(ts AS BIGINT) AS frame_ts_ms,
       substr(sha256(h || ':' || CAST(ts AS VARCHAR)), 1, 16) AS frame_hash
FROM dur, LATERAL (SELECT unnest(range(0, duration_ms, 1000)) AS ts) g
"""


@query("multimodal_frame_sample", oracle=_frames_oracle())
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video frame sampling (1 → N rows through mapInPandas),
    deterministic stub timeline. ORACLE-HASHED since r3: the stub
    timeline (digest-derived duration, per-frame hash over the hex
    digest + timestamp text) is replayed by DuckDB — pinning the
    1-in-N-out table-function shape through the Arrow boundary."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return frame_sample_batches(attach_payload(docs), every_ms=1000, stub=True)


# ------------------------------------------------- REAL codec queries
# (r2: WAV and BMP need no external libraries — see operators/codecs.py.
# The stub decode above remains for formats that genuinely need
# PIL/ffmpeg; these two paths are actual byte-level parsers whose
# decoded statistics the DuckDB oracle recomputes from arithmetic.)

WAV_DECODED_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "duration_ms bigint, sumsq bigint"
)


@query(
    "multimodal_decode_wav",
    oracle="""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id < 200
),
s AS (
  SELECT d.doc_id, d.n,
         ((d.doc_id * 31 + u.i * 17) % 2003) - 1001 AS v
  FROM d, LATERAL (SELECT unnest(range(d.n)) AS i) u
)
SELECT doc_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
       CAST(SUM(v * v) AS BIGINT) AS sumsq
FROM s
GROUP BY doc_id, n
""",
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-checked end-to-end: each doc's
    payload is a spec-compliant RIFF/WAVE file (PCM16) built from
    deterministic integer samples; a real chunk-walking parser
    (operators/codecs.py:parse_wav — alignment-padded, order-agnostic)
    decodes it executor-side via mapInPandas, and the emitted stats
    (rate, channels, sample count, duration, energy sum-of-squares)
    are recomputed INDEPENDENTLY by the oracle from range()
    arithmetic — a byte-layout bug in either the writer or the parser
    breaks the hash. The 100 TB shape is the stub pipeline's: Arrow
    batches per partition, payloads never gather to the driver."""
    from gmt_dbt_spark.operators.codecs import decode_media, wav_payload_for

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = decode_media(wav_payload_for(int(doc_id)))
                rows.append(
                    (
                        int(doc_id),
                        d["sample_rate"],
                        d["n_channels"],
                        d["n_samples"],
                        # duration from the DECODED rate, not a module
                        # constant — the emitted stats must all come
                        # from the parse itself
                        d["n_samples"] * 1000 // d["sample_rate"],
                        d["sumsq"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "sumsq",
                ],
            )

    return docs.mapInPandas(run, WAV_DECODED_SCHEMA)


BMP_DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, sum_r bigint, sum_g bigint, "
    "sum_b bigint"
)


@query(
    "multimodal_decode_bmp",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
  FROM documents WHERE doc_id < 200
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id + 7 * x.i + 13 * y.i) % 256 AS r,
         (d.doc_id + 7 * x.i + 13 * y.i + 29) % 256 AS g,
         (d.doc_id + 7 * x.i + 13 * y.i + 58) % 256 AS b
  FROM d,
       LATERAL (SELECT unnest(range(d.w)) AS i) x,
       LATERAL (SELECT unnest(range(d.h)) AS i) y
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id, w, h
""",
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-checked end-to-end: each doc's
    payload is a 24-bit BMP (bottom-up rows, BGR, 4-byte stride)
    built from deterministic pixels; a real header/stride-honoring
    parser (operators/codecs.py:parse_bmp) decodes it executor-side,
    and the per-channel pixel sums are recomputed INDEPENDENTLY by
    the oracle over range(w)×range(h) — stride or channel-order bugs
    in writer or parser break the hash."""
    from gmt_dbt_spark.operators.codecs import bmp_payload_for, decode_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = decode_media(bmp_payload_for(int(doc_id)))
                rows.append(
                    (
                        int(doc_id),
                        d["width"],
                        d["height"],
                        d["sum_r"],
                        d["sum_g"],
                        d["sum_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return docs.mapInPandas(run, BMP_DECODED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, zero_crossings bigint, "
    "peak_abs bigint, n_clipped bigint, rms double"
)


def audio_features(samples) -> tuple:
    """(n, zero_crossings, peak_abs, n_clipped, rms) from a PCM
    sample vector. Module-level (not closed over) so executors
    re-import it cleanly and property tests can fuzz it directly;
    int64-widens before products (int16 pairwise products wrap)."""
    import math

    import numpy as np

    v = np.asarray(samples).astype(np.int64)
    sumsq = int(np.dot(v, v))
    return (
        len(v),
        int(np.count_nonzero(v[1:] * v[:-1] < 0)),
        int(np.max(np.abs(v))) if len(v) else 0,
        int(np.count_nonzero(np.abs(v) >= 1000)),
        math.sqrt(sumsq / len(v)) if len(v) else 0.0,
    )


@query(
    "multimodal_audio_features",
    oracle="""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id < 200
),
s AS (
  SELECT d.doc_id, d.n, u.i,
         ((d.doc_id * 31 + u.i * 17) % 2003) - 1001 AS v
  FROM d, LATERAL (SELECT unnest(range(d.n)) AS i) u
),
w AS (
  SELECT doc_id, n, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(COUNT(CASE WHEN v * pv < 0 THEN 1 END) AS BIGINT)
         AS zero_crossings,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
       CAST(COUNT(CASE WHEN ABS(v) >= 1000 THEN 1 END) AS BIGINT)
         AS n_clipped,
       sqrt(CAST(SUM(v * v) AS DOUBLE) / n) AS rms
FROM w
GROUP BY doc_id, n
""",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction over decoded PCM — the
    signal-level stats an audio-curation pipeline gates on: zero-
    crossing count (noisiness/voicedness proxy), peak amplitude,
    clipping count (|s| at the rail), and RMS energy. Payloads are
    spec-compliant WAV files round-tripped through the real parser
    (codecs.py:parse_wav) executor-side via mapInPandas; every
    feature is recomputed INDEPENDENTLY by the oracle from the
    generator's range() arithmetic — parser misalignment, sign, or
    off-by-one sample bugs all break the hash.

    Exactness: crossings/peak/clip are integers over int64-widened
    samples (int16 products would wrap); RMS is one exact int→double
    conversion, one division, one IEEE sqrt — deterministic on both
    engines. Scale shape: Arrow batches per partition, samples never
    leave the executor, output is 6 scalars per blob."""
    from gmt_dbt_spark.operators.codecs import parse_wav, wav_payload_for

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                v = parse_wav(wav_payload_for(int(doc_id)))["samples"]
                rows.append((int(doc_id), *audio_features(v)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "zero_crossings",
                    "peak_abs",
                    "n_clipped",
                    "rms",
                ],
            )

    return docs.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


IMAGE_GRADIENT_SCHEMA = (
    "doc_id bigint, width int, height int, grad_h bigint, grad_v bigint, "
    "pix_sum bigint"
)


@query(
    "multimodal_image_gradient",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
  FROM documents WHERE doc_id < 200
),
gh AS (
  SELECT d.doc_id,
         SUM(ABS(((d.doc_id + 7*(x.i+1) + 13*y.i + 29*c.i) % 256)
               - ((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256))) AS grad_h
  FROM d,
       LATERAL (SELECT unnest(range(d.w - 1)) AS i) x,
       LATERAL (SELECT unnest(range(d.h)) AS i) y,
       LATERAL (SELECT unnest(range(3)) AS i) c
  GROUP BY d.doc_id
),
gv AS (
  SELECT d.doc_id,
         SUM(ABS(((d.doc_id + 7*x.i + 13*(y.i+1) + 29*c.i) % 256)
               - ((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256))) AS grad_v
  FROM d,
       LATERAL (SELECT unnest(range(d.w)) AS i) x,
       LATERAL (SELECT unnest(range(d.h - 1)) AS i) y,
       LATERAL (SELECT unnest(range(3)) AS i) c
  GROUP BY d.doc_id
),
ps AS (
  SELECT d.doc_id,
         SUM((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256) AS pix_sum
  FROM d,
       LATERAL (SELECT unnest(range(d.w)) AS i) x,
       LATERAL (SELECT unnest(range(d.h)) AS i) y,
       LATERAL (SELECT unnest(range(3)) AS i) c
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(gh.grad_h AS BIGINT) AS grad_h,
       CAST(gv.grad_v AS BIGINT) AS grad_v,
       CAST(ps.pix_sum AS BIGINT) AS pix_sum
FROM d
JOIN gh USING (doc_id) JOIN gv USING (doc_id) JOIN ps USING (doc_id)
""",
)
def multimodal_image_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction over decoded pixels: horizontal
    and vertical L1 gradient energy (the blur/flat-image and
    screenshot-vs-photo discriminator an image-curation gate uses)
    plus total brightness — computed from pixels that round-trip
    through the actual 24-bit BMP parser (stride, bottom-up rows,
    BGR), so a row-order or channel-order bug in the codec flips the
    gradients and breaks the hash. The oracle recomputes everything
    from the generator's modular arithmetic over range(w)×range(h)×3.

    Exactness: uint8 pixels widen to int64 before differencing (the
    uint8 wraparound trap); all features are pure integers. Scale
    shape: mapInPandas per-partition batches, pixels never leave the
    executor, 6 scalars out per image."""
    from gmt_dbt_spark.operators.codecs import bmp_payload_for, parse_bmp

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                px = parse_bmp(bmp_payload_for(int(doc_id))).astype(np.int64)
                h, w, _ = px.shape
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        int(np.abs(np.diff(px, axis=1)).sum()),
                        int(np.abs(np.diff(px, axis=0)).sum()),
                        int(px.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "grad_h", "grad_v", "pix_sum",
                ],
            )

    return docs.mapInPandas(run, IMAGE_GRADIENT_SCHEMA)


IMAGE_HISTOGRAM_SCHEMA = (
    "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint, n_pix bigint"
)


@query(
    "multimodal_image_histogram",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
  FROM documents WHERE doc_id < 200
)
SELECT d.doc_id,
       CAST(SUM(CASE WHEN ((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256) // 64 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS b0,
       CAST(SUM(CASE WHEN ((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256) // 64 = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS b1,
       CAST(SUM(CASE WHEN ((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256) // 64 = 2
                THEN 1 ELSE 0 END) AS BIGINT) AS b2,
       CAST(SUM(CASE WHEN ((d.doc_id + 7*x.i + 13*y.i + 29*c.i) % 256) // 64 = 3
                THEN 1 ELSE 0 END) AS BIGINT) AS b3,
       COUNT(*) AS n_pix
FROM d,
     LATERAL (SELECT unnest(range(d.w)) AS i) x,
     LATERAL (SELECT unnest(range(d.h)) AS i) y,
     LATERAL (SELECT unnest(range(3)) AS i) c
GROUP BY d.doc_id
""",
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intensity histogram (4 bands of 64) over REAL decoded BMP
    pixels — the exposure/contrast profile an image-curation gate
    bins on (all-dark, blown-out, low-dynamic-range rejects). Pixels
    round-trip through the actual 24-bit BMP parser; the oracle
    recomputes the bands from the generator's modular arithmetic, so
    a codec stride/row-order bug that permutes pixels would still
    hash right (histograms are order-free) but any VALUE corruption
    breaks it — complementing multimodal_image_gradient, whose
    order-sensitive features pin the layout.

    Scale shape: mapInPandas per-partition Arrow batches; one
    np.bincount per image; 5 scalars out per blob — pixels never
    leave the executor."""
    from gmt_dbt_spark.operators.codecs import bmp_payload_for, parse_bmp

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                px = parse_bmp(bmp_payload_for(int(doc_id))).astype(np.int64)
                bands = np.bincount(px.ravel() // 64, minlength=4)
                rows.append(
                    (
                        int(doc_id),
                        int(bands[0]),
                        int(bands[1]),
                        int(bands[2]),
                        int(bands[3]),
                        int(px.size),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3", "n_pix"]
            )

    return docs.mapInPandas(run, IMAGE_HISTOGRAM_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = (
    "doc_id bigint, n_out bigint, dec_sum bigint, dec_min bigint, dec_max bigint"
)


@query(
    "multimodal_audio_resample",
    oracle="""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id < 200
),
g AS (
  SELECT d.doc_id,
         ((((d.doc_id * 31 + (4 * u.g + 0) * 17) % 2003) - 1001)
        + (((d.doc_id * 31 + (4 * u.g + 1) * 17) % 2003) - 1001)
        + (((d.doc_id * 31 + (4 * u.g + 2) * 17) % 2003) - 1001)
        + (((d.doc_id * 31 + (4 * u.g + 3) * 17) % 2003) - 1001)
        + 4004) // 4 - 1001 AS mean_v
  FROM d, LATERAL (SELECT unnest(range(d.n // 4)) AS g) u
)
SELECT doc_id,
       COUNT(*) AS n_out,
       CAST(SUM(mean_v) AS BIGINT) AS dec_sum,
       MIN(mean_v) AS dec_min,
       MAX(mean_v) AS dec_max
FROM g GROUP BY doc_id
""",
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4x decimation resample over REAL decoded PCM: each output
    sample is the boxcar mean of 4 consecutive input samples — the
    rate-reduction step an audio-curation pipeline runs before
    feature extraction (16 kHz -> 4 kHz). Samples round-trip through
    the actual RIFF parser; the oracle recomputes the decimated
    stream from the generator's modular arithmetic.

    Exactness: the frame mean biases the sum non-negative before
    integer division ((s + 4004) div 4 - 1001) so floor-vs-truncate
    division semantics can't diverge between numpy and SQL on
    negative sums. Frame counts are always whole (n is a multiple of
    4 by construction; a production resampler pads the tail).

    Scale shape: mapInPandas per-partition Arrow batches; one reshape
    + mean per blob; 4 scalars out per clip, samples never leave the
    executor."""
    from gmt_dbt_spark.operators.codecs import parse_wav, wav_payload_for

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                sm = parse_wav(wav_payload_for(int(doc_id)))["samples"].astype(
                    np.int64
                )
                frames = sm.reshape(-1, 4).sum(axis=1)
                dec = (frames + 4004) // 4 - 1001
                rows.append(
                    (
                        int(doc_id),
                        int(dec.size),
                        int(dec.sum()),
                        int(dec.min()),
                        int(dec.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_out", "dec_sum", "dec_min", "dec_max"]
            )

    return docs.mapInPandas(run, AUDIO_RESAMPLE_SCHEMA)



def _hamming_band_pairs(sig: DataFrame, hash_col: str) -> DataFrame:
    """Shared Manku banding + Hamming-verify plan for the two
    payload-fingerprint dedups (phash / audio fingerprint): band the
    56-bit signature into 4×14-bit pieces, self-join on (band, piece)
    (pigeonhole-exact for Hamming ≤ 3), verify with bit_count(xor).
    ONE implementation (r6 review — two hand-maintained copies of the
    banding constants would silently diverge on the next width
    change). ``sig`` must carry (doc_id, <hash_col>) and be safe to
    read four times (checkpoint it)."""
    pieces = F.array(
        *[
            F.shiftright(hash_col, b * 14).bitwiseAND(F.lit(16383))
            for b in range(4)
        ]
    )
    banded = sig.select("doc_id", F.posexplode(pieces).alias("band", "piece"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.piece") == F.col("r.piece"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col(hash_col).alias("ha"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col(hash_col).alias("hb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


PHASH_SCHEMA = "doc_id bigint, phash bigint"

_PHASH_ORACLE = """
WITH d AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
  FROM documents WHERE doc_id < 200
),
g AS (
  -- grayscale (3-channel sum, exact integer) sampled on the 8x8
  -- dHash grid: gx-th column = pixel x = (gx*w)//8, same for rows
  SELECT d.doc_id, xi.i AS gx, yj.i AS gy,
         ((d.doc_id + 7*((xi.i*d.w)//8) + 13*((yj.i*d.h)//8)) % 256
        + (d.doc_id + 7*((xi.i*d.w)//8) + 13*((yj.i*d.h)//8) + 29) % 256
        + (d.doc_id + 7*((xi.i*d.w)//8) + 13*((yj.i*d.h)//8) + 58) % 256)
           AS gray
  FROM d,
       LATERAL (SELECT unnest(range(8)) AS i) xi,
       LATERAL (SELECT unnest(range(8)) AS i) yj
),
hbits AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN b.gray > a.gray
                  THEN (CAST(1 AS BIGINT) << (a.gy * 7 + a.gx))
                  ELSE 0 END) AS BIGINT) AS hsum
  FROM g a JOIN g b
    ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
  WHERE a.gx <= 6
  GROUP BY a.doc_id
),
vbits AS (
  -- vertical gradients down sampled column 0, bits 56..62: a row
  -- flip reverses the comparison chain, so these bits survive a
  -- flip only under an anti-symmetric tie pattern (measured: never,
  -- on any of the 48 fixture geometry classes)
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN b.gray > a.gray
                  THEN (CAST(1 AS BIGINT) << (56 + a.gy))
                  ELSE 0 END) AS BIGINT) AS vsum
  FROM g a JOIN g b
    ON a.doc_id = b.doc_id AND a.gx = 0 AND b.gx = 0
   AND b.gy = a.gy + 1
  WHERE a.gy <= 6
  GROUP BY a.doc_id
),
sig AS (
  SELECT h.doc_id, CAST(h.hsum + v.vsum AS BIGINT) AS phash
  FROM hbits h JOIN vbits v ON h.doc_id = v.doc_id
),
banded AS (
  SELECT doc_id, bb.i AS band, (phash >> (bb.i * 14)) & 16383 AS piece
  FROM sig, LATERAL (SELECT unnest(range(4)) AS i) bb
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.piece = r.piece AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(sa.phash, sb.phash)) AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.phash, sb.phash)) <= 3
"""


@query("multimodal_phash_dedup", oracle=_PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup — the multimodal sibling of
    `dedup_simhash`: each image's REAL decoded pixels (the 24-bit BMP
    parser) reduce to a 56-bit dHash (8 sampled rows × 7 horizontal
    gradient-sign comparisons on an 8×8 nearest-neighbor grid —
    grayscale = exact integer 3-channel sum, grid index = (i·w)//8,
    no float resampling), then Manku banding (4×14-bit pieces,
    pigeonhole-exact for Hamming ≤ 3) finds candidate pairs without
    an all-pairs join — only (doc_id, 14-bit piece) rows ever
    shuffle, never pixels.

    This op pins IMAGE ORIENTATION, class-complete since r7: beyond
    the 56 horizontal-gradient bits (whose flip sensitivity depends
    on the generator's mod-256 wraparound — 19/48 geometry classes),
    bits 56..62 hash the 7 VERTICAL gradient signs down sampled
    column 0. A row flip reverses that comparison chain (and the
    non-symmetric (j·h)//8 grid resamples different rows), so the
    hash survives a flip only under an anti-symmetric tie pattern —
    measured: 48/48 geometry classes and 200/200 fixture images are
    flip-sensitive (test_phash_is_orientation_sensitive), so a
    bottom-up/top-down parser bug (which the order-free
    sum/histogram oracles cannot see) can never pass the parity
    check. The oracle recomputes the grid independently from the
    pixel generator's modular arithmetic and replays banding +
    Hamming verify in SQL (`bit_count(xor(...))`). Banding still
    covers bits 0..55 only — pigeonhole stays exact for the ≤3
    threshold over the full 63-bit hash, because ≤3 total differing
    bits means ≤3 differing bits in any subset.

    Scale shape: mapInPandas per-partition Arrow batches emit 8 bytes
    per image; banding join + verify is the dedup_simhash plan. At
    production scale the hot-bucket cap (dedup.py:SIMHASH_BUCKET_CAP)
    applies identically — the fixture's 24 geometry classes keep
    buckets tiny, so this surface stays uncapped by design."""
    from gmt_dbt_spark.operators.codecs import bmp_payload_for, parse_bmp

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                px = parse_bmp(bmp_payload_for(int(doc_id))).astype(np.int64)
                h, w, _ = px.shape
                gray = px.sum(axis=2)
                xs = [(i * w) // 8 for i in range(8)]
                ys = [(j * h) // 8 for j in range(8)]
                ph = 0
                for j in range(8):
                    for i in range(7):
                        if gray[ys[j], xs[i + 1]] > gray[ys[j], xs[i]]:
                            ph |= 1 << (j * 7 + i)
                # bits 56..62: vertical gradients down sampled column
                # 0 — the class-complete orientation pin (r7)
                for j in range(7):
                    if gray[ys[j + 1], xs[0]] > gray[ys[j], xs[0]]:
                        ph |= 1 << (56 + j)
                rows.append((int(doc_id), ph))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    sig = docs.mapInPandas(run, PHASH_SCHEMA).localCheckpoint(eager=True)
    return _hamming_band_pairs(sig, "phash")


AUDIO_FP_SCHEMA = "doc_id bigint, afp bigint"

_AUDIO_FP_ORACLE = """
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id < 200
),
s AS (
  SELECT d.doc_id,
         (i.i * 57) // d.n AS k,
         ((d.doc_id * 31 + i.i * 17) % 2003 - 1001) AS v
  FROM d, LATERAL (SELECT unnest(range(d.n)) AS i) i
),
e AS (
  SELECT doc_id, k, CAST(SUM(v * v) AS BIGINT) AS energy
  FROM s GROUP BY doc_id, k
),
sig AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN b.energy > a.energy
                  THEN (CAST(1 AS BIGINT) << CAST(a.k AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS afp
  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.k = a.k + 1
  WHERE a.k <= 55
  GROUP BY a.doc_id
),
banded AS (
  SELECT doc_id, bb.i AS band, (afp >> (bb.i * 14)) & 16383 AS piece
  FROM sig, LATERAL (SELECT unnest(range(4)) AS i) bb
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.piece = r.piece AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(sa.afp, sb.afp)) AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.afp, sb.afp)) <= 3
"""


@query("multimodal_audio_fingerprint", oracle=_AUDIO_FP_ORACLE)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic-fingerprint audio near-dup — the WAV sibling of
    `multimodal_phash_dedup` (chromaprint's shape, integer-exact):
    each clip's REAL decoded PCM16 samples (the chunk-walking RIFF
    parser) reduce to a 56-bit energy-contour hash — 57 frames
    (sample i → frame (i·57)//n, the per-sample formula both engines
    evaluate identically), exact int64 energy per frame, bit k =
    energy rises from frame k to k+1 — then the same 4×14-bit Manku
    banding + `bit_count(xor)` Hamming ≤ 3 verify as the image path.
    Only 8-byte fingerprints shuffle; samples never leave the
    mapInPandas batch.

    Energy contours are the RIGHT invariant for near-dup audio: they
    survive the re-encodes and level changes that break byte-level
    content hashes (multimodal_content_dedup), while staying pure
    integer — no FFT, no float, so DuckDB replays the ENTIRE chain
    (waveform → framing → energies → bits → banding → verify) from
    the sample generator's modular arithmetic."""
    from gmt_dbt_spark.operators.codecs import parse_wav, wav_payload_for

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                s = parse_wav(wav_payload_for(int(doc_id)))["samples"].astype(
                    np.int64
                )
                n = s.size
                k = (np.arange(n) * 57) // n
                e = np.zeros(57, dtype=np.int64)
                np.add.at(e, k, s * s)
                fp = 0
                for i in range(56):
                    if e[i + 1] > e[i]:
                        fp |= 1 << i
                rows.append((int(doc_id), fp))
            yield pd.DataFrame(rows, columns=["doc_id", "afp"])

    sig = docs.mapInPandas(run, AUDIO_FP_SCHEMA).localCheckpoint(eager=True)
    return _hamming_band_pairs(sig, "afp")
