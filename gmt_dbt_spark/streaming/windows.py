"""Event-time window aggregations — SURVEY.md §2.J (all [ext]).

Tumbling / sliding / session windows over the `events` table.
Registered as batch queries (Structured Streaming and batch share
window semantics exactly — same `window`/`session_window` functions,
same results on the same input), which is what makes them
oracle-checkable; the *streaming* execution of the same plans (file
source → watermark → memory sink) is exercised in
tests/test_streaming.py.

Value sums go through DECIMAL (exprs.py) for bit-exact compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.exprs import dsum
from gmt_dbt_spark.registry import query


@query(
    "stream_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL '10 minutes', ts) AS wstart,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS wend,
       event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window × event_type. Spark's window origin
    (epoch) and DuckDB's time_bucket origin land on the same 10-min
    grid, so the buckets agree exactly."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "stream_sliding",
    oracle="""
WITH e AS (SELECT *, time_bucket(INTERVAL '5 minutes', ts) AS b5 FROM events),
     w AS (SELECT unnest([b5, b5 - INTERVAL '5 minutes']) AS wstart, event_type, value
           FROM e)
SELECT wstart,
       wstart + INTERVAL '10 minutes' AS wend,
       event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total
FROM w
GROUP BY 1, 2, 3
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min size, 5 min slide): every event lands
    in exactly two windows; the oracle expands the two candidate
    starts per event explicitly."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "stream_session",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         -- STRICT > (r3 adversarial finding): Spark's session_window
         -- MERGES an event arriving at exactly prev_ts + gap (touching
         -- windows coalesce), so only a gap STRICTLY greater than the
         -- duration starts a new session. The >= spelling diverged on
         -- events spaced exactly 30 minutes apart — a cadence the
         -- random-timestamp fixture never produced. Matches
         -- agg_session_window's oracle and events_sessionize's
         -- gap > SESSION_GAP_S.
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
 s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total
FROM s
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user. Spark merges events
    while ts <= prev_end (= prev_ts + gap — touching windows
    coalesce); the oracle's gaps-and-islands uses the matching
    STRICT `> gap` break condition, and session_end = last_ts + gap
    on both sides."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )
