"""Sessionization + event-transition analytics over the event stream.

[surface]/[ext] — gaps-and-islands sessionization and next-event
transition matrices are the two canonical clickstream rollups any
BigQuery-hosted dbt project materializes daily (the reference hosts
arbitrary model SQL, `dbt_project.yml:11`; its closest analogue is
the Yelp checkin time series). Batch twins of the §2.J streaming
surface: `stream_session` assigns windows with a state store, this
assigns them with one analytic-window pass.

Scale shape: both ops shuffle ONCE on user_id; the window functions
and the follow-up groupBy reuse that partitioning (no second
exchange for the session rollup — Catalyst sees the child ordering
and the aggregate runs partial→final on the windowed output).
Per-user state is one row of lag/lead lookback, never the event
list, so a power user with 10M events streams through the window
operator without materializing anything user-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query

# A session ends after 30 minutes of inactivity — the industry-default
# gap, and the same literal `stream_session` passes to session_window.
SESSION_GAP_S = 1800


@query(
    "events_sessionize",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       date_diff('second', MIN(ts), MAX(ts)) AS duration_s,
       CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases
FROM s GROUP BY user_id, session_seq
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event exceeds 30 minutes. lag() marks session
    starts, a running SUM numbers them, and one groupBy rolls each
    session up — the batch twin of `stream_session` (which the state
    store computes incrementally). (event_id breaks ts ties so the
    island numbering is a total order on both engines.)"""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0).alias("is_new"),
        F.col("event_id"),
    )
    sessioned = marked.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_seq"),
    )
    return sessioned.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )


@query(
    "events_transitions",
    oracle="""
WITH p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
n AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM p WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p_next
FROM n
""",
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix: per-user ordered event
    pairs via lead(), counted per (from, to), normalized to a
    transition probability within each from-state. Output is bounded
    by |event_types|² regardless of stream size; the probability is
    one bigint/bigint double division (deterministic, both engines
    correctly-rounded IEEE)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / total.cast("double")).alias("p_next"),
    )


# events.value is money-like (2 dp, < 10^3), so DECIMAL(9,6) casts are
# exact and per-row squares stay inside DuckDB's 18-digit product class.
_DV = "DECIMAL(9,6)"


@query(
    "events_anomaly_zscore",
    oracle=f"""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(value AS {_DV})) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(value AS {_DV}) * CAST(value AS {_DV}))
              AS VARCHAR) AS DOUBLE) AS sxx
  FROM events GROUP BY event_type
),
s AS (
  SELECT event_type, n, (sx / n) AS mean,
         sqrt((sxx / n) - ((sx / n) * (sx / n))) AS std
  FROM m
)
SELECT e.event_type, s.mean, s.std,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(count_if(abs(e.value - s.mean) > (3.0 * s.std)) AS BIGINT)
         AS n_outliers
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type, s.mean, s.std
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: exact decimal
    moments (n, Σv, Σv²) → mean/σ in correctly-rounded doubles →
    broadcast the per-type stats back over the stream and count
    |v − μ| > 3σ. Two passes over events, both partial-aggregable;
    the stats side is |event_types| rows so the second pass's join
    is a broadcast — no shuffle of the event stream itself. Same
    moment discipline as agg_corr: decimal sums are order-free, and
    every double op afterwards is parenthesized identically on both
    engines, so the 3σ boundary lands bit-identically."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast(_DV)
    from gmt_dbt_spark.exprs import dec2dbl

    m = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        dec2dbl(F.sum(v)).alias("sx"),
        dec2dbl(F.sum(v * v)).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    stats = m.select(
        "event_type",
        mean.alias("mean"),
        F.sqrt((F.col("sxx") / F.col("n")) - (mean * mean)).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "mean", "std")
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(
                F.abs(F.col("value") - F.col("mean")) > (3.0 * F.col("std"))
            ).alias("n_outliers"),
        )
    )


@query(
    "events_path_analysis",
    oracle="""
WITH p AS (
  SELECT user_id,
         -- COALESCE: array_to_string of an all-NULL/empty list is
         -- NULL in DuckDB where Spark concat_ws gives '' (mid-list
         -- NULLs skip identically on both engines)
         COALESCE(array_to_string(list(event_type ORDER BY ts, event_id)[1:5],
                                  '>'), '') AS path
  FROM events GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM p GROUP BY path
""",
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User path analysis: each user's first 5 events as an ordered
    'view>click>...' path string, counted per distinct path — the
    behavioral-flow report (which journeys are common, where do they
    diverge). Determinism: rank on (ts, event_id) so ties can't
    reorder across engines. Scale shape: the rank window prunes to
    ≤ 5 rows per user BEFORE any collection (WindowGroupLimit pushes
    the cut into the shuffle read — a plain collect_list-then-slice
    would buffer a heavy user's ENTIRE event history in one aggregate
    row), and the per-user aggregate reuses the window's user_id
    partitioning: one exchange end-to-end plus the low-cardinality
    path rollup."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    seq = first5.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("rn", "event_type"))).alias("seq")
    )
    path = F.concat_ws(">", F.transform("seq", lambda s: s["event_type"]))
    return (
        seq.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "win_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS island
  FROM days
),
streaks AS (
  SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
       MIN(streak_start) AS first_active_day
FROM streaks GROUP BY user_id
""",
)
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days — the retention/engagement streak metric. The classic trick:
    `day − row_number()` is constant within a consecutive run, so
    islands fall out of one ranking window + one grouped count; at any
    scale that is one user_id shuffle (the distinct, window, and both
    aggregates all share the user_id clustering) over |user, day|
    rows, never raw events."""
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub("day", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("day").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").cast("bigint").alias("longest_streak"),
        F.min("streak_start").alias("first_active_day"),
    )


@query(
    "agg_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes' OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
seq AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS s
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM seq
GROUP BY user_id, s
""",
)
def agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN `session_window` aggregate in BATCH: one
    groupBy(session_window(ts, gap), user) call replaces the whole
    lag → new-session flag → running-sum → rollup pipeline
    (`events_sessionize`) — and this oracle PROVES the equivalence:
    DuckDB reconstructs sessions with the manual gaps-and-islands
    spelling and the hash must match, pinning Spark's merging-window
    semantics (window end = last event + gap) against the classical
    formulation. One shuffle on the session key, merging handled
    inside the aggregate — no window function pass at all."""
    ev = table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
