"""dbt-style data-quality tests — SURVEY.md §5.3.

The reference declares a dbt test surface but ships it empty
(`dbt_project.yml:13` test-paths, `tests/` contains only .gitkeep;
`models/yelp/source.yml:1-18` has no `tests:` keys). These four are
the dbt built-in schema tests that project *should* have had; each is
an operator returning the VIOLATING rows — a test passes when its
result is empty, exactly dbt's contract.

Every test is a pure DataFrame plan (filter / groupBy-having /
left-anti join), so at 100 TB it inherits Catalyst pushdown and AQE:
`not_null` and `accepted_values` are scan-side filters with zero
shuffle; `unique` is one hash aggregate on the key; `relationships`
is a join that broadcasts whenever the parent key side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query


def test_not_null(df: DataFrame, column: str) -> DataFrame:
    """Rows where `column` IS NULL (dbt `not_null`)."""
    return df.filter(F.col(column).isNull())


def test_unique(df: DataFrame, column: str) -> DataFrame:
    """Key values appearing more than once (dbt `unique`)."""
    return (
        df.groupBy(column)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def test_accepted_values(
    df: DataFrame, column: str, values: Sequence[str]
) -> DataFrame:
    """Rows whose `column` is outside the accepted set (dbt
    `accepted_values`; NULL is not a violation, per dbt)."""
    col: Column = F.col(column)
    return df.filter(col.isNotNull() & ~col.isin(list(values)))


def test_relationships(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent (dbt `relationships`) —
    referential integrity as a left-anti join; NULL child keys are
    not violations (NOT EXISTS semantics)."""
    parent_keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        parent_keys, child[child_key] == parent_keys["__pk"], "left_anti"
    )


@query(
    "dq_volume_drift",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY CAST(ts AS DATE)
),
w AS (
  SELECT day, n,
         LAG(n) OVER (ORDER BY day) AS prev_n
  FROM daily
)
SELECT day, n,
       CAST(COALESCE(prev_n, n) AS BIGINT) AS prev_n,
       (prev_n IS NOT NULL AND (n * 2 <= prev_n OR n >= prev_n * 2))
         AS drift_alert
FROM w
""",
)
def dq_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-drift data test (the dbt-utils `recency`/anomaly family
    beyond freshness): day-over-day event counts with an alert when a
    day's volume halves or doubles vs the previous day — the check
    that catches a broken upstream loader before anyone queries the
    data. Boundaries are INCLUSIVE (an exact halving/doubling alerts,
    per the contract) and integer-only so the boolean hashes exactly;
    the series is one date rollup plus a calendar-bounded lag
    window."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    prev = F.lag("n").over(w)
    return daily.select(
        "day",
        "n",
        F.coalesce(prev, F.col("n")).cast("bigint").alias("prev_n"),
        (
            prev.isNotNull()
            & ((F.col("n") * 2 <= prev) | (F.col("n") >= prev * 2))
        ).alias("drift_alert"),
    )


@query(
    "dq_outlier_iqr",
    oracle="""
WITH fences AS (
  SELECT o_orderpriority,
         quantile_disc(o_totalprice, 0.25) AS q1,
         quantile_disc(o_totalprice, 0.75) AS q3,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
),
flagged AS (
  SELECT f.o_orderpriority, f.q1, f.q3, f.n,
         CASE WHEN o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
                OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
              THEN 1 ELSE 0 END AS is_out
  FROM orders o JOIN fences f ON o.o_orderpriority = f.o_orderpriority
)
SELECT o_orderpriority, q1, q3,
       CAST(n AS BIGINT) AS n,
       CAST(SUM(is_out) AS BIGINT) AS n_outliers,
       (SUM(is_out) * 100 <= n * 2) AS outlier_pct_ok
FROM flagged
GROUP BY o_orderpriority, q1, q3, n
""",
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-fence outlier data test (the Tukey boxplot rule as a dbt
    test): per order-priority, values beyond [q1 − 1.5·IQR,
    q3 + 1.5·IQR] are outliers, and the test passes while they stay
    ≤ 2% of the group. Quartiles are DISCRETE (actual data elements
    — percentile_disc picks identically on both engines, no
    interpolation arithmetic), the fences are one multiply and one
    add of identical doubles (deterministic IEEE), and the pass
    verdict is an integer cross-multiplication.

    Scale: the fences table is |groups| rows — it broadcasts back
    onto the fact scan, so the flag pass is scan-side; total cost is
    two aggregates over one co-partitioned key. The percentile
    aggregate itself sorts per group — for a 100 TB group switch
    q1/q3 to approx_percentile (same fences to sketch error) and
    keep the identical flag pass."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    fences = spark.sql(
        """
        SELECT o_orderpriority,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority
        """
    )
    lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    flagged = o.join(F.broadcast(fences), "o_orderpriority").select(
        "o_orderpriority",
        "q1",
        "q3",
        "n",
        F.when((F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi), 1)
        .otherwise(0)
        .alias("is_out"),
    )
    return (
        flagged.groupBy("o_orderpriority", "q1", "q3", "n")
        .agg(
            F.sum("is_out").cast("bigint").alias("n_outliers"),
            (F.sum("is_out") * 100 <= F.col("n") * 2).alias("outlier_pct_ok"),
        )
        .select(
            "o_orderpriority",
            "q1",
            "q3",
            F.col("n").cast("bigint").alias("n"),
            "n_outliers",
            "outlier_pct_ok",
        )
    )


@query(
    "dq_schema_contract",
    oracle="""
SELECT * FROM (VALUES
  ('o_orderkey',      'bigint'),
  ('o_custkey',       'bigint'),
  ('o_orderstatus',   'string'),
  ('o_totalprice',    'double'),
  ('o_orderdate',     'timestamp'),
  ('o_orderpriority', 'string')
) t(column_name, data_type)
""",
)
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift data test: the source files' LIVE schema, read
    from the parquet FOOTER metadata (zero data scanned),
    hash-compared against the contract — which IS the oracle's
    VALUES list. A column added, dropped, renamed, or retyped
    upstream changes the emitted rows and fails the driver's hash;
    unlike model_contract (which gates a model's OUTPUT at write
    time) this guards an INPUT source the pipeline doesn't own — the
    first thing to check when a 100 TB load starts producing nulls.
    Metadata-only: cost is independent of table size.

    Footer logical types are normalized to ENGINE-LOGICAL names
    before comparing: the driver's parquet generations have shipped
    the same logical column as TIMESTAMP(NANOS), timestamp[us], and
    timestamp_ntz (see catalog.table) — reading the footer directly
    (not the session's post-nanosAsLong view, where a nanos column
    surfaces as bigint) keeps the contract pinned to the logical
    type under every physical flavor."""
    import os

    import pyarrow.parquet as pq

    sch = pq.read_schema(os.path.join(sf_dir, "orders.parquet"))

    def norm(t) -> str:
        s = str(t)
        if s.startswith("timestamp"):
            return "timestamp"
        return {"int64": "bigint", "int32": "int", "float": "float",
                "large_string": "string", "string": "string",
                "double": "double"}.get(s, s)

    rows = [(name, norm(sch.field(name).type)) for name in sch.names]
    return spark.createDataFrame(rows, "column_name string, data_type string")


@query(
    "dq_reconcile_checksums",
    oracle="""
WITH src AS (
  SELECT o_orderkey % 8 AS bucket,
         COUNT(*) AS n,
         SUM(CAST(o_orderkey * 1009
             + CAST(floor(o_totalprice * 100.0) AS BIGINT)
             AS DECIMAL(38,0))) AS cksum
  FROM orders GROUP BY o_orderkey % 8
),
tgt AS (
  SELECT o_orderkey % 8 AS bucket,
         COUNT(*) AS n,
         SUM(CAST(o_orderkey * 1009
             + CAST(floor(CASE WHEN o_orderkey = 7
                               THEN o_totalprice + 1.0
                               ELSE o_totalprice END * 100.0) AS BIGINT)
             AS DECIMAL(38,0))) AS cksum
  FROM orders GROUP BY o_orderkey % 8
)
SELECT s.bucket,
       CAST(s.n AS BIGINT) AS src_n, CAST(t.n AS BIGINT) AS tgt_n,
       CAST(s.cksum AS VARCHAR) AS src_cksum,
       CAST(t.cksum AS VARCHAR) AS tgt_cksum,
       (s.n = t.n) AS count_ok,
       (s.cksum = t.cksum) AS cksum_ok
FROM src s JOIN tgt t ON s.bucket = t.bucket
""",
)
def dq_reconcile_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source↔target RECONCILIATION — the post-ETL audit every
    migration and replication pipeline runs: per-bucket row counts
    AND content checksums compared side by side, so a silent value
    corruption (not just a lost row) surfaces, localized to its
    bucket. The 'target' here is the source with ONE deterministic
    corruption injected (order 7's price +1), proving the check
    actually fires: exactly bucket 7 reports cksum_ok=false with
    counts still equal — the signature of corruption-not-loss.

    Mechanics at 100 TB: both sides reduce to |buckets| rows of
    (count, integer checksum) via one map-side-combined aggregate
    each — the compare join moves bytes proportional to the bucket
    count, never the data; bucketing by key-mod localizes a
    mismatch to 1/Nth of the keyspace for drill-down (recurse into
    the bad bucket with a finer mod). The checksum is an
    order-independent integer SUM (exact, associative), with the
    price folded in via floor(price·100) — same IEEE double ops on
    both engines."""
    o = table(spark, sf_dir, "orders")

    def side(df, price_col):
        # per-row term fits bigint; the ACCUMULATOR is decimal(38,0) —
        # a bigint SUM wraps (Spark legacy) or throws (ANSI/DuckDB
        # hugeint cast) around 1e19, well inside 100 TB territory
        return df.groupBy((F.col("o_orderkey") % 8).alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.col("o_orderkey") * 1009
                    + F.floor(price_col * 100.0).cast("bigint")
                ).cast("decimal(38,0)")
            ).alias("cksum"),
        )

    src = side(o, F.col("o_totalprice"))
    corrupted = F.when(
        F.col("o_orderkey") == 7, F.col("o_totalprice") + 1.0
    ).otherwise(F.col("o_totalprice"))
    tgt = side(o, corrupted)
    s = src.alias("s")
    t = tgt.alias("t")
    return s.join(t, F.col("s.bucket") == F.col("t.bucket")).select(
        F.col("s.bucket").alias("bucket"),
        F.col("s.n").cast("bigint").alias("src_n"),
        F.col("t.n").cast("bigint").alias("tgt_n"),
        F.col("s.cksum").cast("string").alias("src_cksum"),
        F.col("t.cksum").cast("string").alias("tgt_cksum"),
        (F.col("s.n") == F.col("t.n")).alias("count_ok"),
        (F.col("s.cksum") == F.col("t.cksum")).alias("cksum_ok"),
    )


@query(
    "dq_outlier_mad",
    oracle="""
WITH med AS (
  SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS m
  FROM orders GROUP BY o_orderpriority
),
dev AS (
  SELECT o.o_orderpriority, m, ABS(o.o_totalprice - m) AS d
  FROM orders o JOIN med USING (o_orderpriority)
),
mad AS (
  SELECT o_orderpriority, m, quantile_disc(d, 0.5) AS mad
  FROM dev GROUP BY o_orderpriority, m
)
SELECT dv.o_orderpriority, mad.m AS med, mad.mad,
       CAST(COUNT(CASE WHEN dv.d > 5.0 * mad.mad THEN 1 END) AS BIGINT)
         AS n_outliers,
       COUNT(*) AS n
FROM dev dv JOIN mad ON dv.o_orderpriority = mad.o_orderpriority
GROUP BY dv.o_orderpriority, mad.m, mad.mad
""",
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier test (median absolute deviation) — the third
    robust method alongside z-score (events_anomaly_zscore, breaks
    under heavy outliers since mean/stddev absorb them) and IQR
    fences (dq_outlier_iqr): MAD's 50% breakdown point survives data
    that is half-garbage. Flag = |x − median| > 5·MAD. Every
    quantile is DISCRETE (an actual data element), the deviation is
    one subtract+abs of identical doubles, the cut one multiply —
    all hash-exact, no interpolation anywhere.

    Scale: two grouped percentile passes with a broadcast of the
    |groups|-row medians between them (same shape as the IQR test ×2);
    the percentile sort is the cost — swap in approx_percentile per
    pass for the 100 TB spelling, flags unchanged to sketch error."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    med = spark.sql(
        """
        SELECT o_orderpriority,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS m
        FROM orders GROUP BY o_orderpriority
        """
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority", "m",
        F.abs(F.col("o_totalprice") - F.col("m")).alias("d"),
    )
    dev.createOrReplaceTempView("mad_dev")
    mad = spark.sql(
        """
        SELECT o_orderpriority, m,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS mad
        FROM mad_dev GROUP BY o_orderpriority, m
        """
    )
    return (
        dev.join(F.broadcast(mad.select("o_orderpriority", "mad")),
                 "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("m").alias("med"),
            F.first("mad").alias("mad"),
            F.count(F.when(F.col("d") > 5.0 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "dq_drift_tvd",
    oracle="""
WITH binned AS (
  SELECT event_type,
         LEAST(9, CAST(FLOOR(value / 50) AS INT)) AS bin,
         DAY(ts) <= 15 AS in_a
  FROM events
),
cell AS (
  SELECT event_type, bin,
         SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS b
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, SUM(a) AS na, SUM(b) AS nb FROM cell GROUP BY event_type
)
SELECT cell.event_type,
       CAST(MAX(tot.na) AS BIGINT) AS n_a,
       CAST(MAX(tot.nb) AS BIGINT) AS n_b,
       CAST(SUM(ABS(cell.a * 1000000 // tot.na - cell.b * 1000000 // tot.nb)) // 2
         AS BIGINT) AS tv_ppm,
       SUM(ABS(cell.a * 1000000 // tot.na - cell.b * 1000000 // tot.nb)) // 2
         > 100000 AS drifted
FROM cell JOIN tot ON cell.event_type = tot.event_type
GROUP BY cell.event_type
""",
)
def dq_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: total-variation distance between
    the first- and second-half-of-month `value` distributions, per
    event type — the schema-stable cousin of PSI (PSI's log-ratio
    term needs libm, whose rounding is engine-specific; TVD is pure
    integer arithmetic in ppm, so the alert threshold hashes exactly).

    Scale shape: one conditional aggregate over the stream to the
    (type x 10-bin) histogram — everything after operates on at most
    |types| x 10 cells: the totals aggregate, the proportion join and
    the TVD rollup are all dim-sized. Streams of any size reduce to
    the same constant-size drift matrix (the same pattern a weekly
    prod/holdout comparison or a train-vs-serve skew check runs)."""
    ev = table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.least(F.lit(9), F.floor(F.col("value") / 50).cast("int")).alias("bin"),
        (F.dayofmonth("ts") <= 15).alias("in_a"),
    )
    cell = binned.groupBy("event_type", "bin").agg(
        F.count_if("in_a").alias("a"),
        F.count_if(~F.col("in_a")).alias("b"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    tv = F.expr(
        "sum(abs(a * 1000000 div na - b * 1000000 div nb)) div 2"
    )
    return (
        cell.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            tv.alias("tv_ppm"),
            (tv > 100000).alias("drifted"),
        )
    )


# First-digit Benford expectations in ppm: round(log10(1+1/d) * 1e6).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_SQL_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"


@query(
    "dq_benford",
    oracle=f"""
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS first_digit
  FROM orders WHERE o_totalprice >= 1
),
n AS (SELECT COUNT(*) AS total FROM digits),
obs AS (
  SELECT first_digit, COUNT(*) AS cnt FROM digits GROUP BY first_digit
)
SELECT obs.first_digit,
       obs.cnt,
       obs.cnt * 1000000 // n.total AS obs_ppm,
       {_BENFORD_SQL_CASE} AS exp_ppm,
       ABS(obs.cnt * 1000000 // n.total - {_BENFORD_SQL_CASE}) < 30000
         AS benford_ok
FROM obs CROSS JOIN n
""",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the
    classic fabricated-data / fraud screen: naturally-occurring
    multi-magnitude amounts follow P(d) = log10(1+1/d); synthetic or
    tampered figures don't. The expected frequencies are PRECOMPUTED
    integer ppm literals (no runtime log10 — libm rounding is
    engine-specific), observed shares are integer-division ppm, and
    the per-digit tolerance flag (|obs-exp| < 3%) is pure integer
    arithmetic — all hash-exact.

    Scale shape: first digit extracts scan-side (floor → string →
    first char: all codegen), one partial-aggregable groupBy to 9
    rows, and the total joins back as a one-row broadcast. Any fact
    size reduces to a 9-row digit distribution.

    (On this driver's uniformly-generated synthetic prices the flags
    legitimately report non-Benford — the audit DETECTS synthetic
    data, which is the point; the hash compare pins the detection.)"""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    n = digits.agg(F.count(F.lit(1)).alias("total"))
    obs = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("cnt"))
    exp_ppm = F.element_at(
        F.create_map(
            *[F.lit(x) for dp in _BENFORD_PPM.items() for x in dp]
        ),
        F.col("first_digit"),
    )
    obs_ppm = F.expr("cnt * 1000000 div total")
    return obs.crossJoin(F.broadcast(n)).select(
        "first_digit",
        "cnt",
        obs_ppm.alias("obs_ppm"),
        exp_ppm.alias("exp_ppm"),
        (F.abs(obs_ppm - exp_ppm) < 30000).alias("benford_ok"),
    )


@query(
    "dq_anomaly_seasonal",
    oracle="""
WITH cells AS (
  SELECT event_type,
         CAST(ts AS DATE) AS day,
         HOUR(ts) AS hod,
         COUNT(*) AS cnt
  FROM events
  GROUP BY event_type, CAST(ts AS DATE), HOUR(ts)
),
base AS (
  SELECT event_type, hod,
         SUM(cnt) AS total, COUNT(*) AS n_days
  FROM cells GROUP BY event_type, hod
)
SELECT c.event_type, c.day, c.hod, c.cnt,
       CAST(b.total AS BIGINT) AS total, b.n_days,
       c.cnt * b.n_days * 10 > b.total * 30 AS spike,
       c.cnt * b.n_days * 10 < b.total * 2 AS trough
FROM cells c
JOIN base b ON c.event_type = b.event_type AND c.hod = b.hod
WHERE c.cnt * b.n_days * 10 > b.total * 30
   OR c.cnt * b.n_days * 10 < b.total * 2
""",
)
def dq_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-baseline anomaly detection: each (type, day, hour)
    cell compares against the average for that type at that HOUR OF
    DAY across the whole period — catching the 3 a.m. error spike
    that a trailing-window detector (events_burst) normalizes away
    because the neighborhood is equally broken, and the Tuesday-noon
    trough that global stats (events_anomaly_zscore) miss because
    noon is usually the peak. Flags: >3x the seasonal mean (spike) or
    <0.2x (trough), multiplied through the average so no division.

    Scale shape: one conditional aggregate to (type x day x hour)
    cells; the baseline is a second aggregate over cells (types x 24
    rows) joined back broadcast-size; output only the anomalous
    cells."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    base = cells.groupBy("event_type", "hod").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    j = cells.join(base, ["event_type", "hod"])
    lhs = F.col("cnt") * F.col("n_days") * 10
    spike = lhs > F.col("total") * 30
    trough = lhs < F.col("total") * 2
    return j.filter(spike | trough).select(
        "event_type",
        "day",
        "hod",
        "cnt",
        "total",
        "n_days",
        spike.alias("spike"),
        trough.alias("trough"),
    )
