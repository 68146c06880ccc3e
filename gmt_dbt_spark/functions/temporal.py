"""Interval/date arithmetic and deterministic string formatting.

[surface] — the reference's type converter handles TimestampType
(`gcp_function.py:217-218`) and its Yelp/climate data is daily time
series, so hosted model SQL leans on date arithmetic; BigQuery's
DATE_ADD/DATE_TRUNC/LAST_DAY/FORMAT family is the surface mirrored
here. All expressions are JVM built-ins inside whole-stage codegen —
no UDFs, nothing leaves the scan-project pipeline, zero shuffles.

Formatting sticks to exactly-specified conversions (integer printf,
date fields, string pads) — float printf rounds HALF_UP in Java but
round-half-even in C, so %f never appears in an oracle-compared
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query


@query(
    "fn_interval",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) + 3                              AS due_3d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)        AS month_start,
       last_day(CAST(o_orderdate AS DATE))                        AS month_end,
       CAST(quarter(o_orderdate) AS INTEGER)                      AS qtr,
       CAST(dayofyear(o_orderdate) AS INTEGER)                    AS doy
FROM orders
""",
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: day offsets, calendar-clamped month
    adds (Jan 31 + 1 month = Feb 28/29 on both engines), month
    truncation/end, and calendar field extraction — the BigQuery
    DATE_ADD/DATE_TRUNC/LAST_DAY surface."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 3).alias("due_3d"),
        F.add_months(d, 1).alias("next_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@query(
    "fn_format",
    oracle="""
SELECT o_orderkey,
       printf('P%07d|%s', o_orderkey, o_orderpriority) AS tag,
       strftime(o_orderdate, '%Y-%m')                  AS ym,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0')      AS padded,
       repeat(o_orderstatus, 3)                        AS tripled,
       concat_ws('-', o_orderpriority, o_orderstatus)  AS joined
FROM orders
""",
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic formatting: C-style printf over integers/strings
    (exact — no float rounding mode in play), date→pattern rendering,
    pad/repeat/join. BigQuery FORMAT()/FORMAT_DATE() surface."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("P%07d|%s", "o_orderkey", "o_orderpriority").alias("tag"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded"),
        F.repeat("o_orderstatus", 3).alias("tripled"),
        F.concat_ws("-", "o_orderpriority", "o_orderstatus").alias("joined"),
    )


@query(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         concat('https://', source, '.example.com/docs/', doc_id,
                '?lang=', lang, '&v=', n_chars) AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https://([^/]+)', 1)      AS host,
       regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1)              AS query,
       regexp_extract(url, '[?&]lang=([^&]*)', 1)      AS lang_param
FROM u
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (BigQuery NET.HOST / web-crawl curation's
    canonicalization step): host/path/query/single-param extraction
    with the built-in parse_url — JVM codegen, no UDF. URLs are
    seeded deterministically from document columns (the corpus has
    no URL column); the oracle re-derives the same parts with
    anchored regexes."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v="),
        F.col("n_chars"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "dedup_url_canonical",
    oracle="""
WITH u AS (
  SELECT doc_id,
         concat('HTTPS://', upper(source), '.Example.COM/docs/', doc_id % 200,
                '?utm_source=feed&lang=', lang,
                CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=x' ELSE '' END,
                '#frag', doc_id % 7) AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         concat(
           lower(regexp_extract(url, '^[hH][tT][tT][pP][sS]?://([^/?#]+)', 1)),
           regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
           CASE WHEN regexp_replace(regexp_extract(url, '\\?([^#]*)', 1),
                                    '(^|&)utm_[^&]*', '', 'g') IN ('', '&')
                THEN ''
                ELSE concat('?', trim(regexp_replace(
                       regexp_replace(regexp_extract(url, '\\?([^#]*)', 1),
                                      '(^|&)utm_[^&]*', '', 'g'),
                       '^&', '')))
           END) AS canonical_url
  FROM u
)
SELECT canonical_url,
       COUNT(*) AS n_urls,
       MIN(doc_id) AS canonical_doc
FROM canon
GROUP BY canonical_url
HAVING COUNT(*) > 1
""",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl URL canonicalization + dedup — the first pass of
    every crawl-corpus pipeline: lowercase host, strip the fragment,
    drop `utm_*` tracking params, keep the semantic query — then
    group identical canonical URLs and elect MIN(doc_id) as the
    canonical document. All regex/codegen, zero UDFs; dedup is one
    hash aggregate on the canonical key. URLs are deterministically
    synthesized with the messiness the pipeline must survive (mixed
    case scheme/host, tracking params, fragments, deliberate
    collisions via doc_id % 200)."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".Example.COM/docs/"),
        F.col("doc_id") % 200,
        F.lit("?utm_source=feed&lang="),
        F.col("lang"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("&utm_campaign=x")).otherwise(
            F.lit("")
        ),
        F.lit("#frag"),
        F.col("doc_id") % 7,
    )
    u = d.select("doc_id", url.alias("url"))
    host = F.lower(F.regexp_extract("url", r"^[hH][tT][tT][pP][sS]?://([^/?#]+)", 1))
    path = F.regexp_extract("url", r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    raw_q = F.regexp_extract("url", r"\?([^#]*)", 1)
    no_utm = F.regexp_replace(raw_q, r"(^|&)utm_[^&]*", "")
    clean_q = F.when(no_utm.isin("", "&"), F.lit("")).otherwise(
        F.concat(F.lit("?"), F.trim(F.regexp_replace(no_utm, r"^&", "")))
    )
    canon = u.select(
        "doc_id", F.concat(host, path, clean_q).alias("canonical_url")
    )
    return (
        canon.groupBy("canonical_url")
        .agg(F.count("*").alias("n_urls"), F.min("doc_id").alias("canonical_doc"))
        .filter(F.col("n_urls") > 1)
    )
