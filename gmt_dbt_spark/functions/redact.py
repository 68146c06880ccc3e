"""PII redaction — the scrub pass every public-web pretraining
pipeline runs before training (BigScience ROOTS' PII filtering,
CCNet/C4-style cleanups): find and mask emails, IPv4 addresses, and
long digit runs (phone/SSN/card-shaped identifiers), and prove the
REWRITE itself, not just the match counts.

Evidence model is rewrite-and-rehash (the `text_dedup_lines` /
`dedup_substring_rewrite` pattern): the surface carries per-pattern
match counts on the RAW text plus the md5 of the fully redacted text,
so the value hash pins every replacement byte-for-byte — a drift in
match boundaries, replacement order, or unicode handling anywhere in
either engine is a hash mismatch. The redacted text itself never
leaves the executors.

Regex dialect contract (Java `java.util.regex` on Spark vs RE2 on
DuckDB): the three patterns use only the shared-semantics subset —
ASCII character classes, bounded/unbounded counted repetition, `\\d`
(ASCII digits in both defaults), and `\\b` (ASCII word boundary in
both). No backreferences, no lookaround (RE2 has neither), no
inline flags. Cross-engine parity was probed on hostile rows
(unicode neighbours, boundary digits, nested-looking candidates)
before the patterns were frozen. CRITICAL implementation note: the
Spark side passes patterns through the DataFrame API (`F.lit`), NOT
SQL string literals — Spark SQL literal parsing eats `\\b` as a
backspace character (measured: the SQL-literal variant silently
matched nothing), while DuckDB's plain string literals keep
backslashes. The generate-from-constants rule then keeps both
engines on the SAME Python pattern strings.

Semantics (identical on both engines, by spec):
  - counts are per-pattern over the ORIGINAL text (a digit run
    inside an email counts in n_long_ids even though the email
    redaction consumes it first — documented, deterministic);
  - redaction applies sequentially EMAIL → IPV4 → LONG-ID, global
    replace, so later patterns see earlier placeholders;
  - NULL text stays NULL (counts and hash NULL — the engines' shared
    regexp-on-NULL behavior), mirroring the corpus contract that
    NULL is "absent", not "empty".

Scale shape: a pure scan-side projection — three vectorized regex
counts + three chained regex replaces + one md5 inside the one
corpus scan's projection, ZERO exchanges, zero joins, nothing
driver-side (the `text_readability` plan class — the strongest
possible 100 TB shape; plan-guarded). At 100 TB this is exactly the
pass you fuse into ingestion.

Relationship to `text_pii_scrub` (functions/text.py) — deliberate,
not duplication: pii_scrub is the SEEDED demo (20 docs, synthetic
email+phone appended so the scrub provably has targets; combined
count) proving the redaction mechanics fire; THIS op is the
production-shaped pass — full corpus, three pattern classes,
per-pattern counts on raw text, and planted near-miss negatives.
`fn_mask` (functions/scalar.py) covers the column-masking flavor.

Reference parity note: whitefantom00/gmt-dbt has no text-curation
surface; this is part of the demanded LLM-pipeline extension
(SURVEY §2.L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query

# The frozen pattern set (see the dialect contract above). Order is
# part of the spec: EMAIL first (an address can contain digit runs
# and dots that the later patterns would mangle), then IPV4, then
# bare long digit runs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_ID = r"\b\d{9,}\b"
_RULES = [
    ("n_emails", PII_EMAIL, "<EMAIL>"),
    ("n_ips", PII_IPV4, "<IP>"),
    ("n_long_ids", PII_LONG_ID, "<ID>"),
]

_PII_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PII_LONG_ID}')) AS BIGINT)
         AS n_long_ids,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_IPV4}', '<IP>', 'g'),
             '{PII_LONG_ID}', '<ID>', 'g')) AS redacted_md5
FROM documents
"""


@query("text_pii_redact", oracle=_PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub PII from `documents`: per doc, the match count of each
    frozen pattern on the raw text and the md5 of the sequentially
    redacted text (EMAIL → IPV4 → LONG-ID, global replace) — the
    rewrite-and-rehash surface that pins every replacement without
    shipping the text. Module contract above covers the dialect
    subset, the SQL-literal backspace trap, and NULL passthrough.
    Plan: one parquet scan, all six regex ops + md5 in its
    projection, zero exchanges."""
    docs = table(spark, sf_dir, "documents")
    red = F.col("text")
    for _, pat, repl in _RULES:
        red = F.regexp_replace(red, pat, repl)
    cols = [
        F.regexp_count("text", F.lit(pat)).cast("bigint").alias(name)
        for name, pat, _ in _RULES
    ]
    return docs.select("doc_id", *cols, F.md5(red).alias("redacted_md5"))
