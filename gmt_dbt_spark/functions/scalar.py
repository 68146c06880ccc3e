"""Scalar function families — SURVEY.md §2.H.

Families chosen to cover what the reference's data shapes exercise:
the sanitize regex (`main.py:220`), Yelp date-string casts,
comma-joined lists, nested-JSON payloads. All built-in
`pyspark.sql.functions` — JVM-side, whole-stage-codegen'd; no Python
in the hot path. Oracle notes: libm functions with unspecified
rounding (log/exp) are avoided; sqrt/floor/ceil/abs are IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import query


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       TRIM(p_type) AS type_trim,
       regexp_replace(p_type, '[^a-zA-Z0-9_]', '_', 'g') AS type_sanitized,
       SUBSTRING(p_name, 1, 10) AS name_prefix,
       LENGTH(p_name) AS name_len,
       LPAD(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family; `type_sanitized` mirrors the reference's
    identifier-sanitize regex (`main.py:220`, `main.py:287`)."""
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.regexp_replace("p_type", "[^a-zA-Z0-9_]", "_").alias("type_sanitized"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_padded"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(isodow FROM o_orderdate) AS iso_dow,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over the Yelp-style date fields.

    `weekday()+1` matches DuckDB's EXTRACT(isodow) (Mon=1..Sun=7);
    Spark's own `dayofweek` is Sun=1 and would not oracle-match.
    """
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_dow"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("bigint").alias("days_to_y2k"),
        F.date_add(d, 30).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "fn_math",
    oracle="""
SELECT c_custkey,
       ABS(c_acctbal) AS bal_abs,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
       CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
       SQRT(ABS(c_acctbal)) AS bal_sqrt,
       c_acctbal * c_acctbal AS bal_sq,
       c_custkey % 7 AS key_mod
FROM customer
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family restricted to IEEE-exact ops (sqrt is correctly
    rounded per IEEE-754; log/exp are not and would hash-mismatch).

    floor/ceil on DOUBLE return BIGINT in Spark but DOUBLE in DuckDB —
    the driver's text-based value hash distinguishes ``1863`` from
    ``1863.0``, so BOTH sides cast to BIGINT explicitly (r1 FAIL fix)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("bal_abs"),
        F.floor("c_acctbal").cast("bigint").alias("bal_floor"),
        F.ceil("c_acctbal").cast("bigint").alias("bal_ceil"),
        F.sqrt(F.abs("c_acctbal")).alias("bal_sqrt"),
        (F.col("c_acctbal") * F.col("c_acctbal")).alias("bal_sq"),
        (F.col("c_custkey") % 7).alias("key_mod"),
    )


@query(
    "fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 150000 THEN 'high'
            WHEN o_totalprice > 50000  THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
FROM orders
""",
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals: CASE WHEN / coalesce / nullif — the MERGE
    emulation's core expression (SURVEY §2.C `merge_upsert`)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_or_pending"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "fn_array",
    oracle="""
SELECT p_partkey,
       len(string_split(p_name, ' ')) AS n_words,
       string_split(p_name, ' ')[1] AS first_word,
       list_contains(string_split(p_type, ' '), 'BRUSHED') AS has_brushed,
       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS words_sorted
FROM part
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (the Yelp checkin comma-list shape): split, size,
    element access, contains, distinct+sort joined to a stable string."""
    p = table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("bigint").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(F.split(F.col("p_type"), " "), "BRUSHED").alias("has_brushed"),
        F.array_join(F.array_sort(F.array_distinct(words)), "|").alias("words_sorted"),
    )


@query(
    "fn_map",
    oracle="""
SELECT p_partkey, p_brand AS brand_from_map, 2 AS n_keys
FROM part
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family [ext — MapType absent from the reference's lattice,
    SURVEY §1.2]: build a map, read back via element_at/map_keys.
    Oracle is the trivial equivalent (map round-trip is identity)."""
    p = table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("type"), F.col("p_type"), F.lit("brand"), F.col("p_brand")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_from_map"),
        F.size(F.map_keys(m).cast("array<string>")).alias("n_keys"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_string,
       props AS raw_json
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — parity with the reference's JSON-autodetect
    ingest (`main.py:318-320`): path extraction + typed parse."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.get_json_object("props", "$.k").alias("k_string"),
        F.col("props").alias("raw_json"),
    )


@query(
    "fn_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS VARCHAR) AS price_dec,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_orderkey % 2 AS BOOLEAN) AS odd_key
FROM orders
""",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across the §1.2 type lattice (the reference's converter
    `gcp_function.py:169-222` is the spec); decimal target uses scale
    6 so no double lands on a rounding tie.

    The double→decimal cast is still the op under test, but the
    COMPARED surface is its VARCHAR rendering (the repo's decimal
    convention): a raw DECIMAL output hashes differently between
    Spark (`Decimal('112946.260000')`) and the driver's DuckDB fetch
    (float64 `112946.26`) even when every value matches — r2 FAIL was
    purely representational."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_totalprice").cast("decimal(18,6)").cast("string").alias("price_dec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        (F.col("o_orderkey") % 2).cast("boolean").alias("odd_key"),
    )


@query(
    "fn_try",
    oracle="""
SELECT
  COUNT(*) AS n,
  COUNT(TRY_CAST(o_orderpriority AS INTEGER)) AS n_prio_numeric,
  COUNT(CASE WHEN o_custkey % 100 = 0 THEN NULL
             ELSE CAST(o_totalprice / (o_custkey % 100) AS DOUBLE) END)
    AS n_safe_div
FROM orders
""",
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (the ANSI-mode escape hatches,
    default-on in Spark 4): `try_cast` yields NULL instead of
    raising on malformed input, `try_divide` NULL on division by
    zero — the difference between one bad row failing a 100 TB job
    and one NULL in the output. Counted (not projected) so the oracle
    compares integers, not error objects."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.expr("try_cast(o_orderpriority AS INT)")).alias("n_prio_numeric"),
        F.count(
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 100)
        ).alias("n_safe_div"),
    )


@query(
    "fn_higher_order",
    oracle="""
SELECT l_orderkey,
       len(qtys) AS n_lines,
       len(list_filter(qtys, x -> x >= 40)) AS n_large,
       list_aggregate(list_transform(qtys, x -> x * 2), 'sum') AS sum_doubled,
       list_contains(qtys, 50.0) AS has_max
FROM (SELECT l_orderkey,
             -- collect_list SKIPS nulls on Spark; DuckDB's list()
             -- keeps them (r3 adversarial finding) — filter + an
             -- empty-list fallback for an all-NULL group (FILTERed
             -- list() of zero rows is NULL, Spark's is [])
             list_sort(COALESCE(list(l_quantity)
                                FILTER (l_quantity IS NOT NULL), [])) AS qtys
      FROM lineitem GROUP BY l_orderkey)
""",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / aggregate
    / exists with lambdas, all inside codegen (the JVM answer to
    'I need a loop over this array', where a Python UDF would leave
    whole-stage codegen). Arrays are sorted first so the fold order
    is identical on both engines; quantities are small integers in
    doubles, so the folded sum is exact."""
    li = table(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    return arrs.select(
        "l_orderkey",
        F.size("qtys").alias("n_lines"),
        F.size(F.filter("qtys", lambda x: x >= 40)).alias("n_large"),
        F.aggregate(
            F.transform("qtys", lambda x: x * 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_doubled"),
        F.array_contains("qtys", 50.0).alias("has_max"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       md5(CONCAT(COALESCE(c_name, chr(1)), '|',
                  COALESCE(CAST(c_nationkey AS VARCHAR), chr(1)))) AS row_digest
FROM customer
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest family — content addressing / change
    detection (the fingerprint side of dedup_cross_corpus). MD5 and
    SHA-256 are bit-exact across engines by definition; the row
    digest is the concat-then-hash change-capture idiom."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        # NULL-sentinel digest (r3 adversarial finding): concat_ws
        # SKIPS nulls, so (NULL, 5) and ('', 5) would collide — and
        # Spark's skip disagreed with the oracle's CONCAT (which keeps
        # the separator). A \x01 sentinel keeps the digest total and
        # identical on both engines.
        F.md5(
            F.concat_ws(
                "|",
                F.coalesce(F.col("c_name"), F.lit("\x01")),
                F.coalesce(F.col("c_nationkey").cast("string"), F.lit("\x01")),
            )
        ).alias("row_digest"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 21845) AS xored,
       o_orderkey << 3 AS shifted_up,
       o_orderkey >> 2 AS shifted_down,
       bit_count(o_orderkey) AS popcount
FROM orders
WHERE o_orderkey < 1000
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — flag packing, hash mixing, shard routing
    (the primitives under sink_zorder's Morton interleave and the
    CMS cell hash). Integer ops: exact everywhere."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 3).alias("shifted_up"),
        F.shiftright(k, 2).alias("shifted_down"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "fn_levenshtein",
    oracle="""
WITH s AS (SELECT DISTINCT source FROM documents),
l AS (SELECT DISTINCT lang FROM documents)
SELECT a.source AS src_a, b.source AS src_b,
       levenshtein(a.source, b.source) AS dist,
       levenshtein(a.source, 'webcrawl') AS dist_web
FROM s a CROSS JOIN s b
UNION ALL
SELECT a.lang, b.lang, levenshtein(a.lang, b.lang), levenshtein(a.lang, 'en')
FROM l a CROSS JOIN l b
""",
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy key matching / near-dup source names —
    the string-similarity primitive under record linkage). Computed
    over the DISTINCT value sets first, so the cross product is
    |values|² on deduplicated inputs, never rows² — at scale the
    distinct sets broadcast and the quadratic stays bounded by
    vocabulary size. Classic Wagner-Fischer on both engines: same
    integer distances."""
    d = table(spark, sf_dir, "documents")
    s = d.select("source").distinct()
    lang = d.select("lang").distinct()
    a, b = s.alias("a"), s.alias("b")
    src = a.crossJoin(b).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.levenshtein(F.col("a.source"), F.col("b.source")).alias("dist"),
        F.levenshtein(F.col("a.source"), F.lit("webcrawl")).alias("dist_web"),
    )
    la, lb = lang.alias("la"), lang.alias("lb")
    lng = la.crossJoin(lb).select(
        F.col("la.lang").alias("src_a"),
        F.col("lb.lang").alias("src_b"),
        F.levenshtein(F.col("la.lang"), F.col("lb.lang")).alias("dist"),
        F.levenshtein(F.col("la.lang"), F.lit("en")).alias("dist_web"),
    )
    return src.unionAll(lng)


@query(
    "fn_array_set",
    oracle="""
WITH a AS (
  SELECT l_orderkey,
         list_sort(list_distinct(list(l_linenumber))) AS lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       coalesce(array_to_string(
           list_sort(list_distinct(list_concat(lines, [1, 2, 3]))), ','),
           '') AS u,
       coalesce(array_to_string(
           list_sort(list_distinct(list_filter(lines,
               x -> list_contains([1, 2, 3], x)))), ','), '') AS i,
       coalesce(array_to_string(
           list_sort(list_distinct(list_filter(lines,
               x -> NOT list_contains([1, 2, 3], x)))), ','), '') AS d,
       list_has_any(lines, [5, 6, 7]) AS has_high
FROM a
""",
)
def fn_array_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — union/intersect/except/overlap — all
    JVM built-ins inside codegen. Per-order line-number sets vs the
    literal {1,2,3}; every result array is sorted so the value
    compare is order-free (Spark's array_union preserves encounter
    order, DuckDB's list_distinct doesn't — sorting both pins it).
    The DuckDB twin spells intersect/except as list_filter over
    list_contains (no native list_intersect in 1.0).

    The result sets are SERIALIZED to comma-joined strings (the
    agg_collect convention, in force since r1): the driver's
    canonicalizer row-sorts raw pandas frames, and `sort_values`
    cannot factorize unhashable numpy arrays — a raw array<int>
    output column is a guaranteed driver err (CORRECTNESS_r04,
    this very query). tests/test_queries_oracle.py sweeps the whole
    registry for top-level complex output columns. Empty-set edge:
    Spark's array_join([]) is '' but DuckDB's array_to_string([]) is
    NULL — the oracle coalesces to ''."""
    li = table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_linenumber")).alias("lines")
    )
    lit123 = F.array(F.lit(1), F.lit(2), F.lit(3))
    lit567 = F.array(F.lit(5), F.lit(6), F.lit(7))

    def _csv(col: Column) -> Column:
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return base.select(
        "l_orderkey",
        _csv(F.sort_array(F.array_union("lines", lit123))).alias("u"),
        _csv(F.sort_array(F.array_intersect("lines", lit123))).alias("i"),
        _csv(F.sort_array(F.array_except("lines", lit123))).alias("d"),
        F.arrays_overlap("lines", lit567).alias("has_high"),
    )


@query(
    "fn_csv_expr",
    oracle="""
WITH c AS (
  SELECT o_orderkey,
         CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
           || o_orderpriority AS csv_line
  FROM orders WHERE o_orderkey < 200
)
SELECT o_orderkey, csv_line,
       CAST(string_split(csv_line, ',')[1] AS BIGINT) AS parsed_key,
       string_split(csv_line, ',')[3] AS parsed_priority,
       (CAST(string_split(csv_line, ',')[1] AS BIGINT) = o_orderkey)
         AS roundtrip_ok
FROM c
""",
)
def fn_csv_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as an EXPRESSION (`to_csv` / `from_csv`): serialize a
    struct to a CSV line and parse it back with a declared schema —
    schema-on-read inside a single projection, no file round-trip.
    This is how embedded CSV payloads (log lines, legacy message
    fields) are handled at scale: both directions are codegen
    expressions on the scan, zero shuffles, no Python. Columns stay
    int/string so serialization is format-stable across engines
    (doubles would pin printf behavior instead of the operator);
    the oracle rebuilds and re-splits the same lines."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    c = o.select(
        "o_orderkey",
        F.to_csv(
            F.struct("o_orderkey", "o_orderstatus", "o_orderpriority")
        ).alias("csv_line"),
    )
    parsed = F.from_csv(
        "csv_line", "k bigint, s string, p string"
    )
    return c.select(
        "o_orderkey",
        "csv_line",
        parsed.getField("k").alias("parsed_key"),
        parsed.getField("p").alias("parsed_priority"),
        (parsed.getField("k") == F.col("o_orderkey")).alias("roundtrip_ok"),
    )


@query(
    "fn_mask",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
           '\\p{Lu}', 'X', 'g'), '\\p{Ll}', 'x', 'g'), '\\p{Nd}', 'n', 'g')
         AS masked_default,
       regexp_replace(c_name, '\\p{Nd}', '*', 'g') AS masked_digits_only
FROM customer
""",
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in data masking (`mask()`, Spark 3.4+): uppercase → X,
    lowercase → x, digits → n in one codegen expression — the
    display-layer PII redaction that keeps string SHAPE (length,
    word boundaries, digit positions) for debugging while destroying
    content; the second variant masks digits only (account-number
    style). Complements text_pii_scrub (regex pattern scrubbing of
    emails/SSNs): mask is shape-preserving and type-blind, scrub is
    pattern-targeted. Zero shuffles, scan-side; the oracle mirrors
    with character-class regex chains."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_default"),
        F.expr("mask(c_name, NULL, NULL, '*', NULL)").alias("masked_digits_only"),
    )


@query(
    "fn_regexp",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
       -- COALESCE: array_to_string([], '|') is NULL in DuckDB where
       -- Spark array_join gives '' (the r3 empty-list class); a NULL
       -- p_name stays NULL via the CASE
       CASE WHEN p_name IS NULL THEN NULL
            ELSE COALESCE(array_to_string(
                     regexp_extract_all(p_name, '[a-z]+'), '|'), '') END
         AS words_csv,
       regexp_matches(p_name, '^(red|blue) ') AS is_primary_color,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
""",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: extract / extract-all / count /
    boolean match / global replace — all JVM-codegen scan-side
    expressions (Java regex here, RE2 in the DuckDB twin; the
    patterns stick to the common subset where both dialects agree).
    regexp_count is expressed as the length of extract_all so the
    same column works on engines without a native count."""
    p = table(spark, sf_dir, "part")
    words = F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.size(words).alias("n_words"),
        F.array_join(words, "|").alias("words_csv"),
        F.col("p_name").rlike("^(red|blue) ").alias("is_primary_color"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )
