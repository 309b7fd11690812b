"""Scalar function suites (SURVEY §2.8): string, math, date, array,
JSON, conditional/null, and hash digests.

The reference touches only a sliver of this surface (JSON encode/
decode, timestamp parse, epoch arithmetic, hour extraction, f-string
concat — F1-F9); the [GAP] rows here complete it.  Everything is
built-in `pyspark.sql.functions` — JVM-side, codegen'd, no UDFs.

Cross-engine notes (each encoded in the oracle SQL):
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all semantics.
- DuckDB dayofweek is 0-based Sunday; Spark is 1-based.
- ln/log10 go through libm (not correctly-rounded): rounded to 6 dp.
- Array folds are left-to-right in both engines, so double sums over
  arrays are bit-exact without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import ts_us
from ..registry import register


@register(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(p_name LIKE '%a%' AS BOOLEAN) AS has_a,
           CAST(strpos(p_name, 'e') AS INTEGER) AS first_e,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           trim('  ' || p_name || '  ') AS trimmed
    FROM part
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10: case, length, substring, split, regexp extract/replace,
    concat, LIKE, instr, pad, trim."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.instr("p_name", "e").alias("first_e"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "fn_regex_suite",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)
             AS n_numbers,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '\\bs[a-z]+')) AS INTEGER)
             AS n_s_words,
           regexp_matches(text, 'spark|sql') AS mentions_engine,
           regexp_matches(text, '(?i)TABLE') AS mentions_table_ci,
           COALESCE(array_to_string(
               regexp_extract_all(text, '\\b[a-z]{6,}\\b'), ','), '')
             AS long_words,
           regexp_replace(text, '\\s+', ' ', 'g') AS squashed
    FROM documents
    """,
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: count/extract/extract_all/like/replace with
    case-insensitive flags.  Patterns stay within the common
    Java-regex/RE2 subset (character classes, \\b, alternation, (?i))
    so both engines match identically.  All JVM-side codegen — regex on
    a 100 TB corpus must never drop into Python."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '[0-9]+', 0))").alias(
            "n_numbers"
        ),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.expr(r"size(regexp_extract_all(text, '\\bs[a-z]+', 0))").alias(
            "n_s_words"
        ),
        F.col("text").rlike("spark|sql").alias("mentions_engine"),
        F.col("text").rlike("(?i)TABLE").alias("mentions_table_ci"),
        F.expr(
            r"array_join(regexp_extract_all(text, '\\b[a-z]{6,}\\b', 0), ',')"
        ).alias("long_words"),
        F.regexp_replace("text", r"\s+", " ").alias("squashed"),
    )


@register(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST('0.1' AS DECIMAL(2,1)), 2)
                AS VARCHAR) AS DOUBLE) AS rounded_cents,
           round(sqrt(l_extendedprice), 3) AS rounded_root,
           CAST(floor(l_extendedprice) AS BIGINT) AS floored,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
           abs(l_discount - 0.05) AS abs_diff,
           sqrt(l_quantity) AS root_qty,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           power(l_quantity, 2) AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
           greatest(l_quantity, 25.0) AS g25,
           least(l_quantity, 25.0) AS l25
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F12: round/floor/ceil/abs/sqrt/ln/log10/pow/mod/sign/
    greatest/least.  sqrt is IEEE-exact cross-engine; ln/log10 are
    libm-dependent, hence rounded."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * F.lit("0.1").cast("decimal(2,1)"),
            2,
        )
        .cast("double")
        .alias("rounded_cents"),
        F.round(F.sqrt("l_extendedprice"), 3).alias("rounded_root"),
        F.floor("l_extendedprice").alias("floored"),
        F.ceil("l_extendedprice").alias("ceiled"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.sqrt("l_quantity").alias("root_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.greatest("l_quantity", F.lit(25.0)).alias("g25"),
        F.least("l_quantity", F.lit(25.0)).alias("l25"),
    )


@register(
    "fn_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F13: field extraction, truncation, date arithmetic.  dayofweek
    offset (DuckDB Sunday=0 vs Spark Sunday=1) normalized in the oracle.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("wk"),
        F.quarter("o_orderdate").alias("qtr"),
        ts_us(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start_us"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "fn_array_suite",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding, x -> CAST(x AS DOUBLE))),
               (a, b) -> a + b) AS elem_sum,
           CAST(list_min(embedding) AS DOUBLE) AS elem_min,
           CAST(list_max(embedding) AS DOUBLE) AS elem_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 array suite over the embedding column: size, indexing,
    fold-sum (left-to-right → bit-exact), min/max, filter-count.
    These are the primitives the similarity operators compose."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ).alias("elem_sum"),
        F.array_min("embedding").cast("double").alias("elem_min"),
        F.array_max("embedding").cast("double").alias("elem_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract_string(props, '$.missing') AS INTEGER) AS missing_field,
           printf('{"k":%d}', CAST(json_extract_string(props, '$.k') AS INTEGER)) AS rebuilt
    FROM events
    WHERE event_id < 500
    """,
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 JSON decode (P1 parity): path extraction with missing-field →
    null, plus a deterministic re-encode (printf, not to_json, so both
    engines emit byte-identical strings)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_field"),
        F.format_string('{"k":%d}', k).alias("rebuilt"),
    )


@register(
    "fn_conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
           CAST(nullif(c_acctbal, 0.0) IS NULL AS BOOLEAN) AS is_zero,
           greatest(c_acctbal, 0.0) AS floor_zero,
           CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE NULL END AS pos_or_null
    FROM customer
    """,
)
def fn_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14/null-handling: CASE chains, nullif/coalesce, null-producing
    guards (the engine's default is null-propagation; the reference's
    otherwise(0) quirk is opt-in via enrichment.py)."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias(
            "balance_band"
        ),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_or_default"
        ),
        F.nullif(bal, F.lit(0.0)).isNull().alias("is_zero"),
        F.greatest(bal, F.lit(0.0)).alias("floor_zero"),
        F.when(bal >= 0, bal).alias("pos_or_null"),
    )


@register(
    "fn_hash_digests",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256
    FROM part
    WHERE p_partkey <= 100
    """,
)
def fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: cryptographic digests — the cross-engine-stable hash
    primitives (Spark's hash()/xxhash64 seeds differ from DuckDB's, so
    md5/sha256 are the portable fingerprint functions; dedup builds on
    these)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
    )


@register(
    "fn_map_suite",
    oracle="""
    SELECT event_id,
           event_type,
           CASE event_type
                WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
                WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 3.0
                ELSE 0.0 END AS weight,
           CASE event_type
                WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
                WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 3.0
                ELSE 0.0 END * value AS weighted_value,
           4 AS n_weights,
           'click,purchase,signup,view' AS known_types
    FROM events
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 map suite: map construction + element_at lookup (null →
    coalesce default), size, sorted map_keys — the literal-lookup-table
    pattern that replaces a broadcast join for tiny static mappings."""
    ev = load_table(spark, sf_dir, "events")
    weights = (
        "map('click', 1.0D, 'view', 0.5D, 'purchase', 5.0D, 'signup', 3.0D)"
    )
    return ev.selectExpr(
        "event_id",
        "event_type",
        f"coalesce(element_at({weights}, event_type), 0.0D) AS weight",
        f"coalesce(element_at({weights}, event_type), 0.0D) * value AS weighted_value",
        f"size({weights}) AS n_weights",
        f"array_join(array_sort(map_keys({weights})), ',') AS known_types",
    )


@register(
    "fn_bitwise_suite",
    oracle="""
    SELECT event_id,
           CAST(event_id & 255 AS BIGINT) AS low_byte,
           CAST(event_id | 4096 AS BIGINT) AS with_flag,
           CAST(xor(event_id, user_id) AS BIGINT) AS xor_key,
           CAST(event_id << 3 AS BIGINT) AS shl3,
           CAST(event_id >> 2 AS BIGINT) AS shr2,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-surface bitwise suite: AND/OR/XOR masks, shifts, popcount —
    flag fields, bitmap membership, and hash mixing all reduce to
    these.  Pure codegen'd projections, zero shuffles; both engines
    define identical two's-complement semantics on int64."""
    ev = load_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id",
        "CAST(event_id & 255 AS BIGINT) AS low_byte",
        "CAST(event_id | 4096 AS BIGINT) AS with_flag",
        "CAST(event_id ^ user_id AS BIGINT) AS xor_key",
        "CAST(shiftleft(event_id, 3) AS BIGINT) AS shl3",
        "CAST(shiftright(event_id, 2) AS BIGINT) AS shr2",
        "CAST(bit_count(event_id) AS INT) AS popcount",
    )


@register(
    "fn_bool_agg_suite",
    oracle="""
    SELECT event_type,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 400) AS any_large,
           CAST(count_if(value > 100) AS BIGINT) AS n_over_100,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def fn_bool_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any/count_if) — data-quality assertion
    rollups ("all rows non-negative", "any outlier present") computed
    as one map-side-combinable pass, the monitoring query every
    pipeline runs over each batch."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("every(value >= 0)").alias("all_nonneg"),
        F.expr("any(value > 400)").alias("any_large"),
        F.expr("count_if(value > 100)").cast("bigint").alias("n_over_100"),
        F.count("*").alias("n"),
    )


@register(
    "fn_url_suite",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.org/docs/' || lang
                 || '/' || CAST(doc_id AS VARCHAR) || '?ref=' || lang AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via the native parse_url (host / path /
    query / protocol) over deterministic synthetic crawl URLs — the
    per-domain bucketing primitive of web-curation pipelines (domain
    rate caps, per-site quality priors).  DuckDB has no parse_url, so
    the oracle re-derives each part with anchored regexes; a hash
    match certifies Spark's parser agrees with the RFC-shaped regex
    on this URL family.  Zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id",
        "concat('https://', source, '.example.org/docs/', lang, '/', "
        "CAST(doc_id AS STRING), '?ref=', lang) AS url",
    ).selectExpr(
        "doc_id",
        "url",
        "parse_url(url, 'HOST') AS host",
        "parse_url(url, 'PATH') AS path",
        "parse_url(url, 'QUERY') AS query",
        "parse_url(url, 'PROTOCOL') AS protocol",
    )


@register(
    "fn_try_suite",
    oracle="""
    SELECT event_id,
           -- try_divide returns NULL only at exactly 0: the oracle
           -- guard must be <> 0, not > 0, or the two engines' NULL
           -- sets diverge for negative ids (ADVICE r8).
           CASE WHEN event_id <> 0
                THEN 9223372036854775807 // event_id END AS try_div,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE event_id * 1000000 END AS guarded_mul,
           TRY_CAST(substr(props, 7, 8) AS BIGINT) AS bad_cast,
           TRY_CAST(CAST(2 AS VARCHAR) || CAST(event_id % 100 AS VARCHAR)
                    AS BIGINT) AS ok_cast,
           CASE WHEN event_id = 0 THEN NULL ELSE 100 // event_id END
               AS div_zero_guard
    FROM events
    """,
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-handling surface: the engine runs with strict ANSI
    semantics (overflow/bad-cast/zero-division FAIL LOUDLY — the
    bucket-rule and decimal-carrier contracts depend on that), and
    `try_divide` / `try_multiply` / `try_cast` are the deliberate,
    per-expression escape hatches that degrade to NULL instead.  This
    suite pins the NULL-not-garbage contract on real column data:
    division by a zero key, a cast of non-numeric text (a JSON slice),
    multiplication pushed toward the int64 edge under a guard.  The
    oracle mirrors each escape with an explicit CASE/TRY_CAST, so the
    two engines' notions of "this input fails" are hash-compared, not
    assumed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id",
        "try_divide(9223372036854775807, event_id) AS try_div_raw",
        "CASE WHEN event_id % 3 = 0 THEN NULL"
        " ELSE try_multiply(event_id, 1000000) END AS guarded_mul",
        "try_cast(substr(props, 7, 8) AS BIGINT) AS bad_cast",
        "try_cast(concat('2', CAST(event_id % 100 AS STRING)) AS BIGINT)"
        " AS ok_cast",
        "try_divide(100, event_id) AS div_zero_raw",
    ).selectExpr(
        "event_id",
        # try_divide yields a floating quotient; the integer contract
        # comparable across engines is the floored quotient of the
        # NON-NULL branch — recompute it integrally, keep try_* as the
        # null gate.
        "CASE WHEN try_div_raw IS NOT NULL"
        " THEN 9223372036854775807 div event_id END AS try_div",
        "guarded_mul",
        "bad_cast",
        "ok_cast",
        "CASE WHEN div_zero_raw IS NOT NULL"
        " THEN 100 div event_id END AS div_zero_guard",
    )
