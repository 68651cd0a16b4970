"""Scalar function surface (SURVEY.md §2.8).

All functions here are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen, no Python round-trip. Cross-engine rules:
regexes stay in the RE2 ∩ Java-regex common subset; date functions that
return engine-dependent widths are cast to INTEGER on both sides;
temporal outputs are projected as DATE or formatted strings, never raw
timestamps (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           LOWER(c_name) AS name_lower,
           UPPER(c_mktsegment) AS seg_upper,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name,
           TRIM(CONCAT('  ', c_name, ' ')) AS name_trim,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@query(
    "fn_string_regexp",
    oracle="""
    SELECT p_partkey, p_brand,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_devoweled,
           regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_cheap_line
    FROM part
    """,
)
def fn_string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexes kept in the RE2 ∩ Java common subset: character classes,
    anchors, alternation, capture groups — no lookaround/backrefs.
    Note Spark regexp_replace is global by default; DuckDB needs 'g'."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_cheap_line"),
    )


@query(
    "fn_split_explode",
    oracle="""
    SELECT doc_id, u.word
    FROM documents, unnest(string_split(text, ' ')) AS u(word)
    WHERE lang = 'en' AND doc_id < 50
    """,
)
def fn_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize documents.text → one row per word (fixture text is
    single-space separated, so plain split is a clean tokenizer)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.filter((F.col("lang") == "en") & (F.col("doc_id") < 50))
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER)
               AS days_to_y2k,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction / truncation / arithmetic on o_orderdate.

    dayofweek is deliberately absent (Spark 1=Sunday vs DuckDB 0=Sunday
    — SURVEY §2.8 pitfall); quarter/year/month/day agree. add_months
    output is formatted to a string so both engines' month-end clamping
    is compared textually.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "order_month_start"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_y2k"),
        F.date_format(F.add_months(F.col("o_orderdate").cast("date"), 3), "yyyy-MM-dd")
        .alias("plus3m"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(ABS(l_extendedprice - 30000) * 10000 + 0.5) / 10000 AS abs_dev,
           CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_floor7,
           FLOOR(SQRT(l_extendedprice) * 10000 + 0.5) / 10000 AS price_sqrt,
           FLOOR(LN(l_extendedprice) * 10000 + 0.5) / 10000 AS price_ln,
           FLOOR(LOG10(l_extendedprice) * 10000 + 0.5) / 10000 AS price_log10,
           FLOOR(POW(l_discount, 2) * 10000 + 0.5) / 10000 AS disc_sq,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/log10/pow/mod — all whole-stage
    codegen'd JVM intrinsics; transcendentals IEEE-identical to DuckDB
    (both call libm double versions), pinned by stable floor-rounding."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round4(F.abs(F.col("l_extendedprice") - 30000)).alias("abs_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor7"),
        round4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        round4(F.log(F.col("l_extendedprice"))).alias("price_ln"),
        round4(F.log10("l_extendedprice")).alias("price_log10"),
        round4(F.pow("l_discount", F.lit(2))).alias("disc_sq"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS name_nz,
           GREATEST(s_acctbal, 0.0) AS bal_floor0,
           LEAST(s_acctbal, 9999.0) AS bal_cap
    FROM supplier
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_nz"
        ),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("s_acctbal"), F.lit(9999.0)).alias("bal_cap"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           FLOOR(CAST(list_max(embedding) AS DOUBLE) * 10000 + 0.5) / 10000 AS max_elem,
           FLOOR(CAST(list_min(embedding) AS DOUBLE) * 10000 + 0.5) / 10000 AS min_elem,
           FLOOR(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) / 10000 AS first_elem,
           CAST(len(list_distinct(embedding)) AS INTEGER) AS n_distinct
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the fp32 embedding column. Raw float arrays
    are never projected (fp32 repr drift); every extracted element is
    cast to double — exact widening on both engines — then stably
    rounded."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        round4(F.array_max("embedding").cast("double")).alias("max_elem"),
        round4(F.array_min("embedding").cast("double")).alias("min_elem"),
        round4(F.element_at("embedding", 1).cast("double")).alias("first_elem"),
        F.size(F.array_distinct("embedding")).alias("n_distinct"),
    )


@query(
    "fn_array_transform",
    oracle="""
    SELECT vec_id,
           FLOOR(SQRT(list_reduce(
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b)) * 10000 + 0.5) / 10000 AS l2_norm,
           FLOOR((list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                              (a, b) -> a + b) / len(embedding)) * 10000 + 0.5) / 10000
               AS mean_elem,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
)
def fn_array_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform/aggregate/filter compute
    the L2 norm, mean and positive-count of each embedding JVM-side.

    Both sides fold in array order (Spark ``aggregate``, DuckDB
    ``list_reduce``), so the float sums are bit-identical.
    """
    e = table(spark, sf_dir, "embeddings")
    sq_sum = F.expr(
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " 0.0D, (a, b) -> a + b)"
    )
    el_sum = F.expr(
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0.0D, (a, b) -> a + b)"
    )
    return e.select(
        "vec_id",
        round4(F.sqrt(sq_sum)).alias("l2_norm"),
        round4(el_sum / F.size("embedding")).alias("mean_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS k_max
    FROM events
    WHERE CAST(props->>'$.k' AS INTEGER) >= 50
    GROUP BY event_type
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract props.k from the JSON payload,
    filter and aggregate on it (the archetype's tweet-JSON shape)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests of document text (exact-dedup support:
    hash once, group on the fixed-width digest instead of long text)."""
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT) AS key_and,
           CAST(l_orderkey | 4096 AS BIGINT) AS key_or,
           CAST(xor(l_orderkey, 1365) AS BIGINT) AS key_xor,
           CAST(l_orderkey << 2 AS BIGINT) AS key_shl,
           CAST(l_orderkey >> 3 AS BIGINT) AS key_shr
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey < 5000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor/shifts on the key column (hash-partitioning
    and bitmap-index building blocks)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 5000)
    ).select(
        "l_orderkey",
        F.expr("l_orderkey & 255").alias("key_and"),
        F.expr("l_orderkey | 4096").alias("key_or"),
        F.expr("l_orderkey ^ 1365").alias("key_xor"),
        F.expr("shiftleft(l_orderkey, 2)").alias("key_shl"),
        F.expr("shiftright(l_orderkey, 3)").alias("key_shr"),
    )


@query(
    "fn_levenshtein",
    oracle="""
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_dist
    FROM supplier a JOIN supplier b ON b.s_suppkey = a.s_suppkey + 1
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between consecutive supplier names — the
    fuzzy-matching primitive for entity resolution (both engines
    implement classic Levenshtein, so counts match exactly)."""
    s = table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("supp_a"), F.col("s_name").alias("na"))
    b = s.select(F.col("s_suppkey").alias("supp_b"), F.col("s_name").alias("nb"))
    return (
        a.join(b, F.col("supp_b") == F.col("supp_a") + 1)
        .select(
            "supp_a",
            "supp_b",
            F.levenshtein("na", "nb").alias("edit_dist"),
        )
    )


@query(
    "fn_null_semantics",
    oracle="""
    WITH j AS (
        SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    )
    SELECT c_custkey, o_orderkey,
           (o_orderkey IS NOT DISTINCT FROM NULL) AS is_unmatched,
           COALESCE(CAST(o_totalprice AS VARCHAR), 'none') AS total_str,
           CASE WHEN o_totalprice IS NULL THEN -1.0
                ELSE ROUND(o_totalprice, 4) END AS total_or_flag,
           (CASE WHEN o_totalprice IS NULL THEN NULL
                 ELSE o_totalprice END > 460000) AS big_or_null
    FROM j
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: null-safe equality (``<=>`` /
    IS NOT DISTINCT FROM), NULL propagation through comparisons and
    CASE, and NULL-to-sentinel coalescing — exercised on the
    null-extended side of an outer join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.col("o_orderkey").eqNullSafe(F.lit(None)).alias("is_unmatched"),
        F.coalesce(F.col("o_totalprice").cast("string"), F.lit("none")).alias(
            "total_str"
        ),
        F.when(F.col("o_totalprice").isNull(), -1.0)
        .otherwise(F.round("o_totalprice", 4))
        .alias("total_or_flag"),
        (F.col("o_totalprice") > 460000).alias("big_or_null"),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INTEGER) AS brand_num,
           TRY_CAST(p_type AS INTEGER) AS type_as_int,
           TRY_CAST(SUBSTR(p_name, 1, 2) AS DOUBLE) AS name_prefix_num
    FROM part
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting under ANSI mode (Spark 4 default): try_cast
    yields NULL where a plain CAST would raise — the ingestion-path
    idiom for dirty columns. Mirrored by DuckDB's TRY_CAST."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_to_number(
            F.regexp_extract("p_brand", "#([0-9]+)", 1), F.lit("999")
        ).cast("int").alias("brand_num"),
        F.expr("TRY_CAST(p_type AS INT)").alias("type_as_int"),
        F.expr("TRY_CAST(SUBSTR(p_name, 1, 2) AS DOUBLE)").alias("name_prefix_num"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN CAST(props->>'$.k' AS INTEGER) > 50 THEN 1 END)
               AS n_over_50
    FROM events GROUP BY event_type
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` once into a typed
    semi-structured value, then ``variant_get`` typed extractions —
    the modern replacement for repeated ``get_json_object`` string
    parsing (the VARIANT is a decoded binary representation, so N
    extractions don't re-parse N times; fn_map_json is the legacy
    twin). Aggregated per event_type; oracle uses DuckDB's JSON
    operators over the same props column."""
    e = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_over_50"),
        )
    )


@query(
    "fn_collation_aware",
    oracle="""
    SELECT lower(c_mktsegment) AS segment_ci,
           COUNT(*) AS n,
           COUNT(CASE WHEN c_name ILIKE '%a%' THEN 1 END) AS n_with_a
    FROM customer GROUP BY 1
    """,
)
def fn_collation_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4 ``COLLATE``):
    case-insensitive grouping and matching declared AT THE EXPRESSION
    level instead of scattering lower() calls — the engine can then
    push collation into comparisons, joins, and aggregations. Grouping
    key is projected back through lower() so both engines emit the
    same canonical form; the ILIKE-equivalent match runs under
    UTF8_LCASE collation Spark-side."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            F.expr("c_mktsegment COLLATE UTF8_LCASE").alias("seg_ci"),
            F.expr(
                "CASE WHEN (c_name COLLATE UTF8_LCASE) LIKE '%a%' "
                "THEN 1 END"
            ).alias("has_a"),
        )
        .groupBy("seg_ci")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("has_a").alias("n_with_a"),
        )
        .select(
            F.lower(F.col("seg_ci")).alias("segment_ci"), "n", "n_with_a"
        )
    )


@query(
    "fn_nested_struct",
    oracle="""
    SELECT c_custkey,
           (s).name AS name,
           ((s).fin).bal AS bal,
           ((s).fin).seg AS seg
    FROM (
        SELECT c_custkey,
               struct_pack(name := c_name,
                           fin := struct_pack(
                               bal := FLOOR(c_acctbal * 10000 + 0.5) / 10000,
                               seg := c_mktsegment)) AS s
        FROM customer
    )
    WHERE ((s).fin).bal > 5000.0
    """,
)
def fn_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct construction and field access: build a two-level
    struct, filter on an inner field, project leaves back out — the
    nested data model every log/API schema brings. Catalyst prunes
    straight through struct fields (the scan reads only the three used
    columns; the struct never materializes as a row object in the
    plan), so nesting costs nothing at scan time — unlike
    string-encoded JSON, which re-parses per access (fn_map_json)."""
    c = table(spark, sf_dir, "customer")
    nested = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.struct(
                round4(F.col("c_acctbal")).alias("bal"),
                F.col("c_mktsegment").alias("seg"),
            ).alias("fin"),
        ).alias("s"),
    )
    return nested.filter(F.col("s.fin.bal") > 5000.0).select(
        "c_custkey",
        F.col("s.name").alias("name"),
        F.col("s.fin.bal").alias("bal"),
        F.col("s.fin.seg").alias("seg"),
    )


@query(
    "fn_url_extract",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/' || lang || '/doc-'
                   || CAST(doc_id AS VARCHAR) || '?q='
                   || split_part(text, ' ', 1) AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param,
           regexp_extract(url, '\\.([a-z]+)\\.[a-z]+/', 1) AS subdomain_tld
    FROM u
    """,
)
def fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing as pure regexp_extract — host, path, query
    parameter, and a capture-group slice — over URLs synthesized from
    document metadata (the fixtures carry no URL column; the
    mechanics, not the corpus, are what the key pins). The patterns
    are deliberately lookaround-free and anchor-simple so Java regex
    (Spark) and RE2-ish DuckDB agree character-for-character; Spark's
    dedicated parse_url() is avoided because the oracle engine has no
    equivalent and the regex form IS the portable contract. Row-local
    expression work — whole-stage codegen, no shuffle at any scale."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.substring_index("text", " ", 1),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, r"^https?://([^/?#]+)", 1).alias("host"),
        F.regexp_extract(url, r"^https?://[^/?#]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract(url, r"[?&]q=([^&#]*)", 1).alias("q_param"),
        F.regexp_extract(url, r"\.([a-z]+)\.[a-z]+/", 1).alias(
            "subdomain_tld"
        ),
    )


@query(
    "fn_array_setops",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               ['the', 'a', 'data', 'join', 'spark'] AS probe
        FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(toks, x -> list_contains(probe, x)))), '|'), '')
               AS inter,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(toks, x -> NOT list_contains(probe, x)))), '|'),
               '') AS except_probe,
           CAST(len(list_distinct(list_concat(toks, probe))) AS INTEGER)
               AS n_union
    FROM t
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations — intersection, difference, distinct-union
    cardinality — of each document's token array against a literal
    probe vocabulary. Both engines express all three through the SAME
    filter/contains/distinct/sort composition rather than their native
    array_intersect/list_intersect, whose dedup-and-order conventions
    are engine-specific: the sorted-distinct normal form makes array
    VALUES hash-comparable. Both array results are projected as
    '|'-joined STRINGS (concat_ws / array_to_string), never raw
    arrays — the driver's pandas canonicalizer cannot sort
    list-typed cells (r5 driver-red: TypeError unhashable list),
    and scalar outputs keep the oracle hash format-independent
    (same rule as agg_collect). Pure higher-order JVM expressions —
    the lambda runs inside codegen, zero shuffles, linear at any
    scale."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    probe = F.array(*[F.lit(w) for w in ("the", "a", "data", "join", "spark")])
    return d.select(
        "doc_id",
        F.concat_ws(
            "|",
            F.array_sort(
                F.array_distinct(
                    F.filter(toks, lambda x: F.array_contains(probe, x))
                )
            ),
        ).alias("inter"),
        F.concat_ws(
            "|",
            F.array_sort(
                F.array_distinct(
                    F.filter(toks, lambda x: ~F.array_contains(probe, x))
                )
            ),
        ).alias("except_probe"),
        F.size(F.array_distinct(F.concat(toks, probe))).alias("n_union"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
    SELECT p_partkey,
           coalesce(array_to_string(
               list_filter(string_split(p_name, ' '), x -> length(x) > 5),
               '|'), '') AS long_words,
           coalesce(array_to_string(
               list_transform(string_split(p_name, ' '), x -> upper(x)),
               '|'), '') AS upper_words,
           CAST(list_sum(list_transform(string_split(p_name, ' '),
                                        x -> length(x))) AS BIGINT)
               AS total_chars,
           list_has_any(string_split(p_name, ' '),
                        ['widget', 'gear']) AS is_mechanical
    FROM part
    """,
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions with lambda arguments — filter,
    transform, fold, and set-overlap over a split column, the
    expression family fn_array_transform only samples (transform) and
    the vector kernels use internally (vector.py's zip_with/aggregate
    folds). Everything stays inside whole-stage codegen: the lambdas
    compile to JVM expressions, no UDF. The fold is written as
    transform-to-lengths THEN sum on BOTH engines because the raw
    fold primitives disagree: Spark's aggregate() takes an explicit
    zero, DuckDB's list_reduce seeds from the first element — summing
    a transformed list is the form with one shared semantics (and it
    is empty-safe where list_reduce throws). The two array-valued
    results are projected as '|'-joined strings (concat_ws /
    array_to_string) per the agg_collect rule: raw array outputs
    crash the driver's pandas canonicalizer and make hashes
    format-dependent."""
    p = table(spark, sf_dir, "part")
    arr = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.concat_ws("|", F.filter(arr, lambda x: F.length(x) > 5)).alias(
            "long_words"
        ),
        F.concat_ws("|", F.transform(arr, F.upper)).alias("upper_words"),
        F.aggregate(
            F.transform(arr, F.length),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("bigint")
        .alias("total_chars"),
        F.arrays_overlap(arr, F.array(F.lit("widget"), F.lit("gear"))).alias(
            "is_mechanical"
        ),
    )


@query(
    "fn_regexp_replace_backrefs",
    oracle=r"""
    SELECT c_custkey,
           regexp_replace(c_name, '^(\w+)#(\d+)$', '\2:\1') AS swapped,
           regexp_replace(c_name, '^(\w+)#0*(\d+)$', '\1-\2') AS compact,
           regexp_replace(c_name, '\d', '#', 'g') AS masked
    FROM customer
    """,
)
def fn_regexp_replace_backrefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group backreferences in regexp_replace — group swap,
    leading-zero compaction (greedy 0* before the captured digits),
    and global digit masking. The pinned cross-engine trap is pure
    SYNTAX: Java replacement strings write backrefs as $1/$2, RE2
    writes \\1/\\2 — the same logical replacement must be spelled
    differently per engine, which is exactly the kind of silent
    mistranslation a migration harness has to catch (a $1 shipped to
    DuckDB is a literal dollar-one). Patterns themselves stay in the
    RE2∩Java-safe subset (text_pii_redaction contract); Spark's
    regexp_replace is global by default where DuckDB needs the 'g'
    flag — the masked column pins that second asymmetry too."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace(F.col("c_name"), r"^(\w+)#(\d+)$", r"$2:$1").alias(
            "swapped"
        ),
        F.regexp_replace(
            F.col("c_name"), r"^(\w+)#0*(\d+)$", r"$1-$2"
        ).alias("compact"),
        F.regexp_replace(F.col("c_name"), r"\d", "#").alias("masked"),
    )


@query(
    "fn_binary_encoding",
    oracle="""
    SELECT doc_id,
           base64(encode(SUBSTRING(text, 1, 24))) AS b64,
           hex(SUBSTRING(text, 1, 8)) AS hx,
           decode(from_base64(base64(encode(SUBSTRING(text, 1, 24)))))
               = SUBSTRING(text, 1, 24) AS roundtrip_ok,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id < 100
    """,
)
def fn_binary_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary↔text encodings: base64 and hex of UTF-8 text bytes, the
    decode-and-compare roundtrip, and the BYTE length (vs the
    character length fn_string reports — they diverge the moment a
    non-ASCII codepoint appears, a classic ingestion off-by-N). The
    pinned dialect facts: both engines emit RFC-4648 base64 with
    padding and UPPERCASE hex, but DuckDB types the operand as BLOB
    (explicit encode()/decode() around the text) while Spark casts
    string→binary implicitly — the same logical pipeline spelled with
    different casts, which is exactly what a migration has to map.
    Pure narrow map, expression-only."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    prefix = F.substring(F.col("text"), 1, 24)
    return d.select(
        "doc_id",
        F.base64(prefix.cast("binary")).alias("b64"),
        F.hex(F.substring(F.col("text"), 1, 8).cast("binary")).alias("hx"),
        (
            F.unbase64(F.base64(prefix.cast("binary"))).cast("string")
            == prefix
        ).alias("roundtrip_ok"),
        F.length(F.col("text").cast("binary"))
        .cast("bigint")
        .alias("n_bytes"),
    )
