"""Scans, filters, projections (SURVEY.md §2.1, §2.2).

Scale notes: every query here is a single parquet scan with predicates
and projections expressed declaratively, so Catalyst pushes filters to
the parquet reader (row-group skipping) and prunes columns (ReadSchema
shows only referenced columns). At 100 TB these scans are
embarrassingly parallel — no shuffle in any plan in this module except
the aggregate that follows a scan.
"""

from __future__ import annotations

import os

from movierecommender_sentimentanalysissytem_spark.scratch import mkscratch

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4
from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


# ---------------------------------------------------------------- §2.1 scans

@query(
    "scan_parquet",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan: count + checksum over the fact table."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("sum_orderkey"),
    )


@query(
    "scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_quantity, 4) AS qty
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan reading 3 of 11 columns with a pushed-down predicate.

    ``.explain`` must show PushedFilters: [GreaterThan(l_quantity,45.0)]
    and a ReadSchema limited to the three columns — asserted in
    tests/test_plans.py.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 4).alias("qty"),
        )
    )


@query(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source (the reference archetype's actual input format).

    Round-trips a slice of ``nation`` through a temp CSV with an
    explicit schema (schema-on-read, no inference job at scale).
    SQL-checked: the round-trip must reproduce the nation view exactly.
    """
    nation = table(spark, sf_dir, "nation")
    out = os.path.join(mkscratch("mrsas_csv_"), "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .csv(out)
        .orderBy("n_nationkey")
    )


@query(
    "scan_json",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON lines source (the archetype's tweet-stream format).

    Round-trips ``region`` through temp JSON with explicit schema.
    """
    region = table(spark, sf_dir, "region")
    out = os.path.join(mkscratch("mrsas_json_"), "region_json")
    region.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    return spark.read.schema(schema).json(out).orderBy("r_regionkey")


@query(
    "sink_parquet",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet write + re-read round-trip (results/model export path)."""
    orders = table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )
    out = os.path.join(mkscratch("mrsas_sink_"), "orders_agg")
    agg.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).orderBy("o_orderstatus")


# ------------------------------------------------- §2.2 filter / projection

@query(
    "filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    WHERE l_quantity > 30
    """,
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
           ROUND(o_totalprice, 4) AS total
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND (o_totalprice BETWEEN 1000 AND 200000)
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND NOT (o_custkey IS NULL)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL in one predicate tree."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 200000)
            & (
                F.col("o_orderpriority").like("1-%")
                | F.col("o_orderpriority").like("2-%")
            )
            & ~F.col("o_custkey").isNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            F.round("o_totalprice", 4).alias("total"),
        )
    )


@query(
    "project_expressions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS disc_price,
           FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) / 10000 AS charge,
           CAST(l_quantity * 2 AS DOUBLE) AS double_qty
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def project_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections. Uses the floor-based stable round
    (functions/rounding.py): ROUND(x,4) hit a half-way rounding-mode
    divergence between Spark and DuckDB on this column."""
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        round4(disc).alias("disc_price"),
        round4(disc * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2).cast("double").alias("double_qty"),
    )


@query(
    "project_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_norm
    FROM orders
    """,
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_norm"
        ),
    )


@query(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int↔double↔string↔date casts (l_quantity is a whole-valued double
    in the fixtures, so double→int truncation is exact on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


@query(
    "scan_orc",
    oracle="SELECT s_suppkey, s_name, s_nationkey, ROUND(s_acctbal, 4) AS acctbal FROM supplier",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round-trip (Spark's second first-class columnar
    format; same vectorized reader + pushdown machinery as parquet).
    SQL-checked: must reproduce the supplier view exactly."""
    supplier = table(spark, sf_dir, "supplier")
    out = os.path.join(mkscratch("mrsas_orc_"), "supplier_orc")
    supplier.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round("s_acctbal", 4).alias("acctbal"),
    )


@query(
    "sink_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           FLOOR(SUM(c_acctbal) * 10000 + 0.5) / 10000 AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write + schema-on-read round-trip (the export format every
    downstream spreadsheet/BI consumer still asks for). The write is
    header-ful, the read back infers nothing — an explicit schema, so
    type fidelity does not depend on inference (the classic CSV trap:
    inferSchema re-reads the data AND can flip types between runs)."""
    c = table(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.sum("c_acctbal")).alias("total_bal"),
    )
    out = os.path.join(mkscratch("mrsas_sink_"), "seg_agg_csv")
    agg.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(
        "c_mktsegment string, n bigint, total_bal double"
    ).option("header", True).csv(out)


@query(
    "sink_json_roundtrip",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           FLOOR(AVG(o_totalprice) * 10000 + 0.5) / 10000 AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write + explicit-schema read-back (the API/export
    sibling of sink_csv_roundtrip; also the shape of every
    event-stream landing zone). Explicit schema on read — schema
    inference over JSON costs a full extra pass at 100 TB."""
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.avg("o_totalprice")).alias("avg_price"),
    )
    out = os.path.join(mkscratch("mrsas_sink_"), "prio_json")
    agg.write.mode("overwrite").json(out)
    return spark.read.schema(
        "o_orderpriority string, n bigint, avg_price double"
    ).json(out)


@query(
    "scan_text_lines",
    oracle="""
    SELECT lang, COUNT(*) AS n_lines,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text source (``spark.read.text`` — one row per line): the
    ingestion format of every log/corpus pipeline before schema exists.

    Round-trips documents as ``lang<TAB>text`` lines through a temp
    text directory, reads them back schemaless, and re-derives the
    per-language profile — proving the line round-trip loses nothing.
    Document texts are single-line in this corpus (no embedded
    newlines), so lines == documents; a corpus with embedded newlines
    would use ``wholetext`` or a length-prefixed frame instead.

    NULL text is written as an empty field (``coalesce(text, '')``)
    rather than dropped: ``concat_ws`` would otherwise skip the NULL
    and emit a tab-less line whose read-back would misparse lang as
    text. An empty field keeps the line count identical to the
    oracle's ``COUNT(*)`` and contributes 0 chars, exactly like the
    oracle's NULL-ignoring ``SUM(LENGTH(text))``."""
    d = table(spark, sf_dir, "documents").select(
        F.concat_ws(
            "\t", F.col("lang"), F.coalesce(F.col("text"), F.lit(""))
        ).alias("value")
    )
    out = os.path.join(mkscratch("mrsas_text_"), "docs_txt")
    d.write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.substring_index("value", "\t", 1).alias("lang"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )
