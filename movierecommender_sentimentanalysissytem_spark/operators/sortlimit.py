"""Sort / limit / top-k / sampling (SURVEY.md §2.6).

Scale notes: ``.orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject — each partition keeps its local top-k and only k
rows per partition reach the driver-side merge, so a top-100 over 100 TB
never materializes a global sort. Plan-asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


@query(
    "sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 4) AS total
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT with a unique trailing tiebreaker
    (o_orderkey) so the top-50 set is identical on both engines."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 4).alias("total"),
        )
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 41..60 of a deterministic total order."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("total"))
    )


@query("sample_deterministic")
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (rows-only: Spark's XORShift RNG and any
    SQL engine's RNG pick different rows for the same seed by design).

    At scale ``.sample`` is the right primitive — per-partition,
    no shuffle, no coordination.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query("sample_train_test_split")
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archetype's train/test split (randomSplit 80/20, seeded)
    summarized per split: row count and mean rating. rows-only (the
    RNG is Spark-specific); ml/pipelines trains on full data instead
    precisely because split sizes depend on partitioning."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    ratings = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("user"),
        F.col("l_partkey").alias("item"),
        F.col("l_quantity").alias("rating"),
    )
    train, test = ratings.randomSplit([0.8, 0.2], seed=42)
    return (
        train.withColumn("split", F.lit("train"))
        .unionByName(test.withColumn("split", F.lit("test")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("rating"), 4).alias("avg_rating"),
        )
    )


@query("sample_stratified")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-stratum fractions — keep all
    rare 'error'/'signup' events, thin the dominant 'view' class. The
    class-rebalancing primitive for training-data curation. rows-only
    (seeded Spark RNG)."""
    e = table(spark, sf_dir, "events")
    sampled = e.sampleBy(
        "event_type",
        {"view": 0.1, "click": 0.5, "purchase": 1.0, "signup": 1.0, "error": 1.0},
        seed=42,
    )
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
