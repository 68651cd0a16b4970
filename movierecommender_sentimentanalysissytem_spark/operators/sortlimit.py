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
