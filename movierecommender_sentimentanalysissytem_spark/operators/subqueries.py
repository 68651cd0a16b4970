"""Subquery shapes (SURVEY.md §4: Catalyst's subquery decorrelation).

The archetype's "movies rated above average" analytics generalize to
three subquery classes: scalar, IN, and correlated EXISTS/scalar.
Catalyst rewrites each into joins (RewriteCorrelatedScalarSubquery /
RewritePredicateSubquery) — expressed here through the SQL path so the
rewrite rules are exercised, with the physical result staying a
broadcast/shuffle join that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


def _view(spark: SparkSession, sf_dir: str, name: str, alias: str) -> None:
    table(spark, sf_dir, name).createOrReplaceTempView(alias)


@query(
    "subq_scalar",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS total
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 1.5× the global mean.
    Catalyst evaluates the scalar once and broadcasts it as a literal
    filter — one extra tiny job, no per-row recomputation."""
    _view(spark, sf_dir, "orders", "sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS total
        FROM sq_orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM sq_orders)
        """
    )


@query(
    "subq_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey IN (SELECT r_regionkey FROM region
                              WHERE r_name IN ('ASIA', 'EUROPE'))
    )
    """,
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries → rewritten to left-semi joins (the dim
    side is fixed-cardinality, so both semis broadcast)."""
    _view(spark, sf_dir, "customer", "sq_customer")
    _view(spark, sf_dir, "nation", "sq_nation")
    _view(spark, sf_dir, "region", "sq_region")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM sq_customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM sq_nation
            WHERE n_regionkey IN (SELECT r_regionkey FROM sq_region
                                  WHERE r_name IN ('ASIA', 'EUROPE'))
        )
        """
    )


@query(
    "subq_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 4) AS total
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5× above their own
    customer's average. Catalyst decorrelates to an aggregate + join on
    o_custkey — the scalable plan (one shuffle keyed on the correlation
    column), never a per-row re-scan."""
    _view(spark, sf_dir, "orders", "sq_orders_c")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 4) AS total
        FROM sq_orders_c o
        WHERE o.o_totalprice > 1.5 * (
            SELECT AVG(o2.o_totalprice) FROM sq_orders_c o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )
