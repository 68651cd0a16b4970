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


@query(
    "subq_any_all",
    oracle="""
    SELECT o_orderkey, FLOOR(o_totalprice * 10000 + 0.5) / 10000 AS total
    FROM orders
    WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders
                              WHERE o_custkey % 100 = 0)
      AND o_totalprice < ANY (SELECT o_totalprice * 1.5 FROM orders
                              WHERE o_orderpriority = '1-URGENT')
    """,
)
def subq_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (> ALL / < ANY) — an operator Spark SQL
    lacks outright, expressed by its monotone rewrite: ``> ALL S`` ≡
    ``> max(S)`` and ``< ANY S`` ≡ ``< max(S)`` (for non-empty S with
    no NULLs — both hold for this fixture slice; the general form
    needs the null/empty guards Catalyst's IN-rewrite carries). The
    two subquery aggregates collapse to one broadcast 1-row bound set,
    so the filter runs at scan speed — the oracle keeps the literal
    ALL/ANY syntax to prove semantic equivalence."""
    from pyspark.sql import functions as F
    from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4

    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.max(
            F.when(F.col("o_custkey") % 100 == 0, F.col("o_totalprice"))
        ).alias("all_max"),
        F.max(
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                F.col("o_totalprice") * 1.5,
            )
        ).alias("any_max"),
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("o_totalprice") > F.col("all_max"))
            & (F.col("o_totalprice") < F.col("any_max"))
        )
        .select("o_orderkey", round4(F.col("o_totalprice")).alias("total"))
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1995-01-01 00:00:00'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '2001-08-01 00:00:00'
    )
    SELECT strftime(m, '%Y-%m') AS month, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): a month spine generated by
    recursion, LEFT-joined to per-month order counts so empty months
    still appear — the gap-proof time series every reporting layer
    needs (the non-recursive twin is timeseries_gapfill's
    sequence()-explode). The recursion is driver-bounded (80 rows) and
    the spine broadcasts into the join; DuckDB runs the identical
    WITH RECURSIVE text."""
    _view(spark, sf_dir, "orders", "sq_orders_r")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT TIMESTAMP '1995-01-01 00:00:00'
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        )
        SELECT date_format(m, 'yyyy-MM') AS month, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN sq_orders_r ON date_trunc('MONTH', o_orderdate) = m
        GROUP BY m
        """
    )


@query(
    "subq_not_in_nulls",
    oracle="""
    SELECT
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN (
             SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                         ELSE o_custkey END
             FROM orders)) AS n_not_in,
        (SELECT COUNT(*) FROM customer c
         WHERE NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE (CASE WHEN o.o_orderstatus = 'P' THEN NULL
                         ELSE o.o_custkey END) = c.c_custkey))
            AS n_not_exists
    """,
)
def subq_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — the classic three-valued-
    logic trap, pinned as a semantic contract: the subquery maps
    pending orders' keys to NULL, so ``NOT IN`` (x <> ALL) can never
    be TRUE once one NULL exists (n_not_in = 0 whenever a 'P' order
    exists), while ``NOT EXISTS`` ignores the NULLs and counts
    customers with no non-pending order. Catalyst plans NOT IN as a
    null-aware anti join (a broadcast of the key set + null flag, NOT
    a per-row subquery) and NOT EXISTS as an ordinary left-anti —
    both single-pass at scale. One fixed-width row out."""
    _view(spark, sf_dir, "customer", "sq_customer")
    _view(spark, sf_dir, "orders", "sq_orders")
    return spark.sql(
        """
        SELECT
            (SELECT COUNT(*) FROM sq_customer
             WHERE c_custkey NOT IN (
                 SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                             ELSE o_custkey END
                 FROM sq_orders)) AS n_not_in,
            (SELECT COUNT(*) FROM sq_customer c
             WHERE NOT EXISTS (
                 SELECT 1 FROM sq_orders o
                 WHERE (CASE WHEN o.o_orderstatus = 'P' THEN NULL
                             ELSE o.o_custkey END) = c.c_custkey))
                AS n_not_exists
        """
    )


@query(
    "subq_relational_division",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_priorities
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey, CAST(n_priorities AS BIGINT) AS n_priorities
    FROM per_cust
    WHERE n_priorities = (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
    """,
)
def subq_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — "customers who have ordered under EVERY
    priority level": the universal-quantification operator the other
    subquery keys (IN/EXISTS/ANY/ALL) can't express. The textbook
    double-NOT-EXISTS form re-probes the divisor per candidate; the
    scalable rewrite is COUNT-MATCHING — one distinct-count rollup per
    customer equi-compared against the divisor's distinct count, which
    Catalyst evaluates once as an uncorrelated scalar subquery
    (subq_scalar class) and folds into a literal filter. At 100 TB:
    one aggregate shuffle on the group key, a scalar job for the
    divisor, zero joins. The divisor set is data-derived, not a
    literal — new priority values tighten the division automatically."""
    _view(spark, sf_dir, "orders", "rd_orders")
    return spark.sql(
        """
        WITH per_cust AS (
            SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_priorities
            FROM rd_orders GROUP BY o_custkey
        )
        SELECT o_custkey AS custkey,
               CAST(n_priorities AS BIGINT) AS n_priorities
        FROM per_cust
        WHERE n_priorities =
              (SELECT COUNT(DISTINCT o_orderpriority) FROM rd_orders)
        """
    )


@query(
    "sql_view_masked",
    oracle="""
    SELECT c_custkey,
           CONCAT(SUBSTRING(c_name, 1, 9), '***') AS masked_name,
           c_mktsegment,
           FLOOR(c_acctbal * 10000 + 0.5) / 10000 AS acctbal
    FROM customer
    WHERE c_acctbal >= 0
    """,
)
def sql_view_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A masked, row-filtered VIEW as the governed access path: the
    consumer queries a temp view that masks the customer name to a
    prefix and filters out negative-balance rows — the
    poor-man's-row-level-security pattern (real RLS/column masking is
    a catalog feature; the VIEW layer is how an engine without one
    enforces the same contract, and how this engine would expose
    redacted tables to a training-data export). The view definition
    is SQL (Catalyst inlines it — a view adds ZERO runtime cost, the
    plan is identical to the inlined query, so filters still push to
    the scan), and the consumer query never touches the base table
    name."""
    _view(spark, sf_dir, "customer", "mv_customer_base")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW mv_customer_masked AS
        SELECT c_custkey,
               CONCAT(SUBSTRING(c_name, 1, 9), '***') AS masked_name,
               c_mktsegment,
               FLOOR(c_acctbal * 10000 + 0.5) / 10000 AS acctbal
        FROM mv_customer_base
        WHERE c_acctbal >= 0
        """
    )
    return spark.sql("SELECT * FROM mv_customer_masked")


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           FLOOR(SUM(o_totalprice) * 10000 + 0.5) / 10000 AS total
    FROM orders
    WHERE o_totalprice > 200000 AND o_orderdate >= DATE '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL binding (``spark.sql(query, args={...})``):
    the injection-safe templating surface — parameters are bound as
    typed literals by the PARSER, not string-spliced, so a hostile
    value cannot change the query shape and Catalyst still constant-
    folds them (same plan as hand-inlined literals; the filters push
    to the scan). The oracle inlines the same constants — what's
    pinned is that binding is semantically identical to inlining."""
    _view(spark, sf_dir, "orders", "pq_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               FLOOR(SUM(o_totalprice) * 10000 + 0.5) / 10000 AS total
        FROM pq_orders
        WHERE o_totalprice > :min_total AND o_orderdate >= :since
        GROUP BY o_orderpriority
        """,
        args={"min_total": 200000, "since": "1996-01-01"},
    )
