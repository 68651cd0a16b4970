"""Set operations (SURVEY.md §2.7).

Semantics pinned explicitly: UNION ALL (bag), UNION DISTINCT,
INTERSECT (distinct), EXCEPT ALL (bag difference) — each mirrored with
the same keyword on the DuckDB side so ALL-vs-DISTINCT never drifts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark.registry import query
from movierecommender_sentimentanalysissytem_spark.sources.tables import table


def _urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


def _big(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select("o_custkey")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (duplicates preserved) — zero-shuffle concatenation."""
    return _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics on both engines)."""
    return _urgent(spark, sf_dir).intersect(_big(spark, sf_dir))


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — ``exceptAll`` mirrors DuckDB's
    EXCEPT ALL; plain ``subtract`` would be EXCEPT DISTINCT)."""
    return _urgent(spark, sf_dir).exceptAll(_big(spark, sf_dir))


@query(
    "set_union_schema_evolution",
    oracle="""
    SELECT * FROM (
        SELECT doc_id, text, NULL AS lang, NULL AS n_chars
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL BY NAME
        SELECT doc_id, text, lang, n_chars
        FROM documents WHERE doc_id % 3 = 1
    )
    """,
)
def set_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across schema versions: a v1 slice (doc_id, text) and a
    v2 slice that added lang/n_chars, reconciled BY NAME with null
    fill — ``unionByName(allowMissingColumns=True)``, the ingest
    pattern for sources whose schema widened mid-stream. Positional
    UNION would silently misalign columns; by-name reconciliation is
    the only shape that survives schema evolution at 100 TB (same
    contract the parquet mergeSchema read in scan_schema_evolution
    pins on the storage side)."""
    d = table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    v2 = d.filter(F.col("doc_id") % 3 == 1).select(
        "doc_id", "text", "lang", "n_chars"
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection: each key kept min(m, n) times)
    — completes the ALL/DISTINCT matrix with set_intersect /
    set_except / set_union_*. Spark plans ``intersectAll`` as a
    count-matching aggregate + generate, one shuffle per side on the
    row key — the same cost class as the DISTINCT form, unlike a naive
    join which would multiply duplicates instead of min-ing them."""
    return _urgent(spark, sf_dir).intersectAll(_big(spark, sf_dir))


@query(
    "set_except_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT — ``subtract`` — completing the set-operation
    matrix (UNION ALL/DISTINCT, INTERSECT DISTINCT/ALL, EXCEPT
    ALL/DISTINCT): customers with an urgent order who never placed a
    top-ticket (> 350k) one, each listed once. The right side uses a
    HIGHER price bar than set_except's shared helper on purpose: at
    the 200k bar the distinct difference is empty on the live fixture
    (every urgent customer also has a 200k order), which would
    green-on-empty; 350k keeps a non-empty, pinned result. Same
    left-anti + distinct physical shape on both engines; the ALL twin
    (set_except) keeps multiplicities — having BOTH keyed documents
    the semantic trap (EXCEPT is distinct by default in SQL, bag-like
    in DataFrame ``exceptAll``)."""
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table
    from pyspark.sql import functions as F

    o = table(spark, sf_dir, "orders")
    top = o.filter(F.col("o_totalprice") > 350000).select("o_custkey")
    return _urgent(spark, sf_dir).subtract(top)
