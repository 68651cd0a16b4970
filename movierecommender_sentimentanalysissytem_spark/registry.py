"""Query registry: the single source of truth for the engine's surface.

Each operator from SURVEY.md §2 registers itself under its inventory key
with a Spark callable ``(spark, sf_dir) -> DataFrame`` and (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
``__spark_entry__.py`` exposes these to the driver verbatim.

Column names must match between the Spark result and the oracle result:
the driver sorts columns by name before hashing values, so every
computed/aggregate column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: ML model output,
    LSH, true streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import movierecommender_sentimentanalysissytem_spark.operators.relational  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.joins  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.aggregates  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.windows  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.sortlimit  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.setops  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.subqueries  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.recommender  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.storage  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.analytics  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.sources.pysource  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.timeseries  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.scalar  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.text  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.vector  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.dedup  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.text_analysis  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.multimodal  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.ml.pipelines  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.streaming.windows  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.udfs  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return dict(ORACLES)
