"""PySpark-native analytics engine with the query capabilities of
ppatel-bigdata/MovieRecommender-SentimentAnalysisSytem.

Everything here is built on the public PySpark DataFrame/SQL API
(Spark 4.x): declarative logical plans optimized by Catalyst, executed
by Tungsten whole-stage codegen. The reference snapshot is empty
(SURVEY.md §0); the capability contract is SURVEY.md §2's operator
inventory (recommender + sentiment analytics re-expressed relationally,
plus LLM-data-pipeline operators).

Design rules (SURVEY.md §1.2):
- never project raw nanosecond timestamps (truncate/format first)
- round floating aggregates to 4 dp on both Spark and oracle sides
- every LIMIT / top-k carries a total deterministic order
- stay JVM-side: built-in functions > pandas UDF > python UDF
"""

from movierecommender_sentimentanalysissytem_spark.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    oracle_sql,
    queries,
    query,
)
from movierecommender_sentimentanalysissytem_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_tables,
    table,
)
