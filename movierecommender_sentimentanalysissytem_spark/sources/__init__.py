from movierecommender_sentimentanalysissytem_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_tables,
    table,
)
