"""Custom Python Data Source (Spark 4 DataSource API) — the engine's
connector SDK surface.

Implements a deterministic partitioned sequence source ("mrsas_seq"):
each of N partitions generates a contiguous id range with derived
columns, exactly the shape a real connector (REST pages, Kafka ranges,
object-store listings) uses — ``partitions()`` declares the parallel
split, ``read(partition)`` yields that split's rows on an executor.
Deterministic output makes even this custom source SQL-checkable
against a DuckDB ``range()`` relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark.registry import query

try:  # Spark 4 API; gate so older runtimes degrade gracefully
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAS_DS_API = True
except ImportError:  # pragma: no cover
    _HAS_DS_API = False


if _HAS_DS_API:

    class _SeqPartition(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start = start
            self.end = end

    class _SeqReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.n_rows = int(options.get("n_rows", 1000))
            self.n_parts = int(options.get("n_parts", 4))

        def partitions(self):
            step = max(1, self.n_rows // self.n_parts)
            return [
                _SeqPartition(i, min(i + step, self.n_rows))
                for i in range(0, self.n_rows, step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i, i % 7, float(i) * 0.5)

    class SeqDataSource(DataSource):
        """``spark.read.format("mrsas_seq").option("n_rows", ...)``"""

        @classmethod
        def name(cls) -> str:
            return "mrsas_seq"

        def schema(self) -> str:
            return "id BIGINT, bucket BIGINT, half DOUBLE"

        def reader(self, schema) -> "DataSourceReader":
            return _SeqReader(self.options)


@query(
    "scan_python_datasource",
    oracle="""
    SELECT CAST(range % 7 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(range) AS BIGINT) AS id_sum,
           ROUND(SUM(range * 0.5), 4) AS half_sum
    FROM range(1000)
    GROUP BY bucket
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python data source and aggregate.

    The 4 declared partitions read in parallel on executors (Arrow
    batches back to the JVM); the deterministic generator makes the
    result SQL-checkable against DuckDB's range() relation.
    """
    if not _HAS_DS_API:
        raise NotImplementedError("Spark 4 DataSource API unavailable")
    spark.dataSource.register(SeqDataSource)
    df = spark.read.format("mrsas_seq").option("n_rows", "1000").option(
        "n_parts", "4"
    ).load()
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
        F.round(F.sum("half"), 4).alias("half_sum"),
    )
