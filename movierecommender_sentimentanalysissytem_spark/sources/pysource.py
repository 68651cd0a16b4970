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
            # exactly n_parts contiguous chunks (ceil-divided), never
            # n_parts+1 — the declared parallelism IS the contract
            # (pinned in tests/test_operators.py)
            n, p = self.n_rows, max(1, self.n_parts)
            bounds = [min(n, (n * i + p - 1) // p) for i in range(p + 1)]
            return [
                _SeqPartition(bounds[i], bounds[i + 1])
                for i in range(p)
                if bounds[i] < bounds[i + 1] or n == 0 and i == 0
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
           ROUND(CAST(SUM(range * 0.5) AS DOUBLE), 4) AS half_sum
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


if _HAS_DS_API:
    import json as _json
    import os as _os
    import uuid as _uuid

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _JsonlCommit(WriterCommitMessage):
        def __init__(self, path: str, n_rows: int) -> None:
            self.path = path
            self.n_rows = n_rows

    class _JsonlWriter(DataSourceWriter):
        """Per-partition JSONL files + driver-side commit manifest —
        the two-phase commit shape every real sink (JDBC, object
        store, warehouse) implements: executors write side files and
        return commit messages; ``commit`` publishes a manifest; a
        failed job never publishes, so readers see all-or-nothing.

        Storage contract: ``path`` must be visible to BOTH executors
        (which open part files there) and the driver (which writes the
        manifest and re-reads the parts) — i.e. a DFS/object-store
        mount on a real cluster, exactly like every file sink. The
        harness satisfies it trivially under local mode with a
        tempdir; on a multi-node cluster a worker-local path would
        strand the part files away from the driver's commit."""

        def __init__(self, options) -> None:
            self.path = options.get("path")

        def write(self, iterator):
            part_file = _os.path.join(
                self.path, f"part-{_uuid.uuid4().hex}.jsonl"
            )
            n = 0
            with open(part_file, "w") as fh:
                for row in iterator:
                    fh.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return _JsonlCommit(part_file, n)

        def commit(self, messages):
            manifest = {
                "files": sorted(m.path for m in messages),
                "total_rows": sum(m.n_rows for m in messages),
            }
            with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
                fh.write(_json.dumps(manifest))

        def abort(self, messages):
            for m in messages:
                try:
                    _os.remove(m.path)
                except OSError:
                    pass

    class JsonlSinkDataSource(DataSource):
        """``df.write.format("mrsas_jsonl").option("path", ...)``"""

        @classmethod
        def name(cls) -> str:
            return "mrsas_jsonl"

        def writer(self, schema, overwrite: bool) -> "DataSourceWriter":
            return _JsonlWriter(self.options)


@query(
    "sink_python_datasource",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           FLOOR(SUM(o_totalprice) * 10000 + 0.5) / 10000 AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write through the custom Python Data Source WRITER (Spark 4
    ``DataSourceWriter``): executors stream Arrow batches into
    per-partition JSONL side files and return commit messages; the
    driver-side ``commit`` publishes an all-or-nothing manifest (the
    two-phase-commit contract real sinks implement). The result
    re-reads ONLY manifest-listed files and re-aggregates — proving
    the round trip — and is SQL-checked against the source table.
    """
    import json

    from movierecommender_sentimentanalysissytem_spark.scratch import mkscratch
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    if not _HAS_DS_API:
        raise NotImplementedError("Spark 4 DataSource API unavailable")
    spark.dataSource.register(JsonlSinkDataSource)
    out = mkscratch("mrsas_pysink_")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    o.write.format("mrsas_jsonl").option("path", out).mode("append").save()

    with open(f"{out}/_MANIFEST.json") as fh:
        manifest = json.load(fh)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
    ).json(manifest["files"])
    from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4

    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.sum("o_totalprice")).alias("total"),
    )
