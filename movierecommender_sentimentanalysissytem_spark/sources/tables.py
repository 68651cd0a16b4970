"""Parquet source layer.

All fixture tables (FIXTURES.md) load through here so that scale-aware
settings live in one place. At 100 TB the same code path works: Spark's
vectorized parquet reader handles partition discovery, predicate
pushdown and column pruning on the datasource level — we only ever
express *logical* plans downstream, never per-file logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensionality of the ``embeddings.embedding`` fixture column. The
# Spark kernels fold over the actual arrays (zip_with/transform), but
# DuckDB oracle mirrors that index two aliased tables in one lambda
# need an explicit ``range(1, EMBEDDING_DIM + 1)`` — every such oracle
# derives its bound from THIS constant so engine and oracle cannot
# silently desynchronize if the fixture dimensionality changes
# (round-7 advice). tests/test_vectors.py pins the fixture invariant.
EMBEDDING_DIM = 64

# Dimension tables small enough to always broadcast in joins (the 100 TB
# design point: region/nation are fixed-size; customer/supplier/part grow
# with SF and must NOT be assumed broadcastable).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped in two fixture generations: parquet
    TIMESTAMP(NANOS) — which Spark's reader rejects outright
    (PARQUET_TYPE_ILLEGAL), so we read it as raw int64 nanoseconds via
    ``spark.sql.legacy.parquet.nanosAsLong`` and rebuild a microsecond
    TimestampType with integer arithmetic (``div`` on longs, never
    double division, which loses sub-µs precision at epoch-nanosecond
    magnitudes ~1.7e18 > 2^53) — and plain ``timestamp[us]``, which
    Spark reads natively as TIMESTAMP_NTZ. We sniff the loaded dtype
    and normalize both to session-zone TimestampType (session tz is
    pinned to UTC, so the NTZ→TZ cast is wall-clock identity).

    The legacy conf is set ONLY if the native read actually rejects
    the file (nanos generation): a session-global conf flipped as a
    side effect of loading one table would silently change how every
    later nanos-typed parquet read in the session behaves. On the µs
    generation (current fixtures) the conf is never touched.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            df = spark.read.parquet(path)
        except Exception:
            # TIMESTAMP(NANOS) fixture generation: re-read as raw int64
            # ns. The conf stays set for the session afterward BY
            # DESIGN — every engine read goes through table(), and the
            # flag only affects nanos-typed columns, which this session
            # then wants read the same way.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register temp views so both
    the DataFrame API and ``spark.sql`` formulations are available
    (SURVEY.md §3.2)."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
