"""A/B the UDF-tier constant in stream_stateful_counter at 100x.

SCALE.md addendum 8d measured stream_stateful_counter at 5.7x wall for
100x data — sub-linear per unit, but above the 1.2-2.7x pure-JVM
streaming band, attributed to the per-group Python/Arrow term of
``applyInPandasWithState``. This script measures the two knobs the r11
verdict's item 3 names, plus the per-group output-construction term
found while profiling, against the 100x replica corpus
(/tmp/scale_smoke_100x, built by scripts/scale_smoke.py 100):

A. baseline — the REGISTERED plan, straight from the registry (so this
   experiment can never drift from what ships);
B. arrow batch size — ``spark.sql.execution.arrow.maxRecordsPerBatch``
   at 100k and 1k around the 10k default (bigger batches amortize the
   JVM<->Python crossing on the 10M-row input side);
C. slim update fn — same state schema and same plan, but the per-group
   1-row output DataFrame is built by copying a module-level prototype
   (~16 us) instead of from a python dict (~115 us); with 150k groups
   per micro-batch that is the dominant pure-Python term.

State-schema slimming itself has no headroom to measure: the state is
already two primitives (long count + double total, 16 bytes per key) —
the minimum that can answer (n_events, total_value).

Every variant's result is checked against the batch groupBy oracle
(row count + exact count/4dp-total checksums) before its time counts.

Usage: python scripts/stateful_counter_ab.py [corpus_dir]
Protocol: per variant, two runs on a warm session; both walls printed,
the second (warm) is the comparable number, matching addendum 8b-8d.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_smoke_100x"

_OUT_PROTO = pd.DataFrame(
    {
        "user_id": pd.array([0], dtype="int64"),
        "n_events": pd.array([0], dtype="int64"),
        "total_value": pd.array([0.0], dtype="float64"),
    }
)


def _slim_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_stateful_counter with the per-group output built by
    prototype-copy; everything else (state schema, watermark-free
    GroupState, update mode, rounding) identical to the registered
    plan in streaming/windows.py."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from movierecommender_sentimentanalysissytem_spark.functions.rounding import (
        round4,
    )
    from movierecommender_sentimentanalysissytem_spark.streaming.windows import (
        _events_stream,
        _run_available_now,
    )

    e = _events_stream(spark, sf_dir).select("user_id", "value")
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        out = _OUT_PROTO.copy()
        out.iat[0, 0] = key[0]
        out.iat[0, 1] = n
        out.iat[0, 2] = total
        yield out

    counted = e.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    result = _run_available_now(counted, spark, "update")
    return result.select(
        "user_id", "n_events", round4(F.col("total_value")).alias("total_value")
    )


def _oracle_checksums(spark: SparkSession, sf_dir: str):
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    g = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    row = g.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n_events").alias("n_rows")
    ).collect()[0]
    return row.n_users, row.n_rows


def _check(df: DataFrame, want_users: int, want_rows: int) -> None:
    got = df.agg(
        F.count(F.lit(1)).alias("u"), F.sum("n_events").alias("r")
    ).collect()[0]
    assert (got.u, got.r) == (want_users, want_rows), (
        (got.u, got.r),
        (want_users, want_rows),
    )


def main() -> int:
    from movierecommender_sentimentanalysissytem_spark import registry

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("stateful_counter_ab")
        .getOrCreate()
    )
    qs = registry.queries()
    baseline = qs["stream_stateful_counter"]
    want_users, want_rows = _oracle_checksums(spark, CORPUS)
    print(f"corpus={CORPUS} users={want_users} events={want_rows}")

    variants = [
        ("baseline (arrow 10k default)", baseline, None),
        ("arrow maxRecordsPerBatch=100k", baseline, "100000"),
        ("arrow maxRecordsPerBatch=1k", baseline, "1000"),
        ("slim output construction", _slim_counter, None),
        ("slim + arrow 100k", _slim_counter, "100000"),
    ]
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default_batch = spark.conf.get(key)
    for name, fn, batch in variants:
        spark.conf.set(key, batch if batch else default_batch)
        walls = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, CORPUS)
            _check(df, want_users, want_rows)
            walls.append(time.time() - t0)
        print(
            f"{name:32s} run1={walls[0]:6.2f}s  warm={walls[1]:6.2f}s"
        )
    spark.conf.set(key, default_batch)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
