"""Partition-independence and rewrite-equivalence invariants.

These pin the two properties the engine's scale story leans on hardest:
(1) results must not change when the physical partitioning changes
    (what a 1000-executor cluster does to every query), and
(2) optimized rewrites (binned range join) must be result-identical to
    their naive formulations on data they were never tuned against.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from movierecommender_sentimentanalysissytem_spark import registry
from tests.conftest import SF_SMALL

QS = registry.queries()


def test_hash_sample_membership_is_partition_independent(spark):
    """The hash-keyed sample must pick the IDENTICAL row set no matter
    how the input is partitioned — the property seeded `.sample` lacks
    and the reason the hash formulation exists."""
    base = {
        (r.l_orderkey, r.l_linenumber)
        for r in QS["sample_deterministic"](spark, SF_SMALL).collect()
    }
    assert base  # non-empty sample

    # same filter applied after violent repartitioning
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    li = table(spark, SF_SMALL, "lineitem").repartition(37, "l_partkey")
    bucket = F.expr(
        "CAST(conv(substring(md5(concat('smp:', l_orderkey, ':',"
        " l_linenumber)), 1, 15), 16, 10) AS BIGINT) % 100"
    )
    repart = {
        (r.l_orderkey, r.l_linenumber)
        for r in li.filter(bucket < 10)
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert repart == base


def test_binned_range_join_matches_naive_on_random_data(spark):
    """Property check on data the operator was never tuned against:
    the bucket±2 overcover must reproduce the naive theta join exactly,
    including values straddling bucket boundaries."""
    rng = random.Random(7)
    n = 400
    band = 0.1
    # cluster values tightly so many pairs exist AND many sit exactly
    # on bucket edges (k/10 values land on boundaries by construction)
    vals = [
        (i, round(rng.choice([k / 10 for k in range(50)]) + rng.random() * 0.05, 6))
        for i in range(n)
    ]
    df = spark.createDataFrame(vals, "event_id long, value double")

    naive = {
        (r.a, r.b)
        for r in df.alias("x")
        .join(
            df.alias("y"),
            (F.col("x.event_id") < F.col("y.event_id"))
            & (F.abs(F.col("x.value") - F.col("y.value")) <= band),
        )
        .select(F.col("x.event_id").alias("a"), F.col("y.event_id").alias("b"))
        .collect()
    }

    probe = df.select(
        F.col("event_id").alias("b"),
        F.col("value").alias("vb"),
        F.floor(F.col("value") / band).alias("bucket"),
    )
    build = df.select(
        F.col("event_id").alias("a"),
        F.col("value").alias("va"),
        F.explode(
            F.array(*[F.floor(F.col("value") / band) + d for d in range(-2, 3)])
        ).alias("bucket"),
    )
    binned = {
        (r.a, r.b)
        for r in build.join(probe, "bucket")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("va") - F.col("vb")) <= band)
        )
        .select("a", "b")
        .collect()
    }
    assert binned == naive
    assert len(naive) > 100  # the dataset actually exercises the band
