"""Cross-engine property test for the stable rounding helper — the
keystone of the oracle-parity strategy. 10k seeded random doubles
(log-uniform magnitudes, both signs) must round identically in Python,
Spark, and DuckDB."""

from __future__ import annotations

import math
import random

import duckdb

from movierecommender_sentimentanalysissytem_spark.functions.rounding import round4


def _py_round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def _samples(n: int = 10000) -> list[float]:
    rng = random.Random(42)
    out = []
    for _ in range(n):
        mag = 10 ** rng.uniform(-6, 9)
        out.append(rng.choice([-1.0, 1.0]) * mag * rng.random())
    # adversarial half-way neighborhoods
    for k in range(200):
        out.append(k + 0.00005)
        out.append(k + 0.000049999999)
        out.append(k + 0.000050000001)
    return out


def test_round4_matches_across_engines(spark):
    vals = _samples()
    expected = [_py_round4(v) for v in vals]

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "x"])
    got_spark = {
        r.i: r.y for r in df.select("i", round4(df.x).alias("y")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    got_duck = dict(
        con.sql("SELECT i, FLOOR(x * 10000 + 0.5) / 10000 FROM t").fetchall()
    )

    for i, exp in enumerate(expected):
        assert got_spark[i] == exp, (i, vals[i], got_spark[i], exp)
        assert got_duck[i] == exp, (i, vals[i], got_duck[i], exp)
