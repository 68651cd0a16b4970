"""Cross-engine property test for the md5-derived 60-bit hash family —
the primitive every dedup/fingerprint/sampling oracle is built on
(functions/dedup.py:_spark_h/_duck_h). The two engines must produce the
IDENTICAL integer for the identical (seed, string) input, including
adversarial strings: empty, the ':' framing delimiter, tabs/newlines,
non-BMP unicode, combining marks, and multi-kilobyte payloads."""

from __future__ import annotations

import random

import duckdb

from movierecommender_sentimentanalysissytem_spark.functions.dedup import (
    _duck_h,
    _spark_h,
)


def _adversarial_strings() -> list[str]:
    rng = random.Random(99)
    fixed = [
        "",
        ":",
        "::",
        "m:",                       # collides with the seed framing
        "a b c",
        "\t",
        "line\nbreak",
        " leading and trailing ",
        "naïve café",               # latin + combining-adjacent
        "日本語のテキスト",            # CJK
        "🎬🍿",                      # non-BMP (surrogate pairs in UTF-16)
        "é",                  # combining acute (NOT normalized)
        "é",                   # precomposed é — must hash differently
        "0" * 5000,                 # long payload
        "'; DROP TABLE t; --",      # quoting hazard
    ]
    alphabet = "abc :\t'é日🎬"
    randoms = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        for _ in range(200)
    ]
    return fixed + randoms


def test_hash60_matches_duckdb_on_adversarial_strings(spark):
    vals = _adversarial_strings()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["i", "s"]
    )
    got_spark = {}
    for seed in ("m", "h0", "smp"):
        col = _spark_h(seed, "s")
        for r in df.selectExpr("i", f"{col} AS y").collect():
            got_spark[(seed, r.i)] = r.y

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    for seed in ("m", "h0", "smp"):
        col = _duck_h(seed, "s")
        for i, y in con.sql(f"SELECT i, {col} FROM t").fetchall():
            assert got_spark[(seed, i)] == y, (
                seed, i, repr(vals[i]), got_spark[(seed, i)], y
            )

    # unicode normalization must NOT be applied by either engine:
    # precomposed é and e+combining-acute are different byte strings
    i_combining = vals.index("é")
    i_precomposed = vals.index("é")
    assert got_spark[("m", i_combining)] != got_spark[("m", i_precomposed)]


def test_hash60_null_contract(spark):
    """The family is defined on NON-NULL strings only: Spark's concat
    propagates NULL (hash → NULL) while DuckDB's concat treats NULL as
    '' (hash → hash of 'seed:'). Every oracle-paired use therefore
    hashes columns that are filtered/coalesced non-null first. This
    test pins the divergence so the contract can't be forgotten."""
    df = spark.createDataFrame([(1, None)], "i int, s string")
    r = df.selectExpr(f"{_spark_h('m', 's')} AS y").collect()[0]
    assert r.y is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, NULL)")
    duck_null = con.sql(f"SELECT {_duck_h('m', 's')} FROM t").fetchone()[0]
    con.execute("UPDATE t SET s = ''")
    duck_empty = con.sql(f"SELECT {_duck_h('m', 's')} FROM t").fetchone()[0]
    assert duck_null == duck_empty  # NULL treated as '' — NOT NULL
