"""A/B: dictionary-encoded (xxhash64 -> int64) shingles vs the
string-exact contract plan for dedup_ngram_containment.

SCALE.md addendum 7 documented (but did not measure) the mitigation for
the containment key's single-node scratch exhaustion at 100x: the plan
shuffles the exploded STRING-shingle relation four times (cap groupBy,
index join, two verify joins), and dictionary-encoding the shingles
before the exchanges should cut shuffle bytes ~5-8x. This script turns
that note into a measurement (round-9 verdict item 3):

  1. Runs the registered string-exact key and a hashed variant —
     identical plan shape, shingle sets mapped through xxhash64 BEFORE
     the explode so every exchange carries int64s — at 1x and Nx
     (default 10x, the addendum-7 replica corpus).
  2. Measures per-run SHUFFLE WRITE BYTES via the Spark UI REST API
     (stage snapshots before/after each run) alongside wall time.
  3. Verifies PAIR-SET IDENTITY: the hashed variant must emit exactly
     the same (doc_a, doc_b, containment) rows as the string plan at
     every measured SF. Collisions are possible in principle (a cross-
     doc collision could inflate the cap count or a candidate list, an
     intra-doc collision could shrink a set size); identity here is
     the empirical zero-diff evidence. The REGISTERED key stays
     string-exact BY CONTRACT — the DuckDB oracle mirrors the 20-doc
     cap string-exactly, and that baseline is the point of the key.

Usage: python scripts/containment_ab.py [replicas] [--hashed-only]
  --hashed-only skips the string variant at the replica SF (used at
  100x, where the string plan is the documented scratch-exhaustion
  case — the hashed run completing there IS the demonstration).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
UI_PORT = 4050  # off the default 4040 so a concurrent session can't collide


def _rest(path: str) -> list | dict:
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def _app_id() -> str:
    return _rest("applications")[0]["id"]


def _stage_bytes(app: str) -> dict[tuple[int, int], tuple[int, int]]:
    """(stageId, attemptId) -> (shuffleWriteBytes, shuffleReadBytes)
    for every COMPLETE stage so far."""
    out = {}
    for s in _rest(f"applications/{app}/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = (
            s["shuffleWriteBytes"],
            s["shuffleReadBytes"],
        )
    return out


def hashed_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_ngram_containment with shingles dictionary-encoded to
    int64 BEFORE any exchange. Plan shape is identical to the
    registered key (functions/dedup.py) — cap groupBy, inverted-index
    candidate join, pair-distinct, array_intersect verify — but every
    shuffled relation carries xxhash64(shingle) instead of the string."""
    from movierecommender_sentimentanalysissytem_spark.functions.dedup import (
        _SPARK_SHINGLES_W,
    )
    from movierecommender_sentimentanalysissytem_spark.plans.caching import (
        scoped_persist,
    )
    from movierecommender_sentimentanalysissytem_spark.sources.tables import table

    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        table(spark, sf_dir, "documents")
        .repartition(par)
        .withColumn("w", F.split("text", " "))
        .filter(F.size("w") >= 3)
    )
    sh = scoped_persist(
        d.select("doc_id", F.expr(_SPARK_SHINGLES_W).alias("s_str")).select(
            "doc_id",
            F.expr("transform(s_str, x -> xxhash64(x))").alias("s"),
        )
    )
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    freq = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") <= 20)
        .select("g")
    )
    kept = ex.join(freq, "g")
    cand = (
        kept.select(F.col("doc_id").alias("doc_a"), "g")
        .join(kept.select(F.col("doc_id").alias("doc_b"), "g"), "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("s_a"),
        F.size("s").alias("ns_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
        F.size("s").alias("ns_b"),
    )
    inter = F.size(F.array_intersect("s_a", "s_b"))
    cont = inter.cast("double") / F.least(F.col("ns_a"), F.col("ns_b"))
    from movierecommender_sentimentanalysissytem_spark.functions.dedup import round4

    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(cont >= 0.6)
        .select("doc_a", "doc_b", round4(cont).alias("containment"))
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    hashed_only = "--hashed-only" in sys.argv
    replicas = int(args[0]) if args else 10
    big = f"/tmp/scale_smoke_{replicas}x"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.showConsoleProgress", "false")
        # UI ON: the REST stage metrics are this script's instrument
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .appName("containment_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{big}/documents.parquet"):
        from scripts.scale_smoke import _replicate

        t0 = time.time()
        _replicate(spark, big, replicas)
        print(f"replicated {replicas}x fixtures in {time.time()-t0:.1f}s")

    from movierecommender_sentimentanalysissytem_spark import registry

    string_fn = registry.queries()["dedup_ngram_containment"]
    app = _app_id()

    from movierecommender_sentimentanalysissytem_spark.plans.caching import (
        release_scoped_caches,
    )

    def measure(fn, sf_dir: str, label: str, warm: bool = True):
        """noop-sink the plan; report (wall_s, shuffle_write, rows).
        Runs twice (first run warms page cache / codegen) unless warm
        is False; metrics come from the SECOND run's stages only.

        Scoped caches are released BEFORE every build: hashed_containment
        is not registry-wrapped, so without this the other variant's
        still-persisted `sh` survives into this build and the cache
        manager plan-matches it INTO this plan (nested InMemoryRelation,
        different join planning). First observed as the hashed variant
        "gaining" 7x shuffle bytes at 10x — entirely an artifact of the
        string run's cache being alive during the hashed build."""
        runs = 2 if warm else 1
        for i in range(runs):
            release_scoped_caches()
            before = _stage_bytes(app)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
        after = _stage_bytes(app)
        new = {k: v for k, v in after.items() if k not in before}
        wr = sum(v[0] for v in new.values())
        rd = sum(v[1] for v in new.values())
        print(
            f"{label:34s} wall {wall:7.2f}s  shuffle_write "
            f"{wr/1e6:9.1f} MB  shuffle_read {rd/1e6:9.1f} MB"
        )
        return wall, wr

    def identity(sf_dir: str, label: str) -> None:
        release_scoped_caches()
        s_rows = {
            (r.doc_a, r.doc_b, r.containment)
            for r in string_fn(spark, sf_dir).collect()
        }
        release_scoped_caches()
        h_rows = {
            (r.doc_a, r.doc_b, r.containment)
            for r in hashed_containment(spark, sf_dir).collect()
        }
        extra, missing = h_rows - s_rows, s_rows - h_rows
        status = "IDENTICAL" if not extra and not missing else "DIFF"
        print(
            f"identity @ {label}: {status} "
            f"({len(s_rows)} pairs; +{len(extra)} -{len(missing)})"
        )
        if status == "DIFF":
            sys.exit(1)

    print(f"== 1x ({SF_DIR}) ==")
    w_s1, b_s1 = measure(string_fn, SF_DIR, "string (registered)")
    w_h1, b_h1 = measure(hashed_containment, SF_DIR, "hashed int64")
    identity(SF_DIR, "1x")

    print(f"== {replicas}x ({big}) ==")
    if not hashed_only:
        w_sn, b_sn = measure(string_fn, big, "string (registered)")
    w_hn, b_hn = measure(hashed_containment, big, "hashed int64")
    if not hashed_only:
        identity(big, f"{replicas}x")
        print(
            f"\nshuffle-bytes ratio string/hashed: 1x {b_s1 / max(b_h1,1):.1f}x, "
            f"{replicas}x {b_sn / max(b_hn,1):.1f}x"
        )


if __name__ == "__main__":
    main()
