"""Dump .explain("formatted") for a list of query keys to files.

Optimization-round evidence artifact (guide §1 / §7.2): captures the
physical plan of each named query into <outdir>/<key>_<tag>.txt so a
plan-shape claim ("2 Exchange -> 1", "SortMergeJoin -> Broadcast") can
be checked without running Spark.

Usage: python scripts/dump_formatted_plans.py <outdir> <tag> [key ...]
       (no keys -> the bench HEADLINE set)

Uses the same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle.partitions = cpus, AQE on, 16m split) so the captured initial
plan is the one the bench actually executes; reads
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    tag = sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mrsas-plan-dump")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # building a query is no longer plan-only: eager scoped
        # persists materialize caches during the build, and the
        # default 1g driver heap OOMs on the heavier keys (r15)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from movierecommender_sentimentanalysissytem_spark import registry

    qs = registry.queries()
    if not keys:
        import bench

        keys = bench.HEADLINE
    for name in keys:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
