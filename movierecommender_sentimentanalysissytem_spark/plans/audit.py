"""Static plan audit (SURVEY.md §7 phase 8): explain every registered
query and flag plan pathologies that would not survive a 100× scale-up.

Flags:
- CartesianProduct anywhere
- BroadcastNestedLoopJoin not on the reviewed allowlist (acceptable
  only when one side is provably tiny)
- single-partition Exchange (global sort/window without partitioning)
  that is not a final top-k/limit

CLI: ``python scripts/plan_audit.py [sf_dir]`` (thin wrapper).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import SparkSession

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
    "dedup_near_minhash",   # doc_id < doc_id on band-collided pairs
    "multimodal_columns",   # 1-row query vector cross join
    "win_ntile_percent",    # two-pass rank: the only SinglePartition is
                            # the per-partition-counts offset window
                            # (O(shuffle partitions) rows, not O(rows))
    "text_tfidf",           # 1-row N-docs scalar broadcast cross join
    "agg_hll_sketch_union",  # 1-row exact × 1-row sketch-estimate cross
    "corpus_mix_rebalance",   # 1-row corpus-total broadcast cross join
    "embedding_centroid_assign",  # n_labels-row centroid broadcast cross
    "tpch_q22_dormant_customers",  # 1-row avg-balance scalar broadcast
    "subq_any_all",           # 1-row ALL/ANY bound set broadcast
    "tpch_q11_important_stock",  # 1-row fraction-of-total threshold broadcast
    "quality_benford_digits",    # 1-row digit-total broadcast cross join
    "stats_chi_square",       # 1-row N-total and 1-row dof broadcast crosses
    "rec_rfm_segmentation",   # 1-row quartile-boundary broadcast cross join
}


def audit_plans(spark: SparkSession, sf_dir: str) -> list[str]:
    """Explain every non-skipped registered query; return flag strings
    (empty list = clean)."""
    from movierecommender_sentimentanalysissytem_spark import registry

    qs = registry.queries()
    flags_out: list[str] = []
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
            flags_out.append(f"{key}: explain failed: {exc}")
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
            flags_out.append(f"{key}: {', '.join(flags)}")
    return flags_out
