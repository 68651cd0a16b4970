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
    "stats_psi_drift",        # 1-row decile-boundary broadcast cross join
    "text_keyword_cooccurrence",  # 1-row N-docs scalar broadcast cross
                                  # (same class as text_tfidf)
    "rec_association_rules",      # 1-row basket-count scalar broadcast
    "ml_target_encoding",         # 1-row global-mean scalar broadcast
    "profile_join_skew",          # 1-row moment-summary broadcast onto
                                  # the O(keys) top-5 rollup
    "embedding_random_projection",  # 8×64 literal-range sign matrix
                                    # (512 constant rows, built by cross
                                    # of two spark.range literals)
    "rec_rfm_segmentation",   # 1-row quartile-boundary broadcast cross join
    "rec_popularity_time_decay",  # 1-row max-order-date broadcast cross
    "ml_kmeans_lloyd",        # ≤4-row centroid broadcast crosses
                              # (embedding_centroid_assign class)
    "events_bot_detection",   # 1-row population-moment broadcast cross
    "stats_kaplan_meier",     # horizon + total 1-row broadcasts; both
                              # cumulative windows run over the
                              # O(distinct durations) rollup
    "tpch_abc_classification",  # 1-row grand-total broadcast; the
                                # cumulative window runs over the
                                # O(parts) dimension rollup
    "timeseries_decompose_additive",  # centered-MA window over the
                                      # O(days) rollup
    "rec_cold_start_backfill",  # 3-row top-items broadcast cross
                                # (bounded fan-out, not user×catalog)
    "quality_control_chart",    # 1-row centerline broadcast cross
    "stats_anova_oneway",       # 1-row grand-moments broadcast cross
    "text_collocation_llr",     # 1-row bigram-total broadcast cross
    "text_zipf_fit",            # rank window over the O(vocab) rollup
    "agg_share_of_parent",      # 1-row grand-total broadcast; parent
                                # window over the O(nations) rollup
    "quality_fk_matrix",        # seven 1-row × 1-row report crosses
    # reviewed single-partition sorts over BOUNDED rollups (the consumer-
    # aware SinglePartition check, live since round 5):
    "curation_shard_token_budget",  # offsets pass: O(buckets) rows
    "skyline_pareto",               # global pass over union of local
                                    # skylines: O(buckets · |sizes|) rows
    "timeseries_mom_growth",        # growth window: O(months) rows
    "stats_mann_whitney",           # rank-from-counts window: O(distinct
                                    # 2-dp event values), not O(rows)
    "events_cumulative_unique",     # growth-curve window: O(months) rows
    "timeseries_rate_spike",        # trailing-week window: O(days) rows
    "rec_diversity_coverage",       # Gini rank pass: O(catalog items)
                                    # rollup, not O(interactions)
    "timeseries_backlog_curve",     # running-sum window: O(days) spine
    "events_conversion_latency_quantiles",  # cumulative window over the
                                            # O(distinct delay seconds)
                                            # rollup + 1-row n broadcast
    "ml_learning_curve",   # 1-row global-mean/n_train broadcast cross
                           # per training fraction (3 bounded crosses)
    "stats_fdr_bh",        # BH rank + step-up windows over the O(tests)
                           # summary relation: O(segments) rows (25
                           # brands; thousands in production), never
                           # O(fact rows)
    "stats_permutation_test",  # two bounded broadcasts: the 99-row
                               # permutation index onto the O(users)
                               # sum relation, and the 1-row observed
                               # statistic onto the 99-row perm stats
    "stats_permutation_test_paired",  # same class: 99-row sign-flip
                                      # index onto the O(users) diff
                                      # relation + 1-row observed stat
    "geo_point_in_polygon",  # 3-row polygon-fence broadcast with bbox
                             # band predicates — the spatial-join
                             # asymmetry (billions of points, a tiny
                             # fence relation) is the operator's point
    "rec_eval_coverage_at_k",  # 4-row literal k-sweep broadcast onto
                               # the O(users)/O(items) min-rank rollups
    "sim_topk_ivf_probe_sweep",  # three 1-row count aggregates crossed
                                 # per probe width (bounded 4-width
                                 # sweep over one fitted index)
}


def _single_partition_consumers(plan: str) -> list[str]:
    """Names of the plan nodes that directly consume a SinglePartition
    Exchange, from ``explain("formatted")`` output: the detail blocks
    identify which Exchange ids are single-partition; the indented tree
    gives each id's consumer (nearest shallower line above)."""
    import re

    tree, _, details = plan.partition("\n\n")
    sp_ids = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\n(?:(?!\n\().)*?SinglePartition",
            details,
            re.S,
        )
    }
    lines = []
    for raw in tree.splitlines():
        m = re.match(r"^([:+\-| ]*)\*?\(?\d*\)?\s*(\w[\w .]*) \((\d+)\)", raw)
        if m:
            lines.append((len(m.group(1)), m.group(2).strip(), m.group(3)))
    consumers = []
    for i, (indent, _name, nid) in enumerate(lines):
        if nid in sp_ids:
            for j in range(i - 1, -1, -1):
                if lines[j][0] < indent:
                    consumers.append(lines[j][1])
                    break
    return consumers


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
        # formatted explain prints the distribution on the Exchange
        # node's detail line ("Arguments: SinglePartition, ..."), never
        # as the literal "Exchange SinglePartition" (the narrower match
        # was dead code until round 5). A single-partition exchange is
        # only a cliff when a global SORT/WINDOW consumes it — every
        # global aggregate legitimately funnels its per-partition
        # partials through one; so walk the tree for the consumer.
        if key not in NLJ_OK:
            for consumer in _single_partition_consumers(plan):
                if consumer.startswith(("Sort", "Window")):
                    flags.append(
                        f"SinglePartition exchange into {consumer}"
                    )
                    break
        if flags:
            flags_out.append(f"{key}: {', '.join(flags)}")
    return flags_out
