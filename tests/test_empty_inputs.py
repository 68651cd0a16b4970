"""Empty-input robustness: every operator must degrade to an empty (or
well-defined) result when its input tables are empty — no crashes, no
surprise nulls. At 100 TB, empty partitions and empty filter results
are everyday events."""

from __future__ import annotations

import os

import pytest

from movierecommender_sentimentanalysissytem_spark import registry
from movierecommender_sentimentanalysissytem_spark.sources.tables import TABLES
from tests.conftest import SF_SMALL

QS = registry.queries()

# Representative keys spanning every module. Excluded: ML estimators
# (fit() on empty input is a documented error in MLlib itself),
# streaming memory-sink ops (empty dir handled by the source), and
# agg_rollup-style queries that legitimately return a grand-total row
# (graph_triangle_count, quality_fk_orphans) or a generated spine
# (sql_recursive_cte).
REPRESENTATIVE = [
    "filter_compound",
    "project_expressions",
    "join_star_multiway",
    "join_asof",
    "agg_groupby",
    "agg_pivot",
    "win_row_number_topk",
    "sort_multikey",
    "set_except",
    "fn_split_explode",
    "fn_map_json",
    "text_wordcount",
    "text_tfidf",
    "text_lexicon_sentiment",
    "text_langid",
    "text_fingerprint",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "sim_cosine_pairwise",
    "sim_topk_neighbors",
    "multimodal_columns",
    "multimodal_feature_extract",
    "stream_tumbling_window",
    "stream_session_window",
    "udf_pandas_vectorized",
    "udaf_pandas_grouped",
    "subq_correlated",
    "rec_top_items",
    "rec_item_similarity",
    "agg_mode",
    "agg_weighted_avg",
    "quality_benford_digits",
    "join_interval_overlap",
    "join_asof_nearest",
    "win_rolling_median",
    "tpch_q1_pricing_summary",
    # tpch_q6_forecast_revenue excluded: a global aggregate legitimately
    # returns its one grand-total row (null revenue, 0 count) on empty
    # input, like the other excluded grand-total keys.
    "merge_upsert",
    "scd2_history",
    "join_lateral",
    "join_range_binned",
    "fn_variant_json",
    "fn_levenshtein",
    "profile_numeric_histogram",
    "sample_deterministic",
    "sample_train_test_split",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "decontaminate_ngram_overlap",
    "text_repetition_filter",
    "corpus_mix_rebalance",
    "embedding_quantize_int8",
    "embedding_centroid_assign",
    "timeseries_ewma",
    "tpch_q4_order_priority",
    "tpch_q16_supplier_cnt",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q20_excess_suppliers",
    "stats_median_mad",
    "anomaly_zscore",
    "win_rolling_distinct",
    "skyline_pareto",
    "set_union_schema_evolution",
    "curation_shard_token_budget",
    "subq_any_all",
    "fn_nested_struct",
    "agg_boolean_family",
    # round-5 additions. stats_chi_square excluded: its chi2 is a global
    # aggregate (grand-total row on empty input, like tpch_q6).
    "stats_linear_regression",
    "stats_ks_two_sample",
    "stats_gini_concentration",
    "quality_outlier_iqr",
    "stats_autocorr_daily",
    "sessionize_batch",
    "attribution_last_touch",
    "rec_rfm_segmentation",
    "graph_degree_stats",
    "timeseries_resample_ohlc",
    "text_word_entropy",
    "quality_duplicate_rate_by_source",
    "sim_matmul_topk",
    # round-5 batch 2. subq_not_in_nulls excluded: scalar-subquery
    # counts produce a grand-total row on empty input.
    "agg_latest_by_key",
    "timeseries_mom_growth",
    "join_temporal_snapshot",
    "text_bigram_lm",
    "dedup_keep_best",
    "events_time_profile",
    "fn_url_extract",
    "win_share_of_total",
    "profile_topk_values",
    # round-5 batch 3. quality_null_profile excluded: a fixed-width
    # per-column report legitimately emits its rows on empty tables.
    "stats_t_test_welch",
    "events_transition_matrix",
    "time_to_conversion",
    "agg_percentile_disc",
    "fn_array_setops",
    "multimodal_decode_audio",
    "multimodal_decode_image",
    # round-5 batch 5. stats_psi_drift / quality_table_checksum
    # excluded: 1-row-aggregate reports (grand-total class) on empty.
    "set_intersect_all",
    "udf_pandas_iter",
    "sample_k_per_group",
    # round-5 batch 6. stats_mann_whitney excluded: a global-aggregate
    # report (grand-total class) on empty input.
    "stats_spearman_by_group",
    "events_dau_rolling",
    "rec_eval_precision_at_k",
    "join_fuzzy_levenshtein",
    "geo_grid_proximity_join",
    "curation_chunk_overlap",
    # round-5 batch 7
    "events_cumulative_unique",
    "timeseries_rate_spike",
    "sample_weighted_bernoulli",
    "maintenance_snapshot_diff",
    "rec_multihop_expansion",
    # round-5 batch 8. quality_expectation_suite and stats_subsample_ci
    # excluded: 1-row / per-rule aggregate reports (grand-total class).
    "text_keyword_cooccurrence",
    "ml_feature_hashing",
    "events_cohort_ltv",
    # round-5 batch 9
    "rec_association_rules",
    "embedding_random_projection",
    "ml_batch_scoring",
    # round-5 batch 10. join_dynamic_partition_pruning excluded: a
    # partitionBy write of an EMPTY frame produces a directory Spark
    # cannot re-infer a schema from (same class as the other
    # write-then-read sink keys, which are also excluded).
    "set_except_distinct",
    # round-5 batch 11 (scan_ignore_corrupt_files included: its
    # coalesce(1) write emits one schema-bearing empty part file, so
    # the read-back works even on empty input — unlike the partitionBy
    # writes excluded above).
    "ml_feature_scaling",
    "ml_target_encoding",
    # round-7 additions (stream_observe_rate excluded: streaming
    # memory/noop-sink class, like the other stream_* keys).
    "rec_item_similarity_dimsum",
    "events_stickiness",
    "scan_ignore_corrupt_files",
    # round-5 batch 12. events_ab_test_analysis excluded: a 1-row
    # experiment report (grand-total class); rec_diversity_coverage
    # likewise (1-row metric report).
    "stream_windowed_topk",
    # round-5 batch 14. events_window_funnel excluded (1-row funnel
    # report, grand-total class).
    "profile_join_skew",
    # round-5 batch 15. stats_power_analysis excluded (1-row report);
    # timeseries_backlog_curve included (empty spine -> 0 rows).
    "timeseries_backlog_curve",
    # round-5 batch 16. ml_eval_classification and
    # quality_key_candidates excluded (1-row / fixed-3-row aggregate
    # reports, grand-total class).
    "attribution_multi_touch",
    "rec_popularity_time_decay",
    "timeseries_seasonal_baseline",
    "stats_wilson_ci",
    # round-5 batch 17. quality_order_reconcile excluded (1-row
    # report).
    "subq_relational_division",
    "win_topk_with_ties",
    "events_interarrival_histogram",
    "events_path_analysis",
    # round-5 batch 18. events_conversion_latency_quantiles excluded
    # (1-row report); scan_csv_dropmalformed included (empty coalesced
    # CSV part + planted garbage still reads to zero survivors).
    "text_readability_score",
    "scan_csv_dropmalformed",
    # round-5 batch 19
    "fn_array_higher_order",
    "fn_regexp_replace_backrefs",
    "join_hint_shuffle_hash",
    "tpch_shipping_delay_profile",
    # round-5 batches 20-21. scan_json_permissive_corrupt excluded
    # (1-row report). ml_kmeans_lloyd: empty corpus -> empty seed set
    # -> empty assignments, no crash, is exactly the contract.
    "ml_kmeans_lloyd",
    "events_bot_detection",
    "stats_kaplan_meier",
    # round-5 batches 24-32. Excluded as grand-total-report class:
    # ml_eval_classification, quality_key_candidates,
    # quality_order_reconcile, events_conversion_latency_quantiles,
    # stats_anova_oneway, text_zipf_fit (1-row moment reports),
    # quality_fk_matrix (fixed 7-row report).
    "udf_cogrouped_map",
    "quality_control_chart",
    "text_collocation_llr",
    "events_user_overlap_jaccard",
    "fn_binary_encoding",
    "tpch_yoy_customer_growth",
    "agg_share_of_parent",
    "sort_null_ordering",
    "join_asof_tolerance",
    "events_peak_concurrency",
    "sql_view_masked",
    "sql_parameterized",
    "stats_theil_index",
    # round-7 evaluation/curation batch. ml_learning_curve excluded:
    # its three per-fraction rows are global aggregates (grand-total
    # class — NULL rmse, 0 counts on empty input, no crash).
    "rec_eval_ndcg_at_k",
    "rec_eval_map_at_k",
    "stats_fdr_bh",
    "ml_calibration_bins",
    "curation_soft_dedup_weights",
    "sim_distance_metrics",
    "stats_permutation_test",
    # round-8 staged batch. sim_topk_ivf_probe_sweep excluded — the
    # KMeans-quantizer exclusion class shared by sim_topk_ivf and
    # (round 9) sim_topk_ivf_partitioned: MLlib's KMeans.fit on an
    # empty dataset raises java.lang.IllegalArgumentException
    # ("requirement failed: Nothing has been added to this summarizer"
    # from MultivariateOnlineSummarizer, verified against this
    # container's Spark), i.e. fitting a coarse quantizer on zero rows
    # is a defined MLlib error, not a graceful empty result — an empty
    # CORPUS is an upstream-pipeline bug these keys must surface, while
    # an empty QUERY batch degrades gracefully through the same plans.
    "rec_eval_coverage_at_k",
    "dedup_ngram_containment",
    "stats_permutation_test_paired",
    "quality_seq_gap_audit",
    "geo_point_in_polygon",
]


# Heavyweight evidence tier: quality sweeps / scaled corpora /
# multi-second Spark jobs. Fast iteration path: pytest -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Empty copies of every fixture table (schema preserved)."""
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        # events: read raw (ts as int64 nanos via nanosAsLong) so the
        # empty copy round-trips through table()'s ns→µs rebuild —
        # re-writing the converted µs timestamp would break `ts div`.
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(SF_SMALL, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.parametrize("key", REPRESENTATIVE)
def test_operator_on_empty_tables(spark, empty_sf, key):
    df = QS[key](spark, empty_sf)
    assert df.count() == 0


def test_ml_eval_rmse_empty_contract(spark, empty_sf):
    """Grand-total-class key with a PINNED empty-input contract
    (r14 advice): the sufficient-statistics rewrite must preserve the
    window formulation's (n=0, rmse=NULL) on empty ratings — the bare
    SUM-based fold would return (n=NULL, rmse=0.0) because SUM over
    zero rows is NULL and greatest() skips NULLs."""
    row = QS["ml_eval_rmse"](spark, empty_sf).collect()[0]
    assert row["n"] == 0
    assert row["rmse"] is None
