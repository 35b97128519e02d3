"""Registry contract tests (SURVEY.md §2: every inventory ID wired)."""

import __spark_entry__ as E

EXPECTED_IDS = {
    # cat 1
    "scan_parquet", "scan_projected", "scan_events_ns", "read_csv_schema",
    "read_json_lines", "sink_parquet_partitioned", "scan_dpp_star_join",
    "scan_python_datasource", "read_orc_roundtrip", "scan_schema_evolution",
    "catalog_managed_table", "create_view_sql",
    # cat 2
    "project_compute", "filter_simple", "filter_compound",
    "filter_null_handling", "dedup_distinct", "cast_types", "sample_rows", "sample_stratified",
    # cat 3
    "join_broadcast", "join_sortmerge", "join_multiway_star",
    "join_left_outer", "join_full_outer", "join_semi", "join_anti",
    "join_cross", "join_theta_range", "join_range_binned", "join_asof",
    # cat 4
    "agg_global", "agg_groupby", "agg_ratio", "agg_count_distinct",
    "agg_approx_distinct", "agg_stats", "agg_percentile",
    "agg_approx_percentile", "agg_filtered", "agg_collect", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_histogram", "agg_mode",
    "agg_corr_exact", "pivot_wide", "unpivot_melt", "agg_listagg", "agg_mad",
    "llm_inverted_index", "sql_group_by_all",
    # cat 5
    "win_lag_diff", "win_lead", "win_moving_avg", "win_range_frame",
    "win_cumsum", "win_rank_dense", "win_row_number_topk",
    "win_ntile_pctrank", "win_first_last",
    # cat 6
    "sort_multikey", "topk_limit", "limit_offset",
    # cat 7
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "set_union_by_name", "set_except_all", "set_intersect_all",
    # cat 8
    "str_funcs", "str_split_regex", "date_funcs", "ts_funcs", "math_funcs",
    "cond_funcs", "hash_funcs", "bit_funcs", "json_variant_funcs", "array_funcs", "array_hof", "map_funcs",
    "json_funcs",
    # cat 9
    "stream_tumbling_counts", "stream_sliding", "stream_session",
    "stream_watermark_late", "stream_dedup", "stream_stateful_running",
    "stream_multi_batch_replay",
    "stream_static_join", "stream_stream_join",
    # cat 10
    "llm_dedup_exact", "llm_dedup_fuzzy", "llm_sim_cosine_pairs",
    "llm_sim_topk", "llm_knn_per_query", "llm_centroids",
    "llm_semantic_groupby", "llm_text_tokens", "llm_tfidf",
    "llm_text_stats", "llm_ngrams", "llm_multimodal_struct",
    # cat 11
    "udf_python_scalar", "udf_pandas_vectorized", "udaf_applyinpandas",
    "udaf_pandas_grouped_agg", "udf_mapinarrow", "udtf_table_fn",
    "udtf_analyze_polymorphic",
    "obs_metrics_passthrough",
    # extensions beyond the inventory
    "multimodal_decode_stub",
    # training-data prep extensions (textprep.py)
    "llm_lang_id", "llm_quality_score", "llm_token_count_bpe",
    "llm_fingerprint", "llm_dedup_simhash", "llm_dedup_ngram",
    "llm_dedup_embedding", "llm_ann_ivf",
    # shuffle-engineering techniques (scale.py)
    "agg_skew_salted", "join_skew_salted", "join_bucketed",
    "agg_heavy_hitters", "etl_zorder_layout",
    "join_bloom_filtered",
    # multimodal pipeline stages (multimodal.py)
    "multimodal_resize_stub", "multimodal_frame_sample",
    "multimodal_feature_extract",
    # streaming file sink (checkpointed exactly-once landing zone)
    "stream_file_sink",
    # time-series analytics (timeseries.py)
    "ts_trend_forecast", "ts_resample_ffill", "ts_seasonal_naive",
    # composite dashboard reports (reports.py)
    "report_share_of_total", "report_growth_rate", "report_period_compare",
    "report_local_supplier_volume", "report_volume_shipping",
    "report_market_share", "report_returned_items", "report_late_shipping",
    "report_promo_share", "report_large_orders", "report_bracket_revenue",
    "report_idle_customers",
    # SQL subquery surface (sqlsurface.py)
    "sql_subquery_in", "sql_subquery_not_exists", "sql_subquery_scalar_corr",
    "sql_recursive_cte", "sql_lateral_topn",
    # iterative algorithms + sorted layout (iterative.py)
    "ml_kmeans_lloyd", "sink_parquet_sorted", "graph_pagerank",
    "llm_repetition_filter", "etl_compact_small_files", "llm_dataset_mix",
    "llm_embedding_quantize", "events_funnel_conversion",
    # ETL / CDC primitives (etl.py)
    "etl_upsert_scd1", "etl_keep_latest", "etl_scd2_intervals",
    "etl_incremental_agg", "dq_profile_columns",
    "etl_partition_overwrite", "dq_expectations",
    # null-safe join (joins.py)
    "join_null_safe",
    # edit-distance fuzzy matching (textprep.py)
    "str_edit_distance",
    # batch gaps-and-islands sessionization (windows.py)
    "win_sessionize_batch", "win_rolling_distinct", "win_rolling_median",
    # connected-components dedup clustering (textprep.py)
    "llm_dedup_clusters",
    # training-set assembly (llmprep.py)
    "llm_chunk_documents", "llm_pack_sequences", "llm_decontaminate",
    "llm_build_vocab", "llm_clean_corpus", "llm_bpe_merge_pairs",
    # foreachBatch streaming sink
    "stream_foreach_batch",
    # third join strategy (joins.py)
    "join_shuffle_hash",
    # end-to-end composition flagship (reports.py)
    "pipeline_full_report",
    # error-safe arithmetic surface (scalars.py)
    "safe_arith_funcs",
    # corpus curation round 3 (curation.py)
    "llm_span_dedup", "llm_pii_scrub", "llm_train_val_split",
    # rolling anomaly detection (timeseries.py)
    "ts_anomaly_zscore",
    # cohort retention matrix (reports.py)
    "report_retention_cohort",
    # round-3 batch 2: perplexity scoring, basket lift, level-shift
    # changepoint, activity heatmap, MMR diversification
    "llm_perplexity_unigram", "report_basket_lift", "ts_level_shift",
    "report_activity_heatmap", "llm_mmr_diversify",
    # round-3 batch 3: compressed ANN + Benford DQ screen
    "llm_ann_pq", "dq_benford_digits",
    # round-3 batch 4: Spark-4 SQL surface + scan provenance
    "sql_parameterized", "sql_execute_immediate", "scan_file_metadata",
    # round-3 batch 5: categorical-drift entropy + weighted median
    "dq_entropy_drift", "agg_weighted_median",
    # round-3 batch 6: Pareto ABC, seasonality ACF, Gini concentration
    "report_pareto_abc", "ts_autocorr_lag", "report_gini_concentration",
    # round-3 batch 7: snapshot CDC diff
    "etl_snapshot_diff",
    # round-3 batch 8: growth accounting
    "report_new_vs_returning",
    # round-3 batch 9: RFM segmentation + embedding QA gate
    "report_rfm_segmentation", "llm_embedding_qa",
    # round-3 batch 10: bounded-lookahead as-of + reconciliation checksum
    "join_asof_tolerance", "dq_table_checksum",
    # round-4 batch 1: lexical retrieval, winnowing fingerprints, sparse
    # trigram cosine, Gopher rule bank, last-touch attribution, FK screen
    "llm_bm25_rank", "llm_winnowing", "llm_sparse_cosine",
    "llm_gopher_rules", "report_last_touch_attribution",
    "dq_referential_orphans",
    # round-4 batch 2: hybrid RRF fusion, mergeable exact-distinct
    # bitmaps, Markov transition matrix, OHLC resampling
    "llm_hybrid_rrf", "agg_bitmap_distinct",
    "report_event_transitions", "ts_ohlc_bars",
    # round-4 batch 3: streaming OHLC parity, calendar-gap screen,
    # ledger-grade decimal aggregation
    "stream_ohlc_bars", "ts_calendar_gaps", "agg_decimal_exact",
    # round-4 batch 4: dedup canonicalization + dataset card
    "llm_dedup_keep_best", "llm_dataset_card",
    # round-4 batch 5: vocab coverage curve, key-uniqueness screen,
    # bidirectional nearest-event as-of
    "llm_tokenizer_coverage", "dq_uniqueness_keys", "join_asof_nearest",
    # round-4 batch 6: engagement stickiness
    "report_dau_wau_stickiness",
    # round-4 batch 7: RAG context assembly + embedding diagnostics
    "llm_rag_context_pack", "llm_embedding_covariance",
    # round-4 batch 8: fixed-point power-iteration PCA + closed-form OLS
    "ml_pca_power", "ml_ols_normal_eq",
    # round-4 batch 9: BFS hop-distance histogram
    "graph_bfs_distances",
    # round-4 batch 10: IQR outlier screen + bigram-LM perplexity
    "dq_outlier_iqr", "llm_perplexity_bigram",
    # round-4 batch 11: native SQL PIVOT / UNPIVOT clause surface
    "sql_pivot_clause", "sql_unpivot_clause",
    # round-4 batch 12: consistent sampling + training-shard assignment
    "etl_consistent_sample", "llm_dataset_shard_assign",
    # round-4 batch 13: weekday seasonality + n-gram novelty curve
    "report_weekday_seasonality", "llm_ngram_novelty",
    # round-4 batch 14: boolean aggregates + cume_dist / nth_value
    "agg_bool_funcs", "win_cume_dist_nth",
    # round-4 batch 15: generator surface + map higher-order functions
    "gen_funcs", "map_hof_funcs",
    # round-4 batch 16: Mann–Kendall non-parametric trend test
    "ts_mann_kendall",
    # round-4 batch 17: shape statistics from exact integer moments
    "agg_skew_kurtosis",
    # round-4 batch 18: per-source length profile + shipping-delay SLA
    "llm_length_profile_by_source", "report_shipping_delay_percentiles",
    # round-4 batch 19: AQE rebalance-on-write + CSV expression codec
    "etl_rebalance_layout", "csv_funcs",
    # round-4 batch 20: session-level engagement KPIs
    "report_session_duration_stats",
    # round-4 batch 21: composed IVFADC (cells + codes + rerank)
    "llm_ann_ivfpq",
    # round-4 batch 22: plain-text line ingestion (fifth source format)
    "read_text_lines",
    # round-4 batch 23: graph structure diagnostics
    "graph_degree_histogram", "graph_assortativity",
    # round-4 batch 24: LTV deciles + partition-skew screen
    "report_customer_ltv_deciles", "etl_partition_skew_report",
    # round-4 batch 25: dedup threshold-sensitivity sweep
    "llm_dedup_tau_sweep",
    # round-4 batch 26: cluster-size histogram + Zipf-law fit
    "llm_dedup_cluster_sizes", "llm_vocab_zipf_fit",
    # round-5 batch 1: ANSI MERGE semantics on a managed catalog table
    "etl_merge_into",
    # round-5 batch 2: drift / freshness / reconciliation data quality
    "dq_psi_drift", "dq_freshness_lag", "dq_duplicate_rate",
    "dq_reconcile_aggregates",
    # round-5 batch 3: sequential time-series (fold-based, integer-exact)
    "ts_ewma_halflife", "ts_cusum_changepoint", "ts_cross_correlation",
    # round-5 batch 4: training-mixture assembly
    "llm_source_token_budget", "llm_curriculum_order",
    "llm_label_stratified_sample",
    # round-5 batch 5: range join, exact mode, decimal-exact corr matrix
    "join_range_interval", "agg_mode_exact", "agg_corr_matrix",
    # round-5 batch 6: k-truss building block
    "graph_edge_support_topk",
    # round-5 batch 7: CDC streaming upsert into table state
    "stream_upsert_state",
    # round-5 batch 8: exact radius search + full blocked k-NN join
    "llm_ann_range_search", "llm_knn_join",
    # round-5 batch 9: SQL-surface idioms (EXCEPT star, named WINDOW,
    # DISTRIBUTE/SORT BY, LATERAL VIEW)
    "sql_star_except", "sql_window_clause", "sql_distribute_sort_by",
    "sql_lateral_view_explode",
    # round-5 batch 10: Holt trend smoothing, calendar gap audit,
    # parquet snapshot time travel, write-audit-publish
    "ts_holt_linear", "etl_backfill_gaps", "etl_time_travel",
    "etl_write_audit_publish",
    # round-5 batch 11: interval-overlap join + k-core peeling
    "join_interval_overlap", "graph_kcore_peel",
    # round-5 batch 12: Arrow UDF, MinHash calibration, order-gap report
    "udf_arrow_optimized", "llm_minhash_calibration",
    "report_order_gap_stats",
    # round-5 batch 13: GBDT stump, A/B z-test, prefix-dup screen
    "ml_decision_stump", "report_ab_test_lift", "llm_prefix_dup_scan",
    # round-5 batch 14: connected components, Jaccard neighbor overlap,
    # naive Bayes confusion matrix, Pareto skyline
    "graph_connected_components", "graph_jaccard_neighbors",
    "ml_naive_bayes", "report_skyline_parts",
    # round-5 batch 15: classifier eval metrics, FK containment
    # inference, caption-embedding alignment
    "ml_eval_metrics", "dq_fk_containment", "multimodal_caption_align",
    # round-5 batch 16: sequence-pattern regex match, Bollinger bands,
    # tie-corrected rank AUC
    "events_sequence_match", "ts_bollinger_bands", "ml_roc_auc",
    # round-5 batch 17: binaryFile media-ingest source, rolling OLS slope
    "scan_binary_files", "win_rolling_slope",
    # round-5 batch 18: STL-lite decomposition, token-entropy histogram
    "ts_decompose_stl_lite", "llm_token_entropy",
    # round-5 batch 19: cumulative gains table, grouped OLS elasticity,
    # ratio-to-parent shares
    "ml_cumulative_gains", "report_price_elasticity",
    "report_ratio_to_parent",
    # round-5 batch 20: modularity of the brand partition
    "graph_modularity",
    # round-5 batch 21: two-period segment migration matrix
    "report_customer_migration",
    # round-5 batch 22: closed-form ridge, k-NN majority classifier,
    # chi-square contingency terms, retrieval precision@k
    "ml_ridge_closed_form", "ml_knn_classify", "ml_chi2_contingency",
    "ml_precision_at_k",
    # round-5 batch 23: clickstream paths, conversion-latency histogram,
    # event-type co-occurrence
    "events_user_paths", "events_time_to_convert", "events_cooccurrence",
    # round-5 batch 24: deterministic fixed-k reservoir sample,
    # rolling 7-day correlation from integer moments
    "sample_reservoir_topk", "win_rolling_corr",
    # round-5 batch 25: discrete percentile, key-sequence gap scan,
    # corpus byte histogram, local clustering coefficient
    "agg_percentile_disc", "dq_id_gaps", "multimodal_byte_histogram",
    "graph_clustering_local",
    # round-5 batch 26: exact two-sample KS drift test, winsorized mean,
    # Theil-Sen robust slope, fold-exact geometric mean
    "dq_ks_two_sample", "agg_winsorized_mean", "ts_theil_sen",
    "agg_geometric_mean",
    # round-5 batch 27: price/volume mix bridge, max drawdown,
    # ROUGE-1 overlap over a linear candidate pairing
    "report_price_volume_mix", "ts_max_drawdown", "llm_rouge_overlap",
    # round-5 batch 28: Holt-Winters seasonal smoothing, hashing-trick
    # features, position-based multi-touch attribution
    "ts_holt_winters", "ml_feature_hashing", "report_position_attribution",
    # round-5 batch 29: streaming exact windowed distinct, Arrow-optimized
    # scalar UDF, permissive-CSV corrupt-record quarantine
    "stream_window_distinct", "udf_arrow_scalar", "scan_csv_quarantine",
    # round-5 batch 30: cohort LTV curve, Hampel outlier filter,
    # dynamic two-phase pivot
    "report_cohort_ltv", "ts_hampel_outliers", "sql_pivot_dynamic",
    # round-5 batch 31: blocked Levenshtein fuzzy join, quadratic trend
    # fit, variance-ratio diagnostic
    "join_fuzzy_levenshtein", "ts_polyfit_quadratic", "ts_variance_ratio",
    # round-5 batch 32: framed audio RMS, SQL optimizer hints,
    # score-level precision-recall curve
    "multimodal_audio_rms", "sql_join_hints", "ml_pr_curve",
    # round-5 batch 33: ordering-consistency DQ, business-day
    # arithmetic, inter-arrival-time profile
    "dq_monotonic_violations", "date_business_days",
    "events_inter_arrival",
    # round-5 batch 34: three-step ordered funnel, smoothed target
    # encoding
    "events_funnel_steps", "ml_target_encoding",
    # round-5 batch 35: hash-rank neighbor sampling, per-user activity
    # streaks, shot-boundary detection
    "graph_sample_neighbors", "events_active_streak_users",
    "multimodal_shot_boundaries",
    # round-5 batch 36: cluster topic terms, hard-negative mining,
    # integer-prominence peak detection
    "llm_cluster_terms", "llm_hard_negatives", "ts_peak_detection",
    # round-5 batch 37: league-table rank movers, streaming
    # emit-on-transition error-rate alerting
    "report_rank_movers", "stream_error_rate_alert",
    # round-5 batch 38: Lorenz curve points, fixed-point centroid
    # silhouette
    "report_lorenz_points", "ml_silhouette_lite",
    # round-5 batch 39: linearly-weighted moving average, session
    # bounce rate
    "win_weighted_moving_avg", "events_bounce_rate",
    # round-5 batch 40: conditional-reset running sum, backlog aging,
    # second-order Markov transitions
    "win_reset_cumsum", "report_backlog_aging",
    "events_markov_second_order",
    # round-5 batch 41: mutual information, calibration bins, regex
    # conformance audit
    "ml_mutual_information", "ml_calibration_bins",
    "dq_string_pattern_conformance",
    # round-5 batch 42: ABC/XYZ matrix, stochastic oscillator,
    # ingest-volume anomaly scan
    "report_abc_xyz", "ts_stochastic_oscillator",
    "dq_anomalous_partitions",
    # round-5 batch 43: DSIR importance weights, Theil index,
    # streaming top-k per window
    "llm_dsir_importance", "agg_theil_index", "stream_topk_per_window",
    # round-5 batch 44: rolling retention, RSI, HHI concentration
    "events_rolling_retention", "ts_rsi", "agg_hhi_concentration",
    # round-5 batch 45: VARIANT surface, perceptual-hash dedup,
    # month-of-year seasonality index
    "sql_variant_extract", "multimodal_phash_dedup",
    "report_seasonality_index",
    # round-5 batch 46: moment-space gradient descent, held-out LM
    # cross-entropy, customer reactivation
    "ml_gradient_descent", "llm_heldout_cross_entropy",
    "report_customer_reactivation",
    # round-5 batch 47: pandas window UDF, supplier scorecard,
    # two-hop reach
    "udf_pandas_window", "report_supplier_scorecard",
    "graph_two_hop_reach",
    # round-5 batch 48: EWMA crossover signals, one-way ANOVA,
    # blur scoring stage
    "ts_ewma_crossover", "ml_anova_oneway", "multimodal_blur_score",
    # round-5 batch 49: arg-extrema aggregates, XmR control chart,
    # Cramér's V effect size
    "agg_arg_minmax", "ts_control_chart_xmr", "ml_cramers_v",
    # round-5 batch 50: exact frequency moments, grid-blocked spatial
    # join, learning curve
    "agg_frequency_moments", "join_spatial_grid", "ml_learning_curve",
    # round-5 batch 51: template mining, overdispersion test,
    # per-partition checksums
    "llm_template_extraction", "events_overdispersion",
    "dq_partition_checksums",
    # round-7 batch 52: strong-oracle error-envelope companions for the
    # three weak sketch queries
    "agg_approx_distinct_band", "agg_approx_percentile_band",
    "agg_sketch_rollup_band",
    # round-7 batch 53: nonparametric rank statistics on the shared
    # distributed prefix-sum rank dataflow
    "ml_mannwhitney_u", "ml_kruskal_wallis", "ml_spearman_corr",
    "ml_wilcoxon_signed_rank", "ml_friedman_test", "ml_brown_forsythe",
    "ml_cohens_kappa", "ts_ljung_box", "ts_runs_test",
    "ts_turning_points", "graph_resource_allocation",
    # round-7 batch 54: graded retrieval metrics + categorical paired
    # tests + unit-root gate
    "ml_ndcg_at_k", "ml_mrr_at_k", "ml_kendall_tau", "ml_mcnemar_test",
    "ml_cochrans_q", "ts_ar1_unit_root",
    # round-7 batch 55: correlogram + dow seasonality strength +
    # MAP/recall retrieval companions
    "ts_acf_lags", "ts_dow_seasonal_strength", "ml_map_at_k",
    "ml_recall_at_k",
    # round-7 batch 56: survival + hash-deterministic resampling
    # inference + sweep-line concurrency
    "ml_kaplan_meier", "ml_permutation_test", "ml_bootstrap_ci",
    "events_peak_concurrency",
    # round-7 batch 57: survival-analysis suite completion
    "ml_nelson_aalen", "ml_logrank_test", "ml_rmst",
    "ml_competing_risks",
    # round-7 batch 58: financial series on the order book
    "ts_npv_discounted", "ts_sharpe_ratio", "ts_beta_to_market",
    "ts_drawdown_duration",
    # round-7 batch 59: experimentation platform
    "ml_diff_in_diff", "ml_cuped_adjustment", "ml_power_mde",
    "report_ab_srm_check",
    # round-7 batch 60: graph analytics completion
    "graph_hits_scores", "graph_closeness_centrality",
    "graph_reciprocity", "graph_pref_attachment",
    # round-7 batch 61: epidemic-curve analytics (the reference's
    # COVID derived-metric family)
    "ts_doubling_time", "ts_growth_ratio_rt",
    "ts_lagged_outcome_ratio", "ts_active_outstanding",
    # round-7 batch 62: interval union + sequential/ratio inference
    "win_merge_intervals", "ml_wilson_ci", "ml_sprt_monitor",
    "ml_ratio_metric_ci",
    # round-7 batch 63: TPC-H classic shapes (adapted Q13/Q15/Q21/Q22)
    "sql_tpch_q13_custdist", "sql_tpch_q15_top_supplier",
    "sql_tpch_q21_waiting_suppliers", "sql_tpch_q22_prospects",
    # round-7 batch 64: training-data plumbing
    "llm_span_corruption_plan", "llm_filter_funnel",
    "multimodal_aspect_bucket",
    # round-7 batch 65: forecast-evaluation suite
    "ts_pinball_loss", "ts_mase_backtest", "ts_interval_coverage",
    "ts_theil_u2",
    # round-7 batch 66: grid kNN join, Matryoshka eval, catalog curve
    "join_knn_grid", "llm_matryoshka_eval", "report_catalog_adoption",
    # round-7 batch 67: TPC-H Q4/Q16 shapes + Brier score
    "sql_tpch_q4_order_priority", "sql_tpch_q16_supplier_cnt",
    "ml_brier_score",
    # round-7 batch 68: Katz centrality, TPC-H Q18, rank-biased overlap
    "graph_katz_centrality", "sql_tpch_q18_large_volume",
    "ml_rank_biased_overlap",
    # round-7 batch 69: split-conformal interval + TPC-H Q20 shape
    "ml_conformal_interval", "sql_tpch_q20_promo_suppliers",
    # round-8 batch 70: five TPC-H shapes (correlated-scalar Q2,
    # data-derived-threshold Q11, conditional-ratio Q14,
    # correlated-average Q17, disjunctive Q19), trigram lexical
    # richness, FD audit, session percentiles, batch perceptron,
    # supplier HHI
    "sql_tpch_q2_min_cost_supplier", "sql_tpch_q11_important_stock",
    "sql_tpch_q14_promo_revenue", "sql_tpch_q17_small_quantity_revenue",
    "sql_tpch_q19_disjunctive_revenue", "llm_type_token_ratio",
    "llm_hapax_ratio", "dq_functional_dependency",
    "events_session_percentiles", "ml_batch_perceptron",
    "report_supplier_herfindahl",
    # round-8 batch 71: association-rule lift, recursive-CTE
    # reset-accumulator (Spark 4 WITH RECURSIVE), column profiling
    "report_basket_affinity_lift", "sql_recursive_reset_accumulator",
    "dq_schema_profile",
    # round-8 batch 72: SemDeDup cluster-scoped embedding dedup,
    # per-group average precision (sequential-fold exact)
    "llm_semdedup", "ml_average_precision",
    # round-8 batch 73: multiclass confusion matrix, YoY growth (month
    # partitioned lag), interpolated Kneser-Ney bigram smoothing
    "ml_confusion_matrix", "win_percent_change_yoy",
    "llm_kneser_ney_lite",
    # round-8 batch 74: Theta set algebra + KLL quantile rollup, each
    # with a strong error-envelope band companion
    "agg_theta_set_ops", "agg_theta_band",
    "agg_kll_quantile_rollup", "agg_kll_band",
    # round-9 batch 75: two-sample tests + effect sizes, vocabulary
    # coverage curve, dedup token-savings report
    "ml_welch_ttest", "ml_effect_size_d", "ml_two_proportion_ztest",
    "llm_ngram_coverage_curve", "llm_dedup_token_savings",
    # round-9 batch 76: content-defined chunking, Chatterjee's xi,
    # ORDER BY ALL surface
    "llm_cdc_chunking", "ml_xi_correlation", "sql_order_by_all",
    # round-9 batch 77: TPC-H suite completion (q1/q3/q6/q10 join the
    # existing q2/q4/q11/q13-q22 — report_* already carries the q3/q5/
    # q7/q10/q18 DataFrame shapes; these are the canonical SQL forms)
    "sql_tpch_q1_pricing_summary", "sql_tpch_q3_shipping_priority",
    "sql_tpch_q6_forecast_revenue", "sql_tpch_q10_returned_items",
    # round-9 batch 78: isotonic regression via the exact minimax
    # identity on the bounded calibration spine
    "ml_isotonic_calibration",
    # round-9 batch 79: Markov removal-effect attribution (integer
    # fixed-point absorption over the channel-bounded journey graph)
    "events_markov_removal_attribution",
    # round-10 batch 80: skyline variants — per-brand Pareto frontier
    # and exact grid-decomposed dominance counting
    "report_group_skyline", "report_skyline_dominators",
    # round-10 batch 81: chained time-window aggregation (window-on-
    # window cascade, append-mode watermark-flush contract)
    "stream_chained_agg",
    # round-11 batch 82: stream-stream interval join (two watermarked
    # sides, event-time-bounded state, append-mode pair emission)
    "stream_interval_join",
    # round-11 batch 83: chained stateful operators across kinds —
    # the interval join feeding a tumbling daily aggregation
    "stream_join_windowed_agg",
    # round-12 batch 84: stream-stream LEFT OUTER interval join —
    # null-extension emitted on watermark expiry (state-timeout
    # semantics the inner join never exercises)
    "stream_interval_join_left",
    # round-13 batch 85: stream-stream FULL OUTER interval join —
    # null-extension on BOTH sides at expiry; the purchase side
    # buffers under its own horizon (b_ts < wm, no +interval)
    "stream_interval_join_full",
    # round-14 batch 86: RIGHT outer interval join (completes the
    # stream-stream outer-join matrix) + HNSW-style hierarchical beam
    # ANN (coarse->fine navigation over the IVF quantizer)
    "stream_interval_join_right", "llm_ann_beam",
    # round-14 batch 87: recall@k of both navigable indexes vs
    # exhaustive ground truth — index quality as a verified output
    "llm_ann_recall",
}

#: Queries intentionally shipped without a DuckDB oracle (weak check):
#: sketch estimates (HLL++, Greenwald-Khanna, mergeable-HLL rollup) are
#: engine-specific by construction; each carries an error-envelope
#: property test instead (tests/test_properties.py).
WEAK_IDS = {
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_sketch_rollup",
    # round-8: Theta set-algebra and KLL quantile rollup — DataSketches
    # estimates are engine-specific (KLL additionally randomized);
    # each has a strong `_band` error-envelope companion
    "agg_theta_set_ops",
    "agg_kll_quantile_rollup",
}


def test_inventory_complete():
    qs = E.queries()
    missing = EXPECTED_IDS - set(qs)
    assert not missing, f"inventory IDs not implemented: {sorted(missing)}"


def test_oracles_cover_strong_queries():
    qs, orc = E.queries(), E.oracle_sql()
    assert set(orc) <= set(qs)
    weak = set(qs) - set(orc)
    assert weak == WEAK_IDS, f"unexpected weak-oracle set: {sorted(weak)}"


def test_window_rotation_is_never_sampled():
    """Per-round contract: the external driver samples the FIRST 50
    registry ids in iteration order; the rotation must not RE-sample a
    prior round's window wholesale (the r13 window deliberately
    back-fills individually chosen refresh ids once the never-sampled
    pool closed — what this pin forbids is an UNROTATED window, i.e.
    the previous round's artifact reappearing as the front-50).

    Round attribution (r12 ADVICE): the old subset-exclusion heuristic
    masked exactly the violation it existed to catch — an unrotated
    window makes the previous artifact a subset of the front and
    silently excludes it.  The current round is now derived from the
    ``round-N`` git tags laid down at round START (bench.py's A/B needs
    them anyway): current = max(tag)+1, and only artifacts with
    round >= current (the current round's own round-end evidence) are
    excluded.  Forgetting to rotate in round N+1 then trips this test
    the moment ``round-N`` is tagged, because CORRECTNESS_rN is
    enforced against and equals the stale front."""
    import glob
    import json
    import os
    import re
    import subprocess

    qs, orc = E.queries(), E.oracle_sql()
    front = list(qs)[:50]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert len(paths) >= 11, f"committed correctness artifacts missing: {paths}"
    rounds = {
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1)): p for p in paths
    }
    try:
        tags = subprocess.run(
            ["git", "tag", "-l", "round-*"],
            cwd=repo, capture_output=True, text=True, timeout=30,
        ).stdout.split()
        current = max(int(t.split("-")[1]) for t in tags) + 1
    except (ValueError, OSError, subprocess.SubprocessError):
        # No tags visible (e.g. a clone/worktree without refs).  The
        # old fallback (current = max artifact round) excluded the
        # newest committed artifact from enforcement — re-opening the
        # unrotated-window masking this pin exists to close, exactly
        # in the tag-less environment that motivated it (r13 ADVICE).
        # Round attribution now has a tracked second source: the
        # ROUND_MARKER file, committed at round start alongside the
        # round-(N-1) tag, so any checkout carries it.  Only if BOTH
        # sources are absent does the pin fail loudly instead of
        # weakening the check.
        marker = os.path.join(repo, "ROUND_MARKER")
        assert os.path.exists(marker), (
            "round attribution unavailable: no round-* tags visible and "
            "no ROUND_MARKER file — cannot safely exclude any artifact "
            "from the rotation pin; commit ROUND_MARKER (round start) "
            "or fetch tags"
        )
        current = int(open(marker).read().strip()) + 1
    assert current in (max(rounds), max(rounds) + 1), (
        f"round attribution drifted: tags say current={current}, "
        f"artifacts reach r{max(rounds)} — tag the new round or rotate"
    )
    prior = {r: p for r, p in rounds.items() if r < current}
    assert prior, "no prior-round correctness artifacts found"
    for r, p in sorted(prior.items()):
        ids = set(json.load(open(p)))
        assert set(front) != ids, (
            f"front-50 IS the round-{r} window — the rotation was skipped"
        )
    # The never-sampled pool closed in r13; from then on back-fill
    # re-samples are deliberate and listed in core._WINDOW_PRIORITY's
    # comments.  Still forbid wholesale reuse: no prior window may
    # contribute more than 60% of the current front.
    for r, p in sorted(prior.items()):
        ids = set(json.load(open(p)))
        shared = len(ids & set(front))
        assert shared <= 30, (
            f"front-50 shares {shared} ids with the round-{r} window — "
            "rotate instead of re-sampling a past window wholesale"
        )
    assert all(n in orc or n in WEAK_IDS for n in front), (
        "front-50 contains an id with neither a strong oracle nor a "
        "declared-weak registration"
    )
