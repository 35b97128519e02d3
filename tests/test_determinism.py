"""Partition-count invariance: rerunning under a different
``spark.sql.shuffle.partitions`` must give bit-identical results.

This is the local guard for the repo's central determinism claim —
results must not depend on how the data is partitioned, because at
1000 executors the partitioning WILL differ from local[32].  Float
aggregation order is the classic violation (the ``regr_slope`` class
found in round 2): a sum of doubles folded in a different partial
order flips last-ulp bits and, at a rounding boundary, rendered
values.  Every query here either avoids float accumulation (integer /
decimal / fixed-point moments) or rounds at grain boundaries the
repo's conventions define — so an exact cross-partitioning comparison
must hold.

The sample is the float-heavy / aggregation-heavy subset; pure
row-local queries are partition-invariant by construction.
"""

import pytest

import __spark_entry__ as E

#: Queries whose results involve aggregation over floats/moments —
#: the ones a partitioning change could plausibly perturb.
SENSITIVE = [
    "agg_groupby",
    "agg_stats",
    "agg_decimal_exact",
    "agg_skew_kurtosis",
    "ts_trend_forecast",
    "ml_ols_normal_eq",
    "ml_pca_power",
    "llm_perplexity_unigram",
    "llm_perplexity_bigram",
    "llm_tfidf",
    "report_last_touch_attribution",
    "report_dau_wau_stickiness",
    "llm_sparse_cosine",
    "llm_ann_pq",
    "ts_mann_kendall",
    # round-5 batch 22-33 float-sensitive additions
    "ts_holt_winters",
    "agg_geometric_mean",
    "ts_theil_sen",
    "win_rolling_corr",
    "ml_knn_classify",
    "ml_ridge_closed_form",
    "ts_variance_ratio",
    "ts_polyfit_quadratic",
    # round-7: single-row folds of large-magnitude doubles (the
    # ml_anova_oneway class — escaped r5/r6 because it was absent here)
    "ml_anova_oneway",
    "agg_corr_matrix",
    "ml_cramers_v",
    "ml_chi2_contingency",
    "ml_gradient_descent",
    "ts_cross_correlation",
    "ml_silhouette_lite",
    "ml_mutual_information",
    "llm_heldout_cross_entropy",
    "llm_vocab_zipf_fit",
    "llm_dsir_importance",
    "agg_theil_index",
    "ts_cusum_changepoint",
    # round-7 nonparam batch: rank statistics via the distributed
    # prefix-sum (_cum_below must be exact at ANY partition count) and
    # k-term sorted folds / micro-unit integer sums
    "ml_mannwhitney_u",
    "ml_kruskal_wallis",
    "ml_spearman_corr",
    "ml_wilcoxon_signed_rank",
    "ml_friedman_test",
    "ml_brown_forsythe",
    "ts_ljung_box",
    "graph_resource_allocation",
    # round-7: windows over raw lineitem rows, where the synthetic
    # data does NOT make (l_orderkey, l_linenumber) unique — the order
    # must be total over all consumed columns instead
    "win_reset_cumsum",
    # round-7 batches 56-58: survival folds, hash-deterministic
    # resampling, and financial-series folds — all single-row or
    # curve-valued double folds that MUST ride the sorted/ordered
    # sequential-fold idiom to stay partition-invariant
    "ml_kaplan_meier",
    "ml_nelson_aalen",
    "ml_logrank_test",
    "ml_rmst",
    "ml_competing_risks",
    "ml_permutation_test",
    "ml_bootstrap_ci",
    "ts_npv_discounted",
    "ts_sharpe_ratio",
    "ts_beta_to_market",
    # round-7 batches 59-62: moment-based closing expressions and
    # literal-constant LLR/CI math over exact integer aggregates
    "ml_cuped_adjustment",
    "ml_power_mde",
    "ml_ratio_metric_ci",
    "ml_wilson_ci",
    # round-7 batches 65-67: sorted-fold forecast metrics
    "ml_brier_score",
    "llm_matryoshka_eval",
    # round-8: explicit-repartition aggregates (must stay exact at any
    # partition count), float-fold AP, kmeans-assignment dedup, KN
    # smoothing, and the recursive reset-accumulator
    "graph_edge_support_topk",
    "report_basket_affinity_lift",
    "ml_average_precision",
    "llm_semdedup",
    "llm_kneser_ney_lite",
    "sql_recursive_reset_accumulator",
    "report_supplier_herfindahl",
    "ml_batch_perceptron",
    # round-8 batch 74: theta sketches are hash-deterministic; the KLL
    # BAND flags must stay 1 despite KLL's internal randomization (the
    # raw KLL estimates are deliberately not here — see sketch pins)
    "agg_theta_set_ops",
    "agg_theta_band",
    "agg_kll_band",
    # round-10: the distributed-prefix-sum ABC banding (decimal cum
    # must be exact at ANY partition split), the Σ-label CC fixed
    # point, and the grid-decomposed dominance count (integer counts,
    # but the full-cell/strip split must not leak into results)
    "report_pareto_abc",
    "llm_dedup_clusters",
    "report_skyline_dominators",
    "report_group_skyline",
]


def _rows(df):
    cols = sorted(df.columns)
    out = [tuple(repr(r[c]) for c in cols) for r in df.collect()]
    return sorted(out)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_repartitioning(spark, sf_dir, name):
    fn = E.queries()[name]
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(fn(spark, sf_dir))
        # 7 is deliberately odd and small: different partial-merge
        # trees, different reduce-side arrival order.
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    assert a == b, f"{name}: result depends on shuffle partitioning"
