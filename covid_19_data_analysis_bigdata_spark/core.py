"""Query registry.

Each operator from the SURVEY.md §2 inventory registers itself here via
the :func:`query` decorator.  ``__spark_entry__.py`` exposes the two
registries to the driver:

- ``QUERIES[name]`` — callable ``(spark, sf_dir) -> DataFrame`` (lazy;
  the driver collects).
- ``ORACLES[name]`` — equivalent DuckDB ANSI-SQL string over the
  pre-registered parquet views, or absent for non-SQL-expressible
  operators (the driver then records a weaker rows-only check).

Determinism rules applied by every registered query (SURVEY.md §5.3):
alias every computed column identically in both forms; total-order every
window/top-k with a unique tie-break key; round order-dependent double
aggregates the same on both sides; never emit raw ns timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as inventory query ``name`` with optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Front-of-registry order for round 12.  External correctness sweeps
#: sample the first 50 registry entries in iteration order; every id
#: below is NEVER-sampled in any CORRECTNESS_r01-r11 window (verified
#: by ``tools/evidence.py``), so CORRECTNESS_r12 ∩ (r01-r11) = ∅ by
#: construction.  Selection follows the round-11 verdict tasks 1+5:
#: the two r11-new stream_* ids front-loaded (task 5 — completes the
#: streaming family's external coverage), then ALL never-sampled
#: strong-oracle ids from the ml_* (17), agg_* (15 of 18; the other 3
#: are the declared-weak sketches), graph_* (6), sql_* (5) and ts_*
#: (5) families = exactly 50, all with strong DuckDB oracles.  The
#: r13 window plan for the final never-sampled remainder (18 strong
#: singletons/join/scan ids + the 3 weak sketches, which can only ever
#: get rows-only driver rows) is documented in SCALE.md §"r13 window
#: plan".
_WINDOW_PRIORITY: list[str] = [
    # stream_* — the two r11-new ids (verdict task 5)
    "stream_interval_join",
    "stream_join_windowed_agg",
    # ml_* — all 17 never-sampled of 60
    "ml_welch_ttest",
    "ml_effect_size_d",
    "ml_two_proportion_ztest",
    "ml_xi_correlation",
    "ml_isotonic_calibration",
    "ml_rmst",
    "ml_competing_risks",
    "ml_diff_in_diff",
    "ml_cuped_adjustment",
    "ml_power_mde",
    "ml_wilson_ci",
    "ml_sprt_monitor",
    "ml_ratio_metric_ci",
    "ml_brier_score",
    "ml_conformal_interval",
    "ml_average_precision",
    "ml_confusion_matrix",
    # agg_* — all 15 never-sampled STRONG ids of 42 (the 3 weak
    # sketches agg_sketch_rollup/agg_theta_set_ops/agg_kll_quantile_rollup
    # are deferred to r13 where rows-only driver rows are expected)
    "agg_heavy_hitters",
    "agg_mad",
    "agg_decimal_exact",
    "agg_bool_funcs",
    "agg_mode_exact",
    "agg_percentile_disc",
    "agg_winsorized_mean",
    "agg_hhi_concentration",
    "agg_arg_minmax",
    "agg_frequency_moments",
    "agg_approx_distinct_band",
    "agg_approx_percentile_band",
    "agg_sketch_rollup_band",
    "agg_theta_band",
    "agg_kll_band",
    # graph_* — all 6 never-sampled of 19
    "graph_hits_scores",
    "graph_closeness_centrality",
    "graph_reciprocity",
    "graph_pref_attachment",
    "graph_katz_centrality",
    "graph_resource_allocation",
    # sql_* — all 5 never-sampled of 36
    "sql_order_by_all",
    "sql_tpch_q1_pricing_summary",
    "sql_tpch_q3_shipping_priority",
    "sql_tpch_q6_forecast_revenue",
    "sql_tpch_q10_returned_items",
    # ts_* — all 5 never-sampled of 47
    "ts_active_outstanding",
    "ts_pinball_loss",
    "ts_mase_backtest",
    "ts_interval_coverage",
    "ts_theil_u2",
]


def _reorder_front(priority: list[str]) -> None:
    """Rebuild the registry dicts with ``priority`` names first.

    Names absent from the registry are skipped (a rename must not
    silently truncate the window); the remainder keeps module
    registration order.
    """
    front = [n for n in priority if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in front + rest if n in d}
        d.clear()
        d.update(reordered)


def load_all() -> None:
    """Import every operator module so the registries are fully populated.

    Iteration order is deliberate (see ``_WINDOW_PRIORITY``): external
    correctness sweeps sample the registry front-to-back, so the
    queries with the least accumulated sweep evidence are moved to the
    front after all modules register.
    """
    # Imports are at call time so a failure in one module surfaces loudly
    # rather than silently truncating the registry at package import.
    from covid_19_data_analysis_bigdata_spark.functions import (  # noqa: F401
        scalars,
        udfs,
    )
    from covid_19_data_analysis_bigdata_spark.streaming import ops  # noqa: F401
    from covid_19_data_analysis_bigdata_spark.operators import (  # noqa: F401
        attribution,
        llm,
        textprep,
        llmprep,
        curation,
        retrieval,
        multimodal,
        timeseries,
        etl,
        iterative,
        nonparam,
        reports,
        sqlsurface,
        scale,
        relational,
        joins,
        aggregates,
        windows,
    )
    from covid_19_data_analysis_bigdata_spark.sources import (  # noqa: F401
        pysource,
        scans,
    )

    _reorder_front(_WINDOW_PRIORITY)
