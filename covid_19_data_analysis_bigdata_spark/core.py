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


#: Front-of-registry order for round 10.  External correctness sweeps
#: sample the first 50 registry entries in iteration order; every id
#: below is NEVER-sampled in any CORRECTNESS_r01-r09 window (verified
#: by ``tools/evidence.py``), so CORRECTNESS_r10 ∩ (r01-r09) = ∅ by
#: construction.  Selection follows the round-9 verdict task 2: the
#: thinnest external pools are report_* (21/46 = 45%), win_* and
#: etl_* and udf_* (each 50%) — ALL never-sampled ids from those four
#: families go first (25 + 10 + 8 + 3 = 46), then 4 llm_* fills
#: chosen deliberately: the three queries whose global-rank windows
#: were de-globalized this round (llm_tokenizer_coverage,
#: llm_vocab_zipf_fit, llm_ngram_coverage_curve — external evidence
#: lands on the NEW forms, closing the advisor's stale-evidence class)
#: plus llm_cdc_chunking (round-9 addition entering the scalebench
#: trend this round).  All 50 carry strong DuckDB oracles.
_WINDOW_PRIORITY: list[str] = [
    # report_* — all 25 never-sampled of 46
    "report_last_touch_attribution",
    "report_event_transitions",
    "report_dau_wau_stickiness",
    "report_weekday_seasonality",
    "report_shipping_delay_percentiles",
    "report_session_duration_stats",
    "report_order_gap_stats",
    "report_ab_test_lift",
    "report_skyline_parts",
    "report_price_elasticity",
    "report_ratio_to_parent",
    "report_customer_migration",
    "report_price_volume_mix",
    "report_position_attribution",
    "report_cohort_ltv",
    "report_rank_movers",
    "report_backlog_aging",
    "report_abc_xyz",
    "report_seasonality_index",
    "report_customer_reactivation",
    "report_supplier_scorecard",
    "report_ab_srm_check",
    "report_catalog_adoption",
    "report_supplier_herfindahl",
    "report_basket_affinity_lift",
    # win_* — all 10 never-sampled of 20
    "win_range_time",
    "win_percent_change_yoy",
    "win_rolling_distinct",
    "win_rolling_median",
    "win_cume_dist_nth",
    "win_rolling_slope",
    "win_rolling_corr",
    "win_weighted_moving_avg",
    "win_reset_cumsum",
    "win_merge_intervals",
    # etl_* — all 8 never-sampled of 16
    "etl_consistent_sample",
    "etl_partition_skew_report",
    "etl_merge_into",
    "etl_backfill_gaps",
    "etl_time_travel",
    "etl_write_audit_publish",
    "etl_zorder_layout",
    "etl_rebalance_layout",
    # udf_* — all 3 never-sampled of 6
    "udf_arrow_optimized",
    "udf_arrow_scalar",
    "udf_pandas_window",
    # llm_* fills — the three r10-de-globalized forms + the r9 CDC op
    "llm_tokenizer_coverage",
    "llm_vocab_zipf_fit",
    "llm_ngram_coverage_curve",
    "llm_cdc_chunking",
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
