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


#: Front-of-registry order for round 13.  External correctness sweeps
#: sample the first 50 registry entries in iteration order.  Selection
#: follows the round-12 verdict task 3 and the committed plan in
#: SCALE.md §"r13 window plan": the 19 never-sampled STRONG ids first
#: (closing the pool — cumulative external coverage 529/529 after
#: r13), then back-fill re-samples (the r13-changed ``agg_decimal_exact``
#: for its green driver row, the oracle-guard-touched stream joins, the
#: r13-new ``stream_interval_join_full``, and a refresh of the oldest
#: r1/r2 evidence), and the 3 declared-weak sketches LAST — their
#: driver rows are rows-only BY DESIGN (no oracle registered); the
#: error envelopes are hash-checked via the strong ``_band`` companions
#: that went green in r12.
_WINDOW_PRIORITY: list[str] = [
    # ---- 19 never-sampled strong ids (the whole remaining pool) ----
    "stream_interval_join_left",
    "join_range_interval",
    "join_interval_overlap",
    "join_spatial_grid",
    "join_knn_grid",
    "map_hof_funcs",
    "date_business_days",
    "events_markov_removal_attribution",
    "str_edit_distance",
    "sink_parquet_sorted",
    "events_session_percentiles",
    "dq_functional_dependency",
    "dq_schema_profile",
    "report_group_skyline",
    "report_skyline_dominators",
    "sample_reservoir_topk",
    "read_text_lines",
    "scan_binary_files",
    "scan_csv_quarantine",
    # ---- back-fill: r13-changed / r13-new ids ----
    "agg_decimal_exact",          # r12's one hash-fail, requantized r13
    "stream_interval_join_full",  # new in r13
    "stream_join_windowed_agg",   # oracle degenerate-input guard, r13
    "stream_interval_join",       # companion inner join, refresh
    # ---- back-fill: refresh the oldest external evidence (r1 window) ----
    "win_lag_diff",
    "win_lead",
    "win_moving_avg",
    "win_range_frame",
    "win_cumsum",
    "win_rank_dense",
    "win_row_number_topk",
    "win_ntile_pctrank",
    # ---- back-fill: refresh r2-window evidence ----
    "agg_groupby",
    "agg_global",
    "join_broadcast",
    "join_sortmerge",
    "join_multiway_star",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_theta_range",
    "join_asof",
    "filter_compound",
    "project_compute",
    "dedup_distinct",
    "sort_multikey",
    "topk_limit",
    # ---- 3 declared-weak sketches: rows-only driver rows BY DESIGN ----
    "agg_sketch_rollup",
    "agg_theta_set_ops",
    "agg_kll_quantile_rollup",
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
