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


#: Front-of-registry order for round 9.  External correctness sweeps
#: sample the first 50 registry entries in iteration order; every id
#: below is NEVER-sampled in any CORRECTNESS_r01-r08 window (verified
#: by ``tools/evidence.py``), so CORRECTNESS_r09 ∩ (r01-r08) = ∅ by
#: construction.  Selection follows the round-8 verdict task 1: the
#: sql_* pool is by far the thinnest (2/31 external = 6%) and carries
#: the trickiest engine-equivalence claims (recursive CTEs, EXECUTE
#: IMMEDIATE, variant, parameterized SQL) — all 29 never-sampled
#: sql_* ids go first, then the 21 earliest-registered never-sampled
#: ml_* ids (ml_* is next-thinnest at 40%).  All 50 carry strong
#: DuckDB oracles.
_WINDOW_PRIORITY: list[str] = [
    # sql_* — all 29 never-sampled of 31 (SQL-surface family)
    "sql_subquery_in",
    "sql_subquery_not_exists",
    "sql_subquery_scalar_corr",
    "sql_group_by_all",
    "sql_parameterized",
    "sql_execute_immediate",
    "sql_pivot_clause",
    "sql_unpivot_clause",
    "sql_star_except",
    "sql_window_clause",
    "sql_distribute_sort_by",
    "sql_lateral_view_explode",
    "sql_pivot_dynamic",
    "sql_join_hints",
    "sql_variant_extract",
    "sql_tpch_q13_custdist",
    "sql_tpch_q15_top_supplier",
    "sql_tpch_q21_waiting_suppliers",
    "sql_tpch_q22_prospects",
    "sql_tpch_q4_order_priority",
    "sql_tpch_q16_supplier_cnt",
    "sql_tpch_q18_large_volume",
    "sql_tpch_q20_promo_suppliers",
    "sql_tpch_q2_min_cost_supplier",
    "sql_tpch_q11_important_stock",
    "sql_tpch_q14_promo_revenue",
    "sql_tpch_q17_small_quantity_revenue",
    "sql_tpch_q19_disjunctive_revenue",
    "sql_recursive_reset_accumulator",
    # ml_* — earliest-registered never-sampled 21 of 33
    "ml_ndcg_at_k",
    "ml_mrr_at_k",
    "ml_map_at_k",
    "ml_recall_at_k",
    "ml_rank_biased_overlap",
    "ml_batch_perceptron",
    "ml_mannwhitney_u",
    "ml_kruskal_wallis",
    "ml_spearman_corr",
    "ml_wilcoxon_signed_rank",
    "ml_friedman_test",
    "ml_brown_forsythe",
    "ml_cohens_kappa",
    "ml_kendall_tau",
    "ml_mcnemar_test",
    "ml_cochrans_q",
    "ml_kaplan_meier",
    "ml_permutation_test",
    "ml_bootstrap_ci",
    "ml_nelson_aalen",
    "ml_logrank_test",
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
