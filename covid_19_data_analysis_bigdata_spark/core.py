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


def load_all() -> None:
    """Import every operator module so the registries are fully populated.

    Registration order is deliberate: external correctness sweeps sample
    the registry front-to-back, so the categories with the least
    accumulated sweep evidence (scalar functions, streaming, UDFs, LLM
    text/dedup, ETL, time-series) register FIRST; the relational / join
    / aggregate families — already green across two full sweeps — come
    last.
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
