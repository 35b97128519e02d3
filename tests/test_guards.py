"""Invariant guards (SURVEY.md §4.3 discipline, made permanent).

Two classes of one-off round-1 fixes are converted into CI invariants
here so they cannot regress:

1. No driver-side materialization inside the package — ``toPandas()``
   and ``collect()`` pull unbounded data onto the driver; every
   operator must keep data distributed (bench.py, outside the package,
   is the one legitimate materialization point).
2. No nested (array/map/struct) columns in any registered query's
   output schema — result-comparison harnesses canonicalize cells with
   pandas and cannot hash array cells; list-valued results must be
   flattened (concat_ws / per-element columns / to_json) in-plan.
"""

from __future__ import annotations

import pathlib
import re

import pytest

from covid_19_data_analysis_bigdata_spark import core

PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "covid_19_data_analysis_bigdata_spark"
)

#: ``.collect()`` with no arguments — distinct from collect_list/
#: collect_set (aggregate functions, fine) and localCheckpoint.
_MATERIALIZE = re.compile(r"\.(toPandas|collect|toLocalIterator)\(\)")


def test_no_driver_materialization_in_package():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        for lineno, line in enumerate(
            path.read_text().splitlines(), start=1
        ):
            if _MATERIALIZE.search(line):
                offenders.append(f"{path.relative_to(PKG.parent)}:{lineno}")
    assert not offenders, (
        "driver-side materialization in package (keep data distributed; "
        f"bench.py is the only legitimate sink): {offenders}"
    )


@pytest.fixture(scope="module")
def all_queries():
    core.load_all()
    return dict(core.QUERIES)


def test_no_nested_output_schemas(spark, sf_dir, all_queries):
    """Every registered query must emit only scalar columns.

    Builds each plan lazily (no execution) and inspects the analyzed
    schema; streaming queries execute their availableNow replay, which
    is why this runs at the smallest fixture scale.
    """
    bad = {}
    for name, fn in sorted(all_queries.items()):
        df = fn(spark, sf_dir)
        nested = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"nested output columns (unhashable cells): {bad}"
