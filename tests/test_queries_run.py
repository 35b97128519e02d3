"""Every registered query runs at sf0.001 and returns a sane frame."""

import pytest

import __spark_entry__ as E

#: Queries whose result can legitimately be empty at tiny scale.
MAY_BE_EMPTY = {"join_anti"}

_ALL = sorted(E.queries())


@pytest.mark.parametrize("name", _ALL)
def test_query_runs(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert len(set(df.columns)) == len(df.columns), f"{name}: duplicate columns"
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name}: returned 0 rows at {sf_dir}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base",
        "sum_disc", "avg_qty", "cnt",
    ]
