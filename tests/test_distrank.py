"""``operators/distrank`` must reproduce single-partition Window
semantics exactly — it replaces ``Window.orderBy()`` (no partitionBy)
at entity grains, so any divergence is a silent correctness bug in
six registry queries.

The reference IS the unpartitioned window (fine at test scale); the
subject is the two-pass distributed implementation, run over a
deliberately multi-partition, shuffled input with duplicate sort
values so the unique tie-break and the range-boundary handling are
both exercised.
"""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.operators.distrank import (
    global_ntile,
    global_rank,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # heavy ties (50 distinct v over ~1000 rows) + unique id tie-break;
    # 11 input partitions so range boundaries really split runs of ties
    random.seed(7)
    rows = [(i, random.randint(0, 50)) for i in range(997)]
    return spark.createDataFrame(rows, "id long, v long").repartition(11)


def test_global_rank_matches_window(spark, skewed_df):
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rk"]
        for r in global_rank(skewed_df, order, "rk").collect()
    }
    exp = {
        r["id"]: r["rk"]
        for r in skewed_df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rk")
        ).collect()
    }
    assert got == exp


def test_global_rank_total_col(spark, skewed_df):
    out = global_rank(
        skewed_df, [F.asc("v"), F.asc("id")], "rk", total_col="n"
    ).collect()
    assert all(r["n"] == 997 for r in out)
    assert sorted(r["rk"] for r in out) == list(range(1, 998))


@pytest.mark.parametrize("k", [4, 10, 1000])
def test_global_ntile_matches_window(spark, skewed_df, k):
    # k=1000 > n exercises the q=0 branch (tiles of 0 or 1 rows)
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["t"]
        for r in global_ntile(skewed_df, k, order, "t").collect()
    }
    exp = {
        r["id"]: r["t"]
        for r in skewed_df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).alias("t")
        ).collect()
    }
    assert got == exp


def test_global_rank_invariant_under_shuffle_partitions(spark, skewed_df):
    order = [F.asc("v"), F.desc("id")]
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(
            (r["id"], r["rk"])
            for r in global_rank(skewed_df, order, "rk").collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(
            (r["id"], r["rk"])
            for r in global_rank(skewed_df, order, "rk").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b


def test_global_rank_pid_frame_is_persisted(spark, skewed_df):
    """Round-8 advice pin: the spark_partition_id()-stamped frame must
    be a persist barrier feeding BOTH the offsets aggregate and the
    window join — without it, correctness depends on exchange reuse
    (defeated by spark.sql.exchange.reuse=false or divergent AQE
    coalesced reads), and ranks silently shift."""
    df = global_rank(skewed_df, [F.asc("v"), F.desc("id")], "rk")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("InMemoryTableScan") >= 2


def test_global_rank_correct_without_exchange_reuse(spark, skewed_df):
    """The scenario the round-8 advice describes: exchange reuse OFF.
    The persisted pid frame must keep ranks exact anyway."""
    order = [F.asc("v"), F.desc("id")]
    base = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        got = sorted(
            (r["id"], r["rk"])
            for r in global_rank(skewed_df, order, "rk").collect()
        )
    finally:
        spark.conf.set("spark.sql.exchange.reuse", base)
    exp = sorted(
        (r["id"], r["rn"])
        for r in skewed_df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    )
    assert got == exp
