"""Round-7 nonparametric batch: independent recomputes and identities.

Each rank statistic is re-derived here by a *different* route than
either engine uses — ``pandas.Series.rank(method="average")`` /
direct numpy ACF — so the distributed prefix-sum rank machinery
(``nonparam._cum_below``) and the moment-clearing algebra are checked
against textbook definitions, not against themselves.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as E
from covid_19_data_analysis_bigdata_spark.sources.io import load_table
from covid_19_data_analysis_bigdata_spark.operators.nonparam import (
    RA_TOPK,
    _cum_below,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# -- the shared prefix-sum primitive ---------------------------------------


def test_cum_below_matches_unpartitioned_window(spark):
    import random

    random.seed(13)
    # unique order values (the primitive's contract), shuffled weights,
    # deliberately many input partitions so range boundaries matter
    vals = random.sample(range(10_000), 500)
    rows = [(v, random.randint(1, 9)) for v in vals]
    df = spark.createDataFrame(rows, "v long, w long").repartition(17)
    got = {r["v"]: r["cb"] for r in _cum_below(df, "v", "w", "cb").collect()}
    win = (
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    )
    exp = {
        r["v"]: r["cb"]
        for r in df.select(
            "v", F.coalesce(F.sum("w").over(win), F.lit(0)).alias("cb")
        ).collect()
    }
    assert got == exp


# -- Mann-Whitney ----------------------------------------------------------


def test_mannwhitney_matches_pandas_rank_recompute(spark, sf_dir):
    r = _one(E.queries()["ml_mannwhitney_u"](spark, sf_dir))
    # identity: the two U statistics partition the pair count
    assert r["u_a"] + r["u_b"] == r["n_a"] * r["n_b"]
    # independent recompute via pandas average ranks
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pdf = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.round("o_totalprice").cast("long").alias("usd"),
            "c_mktsegment",
        )
        .toPandas()
    )
    ranks = pdf["usd"].rank(method="average")
    a = pdf["c_mktsegment"] == "BUILDING"
    n_a, n_b = int(a.sum()), int((~a).sum())
    u_a = float(ranks[a].sum()) - n_a * (n_a + 1) / 2
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert r["u_a"] == pytest.approx(u_a, abs=1e-9)


# -- Kruskal-Wallis --------------------------------------------------------


def test_kruskal_wallis_matches_pandas_rank_recompute(spark, sf_dir):
    r = _one(E.queries()["ml_kruskal_wallis"](spark, sf_dir))
    # tie correction divides by a factor <= 1
    assert r["h_adj"] >= r["h_stat"]
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pdf = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .select(
            F.round("o_totalprice").cast("long").alias("usd"),
            F.col("c_mktsegment").alias("seg"),
        )
        .toPandas()
    )
    n = len(pdf)
    pdf["rk"] = pdf["usd"].rank(method="average")
    srr = sum(
        g["rk"].sum() ** 2 / len(g) for _, g in pdf.groupby("seg")
    )
    h = 12.0 * srr / (n * (n + 1)) - 3.0 * (n + 1)
    assert r["n"] == n
    assert r["h_stat"] == pytest.approx(h, abs=1e-5)


# -- Spearman --------------------------------------------------------------


def test_spearman_matches_pandas_corr(spark, sf_dir):
    r = _one(E.queries()["ml_spearman_corr"](spark, sf_dir))
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pdf = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("yv"))
        .select(F.round("o_totalprice").cast("long").alias("xv"), "yv")
        .toPandas()
    )
    # spearman = pearson over average ranks (no scipy in this env)
    rx = pdf["xv"].rank(method="average").to_numpy()
    ry = pdf["yv"].rank(method="average").to_numpy()
    rho = float(np.corrcoef(rx, ry)[0, 1])
    assert -1.0 <= r["spearman_rho"] <= 1.0
    assert r["spearman_rho"] == pytest.approx(rho, abs=1e-5)


# -- Wilcoxon signed-rank --------------------------------------------------


def test_wilcoxon_matches_pandas_rank_recompute(spark, sf_dir):
    r = _one(E.queries()["ml_wilcoxon_signed_rank"](spark, sf_dir))
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    usd = F.round("o_totalprice").cast("long")
    pdf = (
        od.filter(F.year("o_orderdate") == 1995)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.month("o_orderdate") <= 6, usd).otherwise(0)).alias("h1"),
            F.sum(F.when(F.month("o_orderdate") >= 7, usd).otherwise(0)).alias("h2"),
        )
        .toPandas()
    )
    d = (pdf["h2"] - pdf["h1"]).astype(float)
    d = d[d != 0]
    ranks = d.abs().rank(method="average")
    w_plus = float(ranks[d > 0].sum())
    n = len(d)
    assert r["n"] == n
    assert r["w_plus"] == pytest.approx(w_plus, abs=1e-9)
    assert 0 <= r["w_plus"] <= n * (n + 1) / 2


# -- Friedman --------------------------------------------------------------


def test_friedman_matches_pandas_rank_recompute(spark, sf_dir):
    r = _one(E.queries()["ml_friedman_test"](spark, sf_dir))
    assert r["k"] == 5
    # complete blocks + Cauchy-Schwarz on rank sums => Q >= 0
    assert r["q_stat"] >= -1e-9
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pdf = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("usd"))
        .toPandas()
    )
    k = pdf["seg"].nunique()
    full = pdf.groupby("mon")["seg"].transform("count") == k
    pdf = pdf[full].copy()
    pdf["rk"] = pdf.groupby("mon")["usd"].rank(method="average")
    b = pdf["mon"].nunique()
    srr = sum(g["rk"].sum() ** 2 for _, g in pdf.groupby("seg"))
    q = 12.0 * srr / (b * k * (k + 1)) - 3.0 * b * (k + 1)
    assert r["b"] == b
    assert r["q_stat"] == pytest.approx(q, abs=1e-6)


# -- Brown-Forsythe --------------------------------------------------------


def test_brown_forsythe_matches_pandas_recompute(spark, sf_dir):
    r = _one(E.queries()["ml_brown_forsythe"](spark, sf_dir))
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pdf = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round("o_totalprice").cast("long").alias("usd"),
        )
        .toPandas()
    )
    # half-dollar-unit deviations from the group median, as documented
    z = pdf.groupby("seg")["usd"].transform(
        lambda s: (2 * s - round(2 * s.median())).abs()
    )
    pdf["z"] = z.astype(float)
    n, k = len(pdf), pdf["seg"].nunique()
    gm = pdf["z"].mean()
    ssb = sum(
        len(g) * (g["z"].mean() - gm) ** 2 for _, g in pdf.groupby("seg")
    )
    ssw = sum(
        ((g["z"] - g["z"].mean()) ** 2).sum() for _, g in pdf.groupby("seg")
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r["k"], r["n"]) == (k, n)
    assert r["f_stat"] == pytest.approx(f, rel=1e-6)


# -- Cohen's kappa ---------------------------------------------------------


def test_cohens_kappa_identities(spark, sf_dir):
    r = _one(E.queries()["ml_cohens_kappa"](spark, sf_dir))
    assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == r["n"]
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0
    # kappa = (po-pe)/(1-pe) recomputed from the emitted table
    po = (r["n11"] + r["n00"]) / r["n"]
    pe = (
        (r["n11"] + r["n10"]) * (r["n11"] + r["n01"])
        + (r["n01"] + r["n00"]) * (r["n10"] + r["n00"])
    ) / (r["n"] ** 2)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)


# -- Ljung-Box -------------------------------------------------------------


def test_ljung_box_matches_numpy_acf(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in E.queries()["ts_ljung_box"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        v = g["v"].to_numpy(dtype=float)
        n = len(v)
        c = v - v.mean()
        den = float(c @ c)
        q = 0.0
        for k in range(1, 8):
            rho = float(c[k:] @ c[:-k]) / den
            q += rho * rho / (n - k)
            if k == 1:
                assert out[et]["acf1"] == pytest.approx(rho, abs=1e-5)
        assert out[et]["n_days"] == n
        assert out[et]["q_lb"] == pytest.approx(n * (n + 2) * q, abs=1e-4)


# -- runs / turning points -------------------------------------------------


def test_runs_test_matches_python_recompute(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in E.queries()["ts_runs_test"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        v = g["v"].to_numpy()
        m2 = round(2 * float(np.median(v)))
        signs = [1 if 2 * x > m2 else 0 for x in v if 2 * x != m2]
        runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
        n1, n2 = sum(signs), len(signs) - sum(signs)
        assert (out[et]["n1"], out[et]["n2"]) == (n1, n2)
        assert out[et]["runs"] == runs


def test_turning_points_matches_python_recompute(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in E.queries()["ts_turning_points"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        v = g["v"].to_numpy()
        turns = sum(
            1
            for i in range(1, len(v) - 1)
            if (v[i - 1] < v[i] > v[i + 1]) or (v[i - 1] > v[i] < v[i + 1])
        )
        assert out[et]["turns"] == turns
        assert out[et]["turns"] <= out[et]["n_days"] - 2


# -- resource allocation ---------------------------------------------------


def test_resource_allocation_matches_python_recompute(spark, sf_dir):
    rows = E.queries()["graph_resource_allocation"](spark, sf_dir).collect()
    assert len(rows) == RA_TOPK
    assert all(r["s1"] < r["s2"] for r in rows)
    micro = [r["ra_micro"] for r in rows]
    assert micro == sorted(micro, reverse=True)
    # recompute the top pair's score from raw relations
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rel = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .toPandas()
    )
    nbrs = rel.groupby("s")["c"].agg(set).to_dict()
    deg = rel.groupby("c")["s"].nunique().to_dict()
    top = rows[0]
    common = nbrs[top["s1"]] & nbrs[top["s2"]]
    assert top["n_common"] == len(common)
    assert top["ra_micro"] == sum(round(1e6 / deg[c]) for c in common)
