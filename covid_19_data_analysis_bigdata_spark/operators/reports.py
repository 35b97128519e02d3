"""Composite report queries — the reference's dashboard shapes.

The COVID-analytics class's headline reports are compositions:
aggregate first, then window over the aggregate (share of world total,
day-over-day growth, month-over-month change — SURVEY.md §0.3).  The
atomic pieces live in aggregates.py/windows.py; these exercise the
composed pipelines end-to-end.

Determinism: aggregates are rounded at the aggregation boundary before
feeding the window stage, so both engines window over identical values
(SURVEY.md §5.3.3); every window order carries a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


@query(
    "report_share_of_total",
    oracle="""
    WITH rev AS (
        SELECT n.n_name,
               round(sum(o.o_totalprice), 4) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name)
    SELECT n_name, revenue,
           round(100 * revenue / sum(revenue) OVER (), 6) AS share_pct
    FROM rev
    """,
)
def report_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total report: each nation's revenue as a percentage of
    the grand total (cases-by-country share of world total analog).

    Aggregate → unpartitioned window-sum over the *aggregated* rows
    (25 nations), so the full-frame window is over a bounded frame —
    the window never sees fact-table cardinality.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "revenue",
        F.round(100 * F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "share_pct"
        ),
    )


@query(
    "report_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def report_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per Asian nation.

    Revenue where customer and supplier share a nation, per nation in
    ASIA, over a two-year order-date window.

    Six-table star: the three bounded dimensions (region→nation→
    supplier) collapse into one broadcast build side, so the fact
    tables (lineitem⋈orders⋈customer) are never shuffled for the
    dimension joins; the date filter pushes to the orders scan.  The
    c_nationkey = s_nationkey equi-condition rides the supplier join.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(dims),
            (li.l_suppkey == dims.s_suppkey)
            & (c.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "report_growth_rate",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS dsum
        FROM events
        GROUP BY 1, 2)
    SELECT event_type, day, dsum,
           round(100 * (dsum - lag(dsum) OVER w) / lag(dsum) OVER w, 6)
               AS growth_pct
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def report_growth_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day growth rate of the daily aggregate per series
    (daily-new-cases growth-rate analog): aggregate to (series, day),
    then lag-percent over the aggregated series.

    ``day`` is unique within a series, so the lag order is total
    without an extra tie-break; the first day's growth is NULL in both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("dsum"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("dsum").over(w)
    return daily.select(
        "event_type",
        "day",
        "dsum",
        F.round(100 * (F.col("dsum") - prev) / prev, 6).alias("growth_pct"),
    )


@query(
    "report_period_compare",
    oracle="""
    WITH monthly AS (
        SELECT n.n_name,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               round(sum(o.o_totalprice), 4)                    AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2)
    SELECT n_name, month, revenue,
           round(revenue - lag(revenue) OVER w, 4) AS mom_delta
    FROM monthly
    WINDOW w AS (PARTITION BY n_name ORDER BY month)
    """,
)
def report_period_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month comparison per nation (period-over-period case
    counts analog): monthly rollup, then a lag delta along the month
    axis within each nation.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    return monthly.select(
        "n_name",
        "month",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 4).alias(
            "mom_delta"
        ),
    )


@query(
    "pipeline_full_report",
    oracle="""
    WITH monthly AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY 1, 2, 3),
    nation_tot AS (
        SELECT region, nation,
               round(sum(revenue), 4)  AS total_rev,
               count(*)                AS n_months
        FROM monthly GROUP BY 1, 2),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY region
                                  ORDER BY total_rev DESC, nation) AS rk,
               round(100 * total_rev /
                     sum(total_rev) OVER (PARTITION BY region), 6)
                   AS region_share_pct
        FROM nation_tot)
    SELECT region, nation, rk, total_rev, region_share_pct, n_months
    FROM ranked WHERE rk <= 3
    """,
)
def pipeline_full_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole notebook as one dataflow: fact ⋈ four
    dimensions → revenue metric → monthly rollup → per-nation totals →
    rank + share-of-region → top-3 nations per region (the
    top-countries-per-continent dashboard).

    Composition check for the engine: dimension broadcasts, partial+
    final aggregation at two grains, and windows over the *aggregated*
    frame (25 nations) all in one lazy plan — the fact table is
    scanned exactly once.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1995-01-01"
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    monthly = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    nation_tot = monthly.groupBy("region", "nation").agg(
        F.round(F.sum("revenue"), 4).alias("total_rev"),
        F.count(F.lit(1)).alias("n_months"),
    )
    w_rank = Window.partitionBy("region").orderBy(
        F.desc("total_rev"), F.asc("nation")
    )
    w_share = Window.partitionBy("region")
    return (
        nation_tot.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "region_share_pct",
            F.round(
                100 * F.col("total_rev") / F.sum("total_rev").over(w_share), 6
            ),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "region", "nation", "rk", "total_rev", "region_share_pct",
            "n_months",
        )
    )
