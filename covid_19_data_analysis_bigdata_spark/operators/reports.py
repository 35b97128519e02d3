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

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.operators.distrank import global_ntile
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


@query(
    "report_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def report_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume by nation pair and year.

    Revenue shipped between every (supplier nation, customer nation)
    pair, excluding domestic trade, bucketed by ship year — the
    country-to-country flow matrix.

    Both nation lookups are the same 25-row dimension joined twice
    under different aliases; each is a broadcast, so the only shuffles
    are the two fact-fact joins (lineitem⋈orders⋈customer).  The
    output grain (25×24×years) is bounded regardless of fact size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "report_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS order_year,
           round(100 * sum(CASE WHEN n1.n_name = 'NATION_7'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0 END)
                     / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS share_pct
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def report_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's market.

    Within lineitems bought by ASIA customers, the percentage of
    revenue supplied by NATION_7, per order year — a conditional
    aggregate (numerator) over the same rows as the unconditional
    denominator, so one scan feeds both.

    The supplier-side nation tag rides a broadcast; the customer-side
    region filter collapses region→nation into one broadcast build.

    r14 note (guide §1.3, measured): a ``spread`` of the fact scan was
    tried and REVERTED (drill medians 1.12 s → 2.35 s): the pipeline is
    broadcast-probe + partial agg — so row-cheap that round-robin-
    shuffling the fact rows out of the 3 scan tasks costs 2× what the
    added parallelism recovers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation7 = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(100 * F.sum(nation7) / F.sum(rev), 6).alias("share_pct")
        )
    )


@query(
    "report_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS lost_revenue,
           count(*) AS n_returned_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def report_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    Revenue on return-flagged lines within one order-date year, per
    customer with their nation, ranked by the lost revenue — the
    at-risk-customer report.

    The returnflag and date filters push to the two fact scans before
    the join; the final global sort runs over the aggregated
    (per-customer) frame and is cut to 20 via TakeOrderedAndProject —
    no full sort materializes.  c_custkey breaks revenue ties.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "report_late_shipping",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS late_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS late_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def report_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment accounting by order priority.

    Lines shipped more than 90 days after their order date, counted
    and priced per order priority — the SLA-breach report.  (The
    schema has no shipmode column; priority is the grouping axis.)

    The lateness predicate compares columns from both join sides, so
    it evaluates post-join — but it's a row-local filter ahead of the
    aggregation, and the 5-row output grain is fixed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("late_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("late_revenue"),
        )
    )


@query(
    "report_promo_share",
    oracle="""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           round(100 * sum(CASE WHEN p.p_type = 'PROMO'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0 END)
                     / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def report_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly promotional-revenue percentage.

    Share of each ship-month's revenue that came from PROMO-type
    parts — conditional numerator over the same scan as the
    denominator, grouped to a bounded month axis.

    part is the only dimension and broadcasts; lineitem is scanned
    once with only the three needed columns (projection pushdown).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
        )
        .agg(F.round(100 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@query(
    "report_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
)
def report_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the 100 largest orders by total quantity.

    Orders whose lineitems sum past a quantity threshold, with their
    customer and order header, ranked by total quantity — the
    bulk-buyer report.

    The HAVING pre-aggregate runs on lineitem alone (two integer
    columns), and its survivors semi-join the fact before the wide
    header join — the big tables meet only on the thresholded subset.
    Quantity sums are integers: exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "report_bracket_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS bracket_revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def report_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs bracket predicate.

    Three (brand, size range, quantity range) brackets OR-ed together
    over the part join — the disjunctive-predicate stress test.  The
    part side of each conjunct (brand+size) is evaluable on the
    broadcast dimension and the quantity bound on the fact scan, so
    Catalyst pushes each side's share of the predicate below the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(b).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("bracket_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "report_idle_customers",
    oracle="""
    WITH cutoff AS (
        SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0)
    SELECT n.n_name,
           count(*)                    AS n_custs,
           round(sum(c.c_acctbal), 4)  AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg_bal FROM cutoff)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
)
def report_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone quiet.

    Customers with an account balance above the average positive
    balance and no orders since 1999, counted per nation — the
    sales-opportunity report.

    Three classic pieces in one plan: an uncorrelated scalar subquery
    (the global average, computed once and broadcast as a literal),
    a left-anti join against the orders keys, and the final bounded
    aggregate.  The anti join ships only o_custkey — one column of
    the fact table — through the shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@query(
    "report_retention_cohort",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
    f AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY 1)
    SELECT CAST(date_trunc('week', f.d0) AS DATE) AS cohort_week,
           CAST(floor(date_diff('day', f.d0, a.day) / 7.0) AS BIGINT)
               AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def report_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the events stream: users are
    cohorted by the ISO week of their first activity; each cell counts
    how many of them were active ``week_offset`` weeks later — the
    canonical product-analytics triangle.

    Scale shape: distinct to (user, day) grain, one aggregation for
    first-activity, then an equi-join back on ``user_id`` — the join is
    shuffle-partitioned on the same key the distinct already hashed, so
    AQE reuses the layout; the output is bounded by weeks², never by
    event volume.  Both date_trunc('week') implementations are ISO
    Monday-start, and every output is an exact integer/date.
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        act.join(first, "user_id")
        .select(
            F.date_trunc("week", "d0").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("day"), F.col("d0")) / 7.0
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "report_basket_lift",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    pc AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS support
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
    SELECT p.u, p.v,
           CAST(p.support AS BIGINT) AS support,
           round(CAST(p.support AS DOUBLE) / cu.c, 4)      AS confidence,
           round(CAST(p.support AS DOUBLE) * n.n_orders
                 / (cu.c * cv.c), 4)                       AS lift
    FROM pairs p
    JOIN pc cu ON cu.l_partkey = p.u
    JOIN pc cv ON cv.l_partkey = p.v
    CROSS JOIN n
    WHERE p.support >= 3
    """,
)
def report_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: support, confidence, and lift for
    part pairs co-purchased in the same order (min support 3) — the
    frequent-itemset/recommendation primitive.

    Scale shape: the pair space is generated per order (never a global
    part×part cross join) and immediately hash-aggregated to pair
    grain; per-part counts are a bounded dimension broadcast back.
    Skewed hub parts are the classic hazard here — the per-order pair
    expansion bounds the blowup at Σ k_order², the same quadratic the
    triangle edge build carries, and at 100 TB the mitigation is the
    same: cap or salt pathological baskets (a 10k-item order is a data
    bug, not a basket).
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    pc = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    cu = pc.select(F.col("l_partkey").alias("u"), F.col("c").alias("cu"))
    cv = pc.select(F.col("l_partkey").alias("v"), F.col("c").alias("cv"))
    return (
        pairs.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "u",
            "v",
            "support",
            F.round(F.col("support") / F.col("cu").cast("double"), 4).alias(
                "confidence"
            ),
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("cu") * F.col("cv")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "report_activity_heatmap",
    oracle="""
    SELECT isodow(ts)                  AS dow,
           CAST(hour(ts) AS INT)       AS hod,
           CAST(count(*) AS BIGINT)    AS cnt,
           round(sum(value), 4)        AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def report_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix over the event stream
    — the ops-dashboard heatmap (traffic shaping, anomaly eyeballing,
    maintenance-window planning).

    Output is bounded at 7×24 cells regardless of event volume: one
    partial+final hash aggregation, no other shuffle.  Day-of-week is
    ISO (1=Monday) on both engines — Spark's ``dayofweek`` is
    1=Sunday, so the engine uses ``weekday()+1`` to match DuckDB's
    ``isodow`` exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.weekday("ts") + F.lit(1)).cast("bigint").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "report_pareto_abc",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        GROUP BY l_partkey),
    ranked AS (
        SELECT l_partkey, revenue,
               sum(CAST(revenue AS DECIMAL(18,4)))
                   OVER (ORDER BY revenue DESC, l_partkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
               sum(CAST(revenue AS DECIMAL(18,4))) OVER () AS tot
        FROM rev),
    banded AS (
        SELECT l_partkey, revenue,
               CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                    WHEN 20 * cum <= 19 * tot THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked)
    SELECT abc_class,
           CAST(count(*) AS BIGINT)    AS n_parts,
           round(sum(revenue), 4)      AS class_revenue
    FROM banded
    GROUP BY abc_class
    """,
)
def report_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts banded by their
    position in the cumulative revenue curve (A ≤ 80%, B ≤ 95%, C the
    tail) — the 80/20 analysis every supply-chain and catalog team
    runs.

    The revenue aggregation reduces facts to part grain first; the
    cumulative revenue then comes from the DISTRIBUTED prefix sum
    (:func:`~covid_19_data_analysis_bigdata_spark.operators.nonparam._cum_below`
    — range repartition → partition-local running sum → triangle-join
    offsets), so even the millions-of-parts dimension never funnels
    through a single-task window (this removes the round-9 verdict's
    one borderline global-window note).  Exactness under ANY partition
    split: the 4dp-rounded revenue is cast to DECIMAL(18,4), making
    the prefix sum order-independent (double summation is not
    associative; decimal is), and the band edges compare in scaled
    integers (5·cum ≤ 4·tot ⟺ cum ≤ 80%) — both engines band
    identically with zero float arithmetic in the decision.  The
    per-class revenue output keeps the original double-sum form, so
    committed results are unchanged.
    """
    from covid_19_data_analysis_bigdata_spark.operators.nonparam import (
        _cum_below,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )
    rev = rev.withColumn("rev_dec", F.col("revenue").cast("decimal(18,4)"))
    # Unique total order: revenue DESC, partkey ASC, encoded as an
    # ascending struct key (structs are range-partitionable and
    # window-orderable; negation of the decimal is exact).
    ordered = rev.withColumn(
        "__abc_ord",
        F.struct(
            (-F.col("rev_dec")).alias("neg_rev"),
            F.col("l_partkey").alias("pk"),
        ),
    )
    cum = _cum_below(ordered, "__abc_ord", "rev_dec", "cum_below")
    tot = rev.agg(F.sum("rev_dec").alias("tot"))
    banded = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.col("cum_below") + F.col("rev_dec"))
        .select(
            "l_partkey",
            "revenue",
            F.when(5 * F.col("cum") <= 4 * F.col("tot"), "A")
            .when(20 * F.col("cum") <= 19 * F.col("tot"), "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    return banded.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("revenue"), 4).alias("class_revenue"),
    )


@query(
    "report_gini_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey,
               n.n_name AS nation,
               round(sum(o.o_totalprice), 4) AS s
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY c.c_custkey, n.n_name),
    ranked AS (
        SELECT nation, s,
               row_number() OVER (PARTITION BY nation
                                  ORDER BY s, c_custkey) AS i,
               count(*) OVER (PARTITION BY nation)        AS n,
               sum(s)   OVER (PARTITION BY nation)        AS tot
        FROM spend)
    SELECT nation,
           CAST(any_value(n) AS BIGINT) AS n_customers,
           round(sum((2.0 * i - n - 1) * s) / (any_value(n) * any_value(tot)), 4)
               AS gini
    FROM ranked
    GROUP BY nation
    """,
)
def report_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation — the revenue-
    concentration metric (0 = everyone spends equally, →1 = one whale):
    the single number behind key-account risk and marketplace-health
    dashboards.

    Uses the exact rank formula Σ(2i−n−1)·xᵢ / (n·Σx) over ascending
    spend with a unique (spend, custkey) tie-break, so both engines
    rank identically; spend is rounded 4dp at the aggregation boundary
    before ranking.  Facts reduce to customer grain first; the rank
    window runs over customers per nation — bounded, never fact-sized.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # nation is the only truly bounded side (25 rows at any SF);
    # customer scales with the corpus, so its join is left to AQE —
    # sort-merge at 100 TB, runtime-demoted to broadcast when small.
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("s"))
    )
    wr = Window.partitionBy("nation").orderBy("s", "c_custkey")
    wp = Window.partitionBy("nation")
    ranked = spend.select(
        "nation",
        "s",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("s").over(wp).alias("tot"),
    )
    return ranked.groupBy("nation").agg(
        F.any_value("n").cast("bigint").alias("n_customers"),
        F.round(
            F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("s"))
            / (F.any_value("n") * F.any_value("tot")),
            4,
        ).alias("gini"),
    )


@query(
    "report_new_vs_returning",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
    f AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY 1)
    SELECT a.day,
           CAST(sum(CASE WHEN a.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(sum(CASE WHEN a.day > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users,
           round(CAST(sum(CASE WHEN a.day > f.d0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS returning_share
    FROM act a JOIN f USING (user_id)
    GROUP BY a.day
    """,
)
def report_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the growth-accounting twin
    of the retention cohort: every active (user, day) is classed by
    whether it is that user's first day, giving acquisition vs
    engagement in one curve (pairs with ``win_rolling_distinct``'s WAU
    and ``report_retention_cohort``'s triangle).

    Same scale shape as the cohort matrix: distinct to (user, day),
    first-activity aggregate, equi-join back on ``user_id`` (layout
    reused by AQE), bounded day-grain output.
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    is_new = (F.col("day") == F.col("d0")).cast("int")
    return (
        act.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum(is_new).alias("new_users"),
            F.sum(1 - is_new).alias("returning_users"),
            F.round(
                F.sum(1 - is_new) / F.count(F.lit(1)).cast("double"), 4
            ).alias("returning_share"),
        )
    )


@query(
    "report_rfm_segmentation",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                         TIMESTAMP '1998-08-02')        AS recency_days,
               count(*)                                 AS frequency,
               round(sum(o_totalprice), 4)              AS monetary
        FROM orders
        GROUP BY o_custkey),
    scored AS (
        SELECT o_custkey,
               ntile(4) OVER (ORDER BY recency_days DESC, o_custkey) AS r,
               ntile(4) OVER (ORDER BY frequency, o_custkey)         AS f,
               ntile(4) OVER (ORDER BY monetary, o_custkey)          AS m
        FROM rfm)
    SELECT r, f, m,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored
    GROUP BY r, f, m
    """,
)
def report_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for recency (days
    since last order, anchored at the corpus's max date), frequency
    (order count), and monetary (total spend), rolled into the 4×4×4
    segment-size cube — the standard CRM targeting matrix.

    Facts reduce to customer grain first; the three quartile cuts run
    over customers with unique (metric, custkey) tie-breaks so both
    engines produce identical quartile boundaries.  The customer
    population is UNBOUNDED, so none of the three may be a
    single-partition ``Window.orderBy`` ntile — each is the two-pass
    distributed rank of :mod:`distrank` (range shuffle + partitioned
    local row_number + broadcast offsets), which reproduces
    ``ntile(4)`` exactly while keeping every stage partitioned at any
    customer count.  The anchor date is a pinned literal (a relative
    now() would make the result time-dependent and uncheckable).
    """
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit("1998-08-02").cast("date"), F.max("o_orderdate"))
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 4).alias("monetary"),
    )
    scored = global_ntile(
        rfm, 4, [F.desc("recency_days"), F.asc("o_custkey")], "r"
    )
    scored = global_ntile(
        scored, 4, [F.asc("frequency"), F.asc("o_custkey")], "f"
    )
    scored = global_ntile(
        scored, 4, [F.asc("monetary"), F.asc("o_custkey")], "m"
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --------------------------------------------------------------------------
# DAU / WAU stickiness (round 4)
# --------------------------------------------------------------------------


@query(
    "report_dau_wau_stickiness",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                                user_id
                FROM events),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    contrib AS (
        SELECT day + CAST(o.o AS INTEGER) AS wday, user_id
        FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) o),
    wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau
            FROM contrib GROUP BY wday)
    SELECT d.day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
)
def report_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly active users, and the
    DAU/WAU stickiness ratio per day — the engagement headline of
    every product dashboard.

    WAU is NOT decomposable from daily counts (distinct does not sum),
    and a 7-day sliding ``count_distinct`` window would re-sort the
    raw stream per frame.  Instead each distinct (day, user) pair is
    expanded to the 7 week-buckets it contributes to — a constant ×7
    fan-out of the already-deduplicated day-grain pairs, then one
    distinct aggregate per bucket.  At 100 TB the corpus-scale work is
    the initial (day, user) dedup that DAU needs anyway; the expansion
    operates on that much smaller grain.  Trailing windows at the
    range edge are partial by construction (the standard convention);
    the ratio is one correctly-rounded integer division.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    offsets = F.array(*[F.lit(i) for i in range(7)])
    contrib = du.select(
        F.explode(offsets).alias("o"), "day", "user_id"
    ).select(F.date_add("day", F.col("o")).alias("day"), "user_id")
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
    )


# --------------------------------------------------------------------------
# Weekday seasonality profile (round 4)
# --------------------------------------------------------------------------


@query(
    "report_weekday_seasonality",
    oracle="""
    WITH daily AS (
        SELECT isodow(ts) AS dow,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
    per AS (SELECT dow,
                   CAST(count(*) AS BIGINT) AS n_purchases,
                   CAST(sum(cents) AS BIGINT) AS revenue_cents
            FROM daily GROUP BY dow),
    tot AS (SELECT sum(revenue_cents) AS t, sum(n_purchases) AS np FROM per)
    SELECT CAST(per.dow AS INTEGER) AS dow,
           per.n_purchases,
           per.revenue_cents,
           round(7.0 * per.revenue_cents / tot.t, 4) AS seasonality_index
    FROM per CROSS JOIN tot
    """,
)
def report_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week purchase seasonality: revenue and counts per ISO
    weekday plus a seasonality index (7 × share of weekly revenue —
    1.0 = a flat week), the profile behind staffing/inventory
    calendars and the deseasonalization step of every weekly forecast.

    One 7-group aggregate over integer cents (immune to accumulation
    order) and a broadcast total; the index is one correctly-rounded
    division.  At 100 TB the scan is the entire cost — the profile is
    seven rows whatever the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.filter(F.col("event_type") == "purchase").select(
        F.dayofweek(F.col("ts")).alias("sun1_dow"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # dayofweek is 1=Sunday; convert to ISO 1=Monday..7=Sunday
    iso = F.when(F.col("sun1_dow") == 1, 7).otherwise(F.col("sun1_dow") - 1)
    per = (
        daily.select(iso.alias("dow"), "cents")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    tot = per.agg(F.sum("revenue_cents").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("int").alias("dow"),
        "n_purchases",
        "revenue_cents",
        F.round(7.0 * F.col("revenue_cents") / F.col("t"), 4).alias(
            "seasonality_index"
        ),
    )


@query(
    "report_shipping_delay_percentiles",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(datediff('day', o.o_orderdate, l.l_shipdate),
                               0.50), 6) AS p50_days,
           round(quantile_cont(datediff('day', o.o_orderdate, l.l_shipdate),
                               0.90), 6) AS p90_days,
           CAST(max(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
               AS max_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def report_shipping_delay_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency distribution by order priority: median,
    p90, and worst-case days between order date and each line's ship
    date — the SLA view that a mean would hide (a fat p90 with a
    healthy median is the classic fulfillment-queue signature).

    One fact-fact equi-join (lineitem shuffles on its order key;
    orders side broadcast-eligible at dimension-like sizes, AQE
    decides) feeding a |priorities|-group exact-percentile aggregate
    on integer day diffs.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.percentile(delay, F.lit(0.50)), 6).alias("p50_days"),
            F.round(F.percentile(delay, F.lit(0.90)), 6).alias("p90_days"),
            F.max(delay).cast("long").alias("max_days"),
        )
    )


@query(
    "report_session_duration_stats",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
               CASE WHEN epoch_ms(ts)
                         - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY t_ms, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS session_no,
               t_ms
        FROM marked),
    per AS (
        SELECT user_id, session_no,
               CAST(count(*) AS BIGINT) AS n_events,
               (max(t_ms) - min(t_ms)) / 1000 AS duration_s
        FROM sessions GROUP BY user_id, session_no)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(quantile_cont(duration_s, 0.50), 6) AS p50_duration_s,
           round(quantile_cont(duration_s, 0.90), 6) AS p90_duration_s,
           round(quantile_cont(n_events, 0.50), 6)   AS p50_events,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS bounce_sessions
    FROM per
    """,
)
def report_session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level engagement summary: session counts, median/p90
    duration, median events per session, and single-event "bounce"
    sessions — the rollup a product dashboard shows above the raw
    sessionization (`win_sessionize_batch` is the grain; this is the
    one-row KPI view).

    Reuses the gaps-and-islands topology (two per-user window passes +
    one aggregate, no self-join); the final exact-percentile aggregate
    runs over the session grain, which is orders of magnitude smaller
    than the event stream.  Durations are exact integer-ms diffs.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_ms = F.unix_millis("ts")
    marked = ev.select(
        "user_id",
        "event_id",
        t_ms.alias("t_ms"),
        F.when(
            t_ms - F.lag(t_ms).over(w) > 1_800_000, 1
        ).otherwise(0).alias("new_session"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.select(
        "user_id",
        F.sum("new_session").over(wc).alias("session_no"),
        "t_ms",
    )
    per = sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max("t_ms") - F.min("t_ms")) / 1000).alias("duration_s"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.percentile("duration_s", F.lit(0.50)), 6).alias(
            "p50_duration_s"
        ),
        F.round(F.percentile("duration_s", F.lit(0.90)), 6).alias(
            "p90_duration_s"
        ),
        F.round(F.percentile("n_events", F.lit(0.50)), 6).alias("p50_events"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "bounce_sessions"
        ),
    )


@query(
    "report_customer_ltv_deciles",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
        FROM rev),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM ranked GROUP BY decile),
    tot AS (SELECT sum(revenue_cents) AS t FROM per)
    SELECT CAST(per.decile AS INTEGER) AS decile,
           per.n_customers, per.revenue_cents,
           round(CAST(per.revenue_cents AS DOUBLE) / tot.t, 4)
               AS revenue_share
    FROM per CROSS JOIN tot
    """,
)
def report_customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles: rank customers by total spend
    (integer cents), cut into ten ntile buckets, and report each
    decile's customer count and revenue share — the concentration
    view behind "the top 10% drive X% of revenue" (the per-bucket
    companion to the Gini/Pareto summaries already in the registry).

    One per-customer aggregate (corpus-scale shuffle on the customer
    key), then a decile cut over the customer grain with the repo's
    unique tie-break (cents desc, custkey).  Customers are an
    unbounded population, so the cut is :func:`distrank.global_ntile`
    (two-pass distributed rank — range shuffle, partitioned local
    row_number, broadcast offsets), never a single-partition
    ``Window.orderBy`` ntile.  All revenue is exact integer cents;
    shares are one correctly-rounded division each.
    """
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = global_ntile(
        rev, 10, [F.desc("cents"), F.asc("o_custkey")], "decile"
    ).select("cents", "decile")
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("revenue_cents"),
    )
    tot = per.agg(F.sum("revenue_cents").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("int").alias("decile"),
        "n_customers",
        "revenue_cents",
        F.round(
            F.col("revenue_cents").cast("double") / F.col("t"), 4
        ).alias("revenue_share"),
    )


@query(
    "report_order_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT c.c_mktsegment AS segment,
               date_diff('day',
                         lag(CAST(o.o_orderdate AS DATE))
                             OVER (PARTITION BY o.o_custkey
                                   ORDER BY o.o_orderdate, o.o_orderkey),
                         CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT segment,
           CAST(count(gap_days) AS BIGINT)          AS n_gaps,
           round(avg(gap_days), 6)                  AS mean_gap,
           round(quantile_cont(gap_days, 0.50), 6)  AS median_gap,
           round(quantile_cont(gap_days, 0.90), 6)  AS p90_gap
    FROM gaps
    GROUP BY segment
    """,
)
def report_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval profile: days between consecutive orders
    per customer, summarized per market segment — the number behind
    replenishment-cycle and churn-risk thresholds ("90% of SEGMENT
    customers reorder within N days").

    One window lag per customer (hash partition on the customer key)
    feeding a per-segment percentile aggregate over integer day gaps;
    both engines interpolate quantiles identically over exact
    integers.  The dimension join is broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = F.col("o_orderdate").cast("date")
    gaps = (
        o.select(
            "o_custkey",
            F.datediff(day, F.lag(day).over(w)).alias("gap_days"),
        )
        .join(
            F.broadcast(
                c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return gaps.groupBy("segment").agg(
        F.count("gap_days").alias("n_gaps"),
        F.round(F.avg("gap_days"), 6).alias("mean_gap"),
        F.round(F.percentile("gap_days", F.lit(0.50)), 6).alias("median_gap"),
        F.round(F.percentile("gap_days", F.lit(0.90)), 6).alias("p90_gap"),
    )


@query(
    "report_ab_test_lift",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS n_purch
        FROM events
        GROUP BY user_id),
    med AS (SELECT quantile_cont(n_purch, 0.5) AS m FROM per_user),
    assign AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'treatment'
                    ELSE 'control' END AS arm,
               CAST(CASE WHEN n_purch > m THEN 1 ELSE 0 END AS BIGINT)
                   AS converted
        FROM per_user CROSS JOIN med),
    arms AS (
        SELECT arm,
               CAST(count(*) AS BIGINT)       AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM assign GROUP BY arm),
    wide AS (
        SELECT max(CASE WHEN arm = 'treatment' THEN n_users END)     AS nt,
               max(CASE WHEN arm = 'treatment' THEN n_converted END) AS ct,
               max(CASE WHEN arm = 'control' THEN n_users END)       AS nc,
               max(CASE WHEN arm = 'control' THEN n_converted END)   AS cc
        FROM arms)
    SELECT nt AS n_treatment, ct AS conv_treatment,
           nc AS n_control,   cc AS conv_control,
           round(CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc, 6)
               AS abs_lift,
           round((CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc)
                 / sqrt(CAST(ct + cc AS DOUBLE) / (nt + nc)
                        * (1 - CAST(ct + cc AS DOUBLE) / (nt + nc))
                        * (1.0 / nt + 1.0 / nc)), 6) AS z_score
    FROM wide
    """,
)
def report_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout: conversion lift between a
    deterministic hash split of users, with the pooled two-proportion
    z-score — the launch/no-launch number of every experimentation
    pipeline.

    "Converted" is purchase count strictly above the population median
    — a self-calibrating definition that yields a non-degenerate rate
    at every scale factor (a fixed threshold saturates at 0% or 100%
    somewhere, making the pooled variance zero).  Per-user counts are
    one hash aggregate, the median is one broadcast scalar, and the z
    statistic is scalar math on exact integer counts.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "n_purch"
        )
    )
    med = per_user.agg(
        F.percentile("n_purch", F.lit(0.5)).alias("m")
    )
    assign = per_user.crossJoin(F.broadcast(med)).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("treatment"))
        .otherwise(F.lit("control"))
        .alias("arm"),
        F.when(F.col("n_purch") > F.col("m"), 1)
        .otherwise(0)
        .cast("long")
        .alias("converted"),
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "treatment", F.col("n_users"))).alias("nt"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n_converted"))).alias("ct"),
        F.max(F.when(F.col("arm") == "control", F.col("n_users"))).alias("nc"),
        F.max(F.when(F.col("arm") == "control", F.col("n_converted"))).alias("cc"),
    )
    pt = F.col("ct").cast("double") / F.col("nt")
    pc = F.col("cc").cast("double") / F.col("nc")
    pp = (F.col("ct") + F.col("cc")).cast("double") / (
        F.col("nt") + F.col("nc")
    )
    return wide.select(
        F.col("nt").alias("n_treatment"),
        F.col("ct").alias("conv_treatment"),
        F.col("nc").alias("n_control"),
        F.col("cc").alias("conv_control"),
        F.round(pt - pc, 6).alias("abs_lift"),
        F.round(
            (pt - pc)
            / F.sqrt(
                pp * (1 - pp) * (1.0 / F.col("nt") + 1.0 / F.col("nc"))
            ),
            6,
        ).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Pareto-optimal frontier (skyline) over the part catalog (round 5)
# --------------------------------------------------------------------------


@query(
    "report_skyline_parts",
    oracle="""
    WITH pts AS (
        SELECT p_retailprice, p_size, count(*) AS n_parts
        FROM part GROUP BY p_retailprice, p_size)
    SELECT p_retailprice,
           CAST(p_size AS INTEGER) AS p_size,
           CAST(n_parts AS BIGINT) AS n_parts
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def report_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of the part catalog: the (price, size)
    points where no other part is both cheaper-or-equal and
    bigger-or-equal with at least one strict — the multi-criteria
    "best offers" report the per-metric top-k queries can't express.

    The oracle states dominance declaratively (NOT EXISTS); the Spark
    plan replaces that quadratic self-join with the sort-based
    sweep: after collapsing to distinct (price, size) points, sort by
    (price ASC, size DESC) and keep a point iff the running max of
    size over all strictly-preceding rows is below its own size —
    every preceding row is cheaper-or-equal, so surviving the sweep is
    exactly non-dominance, in one O(n log n) pass.  At scale the sweep
    runs twice: a *local* prune inside arbitrary hash buckets first
    (dominated-in-any-subset ⇒ dominated-globally, so the prune is
    always safe) shrinks the input, then the global sweep touches only
    local winners — the standard distributed-skyline shape; the final
    window is over frontier points, a set bounded by distinct price
    levels, not by table size.
    """
    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy("p_retailprice", "p_size").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    sweep_cols = [F.asc("p_retailprice"), F.desc("p_size")]
    local_w = (
        Window.partitionBy(F.pmod(F.hash("p_retailprice"), F.lit(16)))
        .orderBy(*sweep_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pruned = pts.withColumn("mx", F.max("p_size").over(local_w)).filter(
        F.col("mx").isNull() | (F.col("mx") < F.col("p_size"))
    ).drop("mx")
    global_w = Window.orderBy(*sweep_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        pruned.withColumn("mx", F.max("p_size").over(global_w))
        .filter(F.col("mx").isNull() | (F.col("mx") < F.col("p_size")))
        .select("p_retailprice", "p_size", "n_parts")
    )


# --------------------------------------------------------------------------
# Grouped closed-form OLS: discount sensitivity per brand (round 5)
# --------------------------------------------------------------------------


@query(
    "report_price_elasticity",
    oracle="""
    WITH m AS (
        SELECT p.p_brand,
               CAST(count(*) AS BIGINT)                      AS n,
               CAST(sum(CAST(round(l.l_discount * 10000) AS BIGINT))
                    AS BIGINT)                               AS sx,
               CAST(sum(CAST(l.l_quantity AS BIGINT))
                    AS BIGINT)                               AS sy,
               CAST(sum(CAST(round(l.l_discount * 10000) AS BIGINT)
                        * CAST(round(l.l_discount * 10000) AS BIGINT))
                    AS BIGINT)                               AS sxx,
               CAST(sum(CAST(round(l.l_discount * 10000) AS BIGINT)
                        * CAST(l.l_quantity AS BIGINT))
                    AS BIGINT)                               AS sxy
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand)
    SELECT p_brand, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) * 10000, 6) AS slope_qty_per_disc,
           round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / (n * sxx - sx * sx), 6)         AS intercept_qty
    FROM m
    """,
)
def report_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount sensitivity: the OLS slope of quantity on
    discount, fit simultaneously for every brand — the grouped
    regression pattern (N independent fits = ONE aggregate) that
    turns "fit a model per segment" from a driver-side loop into a
    single shuffle at any segment count.

    Both slope and intercept come from the closed-form normal
    equations over five integer moments per group (n, Σx, Σy, Σx²,
    Σxy; x in basis points so every moment is exact BIGINT), so each
    output is one IEEE division of two integers — no per-group
    iterative fit, no float accumulation.  The part dimension
    broadcast-joins to the fact table.  Slope is rescaled to
    quantity-per-unit-discount (×10⁴ bp) for readability.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = F.round(F.col("l_discount") * 10000).cast("long")
    y = F.col("l_quantity").cast("long")
    m = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(x * y).alias("sxy"),
        )
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        "p_brand",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / den
            * 10000,
            6,
        ).alias("slope_qty_per_disc"),
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
                "double"
            )
            / den,
            6,
        ).alias("intercept_qty"),
    )


# --------------------------------------------------------------------------
# Ratio-to-parent OLAP shares (round 5)
# --------------------------------------------------------------------------


@query(
    "report_ratio_to_parent",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name),
    w AS (
        SELECT region, nation, cents,
               CAST(sum(cents) OVER (PARTITION BY region) AS BIGINT)
                   AS region_cents,
               CAST(sum(cents) OVER () AS BIGINT) AS total_cents
        FROM rev)
    SELECT region, nation,
           round(CAST(cents AS DOUBLE) / 100, 2)           AS revenue,
           round(100.0 * cents / region_cents, 6)          AS pct_of_region,
           round(100.0 * cents / total_cents, 6)           AS pct_of_total,
           round(100.0 * region_cents / total_cents, 6)    AS region_pct_of_total
    FROM w
    """,
)
def report_ratio_to_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent shares down the region → nation hierarchy —
    the OLAP `RATIO_TO_REPORT` idiom: every nation's share of its
    region AND of the world, plus its region's share of the world, in
    one result (rollup gives the levels, but not the cross-level
    ratios).

    One aggregate to the (region, nation) grain — dimension tables
    broadcast onto the fact scan — then two window sums over the
    25-row aggregate, so the share computation is free at any fact
    size.  Revenue sums in exact cents; every share is one integer
    division rounded at 6 dp.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    w = rev.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(Window.partitionBy("region")).alias("region_cents"),
        F.sum("cents").over(
            Window.partitionBy()
        ).alias("total_cents"),
    )
    return w.select(
        "region",
        "nation",
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        F.round(100.0 * F.col("cents") / F.col("region_cents"), 6).alias(
            "pct_of_region"
        ),
        F.round(100.0 * F.col("cents") / F.col("total_cents"), 6).alias(
            "pct_of_total"
        ),
        F.round(
            100.0 * F.col("region_cents") / F.col("total_cents"), 6
        ).alias("region_pct_of_total"),
    )


# --------------------------------------------------------------------------
# Customer segment migration matrix (round 5)
# --------------------------------------------------------------------------

#: Per-customer half-period revenue bands (cents).  Per-customer order
#: volume is scale-factor-invariant (TPC-H holds orders/customer
#: constant), so fixed bands split the population at every SF.
MIGRATION_BANDS = (30_000_000, 70_000_000)  # $300k / $700k


@query(
    "report_customer_migration",
    oracle=f"""
    WITH bounds AS (
        SELECT min(o_orderdate) AS d0,
               CAST(datediff('day', min(o_orderdate), max(o_orderdate)) // 2
                    AS INTEGER) AS half_days
        FROM orders),
    halves AS (
        SELECT o.o_custkey,
               CASE WHEN datediff('day', b.d0, o.o_orderdate)
                         <= b.half_days
                    THEN 'early' ELSE 'late' END AS half,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o CROSS JOIN bounds b),
    rev AS (
        SELECT o_custkey, half,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM halves GROUP BY o_custkey, half),
    seg AS (
        SELECT o_custkey, half,
               CASE WHEN cents < {MIGRATION_BANDS[0]} THEN 'low'
                    WHEN cents < {MIGRATION_BANDS[1]} THEN 'mid'
                    ELSE 'high' END AS segment
        FROM rev),
    e AS (SELECT o_custkey, segment FROM seg WHERE half = 'early'),
    l AS (SELECT o_custkey, segment FROM seg WHERE half = 'late'),
    mat AS (
        SELECT coalesce(e.segment, 'none') AS seg_early,
               coalesce(l.segment, 'none') AS seg_late
        FROM e FULL OUTER JOIN l ON l.o_custkey = e.o_custkey)
    SELECT seg_early, seg_late,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM mat GROUP BY seg_early, seg_late
    """,
)
def report_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment migration: band every customer's revenue in
    the early and late half of the order history (fixed cents
    thresholds, plus 'none' for absence) and count the transition
    matrix — the churn/upgrade flow report behind every retention
    dashboard, and the two-period generalization of the static RFM
    segmentation already in the registry.

    The period split is data-derived but exact (integer midpoint of
    the date span, broadcast to the scan); each half reduces to one
    per-customer integer revenue, and the matrix is a full outer join
    of two customer-grain aggregates co-partitioned on the key —
    two shuffles at fact scale, one at customer scale, regardless of
    corpus size.  All-counts output, no floats anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("d0"),
        (F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) / 2)
        .cast("int")
        .alias("half_days"),
    )
    halves = o.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.when(
            F.datediff(F.col("o_orderdate"), F.col("d0"))
            <= F.col("half_days"),
            F.lit("early"),
        )
        .otherwise(F.lit("late"))
        .alias("half"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rev = halves.groupBy("o_custkey", "half").agg(
        F.sum("cents").alias("cents")
    )
    seg = rev.select(
        "o_custkey",
        "half",
        F.when(F.col("cents") < MIGRATION_BANDS[0], F.lit("low"))
        .when(F.col("cents") < MIGRATION_BANDS[1], F.lit("mid"))
        .otherwise(F.lit("high"))
        .alias("segment"),
    )
    e = seg.filter(F.col("half") == "early").select(
        "o_custkey", F.col("segment").alias("seg_e")
    )
    late = seg.filter(F.col("half") == "late").select(
        "o_custkey", F.col("segment").alias("seg_l")
    )
    mat = e.join(late, "o_custkey", "full_outer").select(
        F.coalesce("seg_e", F.lit("none")).alias("seg_early"),
        F.coalesce("seg_l", F.lit("none")).alias("seg_late"),
    )
    return mat.groupBy("seg_early", "seg_late").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --------------------------------------------------------------------------
# Period-over-period price/volume mix decomposition (round 5)
# --------------------------------------------------------------------------


@query(
    "report_price_volume_mix",
    oracle="""
    WITH base AS (
        SELECT p.p_brand,
               CAST(year(l.l_shipdate) AS INTEGER) AS yr,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(round(l.l_quantity) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) IN (1996, 1997)),
    per AS (
        SELECT p_brand,
               CAST(sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END)
                    AS BIGINT) AS rev1,
               CAST(sum(CASE WHEN yr = 1997 THEN cents ELSE 0 END)
                    AS BIGINT) AS rev2,
               CAST(sum(CASE WHEN yr = 1996 THEN qty ELSE 0 END)
                    AS BIGINT) AS qty1,
               CAST(sum(CASE WHEN yr = 1997 THEN qty ELSE 0 END)
                    AS BIGINT) AS qty2
        FROM base GROUP BY p_brand)
    SELECT p_brand, rev1, rev2, qty1, qty2,
           round(100.0 * (rev2 - rev1) / rev1, 6) AS rev_growth_pct,
           round(100.0 * (qty2 - qty1) / qty1, 6) AS qty_growth_pct,
           round(100.0 * (rev2 - rev1) / rev1
                 - 100.0 * (qty2 - qty1) / qty1, 6) AS price_mix_pp
    FROM per
    WHERE rev1 > 0 AND qty1 > 0
    """,
)
def report_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per brand decomposed into volume
    growth and price/mix effect (growth-rate difference in percentage
    points) — the finance bridge explaining WHY revenue moved.

    Revenue is summed as exact integer cents and quantity as exact
    integers (associative, partial-aggregated); each output metric is
    formed from those exact sums with at most two IEEE divisions in an
    identical expression tree, rounded once.  The part dimension is
    broadcast onto the fact scan; the year filter prunes at the
    parquet level.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    base = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.year("l_shipdate").cast("int").alias("yr"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
            F.round("l_quantity").cast("long").alias("qty"),
        )
    )
    per = base.groupBy("p_brand").agg(
        F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias(
            "rev1"
        ),
        F.sum(F.when(F.col("yr") == 1997, F.col("cents")).otherwise(0)).alias(
            "rev2"
        ),
        F.sum(F.when(F.col("yr") == 1996, F.col("qty")).otherwise(0)).alias(
            "qty1"
        ),
        F.sum(F.when(F.col("yr") == 1997, F.col("qty")).otherwise(0)).alias(
            "qty2"
        ),
    )
    rg = 100.0 * (F.col("rev2") - F.col("rev1")) / F.col("rev1")
    qg = 100.0 * (F.col("qty2") - F.col("qty1")) / F.col("qty1")
    return (
        per.filter((F.col("rev1") > 0) & (F.col("qty1") > 0))
        .select(
            "p_brand",
            "rev1",
            "rev2",
            "qty1",
            "qty2",
            F.round(rg, 6).alias("rev_growth_pct"),
            F.round(qg, 6).alias("qty_growth_pct"),
            F.round(rg - qg, 6).alias("price_mix_pp"),
        )
    )


# --------------------------------------------------------------------------
# Position-based (40/20/40) multi-touch attribution (round 5)
# --------------------------------------------------------------------------

ATTR_WINDOW_DAYS = 7


@query(
    "report_position_attribution",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id AS conv_id, user_id, ts AS cts
        FROM events WHERE event_type = 'purchase'),
    touches AS (
        SELECT p.conv_id, e.event_type, e.ts, e.event_id,
               row_number() OVER (
                   PARTITION BY p.conv_id ORDER BY e.ts, e.event_id)
                   AS pos,
               count(*) OVER (PARTITION BY p.conv_id) AS k
        FROM purchases p
        JOIN events e
          ON e.user_id = p.user_id
         AND e.event_type IN ('view', 'click')
         AND e.ts < p.cts
         AND e.ts >= p.cts - INTERVAL {ATTR_WINDOW_DAYS} DAY),
    credited AS (
        SELECT event_type,
               CASE WHEN k = 1 THEN 1000000
                    WHEN k = 2 THEN 500000
                    WHEN pos = 1 OR pos = k THEN 400000
                    ELSE 200000 // (k - 2)
               END AS credit_micro
        FROM touches),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(credit_micro) AS BIGINT) AS credit_micro
        FROM credited GROUP BY event_type)
    SELECT event_type, n_touches, credit_micro,
           round(CAST(credit_micro AS DOUBLE)
                 / (SELECT sum(credit_micro) FROM agg), 6) AS credit_share
    FROM agg
    """,
)
def report_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (40/20/40) multi-touch attribution: each purchase
    distributes credit over the user's view/click touches in the prior
    7 days — 40% to the first touch, 40% to the last, 20% split over
    the middle — aggregated per channel (event type).

    Fractional credits are DEFINED in integer micro-units (400000 /
    200000 div (k−2), truncation documented) so every aggregate is an
    exact BIGINT sum — no order-dependent float accumulation at any
    scale; the share is one division at the 3-row result.  The touch
    join keys on user_id with a 7-day range predicate (per-user event
    density bounds the candidates; a coarse time bucket on the
    equi-key caps it at 100 TB, as in ``events_funnel_conversion``);
    positions come from one window per conversion.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("cts"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        "event_type",
        "ts",
        "event_id",
    )
    touches = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("ts") < F.col("cts"))
        & (
            F.col("ts")
            >= F.col("cts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAY")
        ),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    wk = Window.partitionBy("conv_id")
    pos = touches.select(
        "event_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1000000))
        .when(F.col("k") == 2, F.lit(500000))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("k")),
            F.lit(400000),
        )
        .otherwise(F.expr("200000 div (k - 2)"))
    )
    agg = pos.select("event_type", credit.alias("credit_micro")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit_micro").alias("credit_micro"),
    )
    wall = Window.partitionBy()
    return agg.select(
        "event_type",
        "n_touches",
        "credit_micro",
        F.round(
            F.col("credit_micro").cast("double")
            / F.sum("credit_micro").over(wall),
            6,
        ).alias("credit_share"),
    )


# --------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue by cohort age) (round 5)
# --------------------------------------------------------------------------


@query(
    "report_cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(date_trunc('week',
                    CAST(min(date_trunc('day', ts)) AS DATE)) AS DATE)
                   AS cohort_week,
               CAST(min(date_trunc('day', ts)) AS DATE) AS d0
        FROM events GROUP BY user_id),
    rev AS (
        SELECT f.cohort_week,
               CAST(floor(date_diff('day', f.d0,
                    CAST(date_trunc('day', e.ts) AS DATE)) / 7.0)
                    AS BIGINT) AS week_offset,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events e JOIN f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
    cohort_sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
        FROM f GROUP BY cohort_week)
    SELECT r.cohort_week, r.week_offset, s.n_users,
           CAST(sum(r.cents) OVER (
               PARTITION BY r.cohort_week
               ORDER BY r.week_offset) AS BIGINT) AS cum_cents,
           round(CAST(sum(r.cents) OVER (
                     PARTITION BY r.cohort_week
                     ORDER BY r.week_offset) AS DOUBLE)
                 / s.n_users / 100.0, 6) AS ltv_per_user
    FROM rev r JOIN cohort_sizes s USING (cohort_week)
    """,
)
def report_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per user by weekly
    signup cohort and cohort age — the growth-accounting view that
    tells you whether newer cohorts monetize faster.

    Revenue reduces to exact integer cents at the (cohort, age-week)
    grain in one associative pass; the cumulative curve is a window
    over that tiny matrix (|cohorts| × |ages| rows) and LTV-per-user
    is formed as two exact divisions in an identical expression tree.
    First-touch assignment is a per-user min — co-partitioned with the
    revenue join on user_id at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("d0")
    ).select(
        "user_id",
        F.date_trunc("week", "d0").cast("date").alias("cohort_week"),
        "d0",
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("day", "ts").cast("date"), F.col("d0"))
                / 7.0
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    sizes = f.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    wc = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = rev.join(F.broadcast(sizes), "cohort_week")
    cum = F.sum("cents").over(wc)
    return j.select(
        "cohort_week",
        "week_offset",
        "n_users",
        cum.alias("cum_cents"),
        F.round(
            cum.cast("double") / F.col("n_users") / 100.0, 6
        ).alias("ltv_per_user"),
    )


# --------------------------------------------------------------------------
# Period-over-period rank movers (round 5)
# --------------------------------------------------------------------------


@query(
    "report_rank_movers",
    oracle="""
    WITH per AS (
        SELECT p.p_brand,
               CAST(year(l.l_shipdate) AS INTEGER) AS yr,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2),
    ranked AS (
        SELECT p_brand, yr, cents,
               CAST(rank() OVER (
                   PARTITION BY yr ORDER BY cents DESC, p_brand)
                   AS INTEGER) AS rnk
        FROM per),
    wide AS (
        SELECT a.p_brand,
               a.rnk AS rank_1996, b.rnk AS rank_1997,
               a.cents AS cents_1996, b.cents AS cents_1997
        FROM ranked a JOIN ranked b
          ON b.p_brand = a.p_brand AND a.yr = 1996 AND b.yr = 1997)
    SELECT p_brand, rank_1996, rank_1997,
           CAST(rank_1996 - rank_1997 AS INTEGER) AS places_moved,
           cents_1996, cents_1997
    FROM wide
    WHERE rank_1996 <> rank_1997
    """,
)
def report_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank movers: brands whose revenue league-table position changed
    between 1996 and 1997, with how many places they moved — the
    'movers and shakers' slide of every period-close review.

    Revenue per (brand, year) is one exact-cents aggregate over the
    year-pruned scan; ranks are per-year windows over the 25-row brand
    table with (cents DESC, brand) total order, so ties cannot break
    differently across engines; the join back to pair the two years is
    a self-join of that tiny table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("yr").orderBy(F.desc("cents"), F.asc("p_brand"))
    ranked = per.select(
        "p_brand", "yr", "cents", F.rank().over(w).cast("int").alias("rnk")
    )
    a = ranked.filter(F.col("yr") == 1996).select(
        "p_brand",
        F.col("rnk").alias("rank_1996"),
        F.col("cents").alias("cents_1996"),
    )
    b = ranked.filter(F.col("yr") == 1997).select(
        F.col("p_brand").alias("pb"),
        F.col("rnk").alias("rank_1997"),
        F.col("cents").alias("cents_1997"),
    )
    return (
        a.join(b, F.col("pb") == F.col("p_brand"))
        .filter(F.col("rank_1996") != F.col("rank_1997"))
        .select(
            "p_brand",
            "rank_1996",
            "rank_1997",
            (F.col("rank_1996") - F.col("rank_1997"))
            .cast("int")
            .alias("places_moved"),
            "cents_1996",
            "cents_1997",
        )
    )


# --------------------------------------------------------------------------
# Lorenz curve decile points (round 5)
# --------------------------------------------------------------------------


@query(
    "report_lorenz_points",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey),
    deciled AS (
        SELECT cents,
               ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
        FROM cust),
    agg AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM deciled GROUP BY decile),
    cum AS (
        SELECT decile, n_customers, cents,
               sum(cents) OVER (ORDER BY decile) AS cum_cents,
               sum(cents) OVER ()                AS tot_cents,
               sum(n_customers) OVER (ORDER BY decile) AS cum_n,
               sum(n_customers) OVER ()                AS tot_n
        FROM agg)
    SELECT decile, n_customers, cents,
           round(CAST(cum_n AS DOUBLE) / tot_n, 6)         AS pop_share,
           round(CAST(cum_cents AS DOUBLE) / tot_cents, 6) AS revenue_share
    FROM cum
    """,
)
def report_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at decile resolution: cumulative revenue share vs
    cumulative population share over customers ranked by spend — the
    plottable companion to the scalar ``report_gini_concentration``.

    One exact-cents aggregate to customer grain, one decile cut with a
    total order (cents, custkey) — :func:`distrank.global_ntile`, the
    two-pass distributed rank, because customers are an unbounded
    entity grain — then cumulative windows over the 10-row decile
    table (bounded grain: a global window there is fine).  Shares are
    single divisions of exact BIGINTs.  The total order makes decile
    boundaries — and therefore every emitted point — identical across
    engines and partitionings.
    """
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    deciled = global_ntile(
        cust, 10, [F.asc("cents"), F.asc("o_custkey")], "decile"
    ).select("cents", "decile")
    agg = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("cents"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = agg.agg(
        F.sum("cents").alias("tot_cents"),
        F.sum("n_customers").alias("tot_n"),
    )
    cum = agg.select(
        "decile",
        "n_customers",
        "cents",
        F.sum("cents").over(wc).alias("cum_cents"),
        F.sum("n_customers").over(wc).alias("cum_n"),
    ).crossJoin(F.broadcast(tot))
    return cum.select(
        "decile",
        "n_customers",
        "cents",
        F.round(
            F.col("cum_n").cast("double") / F.col("tot_n"), 6
        ).alias("pop_share"),
        F.round(
            F.col("cum_cents").cast("double") / F.col("tot_cents"), 6
        ).alias("revenue_share"),
    )


# --------------------------------------------------------------------------
# Open-order backlog aging (round 5)
# --------------------------------------------------------------------------


@query(
    "report_backlog_aging",
    oracle="""
    WITH anchor AS (
        SELECT CAST(max(o_orderdate) AS DATE) AS as_of FROM orders),
    aged AS (
        SELECT CASE
                 WHEN date_diff('day', CAST(o_orderdate AS DATE), as_of)
                      <= 30 THEN '0-30'
                 WHEN date_diff('day', CAST(o_orderdate AS DATE), as_of)
                      <= 90 THEN '31-90'
                 WHEN date_diff('day', CAST(o_orderdate AS DATE), as_of)
                      <= 180 THEN '91-180'
                 ELSE '180+'
               END AS age_bucket,
               o_totalprice
        FROM orders, anchor
        WHERE o_orderstatus = 'O')
    SELECT age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS backlog_cents
    FROM aged GROUP BY age_bucket
    """,
)
def report_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging: open ('O') orders bucketed by age in days
    relative to the newest order date — the AR/fulfilment aging
    report every operations dashboard carries.

    The as-of anchor is a one-row global aggregate joined in with a
    ``crossJoin`` that Spark plans as a broadcast of a scalar, so the
    fact scan stays a single pass; the bucket CASE is evaluated
    map-side and the final group-by has 4 keys.  Age arithmetic is
    whole-day integer ``datediff``; money is exact integer cents.
    """
    od = load_table(spark, sf_dir, "orders")
    anchor = od.agg(F.max(F.col("o_orderdate").cast("date")).alias("as_of"))
    age = F.datediff(F.col("as_of"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 90, "31-90")
        .when(age <= 180, "91-180")
        .otherwise("180+")
    )
    return (
        od.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            bucket.alias("age_bucket"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("backlog_cents"),
        )
    )


# --------------------------------------------------------------------------
# ABC/XYZ inventory classification (round 5)
# --------------------------------------------------------------------------


@query(
    "report_abc_xyz",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey),
    abc AS (
        SELECT l_partkey, rev_cents,
               CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
               CAST(sum(rev_cents) OVER () AS BIGINT)        AS tot_cents
        FROM per_part),
    monthly AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS mon,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2),
    xyz AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT)    AS n_mon,
               CAST(sum(q) AS BIGINT)      AS s1,
               CAST(sum(q * q) AS BIGINT)  AS s2
        FROM monthly GROUP BY l_partkey),
    cls AS (
        SELECT a.l_partkey,
               CASE WHEN a.cum_cents * 100 <= 80 * a.tot_cents THEN 'A'
                    WHEN a.cum_cents * 100 <= 95 * a.tot_cents THEN 'B'
                    ELSE 'C' END AS abc_class,
               CASE WHEN 4 * (x.n_mon * x.s2 - x.s1 * x.s1)
                         <= x.s1 * x.s1 THEN 'X'
                    WHEN x.n_mon * x.s2 - x.s1 * x.s1
                         <= x.s1 * x.s1 THEN 'Y'
                    ELSE 'Z' END AS xyz_class,
               a.rev_cents
        FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey)
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT)       AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS rev_cents
    FROM cls GROUP BY abc_class, xyz_class
    """,
)
def report_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ matrix: parts classed by cumulative revenue share
    (A ≤ 80%, B ≤ 95%, C rest) crossed with demand variability
    (coefficient of variation of monthly quantity: X cv ≤ 0.5,
    Y cv ≤ 1, Z above) — the two-axis inventory segmentation behind
    stocking-policy decisions (AX = automate, CZ = drop).

    Two partial aggregates over the fact table collapse it to
    per-part grain; the ABC running share is a window over the part
    table only, and both class boundaries are integer
    cross-multiplications (cum·100 ≤ 80·tot; 4·(nΣq²−S²) ≤ S² is
    cv² ≤ 0.25 cleared of division) — no float thresholds to disagree
    across engines.  Output is the ≤ 9-cell matrix.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("rev_cents")
    )
    w_cum = Window.orderBy(
        F.col("rev_cents").desc(), "l_partkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    abc = per_part.select(
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents").over(w_cum).alias("cum_cents"),
        F.sum("rev_cents").over(Window.partitionBy()).alias("tot_cents"),
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("mon")
    ).agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
    xyz = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_mon"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    var_n = F.col("n_mon") * F.col("s2") - F.col("s1") * F.col("s1")
    s1sq = F.col("s1") * F.col("s1")
    cls = abc.join(xyz, "l_partkey").select(
        F.when(F.col("cum_cents") * 100 <= 80 * F.col("tot_cents"), "A")
        .when(F.col("cum_cents") * 100 <= 95 * F.col("tot_cents"), "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(4 * var_n <= s1sq, "X")
        .when(var_n <= s1sq, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "rev_cents",
    )
    return cls.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_cents").alias("rev_cents"),
    )


# --------------------------------------------------------------------------
# Month-of-year seasonality index (round 5)
# --------------------------------------------------------------------------


@query(
    "report_seasonality_index",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_part('year', o_orderdate) AS BIGINT)  AS yr,
               CAST(date_part('month', o_orderdate) AS BIGINT) AS mon,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
    per_mon AS (
        SELECT mon,
               CAST(count(*) AS BIGINT)    AS n_occ,
               CAST(sum(cents) AS BIGINT)  AS sum_cents
        FROM monthly GROUP BY mon),
    tot AS (
        SELECT CAST(sum(n_occ) AS BIGINT)     AS total_occ,
               CAST(sum(sum_cents) AS BIGINT) AS total_cents
        FROM per_mon)
    SELECT mon, n_occ, sum_cents,
           round(100.0 * sum_cents * total_occ
                 / (n_occ * CAST(total_cents AS DOUBLE)), 6)
               AS seasonality_idx
    FROM per_mon, tot
    """,
)
def report_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index: each calendar month's average
    revenue per occurrence as a percentage of the all-month average
    (100 = no seasonality) — the multiplicative seasonal profile a
    demand planner divides out before trend-fitting, at the yearly
    grain the weekday profile (``report_weekday_seasonality``) can't
    see.

    One aggregate to (year, month) grain, one to month-of-year, and a
    broadcast one-row total; the index is a single division of exact
    integer products (sum_m·N_occ vs n_m·total), so occurrence-count
    imbalance (the last partial year) is normalized exactly rather
    than through a chain of rounded averages.
    """
    od = load_table(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    per_mon = monthly.groupBy("mon").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.sum("cents").alias("sum_cents"),
    )
    tot = per_mon.agg(
        F.sum("n_occ").alias("total_occ"),
        F.sum("sum_cents").alias("total_cents"),
    )
    return per_mon.crossJoin(F.broadcast(tot)).select(
        "mon",
        "n_occ",
        "sum_cents",
        F.round(
            100.0
            * F.col("sum_cents")
            * F.col("total_occ")
            / (F.col("n_occ") * F.col("total_cents").cast("double")),
            6,
        ).alias("seasonality_idx"),
    )


# --------------------------------------------------------------------------
# Customer reactivation (win-back) count per quarter (round 5)
# --------------------------------------------------------------------------

REACTIVATION_GAP_DAYS = 180


@query(
    "report_customer_reactivation",
    oracle=f"""
    WITH seq AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS od,
               lag(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev_od
        FROM orders),
    react AS (
        SELECT o_custkey,
               CAST(date_trunc('quarter', od) AS DATE) AS quarter
        FROM seq
        WHERE prev_od IS NOT NULL
          AND date_diff('day', prev_od, od) > {REACTIVATION_GAP_DAYS})
    SELECT quarter,
           CAST(count(*) AS BIGINT)                 AS n_reactivations,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM react GROUP BY quarter
    """,
)
def report_customer_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win-back report: orders placed after more than
    {REACTIVATION_GAP_DAYS} days of customer silence, counted per
    quarter — the lifecycle-marketing readout that complements
    ``report_idle_customers`` (who is idle NOW) with how many idle
    customers each quarter actually CAME BACK.

    One per-customer lag over the orders table (single shuffle on
    custkey), an integer day-gap filter, then a tiny per-quarter
    aggregate; exact whole-day arithmetic, no float thresholds.
    """
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = od.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_od"),
    )
    react = seq.filter(
        F.col("prev_od").isNotNull()
        & (F.datediff("od", "prev_od") > REACTIVATION_GAP_DAYS)
    ).select(
        "o_custkey",
        F.date_trunc("quarter", "od").cast("date").alias("quarter"),
    )
    return react.groupBy("quarter").agg(
        F.count(F.lit(1)).alias("n_reactivations"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# --------------------------------------------------------------------------
# Supplier scorecard (round 5)
# --------------------------------------------------------------------------

SCORECARD_TOPK = 20
ON_TIME_DAYS = 30


@query(
    "report_supplier_scorecard",
    oracle=f"""
    WITH f AS (
        SELECT l.l_suppkey,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
               CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(l.l_shipdate AS DATE))
                         <= {ON_TIME_DAYS} THEN 1 ELSE 0 END AS on_time,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    s AS (
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT)      AS n_lines,
               CAST(sum(cents) AS BIGINT)    AS rev_cents,
               CAST(sum(on_time) AS BIGINT)  AS n_on_time,
               CAST(sum(ret) AS BIGINT)      AS n_returned
        FROM f GROUP BY l_suppkey)
    SELECT l_suppkey, n_lines, rev_cents,
           round(100.0 * n_on_time / n_lines, 6)  AS on_time_pct,
           round(100.0 * n_returned / n_lines, 6) AS return_pct
    FROM s
    ORDER BY rev_cents DESC, l_suppkey
    LIMIT {SCORECARD_TOPK}
    """,
)
def report_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: the top-{SCORECARD_TOPK} suppliers by
    revenue with their on-time-ship rate (shipped within
    {ON_TIME_DAYS} days of order) and return rate — the multi-metric
    vendor review table procurement actually looks at, where each
    metric alone (``report_late_shipping``, ``report_returned_items``)
    tells half the story.

    One fact-to-fact join on orderkey (both sides hash-partition on
    it), one aggregate to supplier grain, then a top-k that Spark
    plans as TakeOrderedAndProject — no global sort materialization.
    Day arithmetic and counts are exact integers; the two rates are
    one division each off integer counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    f = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.when(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= ON_TIME_DAYS,
            1,
        )
        .otherwise(0)
        .alias("on_time"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    s = f.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("cents").alias("rev_cents"),
        F.sum("on_time").alias("n_on_time"),
        F.sum("ret").alias("n_returned"),
    )
    return (
        s.select(
            "l_suppkey",
            "n_lines",
            "rev_cents",
            F.round(
                100.0 * F.col("n_on_time") / F.col("n_lines"), 6
            ).alias("on_time_pct"),
            F.round(
                100.0 * F.col("n_returned") / F.col("n_lines"), 6
            ).alias("return_pct"),
        )
        .orderBy(F.col("rev_cents").desc(), "l_suppkey")
        .limit(SCORECARD_TOPK)
    )


# --------------------------------------------------------------------------
# Sample-ratio-mismatch guardrail (round 7)
# --------------------------------------------------------------------------

#: chi-square(1) 95% critical value (shared double literal).
CHI2_1_95 = 3.841458820694124


@query(
    "report_ab_srm_check",
    oracle=f"""
    WITH assign AS (
        SELECT CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                   1, 8) AS BIGINT) % 2 AS BIGINT) AS arm
        FROM customer),
    m AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM assign)
    SELECT n_a, n_b,
           round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                 / (n_a + n_b), 6) AS chi2_srm,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
               > {CHI2_1_95}e0 AS srm_detected
    FROM m
    """,
)
def report_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: does a 50/50 hash split of the
    customer population actually produce 50/50 arms?  SRM is the #1
    silent invalidator of A/B results (broken assignment, bot
    filtering, logging loss); every experimentation platform runs this
    chi-square before showing a readout.  For two cells with equal
    expectation the statistic collapses to (n_A − n_B)²/n — exact
    integer arithmetic plus one division.

    Assignment is the engine-portable md5-prefix hash of the customer
    key (the ``ml_feature_hashing`` trick), so both engines draw the
    SAME split — the check validates the hash-assignment machinery
    end to end.  One aggregate pass; associative counts; the critical
    value is a shared double literal.
    """
    cu = load_table(spark, sf_dir, "customer")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
    )
    m = cu.select(arm.alias("arm")).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    chi2 = (d * d).cast("double") / (F.col("n_a") + F.col("n_b"))
    return m.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2_srm"),
        (chi2 > F.lit(CHI2_1_95)).alias("srm_detected"),
    )


# --------------------------------------------------------------------------
# Catalog adoption curve (round 7)
# --------------------------------------------------------------------------

@query(
    "report_catalog_adoption",
    oracle="""
    WITH first_sold AS (
        SELECT l.l_partkey,
               min(CAST(date_trunc('month', o.o_orderdate) AS DATE))
                   AS m
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_partkey),
    monthly AS (
        SELECT m, CAST(count(*) AS BIGINT) AS new_parts
        FROM first_sold GROUP BY m)
    SELECT m AS month,
           new_parts,
           CAST(sum(new_parts) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS catalog_parts
    FROM monthly
    """,
)
def report_catalog_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog adoption curve: parts sold for the FIRST time each
    month, and the cumulative count of parts ever sold — the
    assortment-growth report (product analog of new-vs-returning
    users), and the denominator behind any "percent of catalog
    moving" KPI.

    One co-partitioned join + a part-grain min() finds each part's
    first-sale month (associative — map-side partials), the monthly
    rollup is bounded by the calendar, and the running total is an
    exact integer prefix sum over that bounded month spine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    first_sold = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_partkey")
        .agg(
            F.min(
                F.date_trunc("month", F.col("o_orderdate")).cast("date")
            ).alias("m")
        )
    )
    monthly = first_sold.groupBy("m").agg(
        F.count(F.lit(1)).alias("new_parts")
    )
    w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        F.col("m").alias("month"),
        "new_parts",
        F.sum("new_parts").over(w).alias("catalog_parts"),
    )


@query(
    "report_supplier_herfindahl",
    oracle="""
    WITH sup AS (
        SELECT s.s_nationkey, l.l_suppkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS c
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey),
    hh AS (
        SELECT s_nationkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(c) AS BIGINT)   AS total_cents,
               sum(CAST(c AS DECIMAL(19, 0)) * CAST(c AS DECIMAL(19, 0)))
                   AS sum_sq
        FROM sup GROUP BY s_nationkey)
    SELECT n.n_name, hh.n_suppliers, hh.total_cents,
           round(CAST(hh.sum_sq AS DOUBLE)
                 / (CAST(hh.total_cents AS DOUBLE)
                    * CAST(hh.total_cents AS DOUBLE)), 6) AS hhi
    FROM hh JOIN nation n ON n.n_nationkey = hh.s_nationkey
    ORDER BY n.n_name
    """,
)
def report_supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation:
    HHI = Σᵢ shareᵢ² over each nation's suppliers' revenue shares — the
    antitrust-style concentration readout (1/n for perfectly even
    supply, →1 for a monopoly).

    Exactness: per-supplier revenue sums in integer cents; the HHI
    numerator Σ c² accumulates in DECIMAL(19,0)×DECIMAL(19,0) products
    (19, not 18: DuckDB stores ≤18-precision decimals in int64 and its
    int64 multiply overflows at c ≳ 3·10⁹; precision 19 forces the
    int128 path)
    (c² reaches ~10¹⁸ — past safe BIGINT headroom once summed, and
    DuckDB would widen to HUGEINT anyway), so both engines carry the
    identical exact integer until ONE final double division — the
    agg_corr_matrix discipline.  Two shuffles total (supplier grain,
    then nation grain, both key-partitioned) and a broadcast nation
    join; the identity HHI = Σc²/(Σc)² means shares are never
    materialized per-row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_sup = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(cents).alias("c"))
    )
    cd = F.col("c").cast("decimal(19,0)")
    hh = per_sup.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("c").alias("total_cents"),
        F.sum(cd * cd).alias("sum_sq"),
    )
    return (
        hh.join(F.broadcast(nat), hh.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            F.col("total_cents").cast("long").alias("total_cents"),
            F.round(
                F.col("sum_sq").cast("double")
                / (
                    F.col("total_cents").cast("double")
                    * F.col("total_cents").cast("double")
                ),
                6,
            ).alias("hhi"),
        )
        .orderBy("n_name")
    )


BASKET_LIFT_TOPK = 25


@query(
    "report_basket_affinity_lift",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    pa AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS ca
           FROM items GROUP BY l_partkey),
    pc AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2)
    SELECT u, v, c AS support,
           round(c * 1.0 / n.n_orders, 6)            AS support_frac,
           round(c * 1.0 / ua.ca, 6)                 AS confidence_u_v,
           round(c * 1.0 * n.n_orders / (ua.ca * va.ca), 6) AS lift
    FROM pc
    JOIN pa ua ON ua.l_partkey = u
    JOIN pa va ON va.l_partkey = v
    CROSS JOIN n
    WHERE c >= 2
    ORDER BY round(c * 1.0 * n.n_orders / (ua.ca * va.ca), 6) DESC, u, v
    LIMIT {BASKET_LIFT_TOPK}
    """,
)
def report_basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: the
    top-{BASKET_LIFT_TOPK} part pairs by LIFT (observed co-occurrence
    over the independence expectation), with support and confidence —
    the market-basket staple behind "frequently bought together".

    Min-support is 2 CO-OCCURRENCES (a fixed higher floor degenerates:
    the probe showed max pair support FALLS as SF grows — more orders,
    same basket size, so any specific pair repeats less; lift itself is
    scale-calibrated because the n_orders factor grows with the
    corpus).  The pair aggregate is the co-purchase explode (quadratic
    only in basket size); singleton counts join back by part key; lift
    ranks by ``round(c·n/(ca·cb), 6)`` — integer-valued numerators into
    one double division — with (u, v) tie-break, so the top-k cut is
    total-ordered.  TakeOrderedAndProject keeps the ranking a
    per-partition heap at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().transform(cached)
    n = items.agg(
        F.count_distinct("l_orderkey").cast("long").alias("n_orders")
    )
    pa = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    per_order = items.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )
    pair_expr = (
        "flatten(transform(ps, (a, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "b -> struct(a AS u, b AS v))))"
    )
    # Explicit keyed repartition: the pair aggregate is the same
    # CPU-bound/byte-light shape as graph_edge_support_topk's — AQE's
    # parallelism-second coalescing would run it near-serial.
    pc = (
        per_order.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .repartition(spark.sparkContext.defaultParallelism, "u", "v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= 2)
    )
    ua = pa.select(F.col("l_partkey").alias("u"), F.col("ca").alias("cu"))
    va = pa.select(F.col("l_partkey").alias("v"), F.col("ca").alias("cv"))
    lift = F.round(
        F.col("c") * F.lit(1.0) * F.col("n_orders")
        / (F.col("cu") * F.col("cv")),
        6,
    )
    return (
        pc.join(ua, "u")
        .join(va, "v")
        .crossJoin(F.broadcast(n))
        .select(
            "u", "v",
            F.col("c").alias("support"),
            F.round(F.col("c") * F.lit(1.0) / F.col("n_orders"), 6).alias(
                "support_frac"
            ),
            F.round(F.col("c") * F.lit(1.0) / F.col("cu"), 6).alias(
                "confidence_u_v"
            ),
            lift.alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("u"), F.asc("v"))
        .limit(BASKET_LIFT_TOPK)
    )


# --------------------------------------------------------------------------
# Round-10 batch 80: skyline variants — grouped frontier + dominator top-k
# --------------------------------------------------------------------------

#: Top-k (price, size) points reported by domination count.
DOM_TOPK = 25
#: Grid resolution per dimension for the dominance-count decomposition.
DOM_GRID = 32


@query(
    "report_group_skyline",
    oracle="""
    WITH pts AS (
        SELECT p_brand, p_retailprice, p_size, count(*) AS n_parts
        FROM part GROUP BY p_brand, p_retailprice, p_size)
    SELECT p_brand,
           p_retailprice,
           CAST(p_size AS INTEGER) AS p_size,
           CAST(n_parts AS BIGINT) AS n_parts
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.p_brand = p.p_brand
          AND q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def report_group_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped skyline: the per-brand Pareto frontier of (price ↓,
    size ↑) — "best offers within every brand", the partitioned
    variant of ``report_skyline_parts`` that a catalog team runs when
    frontiers are only comparable within a segment.

    Same two-stage sweep as the global skyline, with the group key
    prepended to every partition spec: a *local* prune inside
    (brand, hash-bucket) windows first (dominated-in-any-subset ⇒
    dominated-globally, so pruning inside arbitrary buckets is always
    safe), then the exact sweep inside per-brand windows over local
    winners only.  NO unpartitioned window exists at all — the group
    key keeps even the final sweep partitioned, so this scales with
    the number of brands × frontier size, never with the part count
    in one task.  Dominance is pure comparisons on stored values —
    no arithmetic, so both engines agree bit-exactly.
    """
    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy("p_brand", "p_retailprice", "p_size").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    sweep_cols = [F.asc("p_retailprice"), F.desc("p_size")]
    local_w = (
        Window.partitionBy(
            "p_brand", F.pmod(F.hash("p_retailprice"), F.lit(16))
        )
        .orderBy(*sweep_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pruned = (
        pts.withColumn("mx", F.max("p_size").over(local_w))
        .filter(F.col("mx").isNull() | (F.col("mx") < F.col("p_size")))
        .drop("mx")
    )
    brand_w = (
        Window.partitionBy("p_brand")
        .orderBy(*sweep_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pruned.withColumn("mx", F.max("p_size").over(brand_w))
        .filter(F.col("mx").isNull() | (F.col("mx") < F.col("p_size")))
        .select("p_brand", "p_retailprice", "p_size", "n_parts")
    )


@query(
    "report_skyline_dominators",
    oracle=f"""
    WITH pts AS (
        SELECT p_retailprice AS price, p_size AS sz, count(*) AS m
        FROM part GROUP BY p_retailprice, p_size)
    SELECT a.price,
           CAST(a.sz AS INTEGER)                    AS sz,
           CAST(a.m AS BIGINT)                      AS n_parts,
           CAST(coalesce(sum(b.m), 0) AS BIGINT)    AS dominated
    FROM pts a
    LEFT JOIN pts b ON b.price > a.price AND b.sz < a.sz
    GROUP BY a.price, a.sz, a.m
    ORDER BY dominated DESC, a.price ASC, a.sz ASC
    LIMIT {DOM_TOPK}
    """,
)
def report_skyline_dominators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k dominating points: for every distinct (price, size) offer,
    the exact count of parts it strictly dominates (cheaper AND
    bigger), ranked by that count — "which offers obsolete the most
    catalog" — the counting companion to the skyline's yes/no
    frontier.

    The oracle states the count as the quadratic dominance join; the
    Spark plan replaces all-pairs with the exact grid decomposition:
    points land in a G×G bin grid (G={DOM_GRID} per dimension,
    fixed-width over the observed min/max), the per-cell counts
    (≤ G² rows) broadcast, and a point's dominated-count splits into
    (a) cells strictly below-right of its own — summed exactly from
    the broadcast grid with zero per-point work, binning guarantees
    strictness because equal values share a bin — plus (b) the two
    boundary strips (same price-bin row, same size-bin column), which
    are EQUI-joins on the bin id with the strict comparison applied
    per pair.  Candidate pairs fall from n² to ~2n²/G; G grows with
    the catalog at scale (the decomposition is exact for every G, so
    tuning G never changes results — only the full-cell/strip split).
    Final top-k totals an ORDER BY with unique (price, size)
    tie-break through TakeOrderedAndProject, never a global sort.
    """
    part = load_table(spark, sf_dir, "part")
    pts = (
        part.groupBy(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("sz"),
        )
        .agg(F.count(F.lit(1)).alias("m"))
        .transform(cached)
    )
    g = F.lit(DOM_GRID)
    bounds = pts.agg(
        F.min("price").alias("lo_p"),
        F.max("price").alias("hi_p"),
        F.min("sz").alias("lo_s"),
        F.max("sz").alias("hi_s"),
    )

    def _bin(col: str, lo: str, hi: str) -> F.Column:
        span = F.col(hi) - F.col(lo)
        raw = F.when(span == 0, F.lit(0)).otherwise(
            F.floor((F.col(col) - F.col(lo)) / span * g)
        )
        return F.least(raw, g - 1).cast("int")

    binned = (
        pts.crossJoin(F.broadcast(bounds))
        .select(
            "price",
            "sz",
            "m",
            _bin("price", "lo_p", "hi_p").alias("bi"),
            _bin("sz", "lo_s", "hi_s").alias("bj"),
        )
        .transform(cached)
    )
    cells = binned.groupBy("bi", "bj").agg(F.sum("m").alias("cm"))
    # full cells: strictly higher price-bin AND strictly lower size-bin
    # (equal values share a bin, so bin-strict ⟹ value-strict)
    other = cells.select(
        F.col("bi").alias("obi"), F.col("bj").alias("obj"),
        F.col("cm").alias("ocm"),
    )
    full = (
        cells.join(
            F.broadcast(other),
            (F.col("obi") > F.col("bi")) & (F.col("obj") < F.col("bj")),
            "left",
        )
        .groupBy("bi", "bj")
        .agg(F.coalesce(F.sum("ocm"), F.lit(0)).alias("full_cnt"))
    )
    strict = (F.col("bprice") > F.col("price")) & (F.col("bsz") < F.col("sz"))
    b_side = binned.select(
        F.col("price").alias("bprice"), F.col("sz").alias("bsz"),
        F.col("m").alias("bm"), F.col("bi").alias("bbi"),
        F.col("bj").alias("bbj"),
    )
    # row strip: same price-bin (any size-bin ≤ own handled by strict)
    row_cnt = (
        binned.join(b_side, F.col("bbi") == F.col("bi"), "left")
        .groupBy("price", "sz")
        .agg(
            F.sum(F.when(strict, F.col("bm")).otherwise(0)).alias("row_cnt")
        )
    )
    # column strip: same size-bin, strictly higher price-bin
    col_cnt = (
        binned.join(
            b_side,
            (F.col("bbj") == F.col("bj")) & (F.col("bbi") > F.col("bi")),
            "left",
        )
        .groupBy("price", "sz")
        .agg(
            F.sum(F.when(strict, F.col("bm")).otherwise(0)).alias("col_cnt")
        )
    )
    return (
        binned.join(full, ["bi", "bj"])
        .join(row_cnt, ["price", "sz"])
        .join(col_cnt, ["price", "sz"])
        .select(
            "price",
            "sz",
            F.col("m").alias("n_parts"),
            (
                F.col("full_cnt")
                + F.coalesce(F.col("row_cnt"), F.lit(0))
                + F.coalesce(F.col("col_cnt"), F.lit(0))
            ).cast("long").alias("dominated"),
        )
        .orderBy(F.desc("dominated"), F.asc("price"), F.asc("sz"))
        .limit(DOM_TOPK)
    )
