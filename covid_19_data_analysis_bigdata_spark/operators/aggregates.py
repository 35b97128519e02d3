"""Aggregation operators (SURVEY.md §2 category 4).

Reference analogs: confirmed/deaths/recovered totals by country, global
totals, mortality-rate ratios, country→continent→world rollups.  Every
groupBy here compiles to Spark's two-phase partial+final
``HashAggregateExec`` — map-side combine means shuffle volume is one row
per (partition × group), which is what makes these safe at 100 TB.

Float discipline (SURVEY.md §5.3.3): double aggregates are rounded to a
fixed scale in BOTH the Spark query and the DuckDB oracle, because the
summation tree order differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                        AS sum_qty,
           round(sum(l_extendedprice), 4)                   AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
           round(avg(l_quantity), 4)                        AS avg_qty,
           count(*)                                          AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary aggregation (TPC-H Q1 shape).

    Reference analog: per-country confirmed/deaths/recovered report.
    Scan → pushed filter → partial agg → 6-group final agg; the shuffle
    carries only (flag, status) partials, so the plan is flat in table
    size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
