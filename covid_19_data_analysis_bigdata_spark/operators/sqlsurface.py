"""SQL subquery surface — Catalyst decorrelation coverage.

The engine's SQL entry point (``spark.sql`` over registered views) must
handle the subquery forms analysts actually write; Catalyst rewrites
them into the joins the explicit-join operators produce directly
(IN → left-semi, NOT EXISTS → left-anti, correlated scalar →
aggregate + left-outer join).  Each query here is the SQL-string form,
relying on that decorrelation — the pre-decorrelated twins are
``join_semi`` / ``join_anti`` / the agg operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "sql_subquery_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 200000)
    """,
)
def sql_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery: customers having at least one very large order.
    Catalyst rewrites to a left-semi join — no repeated inner scan."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 200000)
        """
    )


@query(
    "sql_subquery_not_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def sql_subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS: customers with no urgent orders.
    Catalyst decorrelates to a left-anti join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """
    )


@query(
    "sql_subquery_scalar_corr",
    oracle="""
    SELECT c.c_custkey,
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    """,
)
def sql_subquery_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list: per-customer
    order count.  Catalyst decorrelates to one aggregate + left-outer
    join (count(*) over a missing group correctly yields 0, not NULL)
    — never a per-row re-execution of the inner query.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        """
    )
