"""Iterative distributed algorithms + sort-clustered storage layout.

``ml_kmeans_lloyd`` is the engine's iterative-algorithm pattern: the
mutable state between iterations is the centroid table (k × 64 doubles,
broadcast, O(1) in corpus size); each Lloyd step is one broadcast
cross-join argmin + one partial+final aggregate over the corpus.  The
iteration count is fixed and unrolled into a single lazy plan — at
100 TB each iteration is one linear pass, and nothing besides the
centroids ever sits on the driver.

``sink_parquet_sorted`` is the zone-map layout lever: range-partition +
sort-within-partitions on the filter column before writing, so parquet
row-group min/max stats make selective scans skip almost everything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.operators.llm import _d
from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir, load_table

KMEANS_ITERS = 2

_DIST_SQL = "sum((e.val - c.c) * (e.val - c.c))"


def _kmeans_iter_sql(i: int) -> str:
    """CTEs for one unrolled Lloyd iteration (assign → recompute)."""
    prev = "cent0" if i == 0 else f"cent{i}"
    return f"""
    dist{i} AS (
        SELECT e.vec_id, c.cluster, {_DIST_SQL} AS d2
        FROM ex e JOIN {prev} c ON e.ord = c.ord
        GROUP BY e.vec_id, c.cluster),
    asg{i} AS (
        SELECT vec_id, cluster
        FROM dist{i}
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, cluster) = 1),
    cent{i + 1} AS (
        SELECT a.cluster, e.ord, avg(e.val) AS c
        FROM ex e JOIN asg{i} a USING (vec_id)
        GROUP BY a.cluster, e.ord)
    """


@query(
    "ml_kmeans_lloyd",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, ord, CAST(embedding[ord] AS DOUBLE) AS val
        FROM embeddings, generate_series(1, 64) AS t(ord)),
    cent0 AS (
        SELECT label AS cluster, ord, avg(val) AS c
        FROM ex GROUP BY label, ord),
    {",".join(_kmeans_iter_sql(i) for i in range(KMEANS_ITERS))}
    SELECT a.cluster,
           count(DISTINCT a.vec_id)  AS n_members,
           round(sum(e.val) / 64, 6) AS mean_component
    FROM asg{KMEANS_ITERS - 1} a JOIN ex e USING (vec_id)
    GROUP BY a.cluster
    """,
)
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means, {KMEANS_ITERS} Lloyd iterations, deterministic init
    from the per-label centroids (no random seeding — SURVEY.md §5.3.5).

    Per iteration: broadcast the k×64 centroid table, assign every
    vector to its nearest centroid (argmin with cluster tie-break),
    recompute centroids as per-(cluster, dimension) means.  Emits each
    final cluster's size and mean component value.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "label", "pos", _d(F.col("val")).alias("val"))

    cent = (
        ex.groupBy(F.col("label").alias("cluster"), "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
    )

    dist2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda x, c: (_d(x) - c) * (_d(x) - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cluster"))

    assigned = None
    for _ in range(KMEANS_ITERS):
        assigned = (
            e.crossJoin(F.broadcast(cent))
            .select("vec_id", "cluster", dist2.alias("d2"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "cluster")
        )
        cent = (
            ex.join(assigned, "vec_id")
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s.getField("c"),
                ).alias("centroid")
            )
        )

    return (
        ex.join(assigned, "vec_id")
        .groupBy("cluster")
        .agg(
            F.countDistinct("vec_id").alias("n_members"),
            F.round(F.sum("val") / 64, 6).alias("mean_component"),
        )
    )


@query(
    "sink_parquet_sorted",
    oracle="""
    SELECT l_linestatus,
           count(*)                  AS cnt,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
    GROUP BY l_linestatus
    """,
)
def sink_parquet_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered parquet layout: range-partition + sort within
    partitions on ``l_shipdate`` before writing, then read back with a
    narrow date filter.

    Clustering by the dominant filter column tightens every row-group's
    min/max envelope, so the pushed-down predicate skips row groups
    wholesale (zone-map pruning) — the complement of directory-level
    pruning (``sink_parquet_partitioned``) for columns too dense to be
    partition keys.
    """
    out = os.path.join(fixture_dir(sf_dir, "sink"), "lineitem_by_shipdate")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "lineitem")
            .repartitionByRange(8, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(out)
        )
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )
