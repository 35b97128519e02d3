"""Shuffle-engineering operators: the 100 TB mitigation techniques.

Skewed keys and repeated co-located joins are the two classic cluster
killers.  These operators demonstrate the standard mitigations as
checkable queries whose results are provably identical to the plain
form (each carries the plain form as its DuckDB oracle):

- salted two-phase aggregation — hot grouping keys are sharded across
  a deterministic salt before the partial aggregate, so no single
  reducer owns a hot key;
- salted join — the bounded side is replicated across the salt space,
  the skewed side is salted, and the join key becomes (key, salt);
- bucketed join — both sides are written bucketed on the join key, so
  the sort-merge join reads co-located buckets with no Exchange on
  either input (the layout every repeatedly-joined 100 TB fact table
  should have).

AQE's skew-join splitting handles *detected* skew at runtime; these
are the static layouts for skew you know about at design time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir, load_table

SALTS = 8


@query(
    "agg_skew_salted",
    oracle="""
    SELECT l_returnflag,
           count(*)                   AS cnt,
           round(sum(l_quantity), 4)  AS sum_qty,
           round(avg(l_discount), 6)  AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value (maximally hot)
    grouping key: partial aggregates on (key, salt), final combine on
    key.  The salt is deterministic (orderkey mod 8), so the result is
    bit-identical to the direct groupBy the oracle runs.

    avg is decomposed into (sum, count) across the phases — only
    algebraic aggregates survive salting; holistic ones need sketches.
    """
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(SALTS)))
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("p_cnt"),
            F.sum("l_quantity").alias("p_qty"),
            F.sum("l_discount").alias("p_disc"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("p_cnt").alias("cnt"),
            F.round(F.sum("p_qty"), 4).alias("sum_qty"),
            F.round(F.sum("p_disc") / F.sum("p_cnt"), 6).alias("avg_disc"),
        )
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT n.n_name,
           count(*)                      AS orders_cnt,
           round(sum(o.o_totalprice), 4) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the fact side gets a deterministic salt, the
    bounded dimension is exploded across all salt values, and the join
    key becomes (key, salt) — a hot customer's rows land on up to 8
    reducers instead of one.  Identical output to the plain join.

    At 100 TB the dimension replication cost is salts × |dim|, which is
    why only bounded sides are replicated (same rule as broadcasting).
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.col("o_orderkey"), F.lit(SALTS))
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALTS - 1)))
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("orders_cnt"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


def _bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str, buckets: int = 8
) -> str:
    """Write ``name`` as an external parquet table bucketed on ``key``."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    tbl = f"bkt_{tag.replace('.', '_')}_{name}"
    out = os.path.join(fixture_dir(sf_dir, "bucketed"), name)
    if not spark.catalog.tableExists(tbl):
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .option("path", out)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    return tbl


@query(
    "join_bucketed",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)                      AS orders_cnt,
           round(sum(o.o_totalprice), 4) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables pre-bucketed on the join key: both scans emit
    the bucket-hash distribution the sort-merge join needs, so neither
    input is shuffled (no Exchange below the join — pinned by a plan
    test).

    This is the co-location layout for a fact table joined on the same
    key query after query: pay the bucketed write once, skip the join
    shuffle forever after.  Broadcast is disabled for this query so the
    bucketed sort-merge path is what actually runs at any size.
    """
    ot = _bucketed_table(spark, sf_dir, "orders", "o_custkey")
    ct = _bucketed_table(spark, sf_dir, "customer", "c_custkey")
    o, c = spark.table(ot), spark.table(ct)
    joined = o.hint("merge").join(c, o.o_custkey == c.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("orders_cnt"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@query(
    "join_bloom_filtered",
    oracle="""
    SELECT o.o_orderstatus,
           count(*)                  AS n_lines,
           round(sum(l.l_quantity), 4) AS sum_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderstatus
    """,
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction: the selective build
    side injects a bloom filter into the probe side's scan, so most of
    the big table is discarded BEFORE the join shuffle.

    This is Spark's InjectRuntimeFilter rewrite — the modern form of
    the semi-join reduction every warehouse engine applies when a
    large-large join has a selective dimension filter.  At 100 TB this
    is the difference between shuffling the whole fact table and
    shuffling the ~1% that can match.  The injection thresholds are
    sized for clusters, so a ``newSession`` (isolated SQLConf — the
    forced thresholds and disabled broadcast must not leak into
    sibling queries) lowers them to fire at test scale; the plan test
    pins ``bloom_filter_agg``/``might_contain``.
    """
    sub = spark.newSession()
    for k, v in {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }.items():
        sub.conf.set(k, v)
    li = load_table(sub, sf_dir, "lineitem")
    o = load_table(sub, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN l_orderkey % 10 < 6
                    THEN -1 - (l_orderkey % 3)
                    ELSE l_partkey END AS hkey
        FROM lineitem),
    counted AS (SELECT hkey, count(*) AS cnt FROM keyed GROUP BY 1)
    SELECT hkey, cnt FROM counted
    WHERE cnt * 16 > (SELECT count(*) FROM keyed)
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent items without a full-key shuffle: per-partition
    Misra-Gries summaries nominate candidates, a second pass counts
    only those exactly.

    The direct plan — groupBy over every key, then HAVING — shuffles
    one record per distinct key; at 100 TB with high-cardinality keys
    that shuffle IS the cost.  Misra-Gries with K counters per
    partition is O(K) memory and guarantees (mergeable-summaries bound)
    that every key with global share > 1/(K+1) survives in some
    partition's summary, so the union of summaries is a provable
    candidate superset for the share > 1/16 cut (K = 32 > 15).  The
    verify pass semi-joins the scan against the tiny broadcast
    candidate set, so the only wide shuffle carries candidate keys
    only.  Same candidates-then-verify shape as the LSH dedups.

    The skewed key is derived: 60% of rows map onto three hot keys,
    the rest spread across ~part-cardinality keys.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_orderkey") % 10 < 6, -1 - (F.col("l_orderkey") % 3)
        )
        .otherwise(F.col("l_partkey"))
        .cast("long")
        .alias("hkey")
    )
    K = 32

    def mg_summaries(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            # Vectorized batch pre-count, then an MG merge of the two
            # summaries (Agarwal et al.: merge, then subtract the
            # (K+1)-th largest weight and drop non-positives).
            for key, c in pdf["hkey"].value_counts().items():
                counters[int(key)] = counters.get(int(key), 0) + int(c)
            if len(counters) > K:
                cut = sorted(counters.values(), reverse=True)[K]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        yield pd.DataFrame({"hkey": pd.array(list(counters), dtype="int64")})

    candidates = li.mapInPandas(mg_summaries, "hkey long").distinct()
    total = li.agg(F.count(F.lit(1)).alias("total"))
    return (
        li.join(F.broadcast(candidates), "hkey")
        .groupBy("hkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") * 16 > F.col("total"))
        .select("hkey", "cnt")
    )


@query(
    "etl_zorder_layout",
    oracle="""
    WITH base AS (
        SELECT o_custkey % 1024  AS x,
               o_orderkey % 1024 AS y
        FROM orders),
    s1 AS (SELECT x, y,
                  ((x | (x << 8)) & 16711935)   AS xa,
                  ((y | (y << 8)) & 16711935)   AS ya FROM base),
    s2 AS (SELECT x, y,
                  ((xa | (xa << 4)) & 252645135) AS xb,
                  ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
    s3 AS (SELECT x, y,
                  ((xb | (xb << 2)) & 858993459) AS xc,
                  ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
    s4 AS (SELECT x, y,
                  ((xc | (xc << 1)) & 1431655765) AS xd,
                  ((yc | (yc << 1)) & 1431655765) AS yd FROM s3)
    SELECT (xd | (yd << 1)) >> 15 AS bucket,
           count(*) AS rows_in,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM s4
    GROUP BY 1
    """,
)
def etl_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering metric: interleave the bits of two
    key dimensions and bucket rows by z-range, proving every bucket
    covers a tight rectangle in BOTH dimensions at once.

    This is the layout lever behind multi-column data skipping: a
    single-column sort gives min/max pruning on one predicate only,
    while writing files in z-order bounds every file's range in every
    interleaved dimension (here each z-bucket spans ≤1/8 of x and
    ≤1/4 of y vs. the full domain unsorted).  The bit-spread is four
    shift-or-mask rounds — exact integer ops, identical across
    engines — and the bucketing is equal-width on the z-key, so the
    whole query is projection + one aggregation: no global sort is
    needed to *measure* locality (at write time the layout is
    ``repartitionByRange(zkey)`` + ``sortWithinPartitions``, cf.
    ``sink_parquet_sorted``).
    """
    o = load_table(spark, sf_dir, "orders")

    def spread16(c):
        for shift, mask in (
            (8, 0x00FF00FF),
            (4, 0x0F0F0F0F),
            (2, 0x33333333),
            (1, 0x55555555),
        ):
            c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
        return c

    x = F.col("o_custkey") % 1024
    y = F.col("o_orderkey") % 1024
    z = spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))
    return (
        o.select(
            x.alias("x"), y.alias("y"), F.shiftright(z, 15).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


# --------------------------------------------------------------------------
# Exact distinct counting with mergeable bitmap partials (round 4)
# --------------------------------------------------------------------------


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via Spark 3.5 bitmap
    aggregates — the scale path between ``count_distinct`` (exact but
    its partial state is the value set itself) and
    ``approx_count_distinct`` (mergeable but an estimate).

    The id space is bucketed (``bitmap_bucket_number``), each bucket's
    members become set bits in a fixed 4 KB bitmap
    (``bitmap_construct_agg(bitmap_bit_position(id))``), and the
    distinct count is the sum of bucket popcounts — so the shuffle
    carries O(groups·buckets) constant-size bitmaps instead of every
    distinct value, and partials merge associatively like a sketch
    while staying EXACT.  At 100 TB this is how you count billions of
    distinct ids per group without ``count_distinct``'s
    one-row-per-value expansion: the map side collapses to bitmaps
    before anything moves.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.groupBy(
            "event_type",
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(F.col("user_id"))
            ).alias("bm")
        )
    )
    return (
        buckets.groupBy("event_type")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_users"))
    )


@query(
    "etl_rebalance_layout",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def etl_rebalance_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE rebalance-on-write: land a table through the
    ``REBALANCE`` hint so the files come out evenly sized even when the
    producing stage's partitions were skewed — the third layout lever
    next to compaction (`etl_compact_small_files`, file COUNT) and
    Z-order (`etl_zorder_layout`, file CLUSTERING): this one fixes
    file SIZE variance, the writer-side pathology where one straggler
    partition emits a 10 GB file next to a hundred 10 MB ones.

    ``REBALANCE`` inserts an AQE-optimized shuffle whose output
    partitioning is re-split/coalesced at runtime from actual sizes
    (unlike a blind ``repartition(n)``, which fixes parallelism
    forever).  The verification re-aggregates the landed copy against
    the source oracle — layout changed, content identical.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    o = load_table(spark, sf_dir, "orders")
    out = os.path.join(fixture_dir(sf_dir, "rebalance"), "orders")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        o.hint("rebalance").write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )
