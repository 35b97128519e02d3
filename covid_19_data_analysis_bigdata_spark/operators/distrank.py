"""Distributed global rank / ntile without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
input onto ONE executor (Spark logs ``WindowExec: No Partition
Defined``) — fine for bounded grains (days, deciles, vocab slices),
a scale-killer for unbounded entity grains (all customers, all
documents, all users, all graph nodes).  The round-6 audit flagged six
such sites; they all route through here now.

The primitive is the textbook two-pass distributed rank:

1. ``repartitionByRange`` on the total order — every partition holds a
   contiguous, disjoint key range, so partition-local ranks compose
   into the global rank by adding per-partition offsets;
2. per-partition counts (one row per partition — tiny) turned into
   prefix offsets with a triangle self-join over the partition ids (no
   window, so no WindowExec at all on this path);
3. a broadcast join of the offsets back onto the data and ONE
   partitioned window (``partitionBy(_pid)``) for the local
   row_number.

Every corpus-sized stage is partitioned: one range shuffle + one hash
shuffle of the entity-grain table, both embarrassingly parallel at any
executor count.  Results are exactly ``row_number() OVER (ORDER BY
…)`` because the order columns are required to end in a unique
tie-break (the repo's ranking convention): each row's global position
is well-defined no matter where the sampled range boundaries fall.

``global_ntile`` layers SQL ``ntile(k)`` semantics on top in closed
form: with n rows, q = n div k and r = n mod k, tiles 1..r take q+1
rows and tiles r+1..k take q — identical to the ntile the DuckDB
oracles run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached

__all__ = ["global_rank", "global_ntile"]

_PID = "__dr_pid"
_OFF = "__dr_off"
_CNT = "__dr_cnt"


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rk",
    total_col: str | None = None,
) -> DataFrame:
    """Add exact 1-based ``row_number() OVER (ORDER BY *order_cols)``
    as ``rank_col`` without a global single-partition sort.

    ``order_cols`` MUST define a total order (unique tie-break last).
    When ``total_col`` is given, the overall row count is attached as
    a constant column too (needed by ntile / equal-slice consumers).
    """
    # Persisted (round-8 advice): the pid-stamped frame feeds BOTH the
    # counts/offsets aggregate and the partitioned-window join below,
    # keyed by spark_partition_id().  Correctness requires both
    # consumers to observe the SAME range boundaries and the same
    # AQE shuffle-read spec; without a persist barrier that holds only
    # via exchange reuse (defeated by spark.sql.exchange.reuse=false or
    # divergent AQEShuffleRead specs).  The frame is already shuffled,
    # so persisting adds one in-memory write, no extra exchange.
    d = (
        df.repartitionByRange(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .transform(cached)
    )
    counts = d.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    lower = counts.select(
        F.col(_PID).alias("__dr_pid2"), F.col(_CNT).alias("__dr_cnt2")
    )
    offsets = (
        counts.join(lower, F.col("__dr_pid2") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(F.coalesce(F.sum("__dr_cnt2"), F.lit(0)).alias(_OFF))
    )
    wloc = Window.partitionBy(_PID).orderBy(*order_cols)
    out = (
        d.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, F.row_number().over(wloc) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    if total_col is not None:
        tot = counts.agg(F.sum(_CNT).alias(total_col))
        out = out.crossJoin(F.broadcast(tot))
    return out


def global_ntile(
    df: DataFrame,
    k: int,
    order_cols: list[Column],
    tile_col: str,
) -> DataFrame:
    """Add SQL ``ntile(k) OVER (ORDER BY *order_cols)`` as ``tile_col``
    (INTEGER, 1-based) via :func:`global_rank` + the closed form.

    With rank rn of n rows, q = n div k, r = n mod k: the first
    r·(q+1) rows map to tile ⌈rn/(q+1)⌉, the rest to
    r + ⌈(rn − r·(q+1))/q⌉.  ``greatest(…, 1)`` guards the q = 0
    divisor when n < k (that branch is then never selected).
    """
    ranked = global_rank(df, order_cols, rank_col="__dr_rn", total_col="__dr_n")
    rn, n = F.col("__dr_rn"), F.col("__dr_n")
    # integer `div` throughout — double division + floor would lose
    # exactness past 2^53 rows
    q = F.expr(f"__dr_n div {k}")
    r = n % k
    bound = r * (q + 1)
    tile = F.when(
        rn <= bound,
        F.expr(f"(__dr_rn - 1) div (__dr_n div {k} + 1) + 1"),
    ).otherwise(
        r
        + F.expr(
            f"(__dr_rn - (__dr_n % {k}) * (__dr_n div {k} + 1) - 1) "
            f"div greatest(__dr_n div {k}, 1) + 1"
        )
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop(
        "__dr_rn", "__dr_n"
    )
