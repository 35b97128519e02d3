"""ETL / CDC primitives: upsert, keep-latest, and history intervals.

The maintenance operations every warehouse pipeline performs between
queries.  Parquet has no MERGE; these express the standard patterns as
pure dataflow, which is also how they scale — an upsert is a shuffle
on the key either way, and writing it as a join keeps Catalyst/AQE in
charge of the physical strategy.

Timestamp discipline: interval bounds are emitted as epoch
*milliseconds* — ns (DuckDB-native) and µs (Spark post-repair)
truncate to identical ms values, so the oracle compares exactly
(SURVEY.md §1.3.1 forbids raw ts in outputs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.operators.textprep import (
    _POLY_SQL,
    _polyhash,
)
from covid_19_data_analysis_bigdata_spark.sources.io import load_table

#: Canonical row rendering for the reconciliation checksum — integer and
#: string columns only (float formatting differs across engines).
_CHECKSUM_COLS_SQL = (
    "concat_ws('|', l_orderkey, l_partkey, l_suppkey, "
    "l_linenumber, l_returnflag, l_linestatus)"
)


@query(
    "etl_upsert_scd1",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, 'VIP' AS c_mktsegment, round(c_acctbal * 1.1, 4)
                   AS c_acctbal
        FROM customer WHERE c_acctbal > 5000)
    SELECT b.c_custkey,
           coalesce(u.c_mktsegment, b.c_mktsegment) AS segment,
           round(coalesce(u.c_acctbal, b.c_acctbal), 4) AS acctbal
    FROM customer b LEFT JOIN updates u USING (c_custkey)
    """,
)
def etl_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 upsert: an updates table overwrites matching keys in the
    base table, non-matching base rows pass through.

    Implemented as the generic priority union (updates ranked above
    base per key, ``row_number() = 1``) rather than a bespoke coalesce
    join: the same dataflow handles inserts, updates, and multi-source
    precedence, and it is one shuffle on the key — the minimum any
    merge does.
    """
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 4).alias("acctbal"),
        F.lit(0).alias("prio"),
    )
    updates = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            "c_custkey",
            F.lit("VIP").alias("segment"),
            F.round(F.col("c_acctbal") * 1.1, 4).alias("acctbal"),
            F.lit(1).alias("prio"),
        )
    )
    w = Window.partitionBy("c_custkey").orderBy(F.desc("prio"))
    return (
        base.unionByName(updates)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("c_custkey", "segment", "acctbal")
    )


@query(
    "etl_keep_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def etl_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest compaction: one row per key — the most recent event
    (ts desc, event_id desc tie-break).  The CDC log-compaction step
    that turns an append stream into current state; one shuffle on the
    key, no self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "etl_scd2_intervals",
    oracle="""
    SELECT user_id, event_id,
           epoch_ms(ts) AS valid_from_ms,
           lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS valid_to_ms,
           value
    FROM events
    """,
)
def etl_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history building: each event's validity interval runs from
    its own timestamp to the next event's per key (NULL = still
    current).  One window pass; bounds in epoch ms (ns and µs truncate
    identically, so the oracle compares exactly).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from_ms = F.unix_millis("ts")
    return ev.select(
        "user_id",
        "event_id",
        from_ms.alias("valid_from_ms"),
        F.lead(from_ms).over(w).alias("valid_to_ms"),
        "value",
    )


@query(
    "etl_compact_small_files",
    oracle="""
    SELECT event_type,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def etl_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: 64-way fragmented table → 4 right-sized
    files, verified lossless by aggregating the compacted copy.

    The small-file problem is the classic ingest pathology (streaming
    sinks and over-parallel writers emit thousands of KB-scale files;
    every task then pays open/footer costs dwarfing the read).  The
    cure is a periodic rewrite: read the fragmented table, coalesce to
    a target file count sized near the 128 MB block sweet spot, write
    once.  ``coalesce`` (not ``repartition``) merges partitions WITHOUT
    a shuffle — compaction is IO-bound and needs no exchange at all.
    The oracle aggregates the original events, so the check proves the
    two rewrites preserved every row.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = fixture_dir(sf_dir, "compact")
    frag, tidy = os.path.join(root, "fragmented"), os.path.join(root, "compacted")
    if not os.path.exists(os.path.join(tidy, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(64).write.mode("overwrite").parquet(frag)
        spark.read.parquet(frag).coalesce(4).write.mode(
            "overwrite"
        ).parquet(tidy)
    back = spark.read.parquet(tidy)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "etl_partition_overwrite",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           round(sum(CASE WHEN o_orderstatus = 'O'
                          THEN o_totalprice * 1.1
                          ELSE o_totalprice END), 4) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def etl_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: replace exactly one partition of a
    partitioned table, leave every other partition byte-identical.

    The warehouse backfill primitive: with
    ``partitionOverwriteMode=dynamic`` an overwrite touches only the
    partitions present in the incoming frame — here the 'O' partition
    is rewritten with a 10% price uplift while 'F' and 'P' survive
    untouched.  (Static mode would have dropped them: the difference
    between a backfill and a data-loss incident.)  The oracle recomputes
    the expected post-backfill state from the source table.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = fixture_dir(sf_dir, "dynover")
    tbl = os.path.join(root, "orders_by_status")
    done = os.path.join(root, "_BACKFILLED")
    if not os.path.exists(done):
        o = load_table(spark, sf_dir, "orders")
        o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tbl)
        # Uplift left unrounded: the per-row IEEE product is
        # bit-identical across engines, while rounding each product
        # would hit half-cent boundary cases where round differs
        # (aggregates are rounded, per-row values never).
        patch = o.filter(F.col("o_orderstatus") == "O").withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        )
        (
            patch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("o_orderstatus")
            .parquet(tbl)
        )
        open(done, "w").close()
    back = spark.read.parquet(tbl)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@query(
    "dq_expectations",
    oracle="""
    SELECT 'acctbal_non_negative' AS rule,
           (SELECT count(*) FROM customer)                    AS n_checked,
           (SELECT count(*) FROM customer WHERE c_acctbal < 0) AS n_violations
    UNION ALL
    SELECT 'totalprice_positive',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'custkey_unique',
           (SELECT count(*) FROM customer),
           (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
                SELECT count(*) AS c FROM customer
                GROUP BY c_custkey HAVING count(*) > 1))
    UNION ALL
    SELECT 'events_ts_in_range',
           (SELECT count(*) FROM events),
           (SELECT count(*) FROM events
            WHERE ts < TIMESTAMP '1995-01-01'
               OR ts >= TIMESTAMP '2003-01-01')
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation audit (Deequ/dbt-test shape): five
    declarative constraints — range, non-negativity, referential
    integrity, key uniqueness, timestamp domain — evaluated in one
    pass each, emitted as a (rule, checked, violations) audit frame.

    Every rule is an aggregate or anti-join, never a row fetch: the
    audit costs one scan per table plus one key-only shuffle for the
    FK check, the same plans the engine's own operators use — so the
    gate scales exactly as far as the queries it guards.
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import load_table as lt

    c = lt(spark, sf_dir, "customer")
    o = lt(spark, sf_dir, "orders")
    li = lt(spark, sf_dir, "lineitem")
    ev = lt(spark, sf_dir, "events")

    def rule(name, checked_df, viol_df):
        return checked_df.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
            viol_df.agg(
                F.coalesce(F.sum(F.lit(1)), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
        ).select(
            F.lit(name).alias("rule"), "n_checked", "n_violations"
        )

    dup_excess = (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("cc"))
        .filter(F.col("cc") > 1)
        .agg(
            F.coalesce(F.sum(F.col("cc") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations")
        )
    )
    frames = [
        rule(
            "acctbal_non_negative", c, c.filter(F.col("c_acctbal") < 0)
        ),
        rule(
            "totalprice_positive", o, o.filter(F.col("o_totalprice") <= 0)
        ),
        rule(
            "lineitem_fk_orders",
            li,
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        c.agg(F.count(F.lit(1)).alias("n_checked"))
        .crossJoin(dup_excess)
        .select(F.lit("custkey_unique").alias("rule"), "n_checked", "n_violations"),
        rule(
            "events_ts_in_range",
            ev,
            ev.filter(
                (F.col("ts") < "1995-01-01") | (F.col("ts") >= "2003-01-01")
            ),
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@query(
    "etl_incremental_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS cnt,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    GROUP BY 1, 2
    """,
)
def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: merge a precomputed
    aggregate snapshot with a delta-only aggregate instead of
    recomputing history.

    At 100 TB the nightly report never re-reads seven years of facts:
    the snapshot holds per-(status, month) partials, the delta scan is
    partition-pruned to rows at/after the cutoff (the plan test pins
    the pushed ``o_orderdate >=`` filter), and the merge is a tiny
    re-aggregation over group-grain partials.  This works because the
    partials are associative and exact — counts and integer-cent sums
    merge losslessly, where rounded double sums would not (SURVEY.md
    §5.3).  Oracle = full recompute, proving snapshot + delta ≡ whole.
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    cutoff = "1997-06-01"
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def month_agg(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_orderstatus",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(cents).alias("total_cents"),
        )

    snap_path = os.path.join(fixture_dir(sf_dir, "incr_agg"), "orders_snapshot")
    if not os.path.exists(os.path.join(snap_path, "_SUCCESS")):
        month_agg(
            load_table(spark, sf_dir, "orders").filter(
                F.col("o_orderdate") < F.lit(cutoff).cast("date")
            )
        ).write.mode("overwrite").parquet(snap_path)

    snapshot = spark.read.parquet(snap_path)
    delta = month_agg(
        load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= F.lit(cutoff).cast("date")
        )
    )
    return (
        snapshot.unionByName(delta)
        .groupBy("o_orderstatus", "month")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total_cents").alias("total_cents"),
        )
    )


@query(
    "dq_profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           count(*) AS n, count(*) - count(o_custkey) AS nulls,
           count(DISTINCT o_custkey) AS n_distinct,
           CAST(min(o_custkey) AS VARCHAR) AS min_s,
           CAST(max(o_custkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (ANALYZE-style): count / nulls / distinct /
    min / max for several columns in ONE scan, emitted long-form.

    The wide-to-long pivot happens AFTER aggregation — a single pass
    computes every column's stats as one 15-cell row, then ``stack``
    reshapes 1 row, not the table.  Profiling N columns by N scans (or
    by unpivoting the raw table to N× rows before aggregating) is the
    anti-pattern at 100 TB.  These stats are what the optimizer's CBO
    consumes and what drift monitors diff day over day.
    """
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            agg
            for c in ("o_custkey", "o_orderstatus", "o_orderpriority")
            for agg in (
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
                F.count_distinct(F.col(c)).alias(f"{c}_nd"),
                F.min(F.col(c)).cast("string").alias(f"{c}_min"),
                F.max(F.col(c)).cast("string").alias(f"{c}_max"),
            )
        ],
    )
    return stats.select(
        F.expr(
            """stack(3,
            'o_custkey', n, o_custkey_nulls, o_custkey_nd,
                o_custkey_min, o_custkey_max,
            'o_orderstatus', n, o_orderstatus_nulls, o_orderstatus_nd,
                o_orderstatus_min, o_orderstatus_max,
            'o_orderpriority', n, o_orderpriority_nulls,
                o_orderpriority_nd, o_orderpriority_min, o_orderpriority_max)
            AS (col_name, n, nulls, n_distinct, min_s, max_s)"""
        )
    )


@query(
    "etl_cascade_delete",
    oracle="""
    WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    del_o AS (SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM del_c)),
    del_l AS (SELECT l_orderkey FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM del_o))
    SELECT 'customer' AS table_name,
           (SELECT count(*) FROM customer)  AS rows_total,
           (SELECT count(*) FROM del_c)     AS rows_purged
    UNION ALL
    SELECT 'orders',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM del_o)
    UNION ALL
    SELECT 'lineitem',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM del_l)
    """,
)
def etl_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade: given a deletion keyset (customers with
    custkey ≡ 0 mod 97 — standing in for a legal request list), follow
    the foreign keys customer → orders → lineitem and report how many
    rows each table would purge.

    The deletion keyset and its order-key closure are bounded (request
    lists are small relative to facts), so each fact table is screened
    with one broadcast semi-join — a single scan per table, no fact-
    to-fact shuffle.  At 100 TB the same plan drives the delete itself:
    partition-pruned rewrite of only the files whose min/max key ranges
    intersect the broadcast keyset.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_c = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_o = o.join(
        F.broadcast(del_c), o.o_custkey == del_c.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_l = li.join(
        F.broadcast(del_o), li.l_orderkey == del_o.o_orderkey, "left_semi"
    )

    def report(name, total_df, purged_df):
        return total_df.agg(F.count(F.lit(1)).alias("rows_total")).crossJoin(
            purged_df.agg(F.count(F.lit(1)).alias("rows_purged"))
        ).select(
            F.lit(name).alias("table_name"), "rows_total", "rows_purged"
        )

    return (
        report("customer", c, del_c)
        .unionAll(report("orders", o, del_o))
        .unionAll(report("lineitem", li, del_l))
    )


@query(
    "dq_benford_digits",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM orders
        WHERE o_totalprice >= 1),
    c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit),
    t AS (SELECT sum(cnt) AS n FROM c)
    SELECT c.digit,
           CAST(c.cnt AS BIGINT) AS cnt,
           round(CAST(c.cnt AS DOUBLE) / t.n, 4)        AS observed,
           round(log10(1.0 + 1.0 / c.digit), 4)         AS benford,
           round(abs(CAST(c.cnt AS DOUBLE) / t.n
                     - log10(1.0 + 1.0 / c.digit)), 4)  AS abs_dev
    FROM c CROSS JOIN t
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: the observed first-digit
    distribution against log10(1 + 1/d) — the classic fabricated-data /
    unit-mixing detector for monetary columns (a data-quality gate, not
    a statistics demo: synthetic or double-converted feeds fail it
    immediately).

    First digits come from the explicitly floor()ed integer part's
    decimal string — explicit because double→bigint CASTs disagree
    across engines (Spark truncates, DuckDB rounds).  One hash
    aggregation to 9 rows, then constant arithmetic; cost is the scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(F.sum("cnt").alias("n"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "cnt",
        F.round(F.col("cnt") / F.col("n").cast("double"), 4).alias(
            "observed"
        ),
        F.round(benford, 4).alias("benford"),
        F.round(
            F.abs(F.col("cnt") / F.col("n").cast("double") - benford), 4
        ).alias("abs_dev"),
    )


@query(
    "dq_entropy_drift",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               count(*) AS c
        FROM events
        GROUP BY 1, 2),
    tot AS (SELECT day, sum(c) AS n FROM daily GROUP BY day),
    ent AS (
        SELECT d.day,
               CAST(t.n AS BIGINT) AS n_events,
               round(-sum((CAST(d.c AS DOUBLE) / t.n)
                          * ln(CAST(d.c AS DOUBLE) / t.n)), 4) AS entropy
        FROM daily d JOIN tot t USING (day)
        GROUP BY d.day, t.n)
    SELECT day, n_events, entropy,
           round(abs(entropy - avg(entropy) OVER ()), 4) AS abs_dev
    FROM ent
    """,
)
def dq_entropy_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the daily event-type mix — the categorical
    drift metric: a collapsing or exploding entropy flags an upstream
    feed change (one type flooding, a type silently dropped) before any
    per-type threshold fires.

    Two bounded aggregations (day×type, then day) and one global-mean
    window over the day-grain frame; the scan dominates, as a daily DQ
    gate must.  Entropy terms are identical-IEEE p·ln p expressions on
    both engines, rounded 4dp at the day boundary before the deviation
    window so both engines window over identical values.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = daily.groupBy("day").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        daily.join(tot, "day")
        .groupBy("day", "n")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy"))
        .select(
            "day", F.col("n").cast("bigint").alias("n_events"), "entropy"
        )
    )
    w = Window.partitionBy()
    return ent.select(
        "day",
        "n_events",
        "entropy",
        F.round(F.abs(F.col("entropy") - F.avg("entropy").over(w)), 4).alias(
            "abs_dev"
        ),
    )


@query(
    "etl_snapshot_diff",
    oracle="""
    WITH snap_a AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 50 <> 0),
    snap_b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0
                    THEN round(o_totalprice * 1.1, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 47 <> 0),
    j AS (
        SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
               CASE WHEN a.o_orderkey IS NULL THEN 'added'
                    WHEN b.o_orderkey IS NULL THEN 'removed'
                    WHEN a.o_orderstatus <> b.o_orderstatus
                      OR a.o_totalprice <> b.o_totalprice THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey))
    SELECT change, CAST(count(*) AS BIGINT) AS cnt
    FROM j
    GROUP BY change
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC diff: classify every key as added /
    removed / changed / unchanged between two table versions — the
    reconciliation primitive behind incremental loads, replication
    audits, and "what did yesterday's batch actually change" reports.
    The two snapshots are deterministic key-gated variants of orders
    (distinct drop sets + a mutated status/price subset), so the diff
    exercises all four classes.

    One full-outer join on the snapshot key, then a bounded class
    rollup.  At 100 TB both snapshots partition on the same key, so
    the join is co-located after one shuffle each; with bucketed
    snapshot tables (the production layout — `join_bucketed` shows
    the plan) even that shuffle disappears.  Column comparison is
    exact (status string, 2dp price).
    """
    o = load_table(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderkey") % 50 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_b = o.filter(F.col("o_orderkey") % 47 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(
            (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change"))
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "dq_table_checksum",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({_POLY_SQL.format(col=_CHECKSUM_COLS_SQL)})
                % 1000000007 AS BIGINT) AS checksum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable per-bucket table checksum: row count + the sum of a
    deterministic row hash over the key/flag columns, grouped by
    ``l_returnflag`` — the replication-reconciliation primitive (two
    systems agree the table matches iff every bucket's (count,
    checksum) pair agrees, without moving a single data row between
    them).

    The row hash is the portable polynomial hash over a canonical
    ``|``-joined rendering of integer/string columns ONLY — float
    columns are excluded because engines render doubles differently
    and a checksum that depends on float formatting reconciles
    nothing.  Sum-of-hashes is order-independent and partial+final
    aggregable: the checksum of 100 TB is one scan with map-side
    combine, and bucket-level mismatch localizes the diff.
    """
    li = load_table(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "|",
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(_polyhash(canon)) % 1000000007).alias("checksum"),
    )


# --------------------------------------------------------------------------
# Candidate-key uniqueness screen (round 4)
# --------------------------------------------------------------------------

#: Declared candidate keys: (label, table, [key columns]).
CANDIDATE_KEYS = (
    ("region.r_regionkey", "region", ("r_regionkey",)),
    ("nation.n_nationkey", "nation", ("n_nationkey",)),
    ("customer.c_custkey", "customer", ("c_custkey",)),
    ("supplier.s_suppkey", "supplier", ("s_suppkey",)),
    ("part.p_partkey", "part", ("p_partkey",)),
    ("orders.o_orderkey", "orders", ("o_orderkey",)),
    ("lineitem.(l_orderkey,l_linenumber)", "lineitem",
     ("l_orderkey", "l_linenumber")),
    ("events.event_id", "events", ("event_id",)),
    ("documents.doc_id", "documents", ("doc_id",)),
    ("embeddings.vec_id", "embeddings", ("vec_id",)),
)


def _uniqueness_oracle() -> str:
    parts = [
        f"""
        SELECT '{label}' AS key_name,
               CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM
                     (SELECT DISTINCT {', '.join(cols)} FROM {table}))
                    AS BIGINT) AS n_distinct,
               (SELECT count(*) FROM {table}) =
               (SELECT count(*) FROM
                (SELECT DISTINCT {', '.join(cols)} FROM {table}))
                   AS is_unique
        """
        for label, table, cols in CANDIDATE_KEYS
    ]
    return " UNION ALL ".join(parts)


@query("dq_uniqueness_keys", oracle=_uniqueness_oracle())
def dq_uniqueness_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness screen: row count vs distinct-key count
    for every declared primary/natural key in the warehouse, with the
    verdict — the other half of the contract `dq_referential_orphans`
    checks from the child side (a duplicated parent key silently
    FANS OUT every downstream join instead of dropping rows).

    Per key: one count + one distinct aggregate (partial+final, the
    distinct shuffle partitions by the key itself, uniform for id
    keys).  The ten checks are independent 1-row aggregates unioned at
    the end; at 100 TB each costs one scan of its table and nothing
    holds more than a scalar.
    """
    out = None
    for label, table, cols in CANDIDATE_KEYS:
        t = load_table(spark, sf_dir, table)
        # ONE scan per table (r14, guide §1.2): group by the key and
        # derive both facts from the group counts (n_rows = Σ cnt,
        # n_distinct = #groups).  The previous count + distinct pair
        # scanned every table twice and crossJoined two 1-row
        # aggregates — at 100 TB this change halves the I/O of the
        # whole screen; exact integers throughout.
        row = (
            t.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .agg(
                F.count(F.lit(1)).alias("n_distinct"),
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_rows"),
            )
            .select(
                F.lit(label).alias("key_name"),
                F.col("n_rows").cast("long"),
                F.col("n_distinct").cast("long"),
                (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# --------------------------------------------------------------------------
# IQR outlier screen (round 4)
# --------------------------------------------------------------------------


@query(
    "dq_outlier_iqr",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type),
    f AS (SELECT event_type, q1, q3,
                 q1 - 1.5 * (q3 - q1) AS lo,
                 q3 + 1.5 * (q3 - q1) AS hi
          FROM q)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(any_value(f.lo), 6) AS lo_fence,
           round(any_value(f.hi), 6) AS hi_fence,
           CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS outlier_rate
    FROM events e JOIN f USING (event_type)
    GROUP BY e.event_type
    """,
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier screen per event type: exact interpolated
    quartiles → 1.5·IQR fences → outlier counts and rate — the
    distribution-free DQ gate run before any per-type mean/zscore is
    trusted (the z-score detector in ``ts_anomaly_zscore`` assumes the
    tails this screen quantifies).

    Two passes: one exact-percentile aggregate (per-group sort — the
    |types|-group case where exact quantiles are affordable; the
    100 TB many-group variant swaps in the GK sketch, already in the
    registry), then the fence table — |types| rows — broadcast back
    over one counting scan.  Fences are identical IEEE expressions of
    identical interpolated quartiles; counts are integers.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    f = q.select(
        "event_type",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    is_out = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.any_value(F.col("lo")), 6).alias("lo_fence"),
            F.round(F.any_value(F.col("hi")), 6).alias("hi_fence"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("outlier_rate"),
        )
    )


# --------------------------------------------------------------------------
# Referentially-consistent sampling (round 4)
# --------------------------------------------------------------------------

SAMPLE_PCT = 5  #: keep keys with polyhash(key) % 100 < SAMPLE_PCT


@query(
    "etl_consistent_sample",
    oracle=f"""
    WITH keep AS (
        SELECT o_orderkey FROM orders
        WHERE {_POLY_SQL.format(col="CAST(o_orderkey AS VARCHAR)")} % 100
              < {SAMPLE_PCT}),
    so AS (SELECT count(*) AS n FROM keep),
    sl AS (SELECT count(*) AS n
           FROM lineitem l JOIN keep k ON l.l_orderkey = k.o_orderkey),
    orphans AS (
        SELECT count(*) AS n
        FROM (SELECT l_orderkey FROM lineitem l
              WHERE {_POLY_SQL.format(col="CAST(l_orderkey AS VARCHAR)")} % 100
                    < {SAMPLE_PCT}) s
        WHERE NOT EXISTS (SELECT 1 FROM keep k
                          WHERE k.o_orderkey = s.l_orderkey)),
    tot AS (SELECT (SELECT count(*) FROM orders) AS o_total,
                   (SELECT count(*) FROM lineitem) AS l_total)
    SELECT CAST(so.n AS BIGINT) AS sampled_orders,
           CAST(sl.n AS BIGINT) AS sampled_lineitems,
           round(CAST(so.n AS DOUBLE) / tot.o_total, 4) AS order_rate,
           round(CAST(sl.n AS DOUBLE) / tot.l_total, 4) AS lineitem_rate,
           CAST(orphans.n AS BIGINT) AS fk_orphans
    FROM so CROSS JOIN sl CROSS JOIN orphans CROSS JOIN tot
    """,
)
def etl_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referentially-consistent {SAMPLE_PCT}% sample: orders are kept by
    a portable hash gate on the ORDER key, and lineitems are kept by
    hashing the SAME key — so every sampled fact keeps its parent and
    the slice is a valid mini-warehouse (the dev/staging dataset trick
    at 100 TB: `TABLESAMPLE` on each table independently shreds every
    FK edge; keyed hash gates never do).

    The audit proves it: the hash gate applied independently to
    lineitem's FK produces zero orphans against the sampled parents
    (same key → same gate), while the realized rates sit near the
    nominal {SAMPLE_PCT}%.  The gate is the repo's bit-portable
    polynomial hash — row-local, no shuffle to decide membership, and
    stable across engines, runs, and backfills (a random sample
    re-rolls membership every run).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    gate_o = _polyhash(F.col("o_orderkey").cast("string")) % 100 < SAMPLE_PCT
    gate_l = _polyhash(F.col("l_orderkey").cast("string")) % 100 < SAMPLE_PCT
    keep = o.filter(gate_o).select("o_orderkey")
    so = keep.agg(F.count(F.lit(1)).alias("sampled_orders"))
    sl = (
        li.join(keep, li.l_orderkey == keep.o_orderkey)
        .agg(F.count(F.lit(1)).alias("sampled_lineitems"))
    )
    orphans = (
        li.filter(gate_l)
        .select("l_orderkey")
        .join(keep, li.l_orderkey == keep.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    tot = o.agg(F.count(F.lit(1)).alias("o_total")).crossJoin(
        li.agg(F.count(F.lit(1)).alias("l_total"))
    )
    return (
        so.crossJoin(sl)
        .crossJoin(orphans)
        .crossJoin(tot)
        .select(
            "sampled_orders",
            "sampled_lineitems",
            F.round(
                F.col("sampled_orders").cast("double") / F.col("o_total"), 4
            ).alias("order_rate"),
            F.round(
                F.col("sampled_lineitems").cast("double") / F.col("l_total"),
                4,
            ).alias("lineitem_rate"),
            "fk_orphans",
        )
    )


@query(
    "etl_partition_skew_report",
    oracle="""
    WITH per AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY day),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_partitions,
               CAST(max(n_rows) AS BIGINT) AS max_rows,
               CAST(min(n_rows) AS BIGINT) AS min_rows,
               quantile_cont(n_rows, 0.5) AS med
        FROM per)
    SELECT n_partitions, max_rows, min_rows,
           round(med, 6) AS median_rows,
           round(max_rows / med, 4) AS skew_ratio
    FROM stats
    """,
)
def etl_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew screen for the candidate partitioning key: row
    counts per day-partition with the max/median skew ratio — the
    number you check BEFORE ``partitionBy("day")``-ing a 100 TB fact
    table (a skew ratio of 5 means the biggest partition stalls every
    reader five medians long; AQE fixes shuffle skew, not file-layout
    skew).

    One day-grain aggregate, then a one-row summary over the
    partition-count-sized table.  Integer counts; the ratio is one
    correctly-rounded division of exact values.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return per.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.max("n_rows").alias("max_rows"),
        F.min("n_rows").alias("min_rows"),
        F.round(F.percentile("n_rows", F.lit(0.5)), 6).alias("median_rows"),
        F.round(
            F.max("n_rows") / F.percentile("n_rows", F.lit(0.5)), 4
        ).alias("skew_ratio"),
    )


def _merge_dataflow(target: DataFrame, source: DataFrame) -> DataFrame:
    """The MERGE clause semantics as one full-outer key join with
    per-row clause dispatch — the exact rewrite row-level-operation
    table formats plan for MERGE INTO.  Exposed as a helper so the
    plan test can pin the join strategy (key equijoin, never a
    nested-loop) independent of the table write around it.
    """
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col("t.k") == F.col("s.k"), "full_outer")
    m = F.col("t.k").isNotNull() & F.col("s.k").isNotNull()
    return (
        joined
        # WHEN MATCHED AND new_bal < 0 THEN DELETE
        .filter(~(m & (F.col("s.new_bal") < 0)))
        .select(
            F.coalesce(F.col("t.k"), F.col("s.k")).alias("k"),
            # WHEN NOT MATCHED THEN INSERT (segment defaults to 'NEW')
            F.coalesce(F.col("t.segment"), F.lit("NEW")).alias("segment"),
            # WHEN MATCHED THEN UPDATE SET bal = new_bal
            F.when(F.col("s.k").isNotNull(), F.col("s.new_bal"))
            .otherwise(F.col("t.bal"))
            .alias("bal"),
            F.when(m, F.lit("updated"))
            .when(F.col("t.k").isNull(), F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias("action"),
        )
    )


@query(
    "etl_merge_into",
    oracle="""
    WITH tgt AS (
        SELECT c_custkey AS k, c_mktsegment AS segment, c_acctbal AS bal
        FROM customer WHERE c_custkey % 3 <> 0),
    src AS (
        SELECT c_custkey AS k, c_acctbal - 2000 AS new_bal
        FROM customer WHERE c_custkey % 2 = 0),
    matched AS (
        SELECT t.k, t.segment, t.bal, s.new_bal,
               s.k IS NOT NULL AS m
        FROM tgt t LEFT JOIN src s ON t.k = s.k),
    survivors AS (
        SELECT k, segment,
               CASE WHEN m THEN new_bal ELSE bal END AS bal,
               CASE WHEN m THEN 'updated' ELSE 'kept' END AS action
        FROM matched
        WHERE NOT (m AND new_bal < 0)),
    inserts AS (
        SELECT s.k, 'NEW' AS segment, s.new_bal AS bal,
               'inserted' AS action
        FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.k = s.k))
    SELECT k, segment, bal, action FROM survivors
    UNION ALL
    SELECT k, segment, bal, action FROM inserts
    """,
)
def etl_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``MERGE INTO`` against a catalog-managed table: WHEN MATCHED
    AND <cond> THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
    THEN INSERT, with the merged state written back to the warehouse and
    re-read through the catalog.

    Spark's v1 parquet tables reject the MERGE INTO *statement* (it
    needs a row-level-operation catalog — Delta/Iceberg, whose jars are
    not in this environment), so this op compiles the same clause
    semantics to the rewrite those formats themselves plan: one outer
    join of target × source, per-row clause dispatch, and a rewrite of
    the affected table.  That is also the honest 100 TB story — a merge
    IS a shuffle-on-key join plus a write of the touched partitions, no
    matter which syntax spells it; the dataflow here is exactly that
    join (broadcast when the change batch is small, sort-merge when
    not, AQE's call) with one write.

    Deterministic by construction: target and source both derive from
    the base table, so reruns converge on identical state (the managed
    tables are keyed by source fingerprint, same discipline as
    ``catalog_managed_table``).  The ``action`` audit column is what a
    production merge logs as its row-level metrics.
    """
    import shutil
    from urllib.parse import urlparse

    from covid_19_data_analysis_bigdata_spark.sources.io import (
        _source_fingerprint,
    )

    fp = _source_fingerprint(sf_dir)
    tgt_name, out_name = f"eng_merge_tgt_{fp}", f"eng_merge_out_{fp}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal"),
    )
    if not spark.catalog.tableExists(tgt_name):
        shutil.rmtree(f"{warehouse}/{tgt_name}", ignore_errors=True)
        target.write.mode("overwrite").saveAsTable(tgt_name)

    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") - F.lit(2000.0)).alias("new_bal"),
    )

    merged = _merge_dataflow(spark.table(tgt_name), source)
    if not spark.catalog.tableExists(out_name):
        shutil.rmtree(f"{warehouse}/{out_name}", ignore_errors=True)
    merged.write.mode("overwrite").saveAsTable(out_name)
    return spark.table(out_name)


@query(
    "dq_psi_drift",
    oracle="""
    WITH binned AS (
        SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
               o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
        FROM orders),
    counts AS (
        SELECT bin,
               CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ref,
               CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_cur
        FROM binned GROUP BY bin),
    tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts)
    SELECT bin, n_ref, n_cur,
           round((n_ref / t_ref - n_cur / t_cur)
                 * ln((n_ref / t_ref) / (n_cur / t_cur)), 6) AS psi_term
    FROM counts CROSS JOIN tot
    """,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference period and the
    current period — the standard drift gate in front of a model or a
    curated dataset refresh (PSI > 0.2 on any feature blocks the
    publish).

    One binning pass over the fact table, a 10-row aggregate, and the
    PSI terms computed on the driver-free 10-row frame: the cost is the
    scan, full stop, which is the right shape for a 100 TB drift check.
    The ln() ratio is computed on proportions whose integer numerators
    are exact, and the one transcendental evaluation per bin is rounded
    at 6 dp — far above the sub-ulp libm divergence between engines.
    """
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9))
        .cast("long")
        .alias("bin"),
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).alias(
            "is_ref"
        ),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).cast("long").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref") / F.col("t_ref")
    p_cur = F.col("n_cur") / F.col("t_cur")
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias("psi_term"),
    )


@query(
    "dq_freshness_lag",
    oracle="""
    WITH per AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               max(epoch_ms(ts)) AS max_ms
        FROM events GROUP BY event_type),
    g AS (SELECT max(max_ms) AS global_ms FROM per)
    SELECT event_type, n_events,
           CAST((global_ms - max_ms) // 60000 AS BIGINT) AS lag_minutes
    FROM per CROSS JOIN g
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness monitoring: minutes since each event stream last wrote,
    relative to the freshest stream — the first alarm a stalled
    ingestion pipeline trips.

    Per-type max-timestamp aggregate (map-side combinable), a 1-row
    global max broadcast back, integer-ms arithmetic throughout (ns and
    µs readers truncate to identical ms — the repo's timestamp
    discipline).
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_millis("ts")).alias("max_ms"),
    )
    g = per.agg(F.max("max_ms").alias("global_ms"))
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        ((F.col("global_ms") - F.col("max_ms")) / 60000)
        .cast("long")
        .alias("lag_minutes"),
    )


@query(
    "dq_duplicate_rate",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(lower(trim(text)))) AS BIGINT)
               AS n_distinct,
           round(1.0 - count(DISTINCT md5(lower(trim(text))))
                       * 1.0 / count(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def dq_duplicate_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate profile per ingestion source — the triage number
    that decides which source needs the full dedup pass first.

    Exact distinct over a canonicalized digest: partial aggregation
    happens map-side on the digest, so the shuffle carries one row per
    distinct digest per source, not the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    dig = F.md5(F.lower(F.trim(F.col("text"))))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(dig).alias("n_distinct"),
        F.round(
            1.0 - F.countDistinct(dig) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


@query(
    "dq_reconcile_aggregates",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS li_cents
        FROM lineitem GROUP BY l_orderkey),
    j AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_cents,
               li.li_cents
        FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
    SELECT CASE WHEN li_cents IS NULL THEN 'missing_lines'
                WHEN abs(li_cents - o_cents) * 2 <= o_cents
                     THEN 'within_50pct'
                ELSE 'divergent' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM j
    GROUP BY 1
    """,
)
def dq_reconcile_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: does the fact table's detail roll up
    to the header's total?  Buckets orders into missing-detail /
    within-tolerance / divergent — the invariant check run after every
    load of a header+detail pair.

    One key-grain aggregate of the detail side, one key equijoin, all
    comparison in exact integer cents (``abs(diff)*2 <= total`` is the
    50% tolerance with no division at all).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    li_sum = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("li_cents")
    )
    j = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    ).join(li_sum, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    bucket = (
        F.when(F.col("li_cents").isNull(), F.lit("missing_lines"))
        .when(
            F.abs(F.col("li_cents") - F.col("o_cents")) * 2
            <= F.col("o_cents"),
            F.lit("within_50pct"),
        )
        .otherwise(F.lit("divergent"))
    )
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "etl_backfill_gaps",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
               CAST(max(date_trunc('day', ts)) AS DATE) AS hi
        FROM events),
    spine AS (
        SELECT event_type,
               CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM bounds
        CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
    have AS (
        SELECT DISTINCT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events)
    SELECT s.event_type,
           CAST(count(*) AS BIGINT) AS n_expected,
           CAST(sum(CASE WHEN h.day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing,
           min(CASE WHEN h.day IS NULL THEN s.day END) AS first_missing
    FROM spine s
    LEFT JOIN have h ON h.event_type = s.event_type AND h.day = s.day
    GROUP BY s.event_type
    """,
)
def etl_backfill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill gap detection: anti-join a generated calendar spine
    (every partition key × every day in the table's span) against the
    days that actually have data — the audit that produces a backfill
    worklist instead of silently short time series.

    The spine is days × keys (thousands of rows regardless of fact
    size, from one min/max aggregate broadcast into a generator), so
    the join is broadcast-small against the distinct-day table — the
    fact table is scanned once for bounds+distinct and never again.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    bounds = ev.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    have = ev.select("event_type", day.alias("day")).distinct()
    h = have.withColumnRenamed("day", "hday").withColumnRenamed(
        "event_type", "hevent_type"
    )
    j = spine.join(
        h,
        (F.col("event_type") == F.col("hevent_type"))
        & (F.col("day") == F.col("hday")),
        "left",
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_expected"),
        F.sum(F.when(F.col("hday").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
        F.min(F.when(F.col("hday").isNull(), F.col("day"))).alias(
            "first_missing"
        ),
    )


TT_VERSIONS = 3  #: snapshot versions kept by the time-travel fixture


@query(
    "etl_time_travel",
    oracle=f"""
    WITH v AS (SELECT unnest(generate_series(0, {TT_VERSIONS - 1}))
                   AS version)
    SELECT v.version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN c_acctbal * (100 + 5 * v.version) / 100.0
                              > 5000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high_balance
    FROM v CROSS JOIN customer
    GROUP BY v.version
    """,
)
def etl_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning + time travel on plain parquet: each write
    lands in an immutable ``v=N`` directory and readers pin a version —
    the manual form of a transactional format's ``VERSION AS OF``,
    giving reproducible training runs ("data as of run 17") without
    any table-format dependency.

    Version dirs are written once (idempotent fixture: version N holds
    the base table with a 5·N% balance uplift), then ALL versions are
    read back through one partitioned scan (``v`` is a partition
    column, so a single-version read prunes to one directory — the
    exact pruning a time-travel reader needs).  The audit compares a
    balance predicate across versions — the "what changed between
    snapshots" question time travel exists to answer.
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = fixture_dir(sf_dir, "time_travel")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    for ver in range(TT_VERSIONS):
        vdir = os.path.join(root, f"v={ver}")
        if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
            (
                base.select(
                    "c_custkey",
                    (
                        F.col("c_acctbal") * (100 + 5 * ver) / 100.0
                    ).alias("c_acctbal"),
                ).write.mode("overwrite").parquet(vdir)
            )
    snaps = spark.read.option("basePath", root).parquet(
        *[os.path.join(root, f"v={ver}") for ver in range(TT_VERSIONS)]
    )
    return snaps.groupBy(F.col("v").cast("long").alias("version")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0))
        .cast("long")
        .alias("n_high_balance"),
    )


@query(
    "etl_write_audit_publish",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def etl_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish (WAP): land the batch in a staging directory,
    run audits against it (row-count reconciliation vs the source, key
    null check), and only then atomically promote staging to the
    published path — the pattern that keeps consumers from ever reading
    a half-validated load.

    The audits are Spark aggregates over the STAGED files (auditing
    what was actually written, not what was meant to be written —
    that's the point of WAP); the publish step is one directory rename,
    the same primitive a transactional format's commit wraps.  Readers
    only ever see the published path, which the oracle aggregates
    through the source definition.
    """
    import shutil

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = fixture_dir(sf_dir, "wap")
    staging = os.path.join(root, "staging")
    published = os.path.join(root, "published")

    if not os.path.exists(os.path.join(published, "_SUCCESS")):
        src = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        shutil.rmtree(staging, ignore_errors=True)
        src.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        # The audit verdict is a driver-side scalar by nature (it gates
        # a filesystem publish); counts keep it to aggregate actions —
        # no row materialization ever leaves the cluster.
        n_staged = staged.count()
        n_null = staged.filter(F.col("o_orderkey").isNull()).count()
        expected = src.count()
        if n_staged != expected or n_null != 0:
            raise RuntimeError(
                f"WAP audit failed: staged={n_staged} expected={expected} "
                f"null_keys={n_null} — staging NOT published"
            )
        shutil.rmtree(published, ignore_errors=True)
        os.rename(staging, published)

    back = spark.read.parquet(published)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


# --------------------------------------------------------------------------
# FK-candidate inference by containment profiling (round 5)
# --------------------------------------------------------------------------

#: (label, child table, child col, parent table, parent col) — three
#: true FK edges plus three decoys (a partial overlap, a reversed
#: edge, and a coincidental full containment) so the profile has to
#: discriminate, not just confirm.
FK_CANDIDATES = (
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("part.p_size->nation.n_nationkey", "part", "p_size",
     "nation", "n_nationkey"),
    ("customer.c_custkey->orders.o_custkey", "customer", "c_custkey",
     "orders", "o_custkey"),
    ("supplier.s_suppkey->customer.c_custkey", "supplier", "s_suppkey",
     "customer", "c_custkey"),
)


def _containment_oracle() -> str:
    arms = [
        f"""
        SELECT '{label}' AS candidate,
               CAST(count(*) AS BIGINT)       AS n_child_distinct,
               CAST(count(p.hit) AS BIGINT)   AS n_matched,
               round(CAST(count(p.hit) AS DOUBLE) / count(*), 6)
                   AS containment,
               count(p.hit) = count(*)        AS is_contained
        FROM (SELECT DISTINCT {ccol} AS v FROM {child}
              WHERE {ccol} IS NOT NULL) c
        LEFT JOIN (SELECT DISTINCT {pcol} AS v, 1 AS hit
                   FROM {parent}) p USING (v)
        """
        for label, child, ccol, parent, pcol in FK_CANDIDATES
    ]
    return " UNION ALL ".join(arms)


@query("dq_fk_containment", oracle=_containment_oracle())
def dq_fk_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key *inference*: for candidate (child col → parent col)
    pairs, the fraction of distinct child values contained in the
    parent column — the schema-discovery profile that proposes join
    edges on an unfamiliar lake, complementing
    ``dq_referential_orphans`` (which validates edges already known).

    Each arm reduces both columns to distinct values first, so the
    containment join touches |distinct| rows, never table rows — on a
    100 TB fact table that's the difference between profiling key
    columns in seconds and scanning the lake per candidate; the
    distinct sets of real key columns are dimension-sized and the
    parent side broadcasts.  The decoy rows document the method's
    limits: ``supplier.s_suppkey->customer.c_custkey`` scores 1.0
    containment despite not being a real FK (dense surrogate ranges
    overlap coincidentally), which is why the profile reports the
    evidence, not a verdict — and why real systems follow up with
    name/cardinality priors.
    """
    arms = []
    for label, child, ccol, parent, pcol in FK_CANDIDATES:
        c = (
            load_table(spark, sf_dir, child)
            .select(F.col(ccol).alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pcol).alias("v"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        arms.append(
            c.join(p, "v", "left").agg(
                F.lit(label).alias("candidate"),
                F.count(F.lit(1)).alias("n_child_distinct"),
                F.count("hit").alias("n_matched"),
                F.round(
                    F.count("hit").cast("double") / F.count(F.lit(1)), 6
                ).alias("containment"),
                (F.count("hit") == F.count(F.lit(1))).alias("is_contained"),
            )
        )
    out = arms[0]
    for frame in arms[1:]:
        out = out.unionAll(frame)
    return out


# --------------------------------------------------------------------------
# Key-sequence gap detection (round 5)
# --------------------------------------------------------------------------

IDGAP_TOPN = 20
# Number of deterministic key-range shards for the per-shard lag window.
# Each shard is one window task sorting ~n/IDGAP_NSHARDS keys; the
# cross-shard summary window sees exactly one row per non-empty shard.
IDGAP_NSHARDS = 512


@query(
    "dq_id_gaps",
    oracle=f"""
    WITH keys AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
    gaps AS (
        SELECT lag(k) OVER (ORDER BY k) + 1 AS gap_start,
               k - 1                        AS gap_end,
               k - lag(k) OVER (ORDER BY k) - 1 AS gap_len
        FROM keys
        QUALIFY k - lag(k) OVER (ORDER BY k) > 1)
    SELECT gap_start, gap_end, CAST(gap_len AS BIGINT) AS gap_len
    FROM gaps
    QUALIFY row_number() OVER (ORDER BY gap_len DESC, gap_start)
            <= {IDGAP_TOPN}
    """,
)
def dq_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness check: the 20 largest missing runs in the
    finished-order key space (the load-monitoring question 'which id
    ranges did the upstream extract skip?').

    Distributed gaps-and-islands (r13 — the mechanical unpartitioned-
    window audit caught the old shape's global pre-limit lag window,
    a one-task sort of every key): the key space is RANGE-sharded, the
    lag window runs per shard in parallel, and only the per-shard
    (min, max) summary — one row per shard, bounded by ``IDGAP_NSHARDS``,
    never by data — crosses shards in a second tiny window that closes
    the boundary gaps.  Any shard-boundary placement yields the same
    gap set: within-shard consecutive pairs plus consecutive non-empty
    shard (max, next min) pairs cover every adjacent key pair exactly
    once.

    The shard id is a DETERMINISTIC function of the key itself (r13
    ADVICE): ``(k - kmin) div width`` with ``width`` derived from the
    broadcast 1-row (min, max) scalar in exact BIGINT — NOT
    ``spark_partition_id()`` over a sampled ``repartitionByRange``,
    whose stamp was only held consistent across the two consumers by a
    best-effort persist(): a lost/evicted cached partition would
    recompute through a FRESH range sample and new partition ids, and
    divergent boundary sets between the consumers silently drop gaps
    straddling a relocated boundary.  Pure arithmetic cannot diverge
    under recomputation, so no barrier (and no persist) is needed at
    all.  Value-range sharding is count-balanced here because order
    keys are dense in their range; all arithmetic is exact BIGINT; the
    top-N is a ``TakeOrderedAndProject`` under the total order
    (gap_len DESC, gap_start).
    """
    o = load_table(spark, sf_dir, "orders")
    keys = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("k")
    )
    bounds = keys.agg(F.min("k").alias("kmin"), F.max("k").alias("kmax"))
    sharded = keys.crossJoin(F.broadcast(bounds)).select(
        "k",
        F.expr(
            f"(k - kmin) div ((kmax - kmin) div {IDGAP_NSHARDS} + 1)"
        ).alias("__shard"),
    )
    wl = Window.partitionBy("__shard").orderBy("k")
    local = (
        sharded.select(
            (F.lag("k").over(wl) + 1).alias("gap_start"),
            (F.col("k") - 1).alias("gap_end"),
            (F.col("k") - F.lag("k").over(wl) - 1).alias("gap_len"),
        )
        .filter(F.col("gap_len") > 0)
    )
    summ = sharded.groupBy("__shard").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    )
    wb = Window.orderBy("__shard")
    boundary = (
        summ.select(
            (F.lag("hi").over(wb) + 1).alias("gap_start"),
            (F.col("lo") - 1).alias("gap_end"),
            (F.col("lo") - F.lag("hi").over(wb) - 1).alias("gap_len"),
        )
        .filter(F.col("gap_len") > 0)
    )
    return (
        local.unionAll(boundary)
        .orderBy(F.desc("gap_len"), F.asc("gap_start"))
        .limit(IDGAP_TOPN)
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test, exact integers (round 5)
# --------------------------------------------------------------------------


@query(
    "dq_ks_two_sample",
    oracle="""
    WITH vals AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS v,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_r,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_n
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1),
    cum AS (
        SELECT v,
               sum(c_r) OVER (ORDER BY v) AS cum_r,
               sum(c_n) OVER (ORDER BY v) AS cum_n,
               sum(c_r) OVER ()           AS n_r,
               sum(c_n) OVER ()           AS n_n
        FROM vals),
    d AS (
        SELECT v, n_r, n_n,
               abs(cum_r * n_n - cum_n * n_r) AS d_num
        FROM cum)
    SELECT CAST(n_r AS BIGINT) AS n_r, CAST(n_n AS BIGINT) AS n_n,
           v AS at_value,
           round(CAST(d_num AS DOUBLE) / (n_r * n_n), 6) AS ks_d
    FROM d
    QUALIFY row_number() OVER (ORDER BY d_num DESC, v) = 1
    """,
)
def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the quantity
    distributions of returned ('R') vs non-returned ('N') lines — the
    drift test a DQ gate runs between yesterday's and today's loads.

    Exact throughout: the value domain collapses to per-value counts
    (one associative aggregate), the ECDFs are cumulative-count
    windows over that tiny domain table, and the sup-distance is
    maximized on the INTEGER cross-multiplied numerator
    |c1·n2 − c2·n1| (no float ECDFs to compare), with one division at
    the single surviving row.  Scale: the windowed part runs over
    |distinct values| rows, not the corpus; the corpus is touched by
    the first aggregate only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    vals = (
        li.filter(F.col("l_returnflag").isin("R", "N"))
        .groupBy(F.round("l_quantity").cast("long").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("c_r"),
            F.sum(
                F.when(F.col("l_returnflag") == "N", 1).otherwise(0)
            ).alias("c_n"),
        )
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = vals.select(
        "v",
        F.sum("c_r").over(wv).alias("cum_r"),
        F.sum("c_n").over(wv).alias("cum_n"),
        F.sum("c_r").over(wall).alias("n_r"),
        F.sum("c_n").over(wall).alias("n_n"),
    )
    d = cum.select(
        "v",
        "n_r",
        "n_n",
        F.abs(
            F.col("cum_r") * F.col("n_n") - F.col("cum_n") * F.col("n_r")
        ).alias("d_num"),
    )
    return (
        d.orderBy(F.desc("d_num"), F.asc("v"))
        .limit(1)
        .select(
            "n_r",
            "n_n",
            F.col("v").alias("at_value"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_r") * F.col("n_n")),
                6,
            ).alias("ks_d"),
        )
    )


# --------------------------------------------------------------------------
# Ordering-consistency check between two orderings (round 5)
# --------------------------------------------------------------------------


@query(
    "dq_monotonic_violations",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY event_id)
                   AS prev_ts
        FROM events)
    SELECT CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
           round(100.0 * sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END)
                 / count(*), 6) AS violation_pct
    FROM seq WHERE prev_ts IS NOT NULL
    """,
)
def dq_monotonic_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering-consistency DQ check: does event_id order agree with
    event-time order per user?  Counts adjacent inversions (an event
    whose timestamp precedes its predecessor's in id order) — the
    out-of-order-ingest detector that decides whether downstream
    watermarks and as-of joins can trust the id sequence.

    One per-user lag window (partitioned — no global sort), one
    conditional aggregate; timestamps compare as raw values with no
    arithmetic.  Adjacent-pair checking is O(n) and catches every
    boundary of an out-of-order run (full inversion COUNT would be
    O(n log n) per user and adds no actionable signal).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "ts", F.lag("ts").over(w).alias("prev_ts")
    ).filter(F.col("prev_ts").isNotNull())
    viol = F.when(F.col("ts") < F.col("prev_ts"), 1).otherwise(0)
    return seq.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(viol).alias("n_violations"),
        F.round(100.0 * F.sum(viol) / F.count(F.lit(1)), 6).alias(
            "violation_pct"
        ),
    )


# --------------------------------------------------------------------------
# String pattern conformance rates (round 5)
# --------------------------------------------------------------------------


@query(
    "dq_string_pattern_conformance",
    oracle="""
    SELECT * FROM (
        SELECT 'orders.priority_code' AS rule,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN regexp_matches(o_orderpriority,
                        '^[1-5]-[A-Z]+$') THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_conform
        FROM orders
        UNION ALL
        SELECT 'customer.name_format',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN regexp_matches(c_name,
                        '^Customer#[0-9]{9}$') THEN 1 ELSE 0 END) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'part.name_two_words',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN regexp_matches(p_name,
                        '^[a-z]+ [a-z]+$') THEN 1 ELSE 0 END) AS BIGINT)
        FROM part
        UNION ALL
        SELECT 'part.brand_code',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN regexp_matches(p_brand,
                        '^Brand#[0-9]{1,2}$') THEN 1 ELSE 0 END) AS BIGINT)
        FROM part) t
    """,
)
def dq_string_pattern_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex conformance audit: for each declared string-format rule,
    the rowcount and how many rows match — the schema-on-read contract
    check a landing-zone pipeline runs before promoting a batch (the
    deliberately-strict priority rule scores <100% because
    'NOT SPECIFIED' contains a space — a real finding, not a tautology).

    Each rule is one map-side regexp + conditional count over its own
    table — a full scan per rule but zero shuffles beyond the 1-row
    partial-aggregate merge, and rules over the same table share one
    scan under the union.  Patterns stay in the RE2-compatible subset
    (anchors, classes, bounded repeats) so Java and RE2 semantics
    agree.
    """
    def rule(df: DataFrame, name: str, col: str, pat: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col(col).rlike(pat), 1).otherwise(0)
            ).alias("n_conform"),
        )

    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    pt = load_table(spark, sf_dir, "part")
    return (
        rule(od, "orders.priority_code", "o_orderpriority", "^[1-5]-[A-Z]+$")
        .unionAll(
            rule(cu, "customer.name_format", "c_name", "^Customer#[0-9]{9}$")
        )
        .unionAll(
            rule(pt, "part.name_two_words", "p_name", "^[a-z]+ [a-z]+$")
        )
        .unionAll(
            rule(pt, "part.brand_code", "p_brand", "^Brand#[0-9]{1,2}$")
        )
    )


# --------------------------------------------------------------------------
# Anomalous ingest partitions vs median daily volume (round 5)
# --------------------------------------------------------------------------


@query(
    "dq_anomalous_partitions",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1),
    ranked AS (
        SELECT day, n_rows,
               row_number() OVER (ORDER BY n_rows, day) AS rn,
               count(*) OVER () AS n_days
        FROM daily),
    med AS (
        SELECT n_rows AS med_rows FROM ranked
        WHERE rn = CAST(ceil(n_days / 2.0) AS BIGINT))
    SELECT d.day, d.n_rows, m.med_rows,
           CASE WHEN abs(d.n_rows - m.med_rows) * 2 > m.med_rows
                THEN 1 ELSE 0 END AS is_anomalous,
           round(100.0 * (d.n_rows - m.med_rows) / m.med_rows, 6)
               AS dev_pct
    FROM daily d, med m
    """,
)
def dq_anomalous_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly scan: each daily partition's row count
    against the exact median daily count, flagging days that deviate
    more than 50% — the landing-zone tripwire that catches a
    half-delivered batch or a duplicated replay before downstream
    jobs consume it.

    The day-grain rollup is the only fact-table pass; the median is
    the explicit lower-median row (rank ⌈n/2⌉ with a day tie-break —
    the same discrete-selection rule as ``agg_percentile_disc``, no
    engine median() whose interpolation could differ), broadcast back
    over the ~|days| table as a one-row cross join.  The 50% fence is
    an integer cross-multiplication.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    ranked = daily.select(
        "day",
        "n_rows",
        F.row_number()
        .over(Window.orderBy("n_rows", "day"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_days"),
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(F.col("n_days") / 2.0).cast("long")
    ).select(F.col("n_rows").alias("med_rows"))
    return daily.crossJoin(F.broadcast(med)).select(
        "day",
        "n_rows",
        "med_rows",
        F.when(
            F.abs(F.col("n_rows") - F.col("med_rows")) * 2
            > F.col("med_rows"),
            1,
        )
        .otherwise(0)
        .alias("is_anomalous"),
        F.round(
            100.0
            * (F.col("n_rows") - F.col("med_rows"))
            / F.col("med_rows"),
            6,
        ).alias("dev_pct"),
    )


# --------------------------------------------------------------------------
# Per-partition content checksums (round 5)
# --------------------------------------------------------------------------


@query(
    "dq_partition_checksums",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(sum(CAST(('0x' || substr(md5(
                    CAST(o_orderkey AS VARCHAR) || '|' ||
                    o_orderstatus || '|' ||
                    CAST(round(o_totalprice * 100) AS BIGINT)), 1, 10))
                AS BIGINT)) AS BIGINT) AS content_hash
    FROM orders
    GROUP BY 1
    """,
)
def dq_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month content checksums of the orders table: row count,
    money total, and an order-independent content hash (sum of
    per-row md5 fingerprints over the business-key columns) — the
    incremental-reconciliation primitive that lets source and replica
    compare ONE ROW PER PARTITION instead of re-diffing the data
    (``dq_table_checksum`` is the whole-table version; per-partition
    is what an incremental loader actually verifies after each batch,
    touching only the partitions it wrote).

    The row fingerprint is the engine-portable md5-prefix integer
    truncated to 40 bits so a BIGINT sum holds ~10⁶ rows per
    partition headroom-free (15 hex digits overflowed at 60 k rows);
    SUM makes the partition hash insensitive to row order and
    parallelism — any engine, any partitioning, same checksum.  One
    map-side hash + one partial/final aggregate.
    """
    od = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    row_fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_orderstatus"),
                    cents.cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return od.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.sum(row_fp).alias("content_hash"),
    )


#: Declared functional dependencies to audit: (name, table, lhs, rhs).
#: A violation is an lhs value observed with more than one distinct rhs.
_FD_CHECKS = [
    ("p_name->p_brand", "part", "p_name", "p_brand"),
    ("p_name->p_type", "part", "p_name", "p_type"),
    ("p_brand->p_type", "part", "p_brand", "p_type"),
    ("c_custkey->c_mktsegment", "customer", "c_custkey", "c_mktsegment"),
]


def _fd_oracle() -> str:
    parts = []
    for name, table, lhs, rhs in _FD_CHECKS:
        parts.append(f"""
    SELECT '{name}' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(count(*) FILTER (n_rhs > 1) AS BIGINT) AS n_violating,
           CAST(max(n_rhs) AS BIGINT) AS max_rhs_per_lhs
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
          FROM {table} GROUP BY {lhs})""")
    return "\nUNION ALL\n".join(parts)


@query("dq_functional_dependency", oracle=_fd_oracle())
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each declared FD ``lhs → rhs``,
    how many lhs values exist, how many are VIOLATING (carry > 1
    distinct rhs), and the worst multiplicity — the data-profiling
    primitive behind key discovery, denormalization checks, and
    "should this column be derivable" pipeline contracts.

    One hash aggregate per FD on the lhs grain (exact
    ``count(DISTINCT rhs)`` per lhs — dependency violations cannot be
    sketched), then a 1-row reduction each; at 100 TB each FD is an
    independent embarrassingly-parallel aggregate over its own table
    scan, and FDs over the same table share the scan via Spark's
    common-subexpression reuse of the cached source.  All outputs are
    exact integers.
    """
    out = None
    for name, table, lhs, rhs in _FD_CHECKS:
        t = load_table(spark, sf_dir, table)
        per_lhs = t.groupBy(lhs).agg(
            F.count_distinct(F.col(rhs)).alias("n_rhs")
        )
        row = per_lhs.agg(
            F.count(F.lit(1)).alias("n_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                "n_violating"
            ),
            F.max("n_rhs").alias("max_rhs_per_lhs"),
        ).select(
            F.lit(name).alias("fd"),
            F.col("n_lhs").cast("long"),
            F.col("n_violating").cast("long"),
            F.col("max_rhs_per_lhs").cast("long"),
        )
        out = row if out is None else out.unionAll(row)
    return out


#: Columns profiled by dq_schema_profile (orders table).
_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "dq_schema_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col,
           CAST(count(*) AS BIGINT)            AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile of ``orders``: row count, null count,
    and exact distinct cardinality per column — the first thing any
    data-quality / catalog system computes on a new dataset.

    All six columns profile in ONE aggregate pass (Spark expands the
    multi-count-distinct into a single Expand + aggregate rather than
    six scans), then the 1-row wide result unpivots to the per-column
    grain driver-side-free via stack().  Exact distincts are the point
    (the sketch variant is ``agg_approx_distinct``); at 100 TB each
    count-distinct shuffles its own column only — column pruning keeps
    the scan at the profiled columns.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__nd" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) "
            "AS (col, n_rows, n_nulls, n_distinct)"
        )
    ).select(
        "col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
