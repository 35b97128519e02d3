"""Structured Streaming operators over the events stream (SURVEY.md §2
category 9).

The reference class's "live dashboard" variant, realized with
Structured Streaming: ``readStream`` over the static events parquet
replayed via ``trigger(availableNow=True)`` into a memory sink; the
*final* result table is what each query returns, so end-of-stream state
equals the equivalent batch computation and most queries keep a strong
DuckDB oracle.

Event time is the repaired UTC ``ts`` — the declared stream schema is
chosen per-encoding by a metadata-only footer probe and normalized by
the same :func:`repair_events_ts` the batch scan layer uses, so the two
paths cannot diverge.  Watermarks bound the aggregation state so the
same topology runs unbounded at scale (SURVEY.md §4.3.8).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.session import ensure_confs
from covid_19_data_analysis_bigdata_spark.sources.io import (
    events_ts_physical_type,
    repair_events_ts,
)


def _events_fields(ts_type) -> StructType:
    """The events table's StructType with ``ts`` declared as ``ts_type``
    — single source of truth for every schema-declaring events reader
    in this module (the file stream and the multi-batch replay
    fixture), so the field list can never desynchronize."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def _events_schema(sf_dir: str) -> StructType:
    """Declared stream schema for events, branched on the footer probe.

    Streaming file sources require a declared schema (no inference
    pass).  ANY nanosecond encoding — naive or tz-adjusted — reads as
    bigint under ``nanosAsLong`` (verified empirically: the conf
    applies before timezone handling); naive ``timestamp[us]`` reads
    as TIMESTAMP_NTZ; UTC-adjusted µs as TimestampType.
    :func:`repair_events_ts` then normalizes all of them.
    """
    phys = events_ts_physical_type(sf_dir)
    if phys.startswith("timestamp[ns") or phys == "int64":
        ts_type = LongType()
    elif "tz=" in phys or phys == "int96":
        # UTC-adjusted µs — and legacy INT96, which Spark always reads
        # as TIMESTAMP (``nanosAsLong`` does not apply to INT96; the
        # physical-type probe distinguishes it from true int64 nanos).
        ts_type = TimestampType()
    else:
        ts_type = TimestampNTZType()
    return _events_fields(ts_type)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the ts repair applied.

    The declared schema comes from a one-footer metadata probe — the
    same 100 TB discipline as the batch path (never infer over data).
    """
    ensure_confs(spark)
    return repair_events_ts(
        spark.readStream.schema(_events_schema(sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def _state_partitions(spark: SparkSession, sf_dir: str) -> int:
    """State-store partition count sized from the replayed backlog.

    ``spark.sql.shuffle.partitions`` at stream START pins the number of
    state stores for the query's lifetime.  Every store pays a fixed
    commit (delta file + fsync into the checkpoint) PER MICRO-BATCH
    regardless of data volume — measured round 8: the stream-stream
    join over a 20k-row backlog took 8.2 s at 32 partitions (2 sides ×
    4 stores × 32 partitions × 2 batches of commits) and 1.8 s at 4,
    identical results.  At 100 TB/day the per-partition state is large
    and the commit amortizes, so the right count scales with VOLUME:
    ≥ ~8 MB of backlog per state partition, floored at 4 and capped at
    the session's shuffle parallelism (a cluster deployment raises the
    cap via $SPARK_GRAFT_SHUFFLE_PARTITIONS).
    """
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        size_mb = os.path.getsize(os.path.join(sf_dir, "events.parquet")) / 1e6
    except OSError:
        return cap
    return max(4, min(cap, int(size_mb // 8) + 1))


def run_to_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    mode: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming frame to completion into a memory sink.

    ``availableNow`` processes the full backlog then stops — the replay
    harness that makes final state comparable to batch.  Any prior
    active query with the same name is stopped first so reruns in a
    shared session are safe.

    ``state_partitions`` (see :func:`_state_partitions`) scopes
    ``spark.sql.shuffle.partitions`` to the stream's execution — the
    conf is read once at query start to size the state stores and is
    restored before the batch read of the sink, so only the stateful
    topology is affected.
    """
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
            q.awaitTermination()
    base = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        handle = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        handle.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", base)
    return spark.table(name)


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           count(*)             AS cnt,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY day, event_type
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day tumbling-window counts per event type.

    Watermark bounds state to one day of open windows; complete output
    at end-of-stream equals the batch day-bucket aggregation.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = run_to_table(
        spark, agg, "t_tumbling", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.col("w.start").cast("date").alias("day"),
        "event_type",
        "cnt",
        "sum_value",
    )


@query(
    "stream_sliding",
    oracle="""
    WITH buckets AS (
        SELECT epoch_ms(time_bucket(INTERVAL '3 hours', ts)) AS s1,
               epoch_ms(time_bucket(INTERVAL '3 hours', ts)) - 10800000 AS s0,
               value
        FROM events),
    expanded AS (
        SELECT s1 AS window_start_ms, value FROM buckets
        UNION ALL
        SELECT s0 AS window_start_ms, value FROM buckets)
    SELECT window_start_ms,
           count(*)             AS cnt,
           round(sum(value), 4) AS sum_value
    FROM expanded
    GROUP BY window_start_ms
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour windows sliding every 3 hours, per-window event value sum.

    Each event lands in exactly two overlapping windows; the oracle
    expands the same two bucket starts per event in SQL.  Window starts
    leave as epoch-ms integers (SURVEY.md §5.3.4).
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = run_to_table(
        spark, agg, "t_sliding", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        "cnt",
        "sum_value",
    )


@query(
    "stream_session",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g)
    SELECT user_id,
           min(epoch_ms(ts))    AS session_start_ms,
           count(*)             AS cnt,
           round(sum(value), 4) AS sum_value
    FROM s
    GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap.

    Native ``session_window`` keeps per-user open-session state bounded
    by the watermark.  The oracle is the classic gaps-and-islands SQL:
    a session break is a gap ≥ the timeout (Spark sessions span
    [start, last+gap)), islands numbered by a running sum.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = run_to_table(
        spark, agg, "t_session", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        "user_id",
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        "cnt",
        "sum_value",
    )


@query(
    "stream_watermark_late",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events),
    w AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, count(*) AS cnt
          FROM events GROUP BY 1)
    SELECT epoch_ms(ws) AS window_start_ms, cnt
    FROM w, m
    WHERE ws + INTERVAL '1 hour' <= mx - INTERVAL '1 hour'
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data handling: 1-hour watermark, hourly windows, APPEND mode.

    Append emits a window only once the watermark passes its end, so
    windows newer than (max event time − 1 h) at end-of-stream are
    withheld.  The ``availableNow`` replay makes that final state
    deterministic — after the last data batch a no-data batch advances
    the watermark to (global max ts − δ) and flushes every window whose
    end ≤ it — which is exactly the batch SQL in the oracle.  This is
    the state-bounding behavior that keeps an unbounded 100 TB/day
    stream's memory flat.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = run_to_table(
        spark, agg, "t_late", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"), "cnt"
    )


@query(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on (user_id, event_type) within the watermark.

    ``dropDuplicatesWithinWatermark`` keeps the first arrival per key
    and expires key state once the watermark passes — bounded memory on
    unbounded streams.  Only the key columns are emitted, so the result
    set equals batch DISTINCT regardless of arrival order.
    """
    ev = events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "1 day")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_table(
        spark, dedup, "t_dedup", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )


@query(
    "stream_stateful_running",
    oracle="""
    SELECT user_id,
           count(*)             AS cnt,
           round(sum(value), 4) AS sum_value,
           round(max(value), 4) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user aggregate via arbitrary stateful processing
    (``applyInPandasWithState``).

    Custom state machine: each trigger folds the user's new rows into a
    (count, sum, max) state tuple and emits the updated state — the
    update-mode running-total pattern.  End-of-stream state equals the
    batch groupBy, giving a strong oracle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = events_stream(spark, sf_dir).select("user_id", "value")

    def fold(key, pdfs, state: GroupState):
        cnt, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = float(pdf["value"].max()) if len(pdf) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((cnt, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "cnt": [cnt],
                "sum_value": [round(total, 4)],
                "max_value": [round(mx, 4) if mx is not None else None],
            }
        )

    folded = ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="user_id bigint, cnt bigint, sum_value double, max_value double",
        stateStructType="cnt bigint, sum_value double, max_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_table(
        spark, folded, "t_stateful", "update",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    # Update mode appends one row per key per micro-batch; keep only the
    # final state per key (cnt is monotone) so the result is identical
    # whether the replay ran as one batch or many (multi-file source,
    # maxFilesPerTrigger, etc.).
    w_last = Window.partitionBy("user_id").orderBy(F.desc("cnt"))
    return (
        out.withColumn("rk", F.row_number().over(w_last))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_nationkey, c.c_mktsegment
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich the stream with a static dimension (user → customer).

    Stream-static inner joins need no state at all: each micro-batch
    hash-joins against the (broadcast) static side — the standard
    dimension-enrichment topology at scale.
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import load_table

    ev = events_stream(spark, sf_dir).select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "inner"
    ).select("event_id", "user_id", "c_nationkey", "c_mktsegment")
    return run_to_table(
        spark, joined, "t_static_join", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id          AS click_id,
           p.event_id          AS purchase_id,
           c.user_id,
           epoch_ms(c.ts)      AS click_ms,
           epoch_ms(p.ts)      AS purchase_ms,
           round(p.value, 4)   AS purchase_value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: click → purchase attribution.

    Both sides are unbounded streams; the inner join buffers each side
    in state and the event-time range condition (purchase within 30
    minutes of the click) plus the watermarks lets Spark evict a
    click's state once no future purchase can match it — the only way
    a stream-stream join has bounded memory on an unbounded 100 TB/day
    stream.  The ``availableNow`` replay emits every match, so the
    result equals the batch self-join the oracle runs.
    """
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            p_user = c_user
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL 30 MINUTES
            """
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        F.unix_millis("click_ts").alias("click_ms"),
        F.unix_millis("purchase_ts").alias("purchase_ms"),
        F.round("value", 4).alias("purchase_value"),
    )
    return run_to_table(
        spark, joined, "t_ss_join", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )


@query(
    "stream_file_sink",
    oracle="""
    SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM events
    WHERE value > 10
    GROUP BY event_type
    """,
)
def stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parquet file sink with checkpointed exactly-once
    delivery: filter/project the stream, append to a parquet directory
    under a checkpoint, run the backlog to completion, then batch-read
    the sink back and aggregate.

    The checkpoint makes reruns no-ops (the backlog is already
    committed), so the read-back aggregate equals the batch computation
    — which is exactly the exactly-once guarantee the oracle verifies.
    At 100 TB this is the landing-zone topology: streams append
    partitioned parquet; downstream batch jobs read the sink.
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    src = (
        events_stream(spark, sf_dir)
        .filter(F.col("value") > 10)
        .select("event_id", "event_type", "value")
    )
    root = fixture_dir(sf_dir, "stream_sink")
    out = os.path.join(root, "data")
    ckpt = os.path.join(root, "ckpt")
    for q in spark.streams.active:
        if q.name == "t_file_sink":
            q.stop()
            q.awaitTermination()
    handle = (
        src.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .queryName("t_file_sink")
        .trigger(availableNow=True)
        .start()
    )
    handle.awaitTermination()
    back_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    back = spark.read.schema(back_schema).parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "stream_foreach_batch",
    oracle="""
    SELECT event_type,
           count(*)             AS cnt,
           round(avg(value), 6) AS avg_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    """,
)
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: each micro-batch is handed to arbitrary batch
    code (here: filter + append to a parquet landing dir) — the
    production pattern for sinks Structured Streaming lacks natively
    (JDBC upserts, multi-table writes).

    Correctness shape: batch-id-based idempotence.  foreachBatch offers
    at-least-once delivery, so the writer keys files by batch_id —
    reprocessing a batch overwrites its own files instead of
    duplicating rows.  The end-of-stream read-back then equals the
    batch computation, which the oracle checks.
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = fixture_dir(sf_dir, "stream_fe_batch")
    out = os.path.join(root, "data")
    ckpt = os.path.join(root, "ckpt")
    src = events_stream(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "signup")
    ).select("event_id", "event_type", "value")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Partition by batch id: replays of an already-committed batch
        # overwrite their own partition (idempotent at-least-once).
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    for q in spark.streams.active:
        if q.name == "t_foreach_batch":
            q.stop()
            q.awaitTermination()
    handle = (
        src.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .queryName("t_foreach_batch")
        .trigger(availableNow=True)
        .start()
    )
    handle.awaitTermination()
    back_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    back = spark.read.schema(back_schema).parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@query(
    "stream_multi_batch_replay",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           count(*)             AS cnt,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY day, event_type
    """,
)
def stream_multi_batch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-count independence: the same day-grain aggregate driven
    through MANY micro-batches must equal the single-pass batch result.

    The events table is rewritten as 8 files and replayed with
    ``maxFilesPerTrigger=2`` (4+ micro-batches, arbitrary file order),
    in complete mode with no watermark — so no row can be declared
    late by an accident of file ordering, and the final table is
    provably independent of how the backlog was chopped into triggers.
    This is the guard rail for the production topology: incremental
    state folding across triggers == one batch aggregation.  (The
    bounded ``day × event_type`` grain is what makes complete-mode
    state legal here.)
    """
    from covid_19_data_analysis_bigdata_spark.sources.io import (
        fixture_dir,
        load_table,
    )

    frag = os.path.join(fixture_dir(sf_dir, "stream8"), "events8")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        # ts written as raw ns longs so this fixture exercises the
        # bigint branch of repair_events_ts regardless of the source
        # encoding the testdata generation happened to use
        load_table(spark, sf_dir, "events").withColumn(
            "ts", (F.unix_micros("ts") * 1000).cast("long")
        ).repartition(8).write.mode("overwrite").parquet(frag)
    ev = repair_events_ts(
        spark.readStream.schema(_events_fields(LongType()))
        .option("maxFilesPerTrigger", "2")
        .parquet(frag)
    )
    agg = ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    out = run_to_table(
        spark, agg, "t_multibatch", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.col("w.start").cast("date").alias("day"),
        "event_type",
        "cnt",
        "sum_value",
    )


@query(
    "stream_ohlc_bars",
    oracle="""
    WITH k AS (
        SELECT *,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
               lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
        FROM events)
    SELECT date_trunc('hour', ts) AS bar,
           event_type,
           arg_min(value, ord_key) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ord_key) AS close,
           CAST(count(*) AS BIGINT) AS volume
    FROM k
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC bars: the tick→bar resample of ``ts_ohlc_bars``
    run as a watermarked Structured Streaming aggregation — the
    batch/stream parity pair for stateful composite aggregates.

    ``min_by``/``max_by`` carry (value, ordering-key) pairs as
    mergeable partial state, so open/close work under incremental
    processing exactly like count/max do: each micro-batch folds its
    ticks into the open window's state, the 1-hour watermark bounds
    how many bars stay open, and end-of-stream state equals the batch
    aggregate bar-for-bar (same deterministic zero-padded
    (epoch_µs, event_id) tie-break key).  Unbounded at scale: state
    size is open-bars × types, independent of stream length.
    """
    ev = events_stream(spark, sf_dir)
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )
    out = run_to_table(
        spark, agg, "t_ohlc", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.col("w.start").alias("bar"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@query(
    "stream_upsert_state",
    oracle="""
    WITH latest AS (
        SELECT user_id, event_id, event_type, value
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(value), 4)     AS sum_value
    FROM latest
    GROUP BY event_type
    """,
)
def stream_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style streaming upsert: every micro-batch merges into a
    keep-latest state table (one row per user, newest event wins) —
    the foreachBatch topology that maintains a dimension/state table
    from a change stream when the sink has no native MERGE.

    Each batch computes ``keep_latest(state ∪ batch)`` and swaps it in
    via write-to-temp + directory rename — the manual form of the
    atomic commit a transactional table format provides.  Correctness
    does NOT depend on batch order or replay count: keep-latest under
    the (ts, event_id) total order is associative, commutative, and
    idempotent, so any at-least-once, any-order delivery converges to
    the same fixed point — which is why the oracle can state the batch
    QUALIFY over the raw table.  At scale the per-batch merge is one
    shuffle on the key of (state + batch), the same cost MERGE INTO
    pays.
    """
    import shutil

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = fixture_dir(sf_dir, "stream_upsert")
    state = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        cur = batch_df.select(
            "user_id", "event_id", "event_type", "value", "ts"
        )
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            cur = sess.read.parquet(state).unionByName(cur)
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        merged = (
            cur.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        tmp = state + f"_tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state, ignore_errors=True)
        os.rename(tmp, state)

    for q in spark.streams.active:
        if q.name == "t_upsert_state":
            q.stop()
            q.awaitTermination()
    src = events_stream(spark, sf_dir)
    handle = (
        src.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", ckpt)
        .queryName("t_upsert_state")
        .trigger(availableNow=True)
        .start()
    )
    handle.awaitTermination()
    back = spark.read.parquet(state)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "stream_window_distinct",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(DISTINCT user_id) AS n_users,
           count(*)                AS n_events
    FROM events
    GROUP BY day
    """,
)
def stream_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per tumbling day window on a stream — the
    dedup-then-aggregate streaming composition: dropDuplicates on
    (window, user) under the watermark collapses each user to one row
    per day BEFORE the count, so the aggregation state holds one
    counter per window while the dedup state holds (window, user)
    keys bounded by the watermark horizon.

    This is the streaming answer to COUNT(DISTINCT) that
    ``approx_count_distinct`` usually stands in for: exact, but with
    state linear in per-window distinct keys — the honest trade,
    documented deliberately next to the sketch variant.  The raw event
    count is carried through the dedup stage as a per-(window, user)
    partial and re-summed in the finishing aggregate, so one topology
    serves both metrics.
    """
    ev = events_stream(spark, sf_dir)
    # Dedup grain: (day-window, user).  The per-pair event count is
    # pre-aggregated in the same windowed groupBy (no separate dedup
    # operator needed — an exact aggregate IS a dedup at this grain),
    # then the day totals fold those partials.
    per_user = (
        ev.withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    out = run_to_table(
        spark, per_user, "t_window_distinct", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.groupBy(
        F.col("w.start").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_ev").alias("n_events"),
    )


ALERT_RATE_PCT = 20


@query(
    "stream_error_rate_alert",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
    flagged AS (
        SELECT day, n_errors, n_events,
               (n_errors * 100 > {ALERT_RATE_PCT} * n_events) AS breach,
               lag(n_errors * 100 > {ALERT_RATE_PCT} * n_events)
                   OVER (ORDER BY day) AS prev_breach
        FROM daily)
    SELECT day, n_errors, n_events,
           round(100.0 * n_errors / n_events, 6) AS error_pct,
           CASE WHEN breach AND NOT coalesce(prev_breach, FALSE)
                THEN 'FIRED'
                WHEN NOT breach AND coalesce(prev_breach, FALSE)
                THEN 'RESOLVED'
           END AS alert
    FROM flagged
    WHERE (breach AND NOT coalesce(prev_breach, FALSE))
       OR (NOT breach AND coalesce(prev_breach, FALSE))
    """,
)
def stream_error_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming alerting topology: the per-day error rate is
    maintained as a watermarked windowed aggregate on the stream, and
    alert EDGES (threshold first breached / first recovered) are
    derived from the final state — emit-on-transition, not
    emit-on-every-breach, the dedup discipline that keeps a paging
    system quiet.

    The streaming stage carries one (errors, total) counter pair per
    open window; the edge detection is one lag over the day-grain
    result (a foreachBatch sink would evaluate the same lag
    incrementally).  The threshold test is integer cross-multiplied
    (errors·100 > 20·total) so no engine float ambiguity; the rate is
    reported with one division.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    out = run_to_table(
        spark, agg, "t_error_alert", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    daily = out.select(
        F.col("w.start").cast("date").alias("day"),
        "n_errors",
        "n_events",
    )
    breach = F.col("n_errors") * 100 > ALERT_RATE_PCT * F.col("n_events")
    wd = Window.orderBy("day")
    flagged = daily.select(
        "day",
        "n_errors",
        "n_events",
        breach.alias("breach"),
        F.lag(breach).over(wd).alias("prev_breach"),
    )
    prev = F.coalesce(F.col("prev_breach"), F.lit(False))
    return flagged.filter(
        (F.col("breach") & ~prev) | (~F.col("breach") & prev)
    ).select(
        "day",
        "n_errors",
        "n_events",
        F.round(
            100.0 * F.col("n_errors") / F.col("n_events"), 6
        ).alias("error_pct"),
        F.when(F.col("breach") & ~prev, "FIRED")
        .when(~F.col("breach") & prev, "RESOLVED")
        .alias("alert"),
    )


@query(
    "stream_topk_per_window",
    oracle="""
    WITH c AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT day, event_type, cnt,
               CAST(row_number() OVER (PARTITION BY day
                    ORDER BY cnt DESC, event_type) AS BIGINT) AS rnk
        FROM c)
    SELECT day, event_type, cnt, rnk FROM r WHERE rnk <= 3
    """,
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling day window — the "trending now"
    panel of a live dashboard.

    Ranking inside a streaming aggregation is not expressible in a
    single append-mode topology (rank is non-monotone as counts grow),
    so the operator is the standard two-stage shape: the STREAM
    maintains the per-(window, type) counts with a 1-day watermark —
    the unbounded, stateful, scale-bearing half — and the rank is a
    window function over the final counts table, whose size is
    |days|·|types| regardless of stream volume.  At 100 TB/day the
    same topology stands: the memory sink becomes a Delta/Kafka sink
    and the rank runs in the serving query.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = run_to_table(
        spark, agg, "t_topk_win", "complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    counts = out.select(
        F.col("w.start").cast("date").alias("day"), "event_type", "cnt"
    )
    wr = Window.partitionBy("day").orderBy(
        F.col("cnt").desc(), "event_type"
    )
    return counts.select(
        "day",
        "event_type",
        "cnt",
        F.row_number().over(wr).cast("long").alias("rnk"),
    ).filter(F.col("rnk") <= 3)


@query(
    "stream_chained_agg",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events),
    ten AS (
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS w10s,
               count(*) AS cnt10,
               CAST(round(sum(value), 4) AS DECIMAL(18,4)) AS sum10
        FROM events GROUP BY 1),
    hr AS (
        SELECT time_bucket(INTERVAL '1 hour', w10s) AS whs,
               CAST(sum(cnt10) AS BIGINT)           AS cnt,
               round(CAST(sum(sum10) AS DOUBLE), 4) AS sum_value,
               CAST(count(*) AS BIGINT)             AS n_subwindows
        FROM ten GROUP BY 1)
    SELECT epoch_ms(whs) AS window_start_ms, cnt, sum_value, n_subwindows
    FROM hr, m
    WHERE whs + INTERVAL '1 hour' <= mx - INTERVAL '1 hour'
    """,
)
def stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained time-window aggregations in ONE streaming query
    (window-on-window, Spark 3.4+): 10-minute tumbling partials roll up
    into hourly windows — the pre-aggregation cascade every high-volume
    metrics pipeline runs (raw events → minute grain → hour grain)
    without a second job or an intermediate sink.

    The second ``groupBy(window(col("w10"), "1 hour"))`` consumes the
    FIRST aggregation's window column as its event time; the watermark
    propagates through, so each stage's state stays bounded and the
    outer window emits (append mode) once the watermark passes its
    end.  At 100 TB/day the 10-minute stage collapses the raw stream
    ~10⁴× before the hourly shuffle — the cascade IS the scale design.
    End-of-stream append output equals the batch two-level rollup over
    windows whose end ≤ max ts − 1 h (the same availableNow no-data-
    batch flush contract as ``stream_watermark_late``); the oracle
    states that as two nested GROUP BYs plus the watermark filter.
    Partition-safety: the inner 4dp sums are cast to DECIMAL(18,4)
    before the outer sum, so the hourly rollup is order-independent
    in both engines; counts are exact integers.
    """
    ev = events_stream(spark, sf_dir)
    w10 = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w10"))
        .agg(
            F.count(F.lit(1)).alias("cnt10"),
            F.round(F.sum("value"), 4)
            .cast("decimal(18,4)")
            .alias("sum10"),
        )
    )
    hourly = w10.groupBy(F.window(F.col("w10"), "1 hour").alias("wh")).agg(
        F.sum("cnt10").alias("cnt"),
        F.round(F.sum("sum10").cast("double"), 4).alias("sum_value"),
        F.count(F.lit(1)).alias("n_subwindows"),
    )
    out = run_to_table(
        spark, hourly, "t_chained_agg", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.unix_millis(F.col("wh.start")).alias("window_start_ms"),
        "cnt",
        "sum_value",
        "n_subwindows",
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT a.event_id                     AS click_id,
           b.event_id                     AS purchase_id,
           a.user_id                      AS user_id,
           epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
     AND a.event_type = 'click'
     AND b.event_type = 'purchase'
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (the streaming form the batch
    ``join_theta_range`` family lacked): click events join purchase
    events by the same user within [click_ts, click_ts + 30 min] —
    the conversion-attribution join every funnel pipeline runs live.

    Both sides carry a watermark AND the join condition bounds the two
    event-time columns against each other; together they let the state
    store evict a buffered row as soon as the other side's watermark
    passes its match horizon, so per-side state is (watermark delay +
    interval) worth of events — bounded by stream RATE, never by total
    corpus size, at any scale.  Without the time bound a stream-stream
    join must retain EVERY past row forever; the interval is what
    makes the topology runnable unbounded (SURVEY.md §4.3.8).  The
    state shuffle is keyed on user_id — hash-distributed over the user
    population, no hot single task.

    End-of-stream equivalence: inner joins emit exactly the matched
    pairs; the availableNow replay processes the full backlog before
    stopping, so the append output equals the batch interval join the
    oracle states (watermarks only evict state EARLIER than the replay
    delivers a late match when the source splits into multiple
    micro-batches more disordered than the 1-hour delay — the declared
    disorder contract shared with ``stream_watermark_late``).
    ``gap_ms`` is an exact integer (epoch-ms difference), so the
    comparison is bit-stable in both engines.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        F.expr(
            "b_user = c_user AND "
            "b_ts >= c_ts AND b_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
    )
    out = run_to_table(
        spark, joined, "t_interval_join", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_millis("b_ts") - F.unix_millis("c_ts")).alias("gap_ms"),
    )


@query(
    "stream_join_windowed_agg",
    oracle="""
    WITH m AS (SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click')
                                IS NULL
                         OR max(ts) FILTER (WHERE event_type = 'purchase')
                                IS NULL
                       THEN NULL
                       ELSE least(
                   max(ts) FILTER (WHERE event_type = 'click'),
                   max(ts) FILTER (WHERE event_type = 'purchase'))
               END AS mx FROM events),
    p AS (
        SELECT a.ts AS c_ts
        FROM events a
        JOIN events b
          ON b.user_id = a.user_id
         AND a.event_type = 'click'
         AND b.event_type = 'purchase'
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL '30 minutes'),
    w AS (SELECT time_bucket(INTERVAL '1 day', c_ts) AS d,
                 CAST(count(*) AS BIGINT) AS conversions
          FROM p GROUP BY 1)
    SELECT epoch_ms(d) AS window_start_ms, conversions
    FROM w, m
    WHERE d + INTERVAL '1 day' < mx - INTERVAL '90 minutes'
    """,
)
def stream_join_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful operators ACROSS kinds in one streaming query
    (Spark 3.5+ multi-stateful-operator support): the stream-stream
    interval join of ``stream_interval_join`` feeds a tumbling daily
    aggregation — live conversion counts, the funnel metric every
    attribution dashboard derives from the raw pair stream, without an
    intermediate sink or a second job.

    State is the SUM of two independently bounded stores: the join
    buffers (watermark delay + 30-min interval) of events per side —
    rate-bounded, keyed on user_id — and the window store one row per
    open day.  The join's event-time watermark propagates into the
    aggregation DELAYED BY THE JOIN INTERVAL: a click row can sit in
    the join buffer until the watermark passes c_ts + 30 min, so the
    aggregate's effective watermark is wm − 30 min, and the day window
    emits (append mode) iff window_end < wm − 30 min STRICTLY, where
    wm = min(max click ts, max purchase ts) − 1 h — per-side maxima
    because each side's ``withWatermark`` sits above its event_type
    filter, so only that side's rows advance it.  All three facts
    (the 30-min propagation delay, the strict inequality at the
    boundary, the per-side maxima) are pinned empirically by
    tests/test_guards.py::test_join_windowed_agg_watermark_band with a
    synthetic fixture whose max ts lands INSIDE the (wm−30min, wm]
    band the r11 ADVICE flagged — the oracle states exactly this
    cutoff, so the contract holds at any data's max-ts placement, not
    just the committed testdata's.  Counts are exact integers, window
    starts exact epoch-ms.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        F.expr(
            "b_user = c_user AND "
            "b_ts >= c_ts AND b_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
    )
    daily = joined.groupBy(F.window("c_ts", "1 day").alias("w")).agg(
        F.count(F.lit(1)).alias("conversions")
    )
    out = run_to_table(
        spark, daily, "t_join_windowed_agg", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        "conversions",
    )


@query(
    "stream_interval_join_left",
    oracle="""
    WITH m AS (SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click')
                                IS NULL
                         OR max(ts) FILTER (WHERE event_type = 'purchase')
                                IS NULL
                       THEN NULL
                       ELSE least(
                   max(ts) FILTER (WHERE event_type = 'click'),
                   max(ts) FILTER (WHERE event_type = 'purchase'))
               - INTERVAL '1 hour' END AS wm FROM events),
    c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS b_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id                      AS click_id,
           p.purchase_id                   AS purchase_id,
           c.user_id                       AS user_id,
           epoch_ms(p.b_ts) - epoch_ms(c.c_ts) AS gap_ms
    FROM c
    LEFT JOIN p
      ON p.user_id = c.user_id
     AND p.b_ts >= c.c_ts
     AND p.b_ts <= c.c_ts + INTERVAL '30 minutes'
    CROSS JOIN m
    WHERE p.purchase_id IS NOT NULL
       OR c.c_ts + INTERVAL '30 minutes' < m.wm
    """,
)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the state-TIMEOUT
    semantics the inner join never exercises: every click emits either
    its matching purchases within [c_ts, c_ts + 30 min] or, once the
    watermark proves no match can still arrive, ONE null-extended row.
    This is the live form of "which clicks did NOT convert" — the
    funnel-drop stream an attribution pipeline alerts on.

    Emission contract, pinned empirically (probe fixtures + the
    cross-micro-batch expiry test
    tests/test_guards.py::test_left_interval_join_emits_null_on_expiry):
    matched pairs emit as found, exactly like the inner join; an
    unmatched click's null row emits only when its match horizon has
    STRICTLY passed the global watermark — c_ts + 30 min < wm, where
    wm = min(max click ts, max purchase ts) − 1 h (per-side maxima:
    each ``withWatermark`` sits above its event_type filter; min
    because Spark's default multipleWatermarkPolicy is min; equality
    at the boundary stays buffered, verified at exact-boundary
    fixtures).  Clicks whose horizon is still inside the watermark at
    end-of-replay remain in state and emit nothing — the oracle states
    the same cutoff, so batch and stream agree at any max-ts placement.

    Scale: identical state topology to ``stream_interval_join`` —
    per-side buffers bounded by (watermark delay + interval) × stream
    rate, hash-partitioned on user_id, no hot task; the null-extension
    adds no state, only an eviction-time emit.  ``gap_ms`` is an exact
    integer on matched rows and NULL on expiry rows in both engines.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        F.expr(
            "b_user = c_user AND "
            "b_ts >= c_ts AND b_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
        "left_outer",
    )
    out = run_to_table(
        spark, joined, "t_interval_join_left", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_millis("b_ts") - F.unix_millis("c_ts")).alias("gap_ms"),
    )


@query(
    "stream_interval_join_full",
    oracle="""
    WITH m AS (SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click')
                                IS NULL
                         OR max(ts) FILTER (WHERE event_type = 'purchase')
                                IS NULL
                       THEN NULL
                       ELSE least(
                   max(ts) FILTER (WHERE event_type = 'click'),
                   max(ts) FILTER (WHERE event_type = 'purchase'))
               - INTERVAL '1 hour' END AS wm FROM events),
    c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS b_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id                          AS click_id,
           p.purchase_id                       AS purchase_id,
           coalesce(c.user_id, p.user_id)      AS user_id,
           epoch_ms(p.b_ts) - epoch_ms(c.c_ts) AS gap_ms
    FROM c
    FULL JOIN p
      ON p.user_id = c.user_id
     AND p.b_ts >= c.c_ts
     AND p.b_ts <= c.c_ts + INTERVAL '30 minutes'
    CROSS JOIN m
    WHERE (c.click_id IS NOT NULL AND p.purchase_id IS NOT NULL)
       OR (p.purchase_id IS NULL AND c.c_ts + INTERVAL '30 minutes' < m.wm)
       OR (c.click_id IS NULL AND p.b_ts < m.wm)
    """,
)
def stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — null-extension on BOTH
    sides at state expiry, completing the outer-join streaming
    semantics (inner: ``stream_interval_join``; left:
    ``stream_interval_join_left``).  One live query answers both
    funnel questions at once: which clicks never converted AND which
    purchases have no attributable click (the orphan-conversion stream
    a revenue-integrity pipeline alerts on).

    Emission contract, pinned empirically (probe fixtures + the
    cross-micro-batch test
    tests/test_guards.py::test_full_interval_join_expires_both_sides):
    matched pairs emit as found; an unmatched CLICK's null row emits
    iff its match horizon strictly passed the watermark — c_ts +
    30 min < wm (identical to the left join's pinned contract); an
    unmatched PURCHASE's null row emits iff b_ts < wm STRICTLY — the
    purchase side buffers under a DIFFERENT effective horizon because
    the join condition ``b_ts >= c_ts`` means a purchase is only
    unmatchable once no future click (c_ts ≥ wm) can precede it, i.e.
    when b_ts itself falls behind the watermark, with no +30 min
    extension.  Boundary rows on EITHER side (horizon == wm, b_ts ==
    wm) stay buffered and emit nothing.  wm = min(per-side maxima) −
    1 h, per-side because each ``withWatermark`` sits above its
    event_type filter.  The oracle states both expiry cutoffs
    verbatim, and guards the degenerate single-type input: when either
    side is EMPTY, Spark's min-of-watermarks never initializes and the
    query emits nothing — the CASE collapses wm to NULL so the oracle
    emits nothing too (the DuckDB ``least()`` NULL-skipping trap).

    Scale: state topology identical to the inner join — per-side
    buffers bounded by (watermark delay + interval) × stream rate,
    hash-partitioned on user_id across however many state-store
    partitions the cluster runs, no hot task; both null-extension
    classes are eviction-time emits that add NO state.  ``gap_ms`` is
    an exact epoch-ms integer on matched rows and NULL on both expiry
    classes in both engines.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        F.expr(
            "b_user = c_user AND "
            "b_ts >= c_ts AND b_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
        "full_outer",
    )
    out = run_to_table(
        spark, joined, "t_interval_join_full", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        "click_id",
        "purchase_id",
        F.coalesce("c_user", "b_user").alias("user_id"),
        (F.unix_millis("b_ts") - F.unix_millis("c_ts")).alias("gap_ms"),
    )


@query(
    "stream_interval_join_right",
    oracle="""
    WITH m AS (SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click')
                                IS NULL
                         OR max(ts) FILTER (WHERE event_type = 'purchase')
                                IS NULL
                       THEN NULL
                       ELSE least(
                   max(ts) FILTER (WHERE event_type = 'click'),
                   max(ts) FILTER (WHERE event_type = 'purchase'))
               - INTERVAL '1 hour' END AS wm FROM events),
    c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS b_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id                          AS click_id,
           p.purchase_id                       AS purchase_id,
           p.user_id                           AS user_id,
           epoch_ms(p.b_ts) - epoch_ms(c.c_ts) AS gap_ms
    FROM c
    RIGHT JOIN p
      ON p.user_id = c.user_id
     AND p.b_ts >= c.c_ts
     AND p.b_ts <= c.c_ts + INTERVAL '30 minutes'
    CROSS JOIN m
    WHERE c.click_id IS NOT NULL
       OR p.b_ts < m.wm
    """,
)
def stream_interval_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream RIGHT OUTER interval join — null-extension on the
    purchase side only, completing the outer-join matrix whose inner /
    left / full contracts are already empirically pinned.  The live
    form of the orphan-conversion stream alone: every purchase emits
    either its attributable clicks within [c_ts, c_ts + 30 min] or,
    once the watermark proves no click can still claim it, ONE
    null-extended row — without the left side's funnel-drop rows that
    the full join also carries.

    Emission contract (the purchase-expiry half of the full join's
    pinned contract, re-verified by
    tests/test_guards.py::test_right_interval_join_expires_purchases):
    matched pairs emit as found; an unmatched purchase's null row
    emits iff b_ts < wm STRICTLY — no +30 min extension, because the
    join condition ``b_ts >= c_ts`` makes a purchase unmatchable only
    once no future click (c_ts ≥ wm) can precede it, i.e. when b_ts
    itself falls behind the watermark.  Boundary purchases (b_ts ==
    wm) stay buffered and emit nothing.  wm = min(per-side maxima) −
    1 h, per-side because each ``withWatermark`` sits above its
    event_type filter.  The oracle states the cutoff verbatim and
    inherits the degenerate single-type guard: an empty side collapses
    wm to NULL (the CASE around DuckDB's NULL-skipping ``least()``),
    matching Spark's never-initialized min-watermark emitting nothing.

    Scale: state topology identical to the inner join — per-side
    buffers bounded by (watermark delay + interval) × stream rate,
    hash-partitioned on user_id, no hot task; the null-extension is an
    eviction-time emit that adds NO state.  ``gap_ms`` is an exact
    epoch-ms integer on matched rows and NULL on expiry rows in both
    engines.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    buys = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = clicks.join(
        buys,
        F.expr(
            "b_user = c_user AND "
            "b_ts >= c_ts AND b_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
        "right_outer",
    )
    out = run_to_table(
        spark, joined, "t_interval_join_right", "append",
        state_partitions=_state_partitions(spark, sf_dir),
    )
    return out.select(
        "click_id",
        "purchase_id",
        F.col("b_user").alias("user_id"),
        (F.unix_millis("b_ts") - F.unix_millis("c_ts")).alias("gap_ms"),
    )
