"""SparkSession factory + defensive per-session configuration.

The driver may hand us an already-built ``SparkSession``; therefore all
*runtime-settable* SQL confs are (re)applied by :func:`ensure_confs`,
which every query callable runs through (via the scan layer).  Only
confs that must be set before JVM start (driver memory, master) live in
:func:`get_spark`.

Scale notes (100 TB design, SURVEY.md §4.3): AQE stays on so shuffle
partition counts, skew splitting and sort-merge→broadcast demotion are
decided from real runtime statistics rather than hand-tuned constants —
the same code runs on local[32] and on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs every query depends on.
RUNTIME_CONFS: dict[str, str] = {
    # events.ts is parquet TIMESTAMP(NANOS); Spark 4.1.2 rejects it outright
    # (PARQUET_TYPE_ILLEGAL) unless read as raw bigint nanos (SURVEY.md §1.3.1).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Pin the session timezone so collected timestamps agree bit-for-bit with
    # DuckDB's naive (UTC-less) timestamps regardless of machine TZ.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transport for pandas_udf / applyInPandas / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Adaptive execution: runtime re-planning at shuffle boundaries.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Let AQE coalesce below defaultParallelism (the Spark docs'
    # recommended cluster setting).  The default (true) pins every
    # post-shuffle stage at >= 32 partitions, so doc-grain /
    # bucket-grain stages (LSH buckets, band tables, candidate pairs)
    # pay ~30 empty-task schedules per shuffle — measured round 7:
    # an 8-query mixed bench fell 10.1 s -> 9.0 s with ZERO per-query
    # regressions (llm_dedup_fuzzy 1.79->1.43, ml_knn_classify
    # 1.05->0.79).  Advisory partition size still governs real
    # volumes, so genuinely large shuffles keep their parallelism.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # Runtime-settable, so externally-built sessions (the driver's plain
    # session defaults to 200) also get a parallelism-matched value; AQE
    # coalesces further downward per-stage.  Overridable for bench A/B
    # experiments via $SPARK_GRAFT_SHUFFLE_PARTITIONS.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
}


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Apply :data:`RUNTIME_CONFS` to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf a future Spark makes static must not kill the query path.
            pass
    return spark


def get_spark(app_name: str = "covid19-bigdata-spark") -> SparkSession:
    """Build (or fetch) the engine's configured local session.

    Local parallelism comes from ``$SPARK_GRAFT_CPUS`` (default: all
    cores); on a real cluster the same code is submitted with a cluster
    master and these local-mode settings are inert.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return ensure_confs(builder.getOrCreate())
