"""Scan / source / sink operators (SURVEY.md §2 category 1).

Reference analogs: CSV ingest of COVID time-series, JSON API pulls,
saving the cleaned dataset.  At 100 TB the load-bearing properties are
all here: metadata-only schemas, column pruning reaching the parquet
scan, and partitioned layouts so later filters become directory pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import (
    load_table,
    partitioned_sink,
    roundtrip_csv,
    roundtrip_jsonl,
)


@query("scan_parquet", oracle="SELECT * FROM nation")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan, all columns, all rows."""
    return load_table(spark, sf_dir, "nation")


@query(
    "scan_projected",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan: only 2 of 11 lineitem columns reach the reader.

    Catalyst's ColumnPruning pushes the projection into the parquet
    ReadSchema — verified by the plan test in tests/test_plans.py.  At
    100 TB this is the difference between reading 2 columns' pages and
    reading the whole table.
    """
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "scan_events_ns",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           count(*)              AS cnt,
           round(sum(value), 4)  AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def scan_events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the TIMESTAMP(NANOS) events table correctly (§1.3.1 gotcha).

    Emits day-truncated buckets only — raw ns timestamps must never
    appear in checked output (ns vs µs truncation would break the
    value-hash).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query("read_csv_schema", oracle="SELECT * FROM nation")
def read_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest with an explicit pinned StructType (no inferSchema).

    Reference analog: reading the JHU/Kaggle COVID CSVs.  Inference is
    a full extra pass over the data — banned at scale; the pinned
    schema makes the read single-pass and type-stable.
    """
    return roundtrip_csv(spark, sf_dir, "nation")


@query("read_json_lines", oracle="SELECT * FROM region")
def read_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingest with explicit schema (reference analog: OWID/API JSON)."""
    return roundtrip_jsonl(spark, sf_dir, "region")


@query(
    "sink_parquet_partitioned",
    oracle="""
    SELECT l_linestatus,
           count(*)                  AS cnt,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    """,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + pruned read-back aggregate.

    The read-back filter on the partition column (`l_returnflag='R'`)
    is satisfied by directory pruning — no data from other partitions
    is touched.  This layout choice is the primary pruning lever for a
    100 TB fact table.
    """
    path = partitioned_sink(spark, sf_dir)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


@query(
    "scan_dpp_star_join",
    oracle="""
    WITH totals AS (SELECT l_returnflag, sum(l_quantity) AS total
                    FROM lineitem GROUP BY 1),
    keep AS (SELECT l_returnflag AS flag, round(total, 4) AS total
             FROM totals
             QUALIFY row_number() OVER (ORDER BY total DESC, l_returnflag)
                     >= 2)
    SELECT k.flag,
           count(*)                        AS cnt,
           round(sum(l_extendedprice), 4)  AS sum_price
    FROM lineitem l JOIN keep k ON l.l_returnflag = k.flag
    GROUP BY k.flag
    """,
)
def scan_dpp_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning on a partitioned fact star join.

    The dim side (per-flag quantity totals, all but the heaviest flag
    kept) is only known at runtime, so Catalyst injects a
    ``dynamicpruningexpression`` into the partitioned scan's
    PartitionFilters: the fact directories for pruned flags are never
    listed, let alone read.  At 100 TB this is the difference between
    scanning the whole fact table and scanning the partitions a
    filtered dimension actually touches (tests/test_plans pins the
    DPP expression in the plan).
    """
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total")
    )
    w = Window.orderBy(F.desc("total"), F.asc("l_returnflag"))
    dim = (
        totals.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") >= 2)
        .select(F.col("l_returnflag").alias("flag"))
    )
    fact = spark.read.parquet(partitioned_sink(spark, sf_dir))
    return (
        fact.join(dim, fact.l_returnflag == dim.flag)
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


@query(
    "create_view_sql",
    oracle="""
    SELECT o_orderpriority,
           count(*)                     AS cnt,
           round(sum(o_totalprice), 4)  AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def create_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temp view + SQL-string entry point (the reference's main query style).

    ``spark.sql`` parses to the same unresolved logical plan the
    DataFrame API builds — both entry points share one engine path
    (SURVEY.md §3.2).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*)                    AS cnt,
               round(sum(o_totalprice), 4) AS total
        FROM v_orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "read_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*)                    AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def read_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read-back aggregate (the third columnar format).

    ORC carries the same pruning levers as parquet (stripe statistics,
    column projection, predicate pushdown) and Spark supports it
    natively — the oracle runs on the original table, so the check
    verifies the round-trip loses nothing.  The write is filtered to
    'F' orders so the read-back is also a pushdown demonstration:
    only the needed columns reach the scan.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    out = os.path.join(fixture_dir(sf_dir, "orc"), "orders_f")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "F"
        ).write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@query(
    "catalog_managed_table",
    oracle="""
    SELECT n_regionkey,
           count(*)                 AS n_nations,
           round(avg(len(n_name)), 4) AS avg_name_len
    FROM nation
    GROUP BY n_regionkey
    """,
)
def catalog_managed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed catalog table: saveAsTable → spark.table → aggregate.

    The warehouse path (catalog metadata + managed storage) is how a
    cluster shares curated datasets between jobs without re-declaring
    schemas; `spark.table` resolves name → files → pinned schema from
    the metastore.  Overwrite mode makes reruns idempotent.
    """
    import shutil
    from urllib.parse import urlparse

    from covid_19_data_analysis_bigdata_spark.sources.io import (
        _source_fingerprint,
    )

    # Keyed by source fingerprint: a different scale factor (or
    # regenerated testdata) gets its own managed table, never a stale one.
    name = f"eng_nation_{_source_fingerprint(sf_dir)}"
    if not spark.catalog.tableExists(name):
        # The default catalog is in-memory per session while the
        # warehouse directory persists: a fresh session must clear any
        # orphaned location before CREATE, or saveAsTable refuses.
        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir")
        ).path
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        load_table(spark, sf_dir, "nation").write.mode(
            "overwrite"
        ).saveAsTable(name)
    return (
        spark.table(name)
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.round(F.avg(F.length("n_name")), 4).alias("avg_name_len"),
        )
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01'
                THEN o_orderpriority ELSE 'unknown' END AS priority,
           count(*)                    AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY 1
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution via ``mergeSchema``: old files lack a column
    added later; the merged scan surfaces it as NULL for old data.

    The lakehouse reality — producers add columns mid-stream and a
    reader must span both vintages.  Batch 1 (pre-1999 orders) is
    written WITHOUT ``o_orderpriority``; batch 2 carries it.
    ``mergeSchema=true`` unions the footer schemas at planning time;
    the old files' missing column reads as NULL, normalized here to
    'unknown'.  The oracle reconstructs the same split from the source
    table, proving no rows were lost or mis-attributed across vintages.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    root = os.path.join(fixture_dir(sf_dir, "evolve"), "orders_versions")
    if not os.path.exists(os.path.join(root, "_DONE")):
        o = load_table(spark, sf_dir, "orders")
        old = o.filter(F.col("o_orderdate") < "1999-01-01").select(
            "o_orderkey", "o_orderdate", "o_totalprice"
        )
        new = o.filter(F.col("o_orderdate") >= "1999-01-01").select(
            "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"
        )
        old.write.mode("overwrite").parquet(os.path.join(root, "batch=1"))
        new.write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
        open(os.path.join(root, "_DONE"), "w").close()
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "batch=1"), os.path.join(root, "batch=2")
    )
    return (
        back.select(
            F.coalesce("o_orderpriority", F.lit("unknown")).alias("priority"),
            "o_totalprice",
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


@query(
    "scan_file_metadata",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    """,
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden ``_metadata`` file columns on the parquet scan — per-file
    row provenance without storing a path column.  At 100 TB this is
    the lineage/debugging primitive: corrupt-file triage, per-file row
    accounting, and incremental-load auditing all group by
    ``_metadata.file_name`` exactly like this, paying nothing when the
    column is unused (it is populated from the split, not read from
    data pages).  The corpus stores one file per table, so the oracle
    pins the expected name and the exact row/key counts.
    """
    df = load_table(spark, sf_dir, "lineitem")  # scan layer: confs applied
    return df.groupBy(
        F.col("_metadata.file_name").alias("file_name")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )


@query(
    "read_text_lines",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
)
def read_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text line ingestion — the fifth source format next to
    parquet / CSV / JSONL / ORC, and the one raw corpus dumps actually
    arrive in: one record per line, no schema, structure recovered by
    parsing.

    The fixture lands documents as tab-delimited lines once, then
    ``spark.read.text`` streams them back as a single ``value`` column
    and the projection splits fields out — parse-on-read is a
    row-local expression, so text ingest at 100 TB is scan-bound with
    line-level parallelism (text splits by newline at block
    boundaries, no footer needed).  The oracle aggregates the original
    table: the round-trip must lose nothing, including the text body
    byte-for-byte (tabs cannot collide: the corpus text is
    space-delimited words, a guarded invariant).
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(fixture_dir(sf_dir, "text"), "documents_txt")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        d.select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.col("source"),
                F.col("text"),
            ).alias("value")
        ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parts = F.split(F.col("value"), "\t", 3)
    parsed = lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("source"),
        parts.getItem(2).alias("text"),
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Binary-file source (media ingestion path) (round 5)
# --------------------------------------------------------------------------


@query(
    "scan_binary_files",
    oracle="""
    SELECT lang,
           CAST(1 AS BIGINT) AS n_files,
           CAST(sum(octet_length(CAST(
                CAST(doc_id AS VARCHAR) || chr(9) || text || chr(10)
                AS BLOB))) AS BIGINT) AS total_bytes,
           md5(string_agg(CAST(doc_id AS VARCHAR) || chr(9) || text,
                          chr(10) ORDER BY doc_id) || chr(10))
               AS content_md5
    FROM documents GROUP BY lang
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the sixth format, and the one a
    multimodal corpus actually lands in: whole files as rows of
    (path, length, content BINARY), the ingestion front door for the
    image/audio decode stages in operators/multimodal.py.

    Fixture: the documents table is written once as one text file per
    language (single writer task, rows in doc_id order, so the bytes
    are a pure function of the data).  The read side is
    ``spark.read.format("binaryFile")`` with a recursive lookup; each
    file arrives as ONE row with its full byte content, checksummed
    JVM-side (md5 over the binary column) and reconciled against the
    oracle's reconstruction of the same byte stream from the table —
    proving content integrity byte-for-byte, not just row counts.
    Scale: binaryFile parallelizes per file and never splits one (a
    media blob must arrive whole); the 100 TB layout therefore wants
    many medium files, not one giant one — the fixture's
    file-per-partition shape.  Driver never touches content bytes.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(fixture_dir(sf_dir, "binary"), "documents_bin")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        (
            d.select(
                "lang",
                F.concat_ws(
                    "\t", F.col("doc_id").cast("string"), F.col("text")
                ).alias("value"),
            )
            .repartition(1)
            .sortWithinPartitions("lang", "doc_id")
            .write.mode("overwrite")
            .partitionBy("lang")
            .text(out)
        )
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(out)
    )
    return (
        files.select(
            F.regexp_extract(F.col("path"), "lang=([a-z]+)", 1).alias("lang"),
            F.col("length"),
            F.md5(F.col("content")).alias("file_md5"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("length").cast("long").alias("total_bytes"),
            F.min("file_md5").alias("content_md5"),
        )
    )


# --------------------------------------------------------------------------
# Permissive CSV ingest with corrupt-record quarantine (round 5)
# --------------------------------------------------------------------------


@query(
    "scan_csv_quarantine",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 = 3 THEN 'quarantined'
                ELSE 'parsed' END AS bucket,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey % 10 = 3 THEN 0
                         ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                    END) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY 1
    """,
)
def scan_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row quarantine on CSV ingest — the DLT/write-audit
    idiom at the source: rows whose fragile field fails to parse are
    counted into a quarantine bucket instead of killing the load, and
    the query reports parsed-vs-quarantined volume plus the parsed
    total.

    Fixture: the orders table written once as CSV with every
    (orderkey % 10 == 3) row's price field poisoned to a non-numeric
    token — a deterministic function of the data, so the oracle knows
    exactly which rows must quarantine.  The read declares the schema
    with the fragile field as STRING and quarantines on ``try_cast``
    failure — deliberately NOT Spark's ``_corrupt_record`` column,
    which cannot be queried without caching the raw parse
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), a
    non-starter at 100 TB; try_cast also pins the corruptness rule in
    the query, per-row and embarrassingly parallel.  The split is one
    conditional aggregate.
    """
    import os

    from covid_19_data_analysis_bigdata_spark.sources.io import fixture_dir

    o = load_table(spark, sf_dir, "orders")
    out = os.path.join(fixture_dir(sf_dir, "csvq"), "orders_poisoned")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        (
            o.select(
                "o_orderkey",
                F.when(F.col("o_orderkey") % 10 == 3, F.lit("N/A"))
                .otherwise(
                    F.format_number(F.col("o_totalprice"), 2)
                )
                .alias("price_str"),
            )
            .select(
                F.concat_ws(
                    ",",
                    F.col("o_orderkey").cast("string"),
                    F.regexp_replace("price_str", ",", ""),
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(out)
        )
    # NOTE: Spark's built-in _corrupt_record column cannot be referenced
    # without caching the raw parse (UNSUPPORTED_FEATURE.QUERY_ONLY_
    # CORRUPT_RECORD_COLUMN) — a non-starter at 100 TB.  Equivalent and
    # cache-free: land the fragile field as STRING and quarantine on
    # try_cast failure, which also pins the "what counts as corrupt"
    # rule in the query instead of the parser.
    schema = "o_orderkey BIGINT, price_str STRING"
    rows = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(out)
    parsed = F.expr("try_cast(price_str AS DOUBLE)")
    return (
        rows.select(
            F.when(parsed.isNull(), "quarantined")
            .otherwise("parsed")
            .alias("bucket"),
            F.when(parsed.isNull(), F.lit(0))
            .otherwise(F.round(parsed * 100).cast("long"))
            .alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
    )
