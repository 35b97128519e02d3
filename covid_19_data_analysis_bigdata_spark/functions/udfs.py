"""UDF / UDAF / UDTF surface (SURVEY.md §2 category 11) + the
multimodal binary-column plumbing.

Cost ladder, fastest first (SURVEY.md §4.3.6):
1. built-in expressions (JVM, whole-stage codegen) — everything outside
   this module;
2. ``pandas_udf`` / ``applyInPandas`` / ``mapInPandas`` — Arrow batch
   transfer, vectorized numpy/pandas compute;
3. row-at-a-time ``@F.udf`` — one Python round-trip per row; kept ONLY
   as the surface demonstration (`udf_python_scalar`), banned on any
   100 TB hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'large'
                WHEN o_totalprice >= 20000  THEN 'medium'
                ELSE 'small' END AS size_label
    FROM orders
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (custom severity label).

    Every row crosses JVM→Python→JVM individually — serialization cost
    dominates.  Exists to demonstrate the surface; the identical logic
    compiles to a CASE ladder (cond_funcs) that runs ~100× faster.
    """

    @F.udf(StringType())
    def size_label(price: float) -> str:
        if price >= 100000:
            return "large"
        if price >= 20000:
            return "medium"
        return "small"

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", size_label("o_totalprice").alias("size_label"))


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER ()) / stddev_samp(value) OVER (), 6)
               AS zscore
    FROM events
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: z-score of event value.

    The global mean/stddev are computed once JVM-side and broadcast as
    a 1-row frame; the pandas_udf then runs pure vectorized numpy over
    Arrow batches — no per-row Python.
    """

    @F.pandas_udf("double")
    def zscore(v: pd.Series, mean: pd.Series, sd: pd.Series) -> pd.Series:
        return (v - mean) / sd

    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.avg("value").alias("mean_v"), F.stddev_samp("value").alias("sd_v")
    )
    return (
        ev.crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            F.round(
                zscore(F.col("value"), F.col("mean_v"), F.col("sd_v")), 6
            ).alias("zscore"),
        )
    )


@query(
    "udaf_applyinpandas",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch_ms(ts) / 86400000.0), 6)
               AS slope_per_day,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def udaf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF: per-user linear-regression slope of value over
    time (the reference class's trend-forecasting core).

    ``applyInPandas`` ships each user's rows as one Arrow batch to a
    numpy closed-form least-squares.  The x axis is centered before the
    product sums — at epoch-day magnitudes the uncentered formula loses
    ~9 digits to cancellation and would not match regr_slope.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_millis("ts") / F.lit(86400000.0)).alias("x"),
        F.col("value").alias("y"),
    )

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        xc = x - x.mean()
        yc = y - y.mean()
        denom = (xc * xc).sum()
        s = float((xc * yc).sum() / denom) if denom > 0 else None
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "slope_per_day": [round(s, 6) if s is not None else None],
                "n": [len(pdf)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        slope, "user_id bigint, slope_per_day double, n bigint"
    )


@query(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)) / 100.0
                 / sum(CAST(l_quantity AS BIGINT)), 6) AS wavg_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price per flag.

    The third vectorized-UDF shape (``pandas_udf`` used directly inside
    ``groupBy().agg()``, complementing scalar and grouped-map): Spark
    runs it with partial Arrow batches per group, no full-group
    materialization in the plan.  Cross-engine determinism: the inputs
    are pre-scaled to exact integers (price cents × integral quantity),
    so both engines sum identical int64s and perform the identical
    final double division — no float-accumulation-order dependence.
    """
    import numpy as np

    @F.pandas_udf("double")
    def wavg(cents: pd.Series, qty: pd.Series) -> float:
        c = cents.to_numpy(np.int64)
        q = qty.to_numpy(np.int64)
        return float((c * q).sum() / 100.0 / q.sum())

    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a second pandas UDF.
    @F.pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("cents", "qty"), 6).alias("wavg_price"),
        n_rows("qty").alias("n"),
    )


@query(
    "udtf_table_fn",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + CAST(t.g AS INTEGER) AS d
    FROM orders, (SELECT unnest(generate_series(0, 4)) AS g) t
    WHERE o_orderkey % 97 = 0 AND t.g <= o_orderkey % 5
    """,
)
def udtf_table_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one order row → N date rows (date-range expansion).

    A lateral-correlated Python table function demonstrates the UDTF
    surface; the same expansion is expressible natively as
    ``explode(sequence(...))``, which is what a 100 TB pipeline should
    use (JVM-side, no Python worker).
    """
    from datetime import timedelta

    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, d date")
    class ExpandDates:
        def eval(self, orderkey, orderdate):
            for i in range(int(orderkey % 5) + 1):
                yield orderkey, (orderdate + timedelta(days=i)).date()

    spark.udtf.register("expand_dates", ExpandDates)
    load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    ).createOrReplaceTempView("v_orders_udtf")
    return spark.sql(
        """
        SELECT f.o_orderkey, f.d
        FROM v_orders_udtf,
             LATERAL expand_dates(o_orderkey, o_orderdate) f
        """
    )


@query(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB))            AS n_bytes,
           octet_length(CAST(text AS BLOB)) % 640      AS fake_width,
           (octet_length(CAST(text AS BLOB)) * 7) % 480 AS fake_height,
           octet_length(CAST(text AS BLOB)) % 10       AS fake_frames
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: opaque ``binary`` payloads
    decoded via Arrow-batched ``mapInPandas``.

    The Spark-side plumbing is real — binary column, schema-typed
    output, Arrow batch shape, partition-preserving map — while the
    codec itself is a deterministic STUB (real image/audio libraries
    are not in this container).  A production decode swaps the stub
    body for PIL/ffmpeg calls; nothing else changes.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def decode(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            # STUB decode: deterministic pseudo-metadata derived from the
            # payload bytes. Replace with a real codec (PIL / ffmpeg /
            # soundfile) outside this container.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "fake_width": n % 640,
                    "fake_height": (n * 7) % 480,
                    "fake_frames": n % 10,
                }
            )

    return d.mapInPandas(
        decode,
        "doc_id bigint, n_bytes bigint, fake_width bigint, "
        "fake_height bigint, fake_frames bigint",
    )


@query(
    "udf_mapinarrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: zero-copy RecordBatch compute, no pandas layer.

    The fourth Python-integration shape (after scalar pandas_udf,
    grouped-map, grouped-agg): batches arrive as pyarrow RecordBatches
    and the arithmetic runs in Arrow compute kernels — one less
    conversion than pandas for purely columnar math.  The filter stays
    JVM-side (pushed to the scan); only survivors cross the Arrow
    boundary.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def charge(batches):
        for b in batches:
            price = b.column("l_extendedprice")
            disc = b.column("l_discount")
            tax = b.column("l_tax")
            # Left unrounded: per-row IEEE arithmetic is bit-identical
            # across engines, while any decimal rounding of 60k per-row
            # products is guaranteed to hit half-way boundary cases
            # where round implementations differ (determinism rule:
            # round aggregates, never per-row values).
            charged = pc.multiply(
                pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                pc.add(pa.scalar(1.0), tax),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), charged],
                names=["l_orderkey", "l_linenumber", "charged"],
            )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )
    return li.mapInArrow(
        charge, "l_orderkey bigint, l_linenumber int, charged double"
    )


@query(
    "obs_metrics_passthrough",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def obs_metrics_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``observe()``: pipeline metrics riding the plan for free.

    Production jobs need row counts / sums of what a stage actually
    processed without a second scan; ``observe`` attaches aggregate
    metrics to the plan that are collected as a side effect of the
    action (here: rows passed and total price).  The rows flow through
    unchanged — the oracle verifies passthrough; tests/test_properties
    asserts the observed metrics equal the oracle-checked aggregates.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return o.observe(
        "open_orders_metrics",
        F.count(F.lit(1)).alias("rows_seen"),
        F.round(F.sum("o_totalprice"), 4).alias("price_seen"),
    ).select("o_orderkey", "o_totalprice")


@query(
    "udtf_analyze_polymorphic",
    oracle="""
    WITH kv AS (
        SELECT event_id,
               unnest(string_split(
                   trim(BOTH '{}' FROM replace(props, '"', '')), ','))
                   AS pair
        FROM events
        WHERE event_id % 211 = 0)
    SELECT event_id,
           trim(string_split(pair, ':')[1]) AS k,
           trim(string_split(pair, ':')[2]) AS v
    FROM kv
    WHERE pair <> ''
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF: the ``analyze`` static method computes
    the output schema at plan time (Spark 4's dynamic-schema table
    functions) — here a JSON-ish property bag exploded to (key, value)
    rows.

    ``analyze`` receives the argument types and returns the result
    schema, so one UDTF serves any input shape; the per-row work runs
    in the Python worker over Arrow batches.  (The native twin for the
    hot path is ``explode`` over ``from_json`` — the UDTF form exists
    for logic genuinely beyond SQL expressions.)
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ExplodeProps:
        @staticmethod
        def analyze(ev_id: AnalyzeArgument, props: AnalyzeArgument):
            schema = StructType()
            schema = schema.add("event_id", ev_id.dataType)
            schema = schema.add("k", StringType())
            schema = schema.add("v", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, ev_id, props):
            body = props.replace('"', "").strip().strip("{}")
            for pair in body.split(","):
                if not pair:
                    continue
                k, _, v = pair.partition(":")
                yield ev_id, k.strip(), v.strip()

    fn = udtf(ExplodeProps)
    spark.udtf.register("explode_props", fn)
    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 211 == 0
    ).createOrReplaceTempView("v_events_udtf")
    return spark.sql(
        """
        SELECT f.event_id, f.k, f.v
        FROM v_events_udtf,
             LATERAL explode_props(event_id, props) f
        """
    )


@query(
    "udf_arrow_optimized",
    oracle="""
    SELECT o_orderkey,
           CAST(len(string_split(o_orderpriority, '-')) AS BIGINT)
               AS n_parts,
           upper(o_orderpriority) AS pri_upper
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``): the same scalar
    signature as the classic pickled UDF, but arguments and results
    cross the JVM↔Python boundary as Arrow record batches instead of
    per-row pickles — the Spark ≥3.5 middle ground between
    ``udf_python_scalar`` (row serialization, the documented
    anti-pattern) and ``@pandas_udf`` (explicit Series API).

    Sits in the same plan position as any Python UDF (a batch-transfer
    eval node, never fused into codegen), so the rule stands: built-ins
    first, Arrow transfer when Python is unavoidable.
    """

    @F.udf("n_parts bigint, pri_upper string", useArrow=True)
    def split_pri(p: str):
        return (len(p.split("-")), p.upper())

    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", split_pri("o_orderpriority").alias("s"))
        .select(
            "o_orderkey",
            F.col("s.n_parts").alias("n_parts"),
            F.col("s.pri_upper").alias("pri_upper"),
        )
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               AS net_centpct,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'standard'
                ELSE 'sample' END AS tier
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``useArrow=True``) — the
    middle rung Spark 3.5+ added between the row-at-a-time pickle UDF
    and the full ``pandas_udf``: same per-value Python function
    signature, but arguments cross the boundary as Arrow batches, so
    serialization stops dominating.

    The function body mirrors the net-price + tier logic so the oracle
    is plain SQL; the net price is computed in exact integer
    cent-x-percent units (price and discount are 2dp source columns, so
    round(x*100) is exact — deriving floats and rounding per-row is the
    cross-engine trap this repo bans).  Still slower than the equivalent built-in
    expressions (see cond_funcs) — the 100 TB rule stands: Arrow UDFs
    for logic that genuinely needs Python, built-ins otherwise.
    """
    from pyspark.sql.types import LongType as _Long

    @F.udf(returnType=_Long(), useArrow=True)
    def net_centpct(price: float, discount: float) -> int:
        return int(round(price * 100)) * (100 - int(round(discount * 100)))

    @F.udf(returnType=StringType(), useArrow=True)
    def tier(qty: float) -> str:
        if qty >= 40:
            return "bulk"
        if qty >= 10:
            return "standard"
        return "sample"

    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        net_centpct("l_extendedprice", "l_discount").alias("net_centpct"),
        tier("l_quantity").alias("tier"),
    )


# --------------------------------------------------------------------------
# Grouped-agg pandas UDF as a WINDOW function (round 5)
# --------------------------------------------------------------------------


@query(
    "udf_pandas_window",
    oracle="""
    WITH d AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT)                    AS qty
        FROM lineitem WHERE l_suppkey < 50)
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(sum(cents * qty) OVER w * 10
                // (sum(qty) OVER w) AS BIGINT) AS wavg_millicents
    FROM d
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_orderkey, l_linenumber, cents, qty
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def udf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF evaluated OVER A BOUNDED WINDOW — the
    fifth vectorized-Python integration shape (scalar, grouped-map,
    grouped-agg, mapInPandas, and now window-agg): Spark ships each
    3-row frame to the same Arrow UDF that ``udaf_pandas_grouped_agg``
    uses in ``agg()``, proving one UDF definition serves both
    aggregation contexts.

    The frame is ROWS-bounded (2 PRECEDING), which Spark requires for
    pandas window UDFs, and the tie-broken ordering plus all-integer
    arithmetic (cents × integral qty summed as int64, floor-divided in
    milli-cent units) keep the rolling value engine-exact — a double
    quotient here lands on decimal ties whose round() direction the
    engines disagree on.  The supplier filter bounds the demo output;
    the dataflow is one window pass after one shuffle on the
    partition key, any data size.
    """
    import numpy as np

    @F.pandas_udf("long")
    def roll_wavg(cents: pd.Series, qty: pd.Series) -> int:
        c = cents.to_numpy(np.int64)
        q = qty.to_numpy(np.int64)
        return int((c * q).sum() * 10 // q.sum())

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") < 50
    ).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    # suppkey 0 carries a duplicate pair — so the frame ordering
    # tie-breaks on the value columns; rows equal on ALL four keys are
    # interchangeable within a frame, making the ordering total for
    # frame-content purposes.
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "cents", "qty")
        .rowsBetween(-2, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        roll_wavg("cents", "qty").over(w).alias("wavg_millicents"),
    )
