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

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "agg_global",
    oracle="""
    SELECT count(*)                          AS cnt,
           round(sum(l_quantity), 4)         AS sum_qty,
           round(avg(l_extendedprice), 4)    AS avg_price,
           min(l_extendedprice)              AS min_price,
           max(l_extendedprice)              AS max_price,
           min(CAST(l_shipdate AS DATE))     AS first_ship,
           max(CAST(l_shipdate AS DATE))     AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand totals, no keys (world-totals analog) — single-row result.

    Partial aggregation reduces each partition to one row before the
    1-partition final stage, so the exchanged volume is O(#partitions).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
    )


@query(
    "agg_ratio",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6)
               AS discount_rate,
           round(sum(l_quantity) / count(*), 6) AS qty_per_item
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived per-group ratio, sum(a)/sum(b) — the mortality-rate shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount"))
            / F.sum("l_extendedprice"),
            6,
        ).alias("discount_rate"),
        F.round(F.sum("l_quantity") / F.count(F.lit(1)), 6).alias("qty_per_item"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT c_nationkey,
           count(DISTINCT c_mktsegment) AS distinct_segments,
           count(DISTINCT c_custkey)    AS distinct_customers,
           count(*)                     AS cnt
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per nation (expand + two-phase agg in Spark)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("distinct_segments"),
        F.countDistinct("c_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query("agg_approx_distinct")  # weak: HLL++ estimate is engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for distincts.

    The sketch is associative (mergeable partials), so it scales where
    exact distinct's expand-shuffle does not.  Estimates differ across
    engines → rows-only check.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)              AS sd_qty,
           round(var_samp(l_quantity), 6)                 AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6)    AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Descriptive statistics per group (stddev/variance/corr/covar)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS p75
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (both engines interpolate
    linearly over the sorted group)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("p75"),
    )


@query("agg_approx_percentile")  # weak: GK-sketch estimate is engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna sketch quantiles — mergeable, bounded-memory,
    the percentile path that survives 100 TB (exact percentile needs a
    per-group sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = li.groupBy("l_linestatus").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(1000)
        ).alias("qs")
    )
    # One scalar column per quantile: the driver's canonicalizer cannot
    # hash array cells, and per-quantile columns are the friendlier API.
    return sketch.select(
        "l_linestatus",
        F.element_at("qs", 1).alias("p50"),
        F.element_at("qs", 2).alias("p90"),
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 30)            AS cnt_big,
           round(coalesce(sum(l_extendedprice)
                 FILTER (WHERE l_quantity > 30), 0), 4)        AS sum_big,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice ELSE 0 END), 4) AS sum_discounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if / sum(CASE WHEN ...) —
    cases-above-threshold counts analog."""
    li = load_table(spark, sf_dir, "lineitem")
    big = F.col("l_quantity") > 30
    return li.groupBy("l_returnflag").agg(
        F.count_if(big).alias("cnt_big"),
        F.round(
            F.coalesce(F.sum(F.when(big, F.col("l_extendedprice"))), F.lit(0.0)),
            4,
        ).alias("sum_big"),
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
                .otherwise(0.0)
            ),
            4,
        ).alias("sum_discounted"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
                    AS event_types,
           count(*) AS cnt
    FROM events
    GROUP BY user_id
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set per group, emitted sorted and comma-joined: the set
    aggregation runs distributed; the final string form keeps the output
    cell scalar (hashable by any result harness)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           grouping_id(r_name, n_name) AS gid,
           count(*)                    AS customer_cnt,
           round(sum(c_acctbal), 4)    AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals nation→region→grand (country→continent→world)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("customer_cnt"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping_id(l_returnflag, l_linestatus) AS gid,
           count(*)                                AS cnt,
           round(sum(l_quantity), 4)               AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                     AS cnt,
           round(sum(o_totalprice), 4)  AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL entry point."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*)                    AS cnt,
               round(sum(o_totalprice), 4) AS total
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


@query(
    "pivot_wide",
    oracle="""
    SELECT user_id,
           round(sum(value) FILTER (WHERE event_type = 'view'), 4)     AS view,
           round(sum(value) FILTER (WHERE event_type = 'click'), 4)    AS click,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 4) AS purchase,
           round(sum(value) FILTER (WHERE event_type = 'signup'), 4)   AS signup,
           round(sum(value) FILTER (WHERE event_type = 'error'), 4)    AS error
    FROM events
    GROUP BY user_id
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (JHU wide-format reshape analog).

    The pivot value list is EXPLICIT: implicit pivot first runs a
    distinct-values job over the whole table — a full extra pass that
    is banned at 100 TB (SURVEY.md §4.3.2).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum("value"), 4))
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_returnflag, var,
           CAST(count(*) AS BIGINT)                          AS cnt,
           CAST(sum(CAST(round(val * 100) AS BIGINT)) AS BIGINT)
                                                             AS sum_e2,
           min(val)                                          AS min_val,
           max(val)                                          AS max_val
    FROM (
        SELECT l_returnflag, var, val
        FROM lineitem
        UNPIVOT (val FOR var IN (l_quantity, l_extendedprice,
                                 l_discount, l_tax))
    )
    GROUP BY l_returnflag, var
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse reshape), summarized per
    (return-flag, variable) so the checked surface stays O(flags×4).

    The UNPIVOT itself still runs over the FULL lineitem (4 rows out
    per row in — 2.4M melted rows at sf0.1; the plan pins the Expand/
    Unpivot node), but the query emits a 24-row per-variable summary
    instead of the melted rows: r13 measured ~100 s of a 1080 s sweep
    going to the harness hashing 2.4M rows that the operator test adds
    nothing by re-checking.  Sums go through exact integer cents
    (round(val*100) per melted row, BIGINT sum) because all four
    melted metrics are ≤2dp — a double sum over 600k values is
    accumulation-order-dependent and would flap across partitionings;
    the outer CAST collapses DuckDB's silent sum(BIGINT)→HUGEINT
    widening.  min/max are order-free and stay double."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "var",
        "val",
    )
    return melted.groupBy("l_returnflag", "var").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col("val") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_e2"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS bin,
           CAST((CAST(round(o_totalprice * 100) AS BIGINT) // 5000000)
               * 50000.0 AS DOUBLE) AS bin_lo,
           count(*)                    AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value ($50k bins) — the profiling
    aggregate behind every size/latency distribution dashboard.

    Binning goes through exact integer cents (round to cents, then
    integer-divide by 5,000,000) so the bin edge decision can never
    fall to a floating-point ulp — the bin id is identical arithmetic
    in both engines.  One groupBy on a derived dense key; partial
    aggregation collapses each partition to its ≤~40 local bins before
    the shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    bin_id = F.expr(
        "CAST(round(o_totalprice * 100) AS BIGINT) div 5000000"
    )
    return (
        o.select("o_totalprice", bin_id.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .select(
            "bin",
            (F.col("bin") * 50000.0).alias("bin_lo"),
            "cnt",
            "total",
        )
    )


@query(
    "agg_mode",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_count
    FROM (
        SELECT l_returnflag, l_quantity, count(*) AS c,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY count(*) DESC, l_quantity) AS rk
        FROM lineitem
        GROUP BY l_returnflag, l_quantity)
    WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) with a deterministic
    tie-break — engine-native ``mode()`` functions break ties
    arbitrarily, so the portable form is count → rank → slice.

    Two-level shape: the (group, value) count is a partial+final
    aggregate over the fact; the window then ranks only the ≤|distinct
    values| aggregated rows per group — window cardinality is bounded
    by the value domain, not the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("c"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("c").alias("mode_count"),
        )
    )


@query(
    "agg_corr_exact",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               count(*)                                        AS n,
               sum(CAST(l_quantity AS BIGINT))                 AS sx,
               sum(CAST(round(l_extendedprice) AS BIGINT))     AS sy,
               sum(CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT))               AS sxx,
               sum(CAST(round(l_extendedprice) AS BIGINT)
                   * CAST(round(l_extendedprice) AS BIGINT))   AS syy,
               sum(CAST(l_quantity AS BIGINT)
                   * CAST(round(l_extendedprice) AS BIGINT))   AS sxy
        FROM lineitem
        GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS corr_qty_price
    FROM m
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact integer moments — the
    deterministic twin of ``corr()``.

    Engine-native ``corr`` folds doubles in partition order, so its
    last ulp (and a 6-dp rounding boundary) can differ between engines
    and even between runs with different partitioning.  Here the five
    moments are exact BIGINT sums (quantity, dollar-grain price —
    overflow-safe to ~sf100), and the one float combination at the end
    maps identical integers through identical IEEE ops in both engines.
    This is also the scale-correct shape: moments combine
    associatively, so partial aggregation works map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    corr = (nd * F.col("sxy") - sxd * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - sxd * F.col("sx"))
        * (nd * F.col("syy") - syd * F.col("sy"))
    )
    return m.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price")
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           count(*)                                    AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: ``listagg(...) WITHIN GROUP (ORDER
    BY ...)`` — the ANSI 2016 form Spark 4 added natively.

    The WITHIN GROUP ordering is what makes the result deterministic
    (and therefore oracle-able): an unordered listagg reflects shuffle
    arrival order.  Output is a flat string, so the driver harness can
    hash it (nested arrays cannot).  Scale note: listagg is a regular
    ObjectHashAggregate — partial per-group buffers merge on the one
    groupBy shuffle, and group payload is bounded by the group's own
    text, not the table.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_la_nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("v_la_region")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations,
               count(*) AS n_nations
        FROM v_la_nation n JOIN v_la_region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@query(
    "agg_mad",
    oracle="""
    WITH med AS (
        SELECT l_returnflag, median(l_extendedprice) AS m
        FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag,
           round(max(med.m), 4)                                AS median_price,
           round(median(abs(l.l_extendedprice - med.m)), 4)    AS mad_price
    FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust dispersion statistic —
    as an exact two-phase aggregate.

    MAD needs the median twice (center, then deviations from it), so
    no single aggregation pass can produce it: phase one computes the
    per-group median, phase two broadcasts that tiny table back onto
    the scan and takes the median of |x − m|.  Interpolating medians
    over identical doubles agree bit-for-bit across engines.  At
    100 TB the same topology holds with ``approx_percentile`` partials
    replacing the exact sort — the two-phase broadcast-back shape is
    the point.
    """
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("m")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.max("m"), 4).alias("median_price"),
            F.round(
                F.expr("percentile(abs(l_extendedprice - m), 0.5)"), 4
            ).alias("mad_price"),
        )
    )


@query("agg_sketch_rollup")  # approximate sketch — rows-only check by design
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count sketches: per-(event_type, day)
    HyperLogLog sketches of user_id, merged up to per-event_type totals
    with ``hll_union_agg`` — the pre-aggregation pattern that makes
    distinct counts cheap at 100 TB (daily sketch tables are tiny and
    re-mergeable to any coarser grain without rescanning facts;
    an exact countDistinct re-shuffles the raw corpus every rollup).

    DataSketches HLL is deterministic for a given input set but not
    reproducible in DuckDB, so this is a declared-weak rows-only check;
    `tests/test_properties.py` bounds the estimate against the exact
    count instead.
    """
    ev = load_table(spark, sf_dir, "events")
    daily_sk = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily_sk.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_users"
            ),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               round(l_extendedprice, 2) AS price,
               l_quantity                AS wt
        FROM lineitem),
    o AS (
        SELECT l_returnflag, price, wt,
               sum(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY price, wt
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum,
               sum(wt) OVER (PARTITION BY l_returnflag) AS tot
        FROM w)
    SELECT l_returnflag,
           min(price)              AS weighted_median,
           CAST(any_value(tot) AS DOUBLE) AS total_weight
    FROM o
    WHERE cum * 2 >= tot
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the first price
    whose cumulative weight reaches half the group total — the
    weighted-quantile aggregate (resource-usage billing, weighted SLO
    percentiles) that ``percentile`` cannot express.

    One partitioned running-sum window over (price, weight)-ordered
    rows, then a min over the qualifying suffix — no sort beyond the
    window's, no second scan.  The cumulative weights are exact
    integer/decimal sums on an explicit total order (price then
    weight), so the crossing row is engine-independent; the threshold
    test ``2·cum ≥ tot`` stays in integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.round("l_extendedprice", 2).alias("price"),
        F.col("l_quantity").alias("wt"),
    )
    cum_w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    o = w.select(
        "l_returnflag",
        "price",
        F.sum("wt").over(cum_w).alias("cum"),
        F.sum("wt").over(tot_w).alias("tot"),
    )
    return (
        o.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.any_value("tot").cast("double").alias("total_weight"),
        )
    )


@query(
    "agg_decimal_exact",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18, 2)))
                   AS gross,
               sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18, 2))
                   * (1 - CAST(round(l_discount, 2) AS DECIMAL(4, 2))))
                   AS net,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(gross * 100 AS BIGINT)                 AS gross_cents,
           CAST(floor(net) AS BIGINT)                  AS net_units,
           CAST((net - floor(net)) * 10000 AS BIGINT)  AS net_frac_e4,
           cnt
    FROM sums
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation in exact DECIMAL arithmetic: gross and
    discounted revenue per return flag, accumulated as wide decimals
    and emitted as scaled integers.

    The ledger-grade twin of ``agg_groupby``: double sums are
    accumulation-order-dependent (different partitionings of the same
    100 TB give different cents), while decimal sums are exact
    integers underneath — associative, partition-order-free, and
    auditable.  Doubles cross into decimal only where the data is
    already exactly 2dp (price, discount), and the discount product is
    computed IN decimal, so neither engine ever rounds a derived float
    at a half-cent boundary.

    Output contract (hash-safe AND overflow-safe at 100 TB):
    DECIMAL-typed OUTPUT columns of any precision are banned from the
    checked surface — cross-engine drivers render decimals through
    float64 whose shortest-repr drops trailing zeros ('…8990' →
    '…899'), so bit-identical values still hash-mismatch (see
    tools/scan_oracle_types.py, which flags every decimal output).
    The accumulators stay WIDE (Spark auto-widens sum(decimal(18,2))
    to decimal(28,2); DuckDB likewise), then the emit step converts to
    INT64-backed integers without ever narrowing precision mid-sum:

    - ``gross_cents = gross * 100`` — per-flag gross is ~1e15 currency
      units at SF 1e5 (~100 TB), so cents peak ~1e17: 92× inside
      INT64.
    - ``net`` is SPLIT into ``net_units`` (floor, whole currency
      units, ~1e15 — 4 orders inside INT64) and ``net_frac_e4`` (the
      scale-4 remainder in [0, 9999]) instead of a single ``net *
      10000`` that would hit ~1e19 and silently NULL under Spark's
      non-ANSI decimal overflow while DuckDB throws.  Both engines
      keep floor/subtract in the decimal domain (verified: DuckDB
      floor(DECIMAL(38,4)) → DECIMAL(38,0), exact past 2^53), and
      every emitted value is integral before the BIGINT cast, so
      truncate-vs-round cast semantics can never diverge.  net >= 0
      (price > 0, discount <= 1), so floor == truncation on both
      sides.
    """
    li = load_table(spark, sf_dir, "lineitem")
    gross_d = F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")
    disc_d = F.round(F.col("l_discount"), 2).cast("decimal(4,2)")
    net_d = gross_d * (F.lit(1).cast("decimal(4,2)") - disc_d)
    sums = li.groupBy("l_returnflag").agg(
        F.sum(gross_d).alias("gross"),  # decimal(28,2): wide accumulator
        F.sum(net_d).alias("net"),      # decimal(33,4)
        F.count(F.lit(1)).alias("cnt"),
    )
    net = F.col("net")
    return sums.select(
        "l_returnflag",
        (F.col("gross") * 100).cast("bigint").alias("gross_cents"),
        F.floor(net).cast("bigint").alias("net_units"),
        ((net - F.floor(net)) * 10000).cast("bigint").alias("net_frac_e4"),
        "cnt",
    )


@query(
    "agg_bool_funcs",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
               AS n_large,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(max(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN o_orderkey END) AS BIGINT)
               AS max_urgent_key
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bool_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: ``count_if``, ``every``
    (bool_and), ``some`` (bool_or), and a conditional max — the
    predicate-summary surface (SLO checks, data contracts, "did any
    row violate X" gates) in one partial+final aggregate.

    Booleans fold associatively like any other aggregate — AND/OR
    partials merge exactly — so these run map-side-combined at any
    scale; no float anywhere, bit-identical across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(urgent).alias("any_urgent"),
        F.max(F.when(urgent, F.col("o_orderkey"))).alias("max_urgent_key"),
    )


#: Shared raw->central moment arithmetic for the shape statistics —
#: written once and mirrored verbatim in the SQL oracle so both engines
#: evaluate the identical IEEE expression tree over identical integers.
_SHAPE_SQL = """
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round(mu, 6) AS mean,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM (
        SELECT event_type, n, mu, m2,
               s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu AS m3,
               s4 / n - 4.0 * mu * (s3 / n)
                    + 6.0 * mu * mu * (s2 / n) - 3.0 * mu * mu * mu * mu
                   AS m4
        FROM (
            SELECT event_type,
                   CAST(count(*) AS DOUBLE)        AS n,
                   CAST(sum(v) AS DOUBLE)          AS s1,
                   CAST(sum(v * v) AS DOUBLE)      AS s2,
                   CAST(sum(v * v * v) AS DOUBLE)  AS s3,
                   CAST(sum(v * v * v * v) AS DOUBLE) AS s4,
                   CAST(sum(v) AS DOUBLE) / count(*) AS mu,
                   CAST(sum(v * v) AS DOUBLE) / count(*)
                       - (CAST(sum(v) AS DOUBLE) / count(*))
                         * (CAST(sum(v) AS DOUBLE) / count(*)) AS m2
            FROM (SELECT event_type,
                         CAST(round(value) AS BIGINT) AS v FROM events)
            GROUP BY event_type))
"""


@query("agg_skew_kurtosis", oracle=_SHAPE_SQL)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shape per event type: population skewness and
    excess kurtosis from exact integer power sums — the moment
    statistics that tell a monitoring pipeline WHICH way a metric's
    distribution is deformed (fat tail vs lean, left vs right) before
    any threshold fires.

    The engine's built-in ``skewness``/``kurtosis`` accumulate float
    central moments whose partial-merge order varies with
    partitioning — the same nondeterminism class that bit
    ``regr_slope`` in round 2 — so this computes Σv, Σv², Σv³, Σv⁴ as
    exact BIGINTs (dollar-quantized values keep Σv⁴ < 2⁶³ through
    sf1) in ONE partial+final aggregate, then derives central moments
    in a fixed expression tree mirrored verbatim in the oracle.
    Order-independent at any cluster size, bit-identical across
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.round("value").cast("long")
    base = ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("v").cast("double").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).cast("double").alias("s3"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v"))
        .cast("double")
        .alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3.0 * mu * (F.col("s2") / F.col("n")) + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4.0 * mu * (F.col("s3") / F.col("n"))
        + 6.0 * mu * mu * (F.col("s2") / F.col("n"))
        - 3.0 * mu * mu * mu * mu
    )
    return base.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(mu, 6).alias("mean"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(count(*) AS BIGINT)   AS cnt
        FROM lineitem
        GROUP BY 1, 2),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY cnt DESC, qty ASC) AS rk
        FROM counts)
    SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count
    FROM ranked WHERE rk = 1
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode per group with a total tie order (count desc, value
    asc) — engines' built-in ``mode()`` breaks ties arbitrarily, which
    is exactly what a reproducible pipeline cannot have.

    Two-level aggregate: count per (group, value) — map-side
    combinable, shuffle carries distinct pairs only — then a
    ``row_number`` over the per-group count table.  No sort of the
    fact table, no collect.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("qty")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )


#: Integer-unit encodings of the four lineitem measures for the exact
#: correlation matrix: quantity is integral, the money/rate columns are
#: exact 2-dp → integer cents/centi-units.
_CORR_VARS = {
    "quantity": "CAST(l_quantity AS BIGINT)",
    "price_cents": "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "discount_c": "CAST(round(l_discount * 100) AS BIGINT)",
    "tax_c": "CAST(round(l_tax * 100) AS BIGINT)",
}


def _corr_oracle() -> str:
    pairs = []
    names = list(_CORR_VARS)
    exprs = [f"{sql} AS {n}" for n, sql in _CORR_VARS.items()]
    moments = ["CAST(count(*) AS BIGINT) AS n"]
    for n in names:
        moments.append(f"sum(CAST({n} AS DECIMAL(38, 0))) AS s_{n}")
        moments.append(
            f"sum(CAST({n} AS DECIMAL(38, 0)) * {n}) AS q_{n}_{n}"
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            moments.append(
                f"sum(CAST({a} AS DECIMAL(38, 0)) * {b}) AS q_{a}_{b}"
            )
            pairs.append((a, b))
    sel = []
    for a, b in pairs:
        num = (
            f"(CAST(n AS DOUBLE) * CAST(q_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        den = (
            f"sqrt((CAST(n AS DOUBLE) * CAST(q_{a}_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * (CAST(n AS DOUBLE) * CAST(q_{b}_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        sel.append(
            f"SELECT '{a}' AS var_x, '{b}' AS var_y, "
            f"round({num} / {den}, 6) AS corr FROM m"
        )
    return (
        "WITH base AS (SELECT " + ", ".join(exprs) + " FROM lineitem), "
        "m AS (SELECT " + ", ".join(moments) + " FROM base) "
        + " UNION ALL ".join(sel)
    )


@query("agg_corr_matrix", oracle=_corr_oracle())
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the fact table's four
    measures, exact to the last bit before the final 6-dp round.

    One aggregation pass computes all 14 moments (counts, sums, squares,
    cross-products) with DECIMAL(38,0) accumulators over integer-unit
    encodings — no float sums, so the result is independent of
    partitioning and row order in BOTH engines (the property a
    double-sum corr() can never give you across engines).  The 6
    correlations are then pure scalar math on one broadcastable row.
    A 100 TB corr matrix is therefore exactly one scan + one 14-number
    combine.

    r14 note (guide §1.3, measured): a ``spread`` of the scan was
    tried and REVERTED — the partial-aggregate pass already runs at
    the scan's 3-task parallelism, and round-robin-shuffling the raw
    rows from those same 3 tasks costs more than the parallel decimal
    math buys back (drill medians 2.14 s → 2.49 s).  Single-pass
    partial+final over the scan is the floor for this layout.
    """
    li = load_table(spark, sf_dir, "lineitem")
    names = list(_CORR_VARS)
    base = li.select(
        *[F.expr(sql).alias(n) for n, sql in _CORR_VARS.items()]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for n in names:
        dec = F.col(n).cast("decimal(38,0)")
        aggs.append(F.sum(dec).alias(f"s_{n}"))
        aggs.append(F.sum(dec * F.col(n)).alias(f"q_{n}_{n}"))
    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast("decimal(38,0)") * F.col(b)).alias(
                    f"q_{a}_{b}"
                )
            )
            pairs.append((a, b))
    m = base.agg(*aggs)
    # All six correlations as columns of the ONE aggregate row, then
    # stack() to unpivot — a union of per-pair selects would duplicate
    # the whole aggregate subtree (and its scan) once per pair.
    corr_cols = []
    for a, b in pairs:
        n = F.col("n").cast("double")
        num = n * F.col(f"q_{a}_{b}").cast("double") - F.col(
            f"s_{a}"
        ).cast("double") * F.col(f"s_{b}").cast("double")
        den = F.sqrt(
            (
                n * F.col(f"q_{a}_{a}").cast("double")
                - F.col(f"s_{a}").cast("double")
                * F.col(f"s_{a}").cast("double")
            )
            * (
                n * F.col(f"q_{b}_{b}").cast("double")
                - F.col(f"s_{b}").cast("double")
                * F.col(f"s_{b}").cast("double")
            )
        )
        corr_cols.append(F.round(num / den, 6).alias(f"corr_{a}_{b}"))
    wide = m.select(*corr_cols)
    stack_args = ", ".join(
        f"'{a}', '{b}', corr_{a}_{b}" for a, b in pairs
    )
    return wide.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (var_x, var_y, corr)"
        )
    )



# --------------------------------------------------------------------------
# Discrete (order-statistic) percentiles (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_percentile_disc",
    oracle="""
    WITH ordered AS (
        SELECT l_linestatus, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_linestatus
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY l_linestatus) AS n
        FROM lineitem)
    SELECT l_linestatus,
           max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                    THEN l_extendedprice END) AS p25_disc,
           max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN l_extendedprice END) AS p50_disc,
           max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                    THEN l_extendedprice END) AS p90_disc
    FROM ordered GROUP BY l_linestatus
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC WITHIN GROUP — the order-statistic quantile that
    returns an actual data value (smallest value whose cumulative
    distribution reaches p), complementing the interpolating
    ``agg_percentile``.

    Returned values are untouched input doubles, so there is no float
    arithmetic to diverge — the only cross-engine risk is the SELECTION
    rule, which the oracle pins to Spark's definition explicitly
    (value at row ceil(p·n) of the sorted group) rather than trusting
    DuckDB's quantile_disc indexing to agree.  Exact discrete
    percentiles need the per-group sorted order; at 100 TB the
    approx_percentile sketch replaces this, which is why both live in
    the inventory.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_pdisc")
    return spark.sql(
        """
        SELECT l_linestatus,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)
                   AS p25_disc,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)
                   AS p50_disc,
               percentile_disc(0.90) WITHIN GROUP (ORDER BY l_extendedprice)
                   AS p90_disc
        FROM li_pdisc GROUP BY l_linestatus
        """
    )


# --------------------------------------------------------------------------
# Winsorized mean over integer values with order-statistic bounds (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH q AS (
        SELECT l_linestatus, CAST(round(l_quantity) AS BIGINT) AS v,
               l_orderkey, l_linenumber
        FROM lineitem),
    ordered AS (
        SELECT l_linestatus, v,
               row_number() OVER (
                   PARTITION BY l_linestatus
                   ORDER BY v, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY l_linestatus) AS n
        FROM q),
    bounds AS (
        SELECT l_linestatus,
               max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                        THEN v END) AS lo,
               max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                        THEN v END) AS hi
        FROM ordered GROUP BY l_linestatus)
    SELECT q.l_linestatus, b.lo, b.hi,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(least(greatest(q.v, b.lo), b.hi)) AS DOUBLE)
                 / count(*), 6) AS winsorized_mean
    FROM q JOIN bounds b ON b.l_linestatus = q.l_linestatus
    GROUP BY q.l_linestatus, b.lo, b.hi
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-winsorized mean of line quantity per line status: values are
    clamped to the [p05, p95] order statistics before averaging — the
    robust location estimate that survives fat-tailed metrics.

    Two passes over the corpus, both associative: the bounds come from
    PERCENTILE_DISC (actual data values — integers here, so the
    clamped values stay exact integers and the final mean is one
    division of an exact BIGINT sum), then the clamp+mean aggregates
    with the 3-row bounds table broadcast onto the scan.  The oracle
    pins the percentile selection rule explicitly (row ceil(p·n) of
    the sorted group) so both engines choose identical bounds.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        "l_linestatus",
        F.round("l_quantity").cast("long").alias("v"),
    ).createOrReplaceTempView("li_wins")
    bounds = spark.sql(
        """
        SELECT l_linestatus,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS hi
        FROM li_wins GROUP BY l_linestatus
        """
    ).select(
        "l_linestatus",
        # percentile_disc returns DOUBLE even over integer input; the
        # selected value IS an integer datum, so the cast is exact.
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
    )
    q = li.select(
        "l_linestatus", F.round("l_quantity").cast("long").alias("v")
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        q.join(F.broadcast(bounds), "l_linestatus")
        .groupBy("l_linestatus", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean"),
        )
    )


# --------------------------------------------------------------------------
# Geometric mean via ordered fold over the value domain (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_geometric_mean",
    oracle="""
    WITH counts AS (
        SELECT l_linestatus, CAST(round(l_quantity) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem WHERE l_quantity >= 1
        GROUP BY 1, 2),
    folded AS (
        SELECT l_linestatus,
               CAST(sum(cnt) AS BIGINT) AS n,
               list_reduce(
                   list_prepend(0.0, list(cnt * ln(v) ORDER BY v)),
                   (acc, t) -> acc + t) AS log_sum
        FROM counts GROUP BY l_linestatus)
    SELECT l_linestatus, n,
           round(log_sum / n, 6) AS log_gmean,
           round(exp(log_sum / n), 6) AS geo_mean
    FROM folded
    """,
)
def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of line quantity per line status — the
    multiplicative average exp(mean(ln x)) that a skewed positive
    metric (latency, file size, token count) actually wants.

    A naive sum(ln x) is an order-dependent double accumulation (the
    forbidden cross-engine pattern); instead the value domain
    collapses to exact per-value counts first, and the log-sum is a
    SEQUENTIAL fold over the ≤|domain| (value-ordered) terms —
    Spark's F.aggregate and DuckDB's list_reduce execute the identical
    chain of IEEE adds, so the sum is bit-equal by construction (the
    repo's proven fold-equality pattern).  ln over exact-integer
    arguments matches across engines; the corpus itself is touched by
    one associative count aggregate only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = (
        li.filter(F.col("l_quantity") >= 1)
        .groupBy(
            "l_linestatus",
            F.round("l_quantity").cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    folded = counts.groupBy("l_linestatus").agg(
        F.sum("cnt").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("v", "cnt"))),
            F.lit(0.0),
            lambda acc, t: acc
            + t.getField("cnt") * F.log(t.getField("v")),
        ).alias("log_sum"),
    )
    return folded.select(
        "l_linestatus",
        "n",
        F.round(F.col("log_sum") / F.col("n"), 6).alias("log_gmean"),
        F.round(F.exp(F.col("log_sum") / F.col("n")), 6).alias("geo_mean"),
    )


# --------------------------------------------------------------------------
# Theil inequality index per segment (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_theil_index",
    oracle="""
    WITH cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    seg AS (
        SELECT segment, cents,
               CAST(sum(cents) OVER (PARTITION BY segment) AS BIGINT)
                   AS seg_cents,
               CAST(count(*) OVER (PARTITION BY segment) AS BIGINT)
                   AS n_cust
        FROM cust),
    t AS (
        SELECT segment, n_cust, seg_cents,
               CAST(round(1e6 * (CAST(cents AS DOUBLE) / seg_cents)
                    * ln(CAST(cents * n_cust AS DOUBLE) / seg_cents))
                    AS BIGINT) AS term
        FROM seg)
    SELECT segment,
           CAST(max(n_cust) AS BIGINT)    AS n_cust,
           CAST(max(seg_cents) AS BIGINT) AS tot_cents,
           CAST(sum(term) AS BIGINT)      AS theil_unats
    FROM t GROUP BY segment
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend within each market
    segment — the decomposable inequality measure that complements the
    registry's Gini (``report_gini_concentration``) and Lorenz curve:
    T = Σᵢ (xᵢ/X)·ln(xᵢ·n/X), zero under perfect equality, ln(n) at
    full concentration.

    One aggregate collapses orders to customer grain; segment totals
    come from window sums over that (already small) grain, and each
    customer's contribution is quantized to integer micro-nats before
    the final sum — so the per-segment index is an exact integer
    regardless of partitioning or accumulation order, the same
    discipline as ``ml_mutual_information``.
    """
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    cust = (
        od.join(
            F.broadcast(cu.select("c_custkey", "c_mktsegment")),
            od.o_custkey == cu.c_custkey,
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    wseg = Window.partitionBy("segment")
    seg = cust.select(
        "segment",
        "cents",
        F.sum("cents").over(wseg).alias("seg_cents"),
        F.count(F.lit(1)).over(wseg).alias("n_cust"),
    )
    term = F.round(
        1e6
        * (F.col("cents").cast("double") / F.col("seg_cents"))
        * F.log(
            (F.col("cents") * F.col("n_cust")).cast("double")
            / F.col("seg_cents")
        )
    ).cast("long")
    return (
        seg.select("segment", "n_cust", "seg_cents", term.alias("term"))
        .groupBy("segment")
        .agg(
            F.max("n_cust").alias("n_cust"),
            F.max("seg_cents").alias("tot_cents"),
            F.sum("term").alias("theil_unats"),
        )
    )


# --------------------------------------------------------------------------
# Herfindahl–Hirschman concentration index (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH sup AS (
        SELECT l_returnflag AS flag, l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2),
    sh AS (
        SELECT flag, l_suppkey,
               CAST(round(1e6 * CAST(cents AS DOUBLE)
                    / sum(cents) OVER (PARTITION BY flag)) AS BIGINT)
                   AS share_ppm
        FROM sup)
    SELECT flag,
           CAST(count(*) AS BIGINT)                    AS n_suppliers,
           CAST(sum(share_ppm * share_ppm) AS BIGINT)  AS hhi_scaled
    FROM sh GROUP BY flag
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    within each return-flag market — the antitrust-style concentration
    scalar that complements the registry's Gini/Lorenz/Pareto family
    (HHI weights the LARGEST shares quadratically, so it moves first
    when one supplier starts dominating).

    One aggregate to supplier grain, a window share over that grain,
    then Σ share² — with shares quantized to integer ppm BEFORE
    squaring, so the index (scaled by 10¹²) is an exact integer sum:
    no order-dependent double accumulation, and the ppm² products
    (≤ 10¹²·n) stay far inside BIGINT at any supplier count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = li.groupBy(F.col("l_returnflag").alias("flag"), "l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents")
    )
    sh = sup.select(
        "flag",
        F.round(
            1e6
            * F.col("cents").cast("double")
            / F.sum("cents").over(Window.partitionBy("flag"))
        )
        .cast("long")
        .alias("share_ppm"),
    )
    return sh.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("share_ppm") * F.col("share_ppm")).alias("hhi_scaled"),
    )


# --------------------------------------------------------------------------
# Argument-extrema aggregates (max_by / min_by) (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_arg_minmax",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               printf('%020d|%020d|%020d',
                      CAST(round(l_extendedprice * 100) AS BIGINT),
                      l_orderkey, l_partkey) AS ordkey
        FROM lineitem)
    SELECT l_returnflag,
           CAST(arg_max(l_partkey, ordkey) AS BIGINT) AS top_part,
           CAST(max(cents) AS BIGINT)                 AS top_cents,
           CAST(arg_min(l_partkey, ordkey) AS BIGINT) AS bottom_part,
           CAST(min(cents) AS BIGINT)                 AS bottom_cents
    FROM c GROUP BY l_returnflag
    """,
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argument-extrema aggregates: WHICH part carried the priciest and
    cheapest line per return flag, via ``max_by``/``min_by`` — the
    aggregate that answers "the value at the extreme", replacing the
    window-rank-filter detour (rank, filter rn = 1) with one
    partial+final aggregate and no sort at all.

    Determinism is the trap with arg-extrema: ties in the ordering
    value make the result engine- and partitioning-dependent.  Both
    sides therefore maximize the composite (cents, orderkey, partkey)
    — a strict total order, so the winning row is unique by
    construction — encoded as one fixed-width zero-padded string
    because DuckDB's ``arg_max`` takes scalar keys only (lexicographic
    order on %020d fields equals numeric order for non-negatives).
    One shuffle of 5 partial rows per mapper.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    c = li.select(
        "l_returnflag",
        "l_partkey",
        cents.alias("cents"),
        F.format_string(
            "%020d|%020d|%020d", cents, F.col("l_orderkey"),
            F.col("l_partkey")
        ).alias("ordkey"),
    )
    return c.groupBy("l_returnflag").agg(
        F.max_by("l_partkey", F.col("ordkey")).alias("top_part"),
        F.max("cents").alias("top_cents"),
        F.min_by("l_partkey", F.col("ordkey")).alias("bottom_part"),
        F.min("cents").alias("bottom_cents"),
    )


# --------------------------------------------------------------------------
# Frequency moments F0/F1/F2 (round 5)
# --------------------------------------------------------------------------


@query(
    "agg_frequency_moments",
    oracle="""
    WITH f AS (
        SELECT 'event_type' AS col, event_type AS v,
               CAST(count(*) AS BIGINT) AS freq
        FROM events GROUP BY v
        UNION ALL
        SELECT 'user_id', CAST(user_id AS VARCHAR),
               CAST(count(*) AS BIGINT)
        FROM events GROUP BY user_id)
    SELECT col,
           CAST(count(*) AS BIGINT)          AS f0_distinct,
           CAST(sum(freq) AS BIGINT)         AS f1_count,
           CAST(sum(freq * freq) AS BIGINT)  AS f2_selfjoin,
           round(CAST(sum(freq * freq) AS DOUBLE) * count(*)
                 / (CAST(sum(freq) AS DOUBLE) * sum(freq)), 6)
               AS skew_ratio
    FROM f GROUP BY col
    """,
)
def agg_frequency_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency moments of the two natural event-stream keys: F0
    (distinct values), F1 (stream length) and F2 (Σ f² — the
    self-join size / "surprise number" from the AMS sketch literature)
    plus the normalized skew ratio F2·F0/F1² (1 = uniform; large =
    heavy-hitter-dominated) — the numbers a query planner wants
    BEFORE choosing a join strategy on that key, computed exactly.

    Each key collapses to its frequency table with one associative
    count (the only full-data passes), then the moments are one more
    tiny aggregate; everything integer until the final ratio.  F2 on
    a 100 TB key would use the AMS/CountSketch estimate — this exact
    version is the oracle such a sketch calibrates against, the same
    pairing as ``agg_approx_distinct`` vs ``agg_count_distinct``.
    """
    ev = load_table(spark, sf_dir, "events")
    f1 = ev.groupBy(F.col("event_type").alias("v")).agg(
        F.count(F.lit(1)).alias("freq")
    ).select(F.lit("event_type").alias("col"), "v", "freq")
    f2 = ev.groupBy(
        F.col("user_id").cast("string").alias("v")
    ).agg(F.count(F.lit(1)).alias("freq")).select(
        F.lit("user_id").alias("col"), "v", "freq"
    )
    f = f1.unionAll(f2)
    return f.groupBy("col").agg(
        F.count(F.lit(1)).alias("f0_distinct"),
        F.sum("freq").alias("f1_count"),
        F.sum(F.col("freq") * F.col("freq")).alias("f2_selfjoin"),
        F.round(
            F.sum(F.col("freq") * F.col("freq")).cast("double")
            * F.count(F.lit(1))
            / (F.sum("freq").cast("double") * F.sum("freq")),
            6,
        ).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# Round 7: strong-oracle error-envelope companions for the weak sketches
# --------------------------------------------------------------------------
# The three sketch queries (`agg_approx_distinct`, `agg_approx_percentile`,
# `agg_sketch_rollup`) are declared weak by design — their estimates are
# engine-specific, so no DuckDB oracle can hash-match them.  These
# companions turn the error ENVELOPE into a strong check the external
# sweep can hash: Spark computes both the sketch estimate and the exact
# value, emits the exact value plus an in-band flag, and the oracle
# asserts the exact value and a literal 1 — an out-of-envelope sketch
# becomes a hash mismatch instead of an invisible rows-only pass.  The
# envelopes match tests/test_properties.py (±max(3, 15%) for HLL++ at
# rsd 0.02, ±max(2, 5%) for merged DataSketches HLL at lgK 12, and a
# ±0.05-rank continuous-percentile bracket for GK at accuracy 1000 —
# each orders of magnitude looser than the sketch's guarantee, so the
# flag is deterministic at any sf while still catching a broken sketch).


@query(
    "agg_approx_distinct_band",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(1 AS INTEGER) AS within_band
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ error-envelope audit: the rsd-0.02 sketch estimate must
    sit within ±max(3, 15%·exact) of the exact distinct per group.

    One aggregate computes both (the exact distinct is the expensive
    path the sketch replaces at 100 TB — here it IS the check, which
    is the point of an audit query: run it on a sample or one
    partition shard in production).
    """
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("est"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    band = F.greatest(
        F.lit(3.0), F.col("exact_customers").cast("double") * 0.15
    )
    return g.select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers")).cast("double")
            <= band
        )
        .cast("int")
        .alias("within_band"),
    )


@query(
    "agg_approx_percentile_band",
    oracle="""
    SELECT l_linestatus,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.90), 6) AS p90_exact,
           CAST(1 AS INTEGER) AS p50_in_band,
           CAST(1 AS INTEGER) AS p90_in_band
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_approx_percentile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch error-envelope audit: the accuracy-1000 approximate
    p50/p90 (rank error ≤ 0.1%) must land inside the exact continuous
    [p±5] percentile bracket — 50× the sketch's guarantee, so the flag
    cannot flap, while a broken sketch (wrong merge, wrong rank math)
    lands far outside.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_linestatus").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(1000)
        ).alias("qs"),
        F.percentile("l_extendedprice", F.lit(0.45)).alias("p45"),
        F.percentile("l_extendedprice", F.lit(0.50)).alias("p50"),
        F.percentile("l_extendedprice", F.lit(0.55)).alias("p55"),
        F.percentile("l_extendedprice", F.lit(0.85)).alias("p85"),
        F.percentile("l_extendedprice", F.lit(0.90)).alias("p90"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    a50 = F.element_at("qs", 1)
    a90 = F.element_at("qs", 2)
    return g.select(
        "l_linestatus",
        F.round("p50", 6).alias("p50_exact"),
        F.round("p90", 6).alias("p90_exact"),
        ((F.col("p45") <= a50) & (a50 <= F.col("p55")))
        .cast("int")
        .alias("p50_in_band"),
        ((F.col("p85") <= a90) & (a90 <= F.col("p95")))
        .cast("int")
        .alias("p90_in_band"),
    )


@query(
    "agg_sketch_rollup_band",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE))
                AS BIGINT) AS n_daily_sketches,
           CAST(1 AS INTEGER) AS within_band
    FROM events
    GROUP BY event_type
    """,
)
def agg_sketch_rollup_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-HLL error-envelope audit: daily DataSketches HLL
    sketches unioned to event_type grain must estimate the exact
    distinct-user count within ±max(2, 5%·exact) — the same mergeable
    dataflow as ``agg_sketch_rollup``, with the envelope made a
    hashable output instead of a local-only property test.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    band = F.greatest(F.lit(2.0), F.col("exact_users").cast("double") * 0.05)
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        "n_daily_sketches",
        (F.abs(F.col("est") - F.col("exact_users")).cast("double") <= band)
        .cast("int")
        .alias("within_band"),
    )


def _theta_priority_sketches(spark: SparkSession, sf_dir: str):
    """Theta sketches of o_custkey for the URGENT and LOW order slices
    (1-row frames) — shared by the set-ops estimate and its band."""
    o = load_table(spark, sf_dir, "orders")
    sk = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).groupBy("o_orderpriority").agg(
        F.theta_sketch_agg("o_custkey").alias("sk")
    )
    a = sk.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("sk").alias("ska")
    )
    b = sk.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("sk").alias("skb")
    )
    return a.crossJoin(b)


@query("agg_theta_set_ops")  # approximate sketch — rows-only check by design
def agg_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set ALGEBRA on Theta sketches: |urgent ∪ low|,
    |urgent ∩ low| and |urgent − low| customer counts estimated from
    two mergeable sketches — the capability HLL lacks (HLL unions only;
    Theta supports intersection and difference), and the 100 TB way to
    answer "how many users did X but never Y" without a distinct-join
    over raw facts: sketch each slice once, combine sketches at KB
    scale forever after.

    DataSketches Theta estimates are not reproducible in DuckDB, so
    this is declared-weak rows-only; ``agg_theta_band`` carries the
    strong error-envelope oracle for the same dataflow.
    """
    ab = _theta_priority_sketches(spark, sf_dir)
    return ab.select(
        F.round(
            F.theta_sketch_estimate(
                F.theta_union(F.col("ska"), F.col("skb"))
            ),
            0,
        ).alias("est_union"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("ska"), F.col("skb"))
            ),
            0,
        ).alias("est_intersect"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_difference(F.col("ska"), F.col("skb"))
            ),
            0,
        ).alias("est_diff"),
    )


@query(
    "agg_theta_band",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '5-LOW')
    SELECT CAST((SELECT count(*) FROM (SELECT o_custkey FROM a
                                       UNION SELECT o_custkey FROM b))
                AS BIGINT) AS exact_union,
           CAST((SELECT count(*) FROM a JOIN b USING (o_custkey))
                AS BIGINT) AS exact_intersect,
           CAST((SELECT count(*) FROM a
                 WHERE o_custkey NOT IN (SELECT o_custkey FROM b))
                AS BIGINT) AS exact_diff,
           CAST(1 AS INTEGER) AS union_in_band,
           CAST(1 AS INTEGER) AS intersect_in_band,
           CAST(1 AS INTEGER) AS diff_in_band
    """,
)
def agg_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta set-algebra error-envelope audit: each sketch estimate
    (union / intersection / difference of the URGENT and LOW customer
    sets) must land within ±max(2, 5%·exact) of the exact answer —
    the strong-oracle companion that makes ``agg_theta_set_ops``'s
    correctness externally checkable (the HLL ``_band`` pattern).
    """
    o = load_table(spark, sf_dir, "orders")
    a_ex = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("ck")
    ).distinct()
    b_ex = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("ck")
    ).distinct()
    exact = (
        a_ex.unionAll(b_ex).distinct().agg(
            F.count(F.lit(1)).alias("exact_union")
        )
        .crossJoin(
            a_ex.join(b_ex, "ck").agg(
                F.count(F.lit(1)).alias("exact_intersect")
            )
        )
        .crossJoin(
            a_ex.join(b_ex, "ck", "left_anti").agg(
                F.count(F.lit(1)).alias("exact_diff")
            )
        )
    )
    ests = _theta_priority_sketches(spark, sf_dir).select(
        F.theta_sketch_estimate(
            F.theta_union(F.col("ska"), F.col("skb"))
        ).alias("eu"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ska"), F.col("skb"))
        ).alias("ei"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("ska"), F.col("skb"))
        ).alias("ed"),
    )

    def band_flag(est, exact_col):
        band = F.greatest(
            F.lit(2.0), F.col(exact_col).cast("double") * 0.05
        )
        return (
            (F.abs(est - F.col(exact_col)).cast("double") <= band)
            .cast("int")
        )

    return exact.crossJoin(ests).select(
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersect").cast("long").alias("exact_intersect"),
        F.col("exact_diff").cast("long").alias("exact_diff"),
        band_flag(F.col("eu"), "exact_union").alias("union_in_band"),
        band_flag(F.col("ei"), "exact_intersect").alias(
            "intersect_in_band"
        ),
        band_flag(F.col("ed"), "exact_diff").alias("diff_in_band"),
    )


def _kll_merged_price_sketch(spark: SparkSession, sf_dir: str):
    """Daily KLL(double) sketches of o_totalprice merged to ONE corpus
    sketch (1-row frame) — the mergeable-quantile rollup shared by the
    estimate query and its band."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.kll_sketch_agg_double("o_totalprice").alias("sk"))
    # kll_sketch_merge_double is a BINARY merge (no union aggregate in
    # Spark 4.1) — fold the collected daily sketches pairwise.  The
    # collected array is #days × ~KB: the whole point of sketch rollups
    # is that this stays driver-free and tiny at any corpus size.
    return daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "sk"))).alias("sks")
    ).select(
        F.aggregate(
            F.expr("slice(transform(sks, s -> s.sk), 2, size(sks))"),
            F.expr("transform(sks, s -> s.sk)[0]"),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("msk"),
        F.size("sks").alias("n_daily_sketches"),
    )


@query("agg_kll_quantile_rollup")  # approximate sketch — rows-only by design
def agg_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable QUANTILE sketches: per-day KLL(double) sketches
    of order value, merged to a corpus sketch and queried for p50/p90 —
    the quantile analog of the HLL rollup (``agg_sketch_rollup``): at
    100 TB, daily sketch tables re-merge to any coarser grain in KB of
    I/O, where exact percentiles or even ``approx_percentile`` would
    rescan the raw facts per rollup grain.

    DataSketches KLL estimates are not reproducible in DuckDB — and,
    unlike HLL/Theta, not even run-stable in Spark (compaction draws
    random bits per execution), so this is declared-weak rows-only and
    deliberately NOT output-pinned; ``agg_kll_band`` carries the
    strong rank-error-envelope oracle, which is exactly the guarantee
    the randomization preserves.
    """
    m = _kll_merged_price_sketch(spark, sf_dir)
    return m.select(
        F.round(
            F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.5)), 2
        ).alias("est_p50"),
        F.round(
            F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.9)), 2
        ).alias("est_p90"),
        F.kll_sketch_get_n_double("msk").alias("n_rows"),
        F.col("n_daily_sketches").cast("long").alias("n_daily_sketches"),
    )


@query(
    "agg_kll_band",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS INTEGER) AS p50_rank_in_band,
           CAST(1 AS INTEGER) AS p90_rank_in_band
    FROM orders
    """,
)
def agg_kll_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL rank-error-envelope audit: the TRUE rank of each merged-
    sketch quantile estimate (count of rows ≤ estimate) must sit within
    ±5%·n of the target rank — KLL's k=200 default guarantees ~1.65%
    normalized rank error at 99% confidence, so the 5% band holds with
    ~10σ margin against the sketch's internal randomization.  Strong-
    oracle companion of ``agg_kll_quantile_rollup`` (the HLL ``_band``
    pattern applied to ranks: value error is unbounded for quantile
    sketches, rank error is the contract).
    """
    o = load_table(spark, sf_dir, "orders")
    ests = _kll_merged_price_sketch(spark, sf_dir).select(
        F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.5)).alias(
            "e50"
        ),
        F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(0.9)).alias(
            "e90"
        ),
    )
    joined = o.crossJoin(F.broadcast(ests))
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("o_totalprice") <= F.col("e50")).cast("long")
        ).alias("r50"),
        F.sum(
            (F.col("o_totalprice") <= F.col("e90")).cast("long")
        ).alias("r90"),
    )

    def in_band(rank_col, q):
        return (
            (
                F.abs(F.col(rank_col).cast("double") - F.lit(q) * F.col("n"))
                <= F.lit(0.05) * F.col("n")
            ).cast("int")
        )

    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        in_band("r50", 0.5).alias("p50_rank_in_band"),
        in_band("r90", 0.9).alias("p90_rank_in_band"),
    )
