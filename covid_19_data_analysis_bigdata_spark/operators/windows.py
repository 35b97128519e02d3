"""Window-function operators (SURVEY.md §2 category 5).

Reference analogs: daily-new-cases via lag-diff, 7-day moving average,
cumulative cases, rank within continent, top-N per group.  Each spec
compiles to one WindowExec: a single hash-partition shuffle on the
partition keys, then a per-partition sort — no joins, no self-joins.

Determinism rule (SURVEY.md §5.3.2): every orderBy feeding
lag/lead/row_number/ntile carries a unique tie-break key (event_id /
o_orderkey / c_custkey).  events timestamps are ns-unique so ts alone
is total, but the tie-break stays for engine-portability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


def _by_user_time() -> Window:
    return Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))


@query(
    "win_lag_diff",
    oracle="""
    SELECT event_id, user_id,
           value - lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def win_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-new-cases shape: value − lag(value) per user over time."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value", 1).over(_by_user_time())).alias("delta"),
    )


@query(
    "win_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             - epoch_ms(ts) AS gap_ms
    FROM events
    """,
)
def win_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap to the next event in milliseconds.

    Output is an epoch-ms difference, not a raw timestamp: ms is the
    common truncation grain of Spark's µs and DuckDB's ns clocks
    (SURVEY.md §5.3.4).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        (
            F.unix_millis(F.lead("ts", 1).over(_by_user_time()))
            - F.unix_millis(F.col("ts"))
        ).alias("gap_ms"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
               AS ma7
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average (7-day moving average analog)."""
    w = _by_user_time().rowsBetween(-6, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("ma7"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id, value,
           round(sum(value) OVER (PARTITION BY event_type ORDER BY value
                                  RANGE BETWEEN 10 PRECEDING AND CURRENT ROW),
                 4) AS near_sum
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: sum over peers within 10 below current.

    Range frames are tie-safe by construction — all peers of the order
    value share one frame — so no tie-break key is needed.
    """
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(-10, Window.currentRow)
    )
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "value",
        F.round(F.sum("value").over(w), 4).alias("near_sum"),
    )


@query(
    "win_cumsum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS cum_value
    FROM events
    """,
)
def win_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum (cumulative-cases analog)."""
    w = _by_user_time().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("cum_value"),
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
               AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
               AS drnk
    FROM customer
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank within nation (country-rank analog).

    rank() is tie-stable: equal balances share a rank in both engines,
    so no tie-break is required for the rank *values*.
    """
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_row_number_topk",
    oracle="""
    SELECT * FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rk
        FROM customer
    ) WHERE rk <= 3
    """,
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per nation via row_number (top-N countries per continent).

    The per-group top-k idiom at scale: one shuffle on the group key,
    heap-bounded sort, filter — never a global sort.  Tie-break on
    c_custkey makes the selected rows identical across engines.
    """
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "win_ntile_pctrank",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w            AS quartile,
           round(percent_rank() OVER w, 6)  AS prank,
           round(cume_dist()    OVER w, 6)  AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + percent_rank + cume_dist of order totals.

    ntile assigns by row position, which is tie-UNSTABLE — the unique
    o_orderkey tie-break makes the assignment total and portable.
    """
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event value per user-day over the full-partition frame."""
    w = (
        Window.partitionBy("user_id", F.col("ts").cast("date"))
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
    )


@query(
    "win_sessionize_batch",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, value, epoch_ms(ts) AS t_ms,
               CASE WHEN epoch_ms(ts)
                         - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, event_id, value, t_ms,
               CAST(sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY t_ms, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
                   AS session_no
        FROM marked)
    SELECT user_id, session_no,
           count(*)                       AS n_events,
           round(sum(value), 4)           AS session_value,
           (max(t_ms) - min(t_ms)) / 1000 AS duration_s
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def win_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a >30-minute silence; session id is the running count of
    session starts.  The batch twin of ``stream_session`` — two window
    passes plus one aggregate, no self-join, no state store.

    Gap boundaries compare epoch *milliseconds* (ns and µs truncate
    identically) so both engines cut sessions at the same events.
    """
    ev = load_table(spark, sf_dir, "events")
    t_ms = F.unix_millis("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "value",
        t_ms.alias("t_ms"),
        F.when(
            t_ms - F.lag(t_ms).over(w_order) > 30 * 60 * 1000, 1
        ).otherwise(0).alias("new_session"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn(
        "session_no", F.sum("new_session").over(w_run)
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        ((F.max("t_ms") - F.min("t_ms")) / 1000).alias("duration_s"),
    )


@query(
    "win_rolling_distinct",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
               user_id
        FROM events),
    days AS (SELECT DISTINCT day FROM pairs)
    SELECT d.day, count(DISTINCT p.user_id) AS wau
    FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (the WAU curve) — rolling
    COUNT DISTINCT, which no window frame can express directly.

    Spark-first shape: reduce to distinct (day, user) pairs first (the
    only big shuffle), then ``explode(sequence(day, day+6))`` fans each
    pair out to the ≤7 window-end days it covers, and a plain
    groupBy/count-distinct finishes.  A 7× expansion of the *deduped*
    pair set beats any range self-join of the raw events, and the day
    spine it joins against grows with time, not data — broadcastable
    forever.  (The approximate twin at extreme scale is a per-day HLL
    sketch merged over the trailing window.)
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    expanded = pairs.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    return (
        expanded.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "win_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS dsum
        FROM events GROUP BY 1, 2)
    SELECT event_type, day,
           round(median(dsum) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM daily
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day median — robust smoothing that a moving average
    cannot provide (one outlier day drags a mean for a week; a median
    shrugs it off).

    Exact ``percentile`` as a *window* aggregate over a row frame: the
    frame re-sorts ≤7 values per row, so cost is frame-bounded, not
    partition-bounded.  Runs over the pre-aggregated daily series —
    the window input is days × types, never raw events, which is the
    scale discipline for every rolling statistic.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.round(F.sum("value"), 4).alias("dsum"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        F.round(F.expr("percentile(dsum, 0.5)").over(w), 4).alias("med7"),
    )


@query(
    "win_cume_dist_nth",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(cume_dist() OVER w, 6) AS cd,
           nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderstatus
                                          ORDER BY o_totalprice, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)
               AS third_cheapest_so_far
    FROM orders
    WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cume_dist`` + ``nth_value`` — the two ranked-window functions
    the rank/dense_rank/ntile/percent_rank family (already covered)
    leaves out: cumulative distribution position and a positional
    lookup inside the running frame.

    One window sort per spec, like every ranked window; the unique
    (price, key) order key is the determinism rule AND the skew guard.
    cume_dist is a ratio of two frame-local integers — one correctly-
    rounded division.  The sampled key filter keeps the checked result
    small; the plan is identical at any selectivity.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 0
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_cheapest_so_far"),
    )


# --------------------------------------------------------------------------
# Rolling OLS trend slope (round 5)
# --------------------------------------------------------------------------

SLOPE_WINDOW = 14  #: trailing days (inclusive)


@query(
    "win_rolling_slope",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate),
    idx AS (
        SELECT day, cents,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
        FROM daily),
    w AS (
        SELECT day,
               CAST(count(*) OVER win AS BIGINT)           AS n_days,
               CAST(sum(t) OVER win AS BIGINT)             AS st,
               CAST(sum(cents) OVER win AS BIGINT)         AS sy,
               CAST(sum(t * t) OVER win AS BIGINT)         AS stt,
               CAST(sum(t * cents) OVER win AS BIGINT)     AS sty
        FROM idx
        WINDOW win AS (ORDER BY day
                       ROWS BETWEEN {SLOPE_WINDOW - 1} PRECEDING
                            AND CURRENT ROW))
    SELECT day, n_days,
           CASE WHEN n_days < 2 THEN 0.0
                ELSE round(CAST(n_days * sty - st * sy AS DOUBLE)
                           / (n_days * stt - st * st) / 100, 4)
           END AS slope_dollars_per_day
    FROM w
    """,
)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {SLOPE_WINDOW}-day OLS trend slope of daily revenue —
    the local trend detector between a moving average (level) and
    Mann–Kendall (global monotonicity): its sign flips exactly where
    the trend turns, in dollars/day units a dashboard can read.

    The closed form β̂ = (nΣty − Σt·Σy) / (nΣt² − (Σt)²) needs only
    four trailing window sums, all over exact integers (t is the
    day's row index, y exact cents), so the slope is one IEEE
    division per row — no per-window refit, no float accumulation.
    Magnitudes stay inside BIGINT by construction (t ≤ |days|,
    windowed Σty ≤ w·t·y ≈ 10¹⁴ at sf0.1).  Same daily-grain shuffle
    + one sort as every trailing-window op; scales with |days|, not
    |orders|.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    idx = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    win = (
        Window.orderBy("day")
        .rowsBetween(-(SLOPE_WINDOW - 1), Window.currentRow)
    )
    w = idx.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n_days"),
        F.sum("t").over(win).alias("st"),
        F.sum("cents").over(win).alias("sy"),
        F.sum(F.col("t") * F.col("t")).over(win).alias("stt"),
        F.sum(F.col("t") * F.col("cents")).over(win).alias("sty"),
    )
    slope = (
        F.col("n_days") * F.col("sty") - F.col("st") * F.col("sy")
    ).cast("double") / (
        F.col("n_days") * F.col("stt") - F.col("st") * F.col("st")
    ) / 100
    return w.select(
        "day",
        "n_days",
        F.when(F.col("n_days") < 2, F.lit(0.0))
        .otherwise(F.round(slope, 4))
        .alias("slope_dollars_per_day"),
    )


# --------------------------------------------------------------------------
# Rolling correlation between two event series (round 5)
# --------------------------------------------------------------------------


@query(
    "win_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1),
    roll AS (
        SELECT day, x, y,
               count(*)   OVER w AS n,
               sum(x)     OVER w AS sx,
               sum(y)     OVER w AS sy,
               sum(x * x) OVER w AS sxx,
               sum(y * y) OVER w AS syy,
               sum(x * y) OVER w AS sxy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, x, y,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
                 6) AS corr_7d
    FROM roll WHERE n = 7
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the daily error count
    and the daily click count, from exact integer moments.

    The corpus collapses to one row per day first (associative
    conditional counts), so the window runs over the tiny day-level
    series; on a real deployment the frame would be partitioned per
    (metric pair / tenant) key — here there is a single global pair,
    and the single-partition window is over |days| rows, not the
    corpus.  Determinism: all six moments are exact BIGINTs inside the
    row frame; the correlation is formed from them with an identical
    expression tree in both engines (one subtraction pattern, two
    correctly-rounded sqrts, one division), rounded once at the end —
    no accumulation of doubles anywhere.  Full windows only (n = 7) so
    edge frames can't produce engine-specific NULL shapes.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    roll = daily.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    d1 = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    d2 = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return (
        roll.filter(F.col("n") == 7)
        .select(
            "day",
            "x",
            "y",
            F.round(
                num / F.nullif(d1 * d2, F.lit(0.0)), 6
            ).alias("corr_7d"),
        )
    )


# --------------------------------------------------------------------------
# Weighted moving average with integer weights (round 5)
# --------------------------------------------------------------------------


@query(
    "win_weighted_moving_avg",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    lagged AS (
        SELECT event_type, day, cents,
               lag(cents, 1) OVER w AS c1,
               lag(cents, 2) OVER w AS c2,
               lag(cents, 3) OVER w AS c3,
               lag(cents, 4) OVER w AS c4,
               lag(cents, 5) OVER w AS c5,
               lag(cents, 6) OVER w AS c6
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day, cents,
           round((7 * cents + 6 * c1 + 5 * c2 + 4 * c3
                  + 3 * c4 + 2 * c5 + 1 * c6) / 28.0 / 100.0, 6)
               AS wma_7d
    FROM lagged
    WHERE c6 IS NOT NULL
    """,
)
def win_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted 7-day moving average (today weighted 7, six
    days ago weighted 1) — the smoother that reacts faster than the
    flat ``win_moving_avg`` without the state of an EWMA.

    The weighted numerator is an exact BIGINT combination of seven
    lagged integer-cent values (explicit lags rather than a frame
    aggregate, because a weighted frame sum has no built-in and the
    weight vector is fixed); one division normalizes at the end.
    Partial windows are excluded (c6 IS NOT NULL) so both engines
    emit identical rows.  Per-series partitioned window over the
    day-grain table.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = [F.lag("cents", i).over(w).alias(f"c{i}") for i in range(1, 7)]
    lagged = daily.select("event_type", "day", "cents", *lags).filter(
        F.col("c6").isNotNull()
    )
    num = (
        7 * F.col("cents") + 6 * F.col("c1") + 5 * F.col("c2")
        + 4 * F.col("c3") + 3 * F.col("c4") + 2 * F.col("c5")
        + 1 * F.col("c6")
    )
    return lagged.select(
        "event_type",
        "day",
        "cents",
        F.round(num / 28.0 / 100.0, 6).alias("wma_7d"),
    )


# --------------------------------------------------------------------------
# Conditional-reset running total (round 5)
# --------------------------------------------------------------------------


@query(
    "win_reset_cumsum",
    oracle="""
    WITH seg AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(round(l_quantity) AS BIGINT) AS qty,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                   CASE WHEN l_returnflag = 'R'
                                        THEN 1 ELSE 0 END,
                                   CAST(round(l_quantity) AS BIGINT)
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS segment_no
        FROM lineitem)
    SELECT l_suppkey, l_orderkey, l_linenumber, segment_no,
           CAST(sum(qty) OVER (PARTITION BY l_suppkey, segment_no
                               ORDER BY l_orderkey, l_linenumber, qty
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS run_qty
    FROM seg
    """,
)
def win_reset_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-supplier quantity total that RESTARTS at every
    returned ('R') line — the classic conditional-reset running sum
    (inventory counters that zero on an audit event, error counters
    that clear on success).

    The reset is expressed without any self-join or loop: a running
    count of reset markers assigns a segment number, then a second
    running sum scoped to (supplier, segment) accumulates within each
    segment.  Two window passes over the SAME partitioning key, so the
    single hash-partition by ``l_suppkey`` is reused — one shuffle
    total, any data size.  Quantities are integral by construction;
    cast to BIGINT so both engines emit exact integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Tie-break note (round-7 flake fix): (l_orderkey, l_linenumber) is
    # NOT unique in the synthetic testdata, so both window orders also
    # sort on every column the query consumes (reset marker, quantity).
    # Remaining ties are rows identical in ALL consumed columns, whose
    # relative order cannot change any emitted value — the output
    # multiset is deterministic without assuming a key the data does
    # not guarantee.
    marker = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    qty = F.round("l_quantity").cast("long")
    w_seg = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", marker, qty)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        qty.alias("qty"),
        F.sum(marker).over(w_seg).alias("segment_no"),
    )
    w_run = (
        Window.partitionBy("l_suppkey", "segment_no")
        .orderBy("l_orderkey", "l_linenumber", "qty")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return seg.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "segment_no",
        F.sum("qty").over(w_run).alias("run_qty"),
    )


# --------------------------------------------------------------------------
# Interval merging / union length (round 7)
# --------------------------------------------------------------------------

@query(
    "win_merge_intervals",
    oracle="""
    WITH iv AS (
        SELECT l.l_suppkey AS supp,
               CAST(o.o_orderdate AS DATE)  AS s,
               CAST(l.l_shipdate AS DATE)   AS e
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)),
    marked AS (
        SELECT supp, s, e,
               CASE WHEN s > coalesce(max(e) OVER (PARTITION BY supp
                        ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), DATE '1900-01-01')
                    THEN 1 ELSE 0 END AS new_grp
        FROM iv),
    grp AS (
        SELECT supp, s, e,
               CAST(sum(new_grp) OVER (PARTITION BY supp ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS g
        FROM marked),
    merged AS (
        SELECT supp, g, min(s) AS ms, max(e) AS me,
               CAST(count(*) AS BIGINT) AS n_iv
        FROM grp GROUP BY supp, g)
    SELECT supp AS l_suppkey,
           CAST(sum(n_iv) AS BIGINT)   AS n_intervals,
           CAST(count(*) AS BIGINT)    AS n_busy_periods,
           CAST(sum(datediff('day', ms, me) + 1) AS BIGINT)
               AS covered_days
    FROM merged GROUP BY supp
    """,
)
def win_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals — the classic union-length problem:
    each lineitem is a fulfillment window [order date, ship date] for
    its supplier; overlapping windows coalesce into maximal busy
    periods, and the union length (covered days) is what a naive
    Σ(end−start) double-counts.  The canonical gaps-and-islands
    solution: an interval starts a new busy period exactly when its
    start exceeds the running max of all previous ends.

    Everything is partitioned BY SUPPLIER — the running-max window,
    the island numbering, and both aggregates — so per-key state is
    bounded by that supplier's interval count and the plan scales
    with more keys, never a global sort.  All arithmetic is exact
    date/integer math; the (s, e) sort order is total per supplier
    for the running max (equal pairs are interchangeable).
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    iv = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("l_suppkey").alias("supp"),
            F.col("o_orderdate").cast("date").alias("s"),
            F.col("l_shipdate").cast("date").alias("e"),
        )
        .filter(F.col("e") >= F.col("s"))
    )
    w_prev = (
        Window.partitionBy("supp")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_grp",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prev), F.lit("1900-01-01").cast("date")
            ),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("supp")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        marked.withColumn("g", F.sum("new_grp").over(w_run))
        .groupBy("supp", "g")
        .agg(
            F.min("s").alias("ms"),
            F.max("e").alias("me"),
            F.count(F.lit(1)).alias("n_iv"),
        )
    )
    return merged.groupBy(F.col("supp").alias("l_suppkey")).agg(
        F.sum("n_iv").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_busy_periods"),
        F.sum(F.datediff("me", "ms") + 1).cast("long").alias(
            "covered_days"
        ),
    )
