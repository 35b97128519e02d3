"""Time-series operators (reference analogs: trend forecasting and
daily-series alignment — SURVEY.md §0.3's regression/resample stages).

Both work on the per-(user, day) daily series derived from ``events``:
daily sums are rounded *at the aggregation boundary* so the two engines
fold identical inputs downstream, and the regression x-axis is an
integer day index (never raw timestamps — SURVEY.md §1.3/§5.3.4, and
ns-vs-µs truncation would skew the slope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table

EPOCH = "2000-01-01"

_DAILY_SQL = """
    daily AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS dsum
        FROM events
        GROUP BY 1, 2)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("dsum"))


@query(
    "ts_trend_forecast",
    oracle=f"""
    WITH {_DAILY_SQL},
    pts AS (
        SELECT user_id,
               datediff('day', DATE '{EPOCH}', day)     AS x,
               CAST(round(dsum * 10000) AS BIGINT)      AS y4
        FROM daily),
    mom AS (
        SELECT user_id,
               count(*)   AS n,
               sum(x)     AS sx,
               sum(y4)    AS sy,
               sum(x * y4) AS sxy,
               sum(x * x) AS sxx,
               max(x)     AS last_x
        FROM pts
        GROUP BY user_id
        HAVING count(*) >= 2),
    fitted AS (
        SELECT user_id, n AS n_days, last_x,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope4,
               (sy - ((n * sxy - sx * sy)
                      / (n * sxx - sx * sx)) * sx) / n    AS icept4
        FROM mom)
    SELECT user_id, n_days,
           round(slope4 / 10000, 6)                          AS slope,
           round(icept4 / 10000, 6)                          AS intercept,
           round((slope4 * (last_x + 1) + icept4) / 10000, 4)
               AS next_day_forecast
    FROM fitted
    """,
)
def ts_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend + next-day forecast over the daily series
    (the reference class's MLlib-regression stage reduced to its
    aggregate core: closed-form OLS).

    Determinism at any scale: the regression moments are **exact
    integers** — y is the 4-dp daily sum scaled ×10⁴ to BIGINT, x an
    integer day index — so Σx, Σy, Σxy, Σx² are order-independent, and
    slope/intercept are the same IEEE divisions of the same integers in
    both engines, bit-for-bit.  (``regr_slope`` over doubles flips 6-dp
    rounding boundaries at sf0.1 because its float moments are
    summation-order-dependent — found by the sf0.1 sweep.)  Integer
    moments also combine associatively, so the aggregate is still one
    partial+final pass that scales like a sum.
    """
    x = F.datediff(F.col("day"), F.lit(EPOCH)).cast("long")
    y4 = F.round(F.col("dsum") * 10000).cast("long")
    mom = (
        _daily(spark, sf_dir)
        .select("user_id", x.alias("x"), y4.alias("y4"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y4").alias("sy"),
            F.sum(F.col("x") * F.col("y4")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.max("x").alias("last_x"),
        )
        .filter(F.col("n") >= 2)
    )
    slope4 = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fitted = mom.select(
        "user_id",
        F.col("n").alias("n_days"),
        "last_x",
        slope4.alias("slope4"),
        ((F.col("sy") - slope4 * F.col("sx")) / F.col("n")).alias("icept4"),
    )
    return fitted.select(
        "user_id",
        "n_days",
        F.round(F.col("slope4") / 10000, 6).alias("slope"),
        F.round(F.col("icept4") / 10000, 6).alias("intercept"),
        F.round(
            (F.col("slope4") * (F.col("last_x") + 1) + F.col("icept4"))
            / 10000,
            4,
        ).alias("next_day_forecast"),
    )


@query(
    "ts_resample_ffill",
    oracle=f"""
    WITH {_DAILY_SQL},
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(min(day), max(day),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily
        GROUP BY user_id),
    j AS (SELECT s.user_id, s.day, d.dsum
          FROM spine s LEFT JOIN daily d USING (user_id, day))
    SELECT user_id, day,
           last_value(dsum IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled,
           CAST(dsum IS NULL AS BOOLEAN) AS was_gap
    FROM j
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resampling with forward-fill: build each user's
    full date spine (min..max day), left-join the observed daily sums,
    and carry the last observation forward across gaps (the standard
    alignment step before comparing/forecasting time series).

    The spine is generated per key with ``sequence`` (no driver-side
    date loop); the fill is one window pass.  Spine size is bounded by
    the date span, not the event count — safe however hot a key is.
    """
    daily = _daily(spark, sf_dir)
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("dsum", ignorenulls=True).over(w).alias("filled"),
        F.col("dsum").isNull().alias("was_gap"),
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'),
    purchases AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    firstbuy AS (
        SELECT c.event_id,
               any_value(c.ts)  AS cts,
               min(p.ts)        AS pts
        FROM clicks c
        LEFT JOIN purchases p
               ON p.user_id = c.user_id
              AND p.ts > c.ts
              AND p.ts <= c.ts + INTERVAL 1 HOUR
        GROUP BY c.event_id)
    SELECT CAST(date_trunc('day', cts) AS DATE) AS day,
           count(*)      AS n_clicks,
           count(pts)    AS n_converted,
           round(100.0 * count(pts) / count(*), 4) AS conv_pct,
           round(avg(epoch_ms(pts) - epoch_ms(cts)), 4) AS avg_delay_ms
    FROM firstbuy
    GROUP BY 1
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: click → purchase conversion within one hour,
    reported per day with the mean conversion delay.

    The sequence match is an interval join (same user, purchase inside
    (click, click+1h]) followed by a per-click min — the batch
    equivalent of MATCH_RECOGNIZE's A-then-B pattern.  The join keys
    on user_id, so pair blowup is bounded by per-user event density;
    at 100 TB add a coarse time bucket to the equi-key (click and
    purchase land in the same or adjacent bucket) to cap the
    candidate window — semantics identical, worst case bounded.
    Delays are epoch-millisecond differences (the cross-engine-safe
    timestamp grain); conversion percentage divides exact counts.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    firstbuy = (
        c.join(
            p,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.first("cts").alias("cts"), F.min("pts").alias("pts"))
    )
    return (
        firstbuy.groupBy(
            F.date_trunc("day", "cts").cast("date").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("pts").alias("n_converted"),
            F.round(
                100.0 * F.count("pts") / F.count(F.lit(1)), 4
            ).alias("conv_pct"),
            F.round(
                F.avg(F.unix_millis("pts") - F.unix_millis("cts")), 4
            ).alias("avg_delay_ms"),
        )
    )


@query(
    "ts_seasonal_naive",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS dsum
        FROM events
        GROUP BY 1, 2),
    tagged AS (
        SELECT event_type, day, dsum,
               datediff('day', DATE '1970-01-05', day) % 7 AS dow
        FROM daily)
    SELECT event_type, dow,
           count(*)            AS n_days,
           round(avg(dsum), 4) AS dow_mean,
           round(max(dsum) - min(dsum), 4) AS dow_range
    FROM tagged
    GROUP BY 1, 2
    """,
)
def ts_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive profile: the day-of-week signature of each daily
    series — the baseline every forecast must beat, and the detrending
    table for weekly seasonality.

    Weekday derives from an integer day count since a known Monday
    (epoch 1970-01-05) mod 7 — calendar-function-free, so both engines
    agree without caring whose ``dayofweek`` starts on Sunday.  Two
    bounded aggregations over the pre-rounded daily series.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("dsum"))
    dow = (
        F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7
    ).alias("dow")
    return (
        daily.select("event_type", dow, "dsum")
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg("dsum"), 4).alias("dow_mean"),
            F.round(F.max("dsum") - F.min("dsum"), 4).alias("dow_range"),
        )
    )


@query(
    "ts_streak_longest",
    oracle=f"""
    WITH {_DAILY_SQL},
    idx AS (
        SELECT user_id,
               datediff('day', DATE '{EPOCH}', day) AS d,
               row_number() OVER (PARTITION BY user_id ORDER BY
                                  datediff('day', DATE '{EPOCH}', day))
                   AS rn
        FROM daily),
    runs AS (
        SELECT user_id, d - rn AS island, count(*) AS len
        FROM idx
        GROUP BY user_id, d - rn)
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM runs
    GROUP BY user_id
    """,
)
def ts_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (reference analog: longest run of days
    with rising case counts).

    Island id = integer day index minus the row number over days: both
    are exact integers, so consecutive days share one id and any gap
    starts a new one — no calendar arithmetic, no floats, identical in
    both engines.  One window pass plus two hash aggregations, all
    partitioned by user_id: state per key is bounded by that key's
    distinct-day count, never the corpus, so the plan survives any
    scale-up unchanged.
    """
    d = F.datediff(F.col("day"), F.lit(EPOCH).cast("date")).alias("d")
    idx = _daily(spark, sf_dir).select("user_id", d)
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("d")
    )
    runs = (
        idx.withColumn("island", F.col("d") - rn)
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@query(
    "ts_interpolate_linear",
    oracle=f"""
    WITH {_DAILY_SQL},
    obs AS (
        SELECT user_id, day,
               CAST(round(dsum * 10000) AS BIGINT) AS y4
        FROM daily),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(min(day), max(day),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM obs
        GROUP BY user_id),
    j AS (SELECT s.user_id, s.day, o.y4
          FROM spine s LEFT JOIN obs o USING (user_id, day)),
    ctx AS (
        SELECT user_id, day, y4,
               last_value(y4 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev4,
               last_value(CASE WHEN y4 IS NOT NULL THEN day END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_day,
               first_value(y4 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next4,
               first_value(CASE WHEN y4 IS NOT NULL THEN day END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_day
        FROM j)
    SELECT user_id, day,
           round(CASE WHEN y4 IS NOT NULL THEN CAST(y4 AS DOUBLE)
                      ELSE prev4 + (next4 - prev4)
                           * datediff('day', prev_day, day)
                           / datediff('day', prev_day, next_day)
                 END / 10000, 4)          AS value,
           CAST(y4 IS NULL AS BOOLEAN)    AS was_gap
    FROM ctx
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resampling with **linear interpolation**: each
    missing day gets the straight-line value between its surrounding
    observations (the alignment step when forward-fill's step function
    is too crude — e.g. smoothing reporting gaps in a case series).

    Cross-engine determinism mirrors ``ts_trend_forecast``: observed
    values become exact scaled integers (×10⁴ BIGINT) first, so the
    interpolation ``prev + (next − prev) · Δd / span`` is the same IEEE
    double arithmetic over the same integers in both engines.  The
    spine rows on the span edges are observed by construction (min/max
    are active days), so every gap has both neighbors.  Per-key date
    spines and two window passes partitioned by user_id — state bounded
    by span length per key, never corpus size.
    """
    daily = _daily(spark, sf_dir)
    obs = daily.select(
        "user_id",
        "day",
        F.round(F.col("dsum") * 10000).cast("long").alias("y4"),
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    j = spine.join(obs, ["user_id", "day"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("y4").isNotNull(), F.col("day"))
    ctx = j.select(
        "user_id",
        "day",
        "y4",
        F.last("y4", ignorenulls=True).over(w_back).alias("prev4"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_day"),
        F.first("y4", ignorenulls=True).over(w_fwd).alias("next4"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_day"),
    )
    interp = F.col("prev4") + (F.col("next4") - F.col("prev4")) * F.datediff(
        F.col("day"), F.col("prev_day")
    ) / F.datediff(F.col("next_day"), F.col("prev_day"))
    return ctx.select(
        "user_id",
        "day",
        F.round(
            F.when(F.col("y4").isNotNull(), F.col("y4").cast("double"))
            .otherwise(interp)
            / 10000,
            4,
        ).alias("value"),
        F.col("y4").isNull().alias("was_gap"),
    )


@query(
    "win_range_time",
    oracle=f"""
    WITH {_DAILY_SQL},
    idx AS (
        SELECT user_id,
               datediff('day', DATE '{EPOCH}', day)  AS d,
               day,
               CAST(round(dsum * 10000) AS BIGINT)   AS y4
        FROM daily)
    SELECT user_id, day,
           round(sum(y4) OVER (
               PARTITION BY user_id ORDER BY d
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) / 10000.0, 4)
               AS trailing_3d,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY d
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_days_in_window
    FROM idx
    """,
)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-calendar-day rolling sum per user over the *sparse*
    daily series — a RANGE frame keyed on the integer day index, so a
    day with absent neighbors aggregates only what actually exists in
    the last 3 calendar days (a ROWS frame would wrongly reach back
    across gaps; compare `win_moving_avg`).

    The frame key is an exact integer day index and the summed values
    are ×10⁴-scaled BIGINTs, so window sums are order-independent
    integer additions in both engines.  One window pass partitioned by
    user_id — per-key state is the 3-day frame, independent of corpus
    size.
    """
    daily = _daily(spark, sf_dir)
    idx = daily.select(
        "user_id",
        "day",
        F.datediff(F.col("day"), F.lit(EPOCH).cast("date"))
        .cast("long")
        .alias("d"),
        F.round(F.col("dsum") * 10000).cast("long").alias("y4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rangeBetween(-2, Window.currentRow)
    )
    return idx.select(
        "user_id",
        "day",
        F.round(F.sum("y4").over(w) / 10000.0, 4).alias("trailing_3d"),
        F.count(F.lit(1)).over(w).alias("n_days_in_window"),
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS v
        FROM events
        GROUP BY 1, 2),
    win AS (
        SELECT event_type, day, v,
               count(v)     OVER w AS cnt,
               sum(v)       OVER w AS s,
               sum(v * v)   OVER w AS ss
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, v,
           round(CASE WHEN cnt >= 4
                       AND (ss - s * s / cnt) / (cnt - 1) > 0
                      THEN (v - s / cnt)
                           / sqrt((ss - s * s / cnt) / (cnt - 1))
                 END, 3) AS zscore,
           coalesce(abs((v - s / cnt)
                        / sqrt((ss - s * s / cnt) / (cnt - 1))) > 2.0
                    AND cnt >= 4
                    AND (ss - s * s / cnt) / (cnt - 1) > 0,
                    false) AS is_anomaly
    FROM win
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the per-type daily series.

    Each day's total is scored against the mean/stddev of the PREVIOUS
    7 days (trailing frame excludes the current row — scoring a point
    against a window that contains it dilutes every spike).  The
    variance comes from explicit window sums (Σv, Σv², n) rather than a
    stddev builtin, so both engines execute the identical arithmetic
    expression — engine-internal Welford vs two-pass implementations
    would differ in the last float bits.  Days with under 4 trailing
    observations emit NULL (no stable baseline).

    Scale shape: one hash aggregation to day grain (tiny output:
    days × event_types), then a partitioned running window — the
    detector's cost is the aggregation; the window runs over the
    already-reduced frame.  The same topology runs incrementally as
    ``stream_stateful_running``'s batch twin.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    cnt = F.count("v").over(w)
    s = F.sum("v").over(w)
    ss = F.sum(F.col("v") * F.col("v")).over(w)
    # Null-gate the count (< 4 trailing obs → NULL) so every division
    # null-propagates instead of tripping ANSI DIVIDE_BY_ZERO on the
    # leading rows of each partition; gate the variance the same way so
    # a zero-variance baseline yields NULL, not ±Inf.
    cnt_g = F.when(cnt >= 4, cnt.cast("double"))
    var = (ss - s * s / cnt_g) / (cnt_g - 1)
    var_g = F.when(var > 0, var)
    z = (F.col("v") - s / cnt_g) / F.sqrt(var_g)
    return daily.select(
        "event_type",
        "day",
        "v",
        F.round(z, 3).alias("zscore"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "ts_level_shift",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS v
        FROM events
        GROUP BY 1, 2),
    win AS (
        SELECT event_type, day, v,
               count(v)   OVER recent AS rc,
               sum(v)     OVER recent AS rs,
               count(v)   OVER prior  AS pc,
               sum(v)     OVER prior  AS ps,
               sum(v * v) OVER prior  AS pss
        FROM daily
        WINDOW recent AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               prior  AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 13 PRECEDING AND 7 PRECEDING))
    SELECT event_type, day, v,
           round(CASE WHEN rc = 7 AND pc = 7
                       AND (pss - ps * ps / pc) / (pc - 1) > 0
                      THEN (rs / rc - ps / pc)
                           / sqrt((pss - ps * ps / pc) / (pc - 1))
                 END, 3) AS shift_score,
           coalesce(abs((rs / rc - ps / pc)
                        / sqrt((pss - ps * ps / pc) / (pc - 1))) > 2.0
                    AND rc = 7 AND pc = 7
                    AND (pss - ps * ps / pc) / (pc - 1) > 0,
                    false) AS is_shift
    FROM win
    """,
)
def ts_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift changepoint detector: the trailing 7-day mean is
    compared against the mean of the 7 days before that, normalized by
    the prior window's stddev — a windowed two-sample test that flags
    regime changes (deploys, outages, seasonality breaks) rather than
    single-day spikes (which ``ts_anomaly_zscore`` covers).

    Both windows require exactly 7 observations (partial windows emit
    NULL); variance again comes from explicit Σv/Σv² sums so the two
    engines execute identical IEEE arithmetic.  Cost profile matches
    the z-score detector: one reduction to day grain, then windows
    over the tiny aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    recent = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    prior = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-13, -7)
    )
    rc = F.count("v").over(recent)
    rs = F.sum("v").over(recent)
    pc = F.count("v").over(prior)
    ps = F.sum("v").over(prior)
    pss = F.sum(F.col("v") * F.col("v")).over(prior)
    # Null-gate the counts so partial windows null-propagate through
    # every division (ANSI-safe), and gate the variance against 0.
    rc_g = F.when(rc == 7, rc.cast("double"))
    pc_g = F.when(pc == 7, pc.cast("double"))
    var = (pss - ps * ps / pc_g) / (pc_g - 1)
    var_g = F.when(var > 0, var)
    score = (rs / rc_g - ps / pc_g) / F.sqrt(var_g)
    return daily.select(
        "event_type",
        "day",
        "v",
        F.round(score, 3).alias("shift_score"),
        F.coalesce(F.abs(score) > 2.0, F.lit(False)).alias("is_shift"),
    )


@query(
    "ts_autocorr_lag",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4)                AS v
        FROM events
        GROUP BY 1, 2),
    lagged AS (
        SELECT event_type, v,
               lag(v, 1) OVER w AS v1,
               lag(v, 7) OVER w AS v7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    mom AS (
        SELECT event_type,
               count(v1)                AS n1,
               sum(v * v1)              AS sxy1,
               sum(v)  FILTER (v1 IS NOT NULL) AS sx1,
               sum(v1)                  AS sy1,
               sum(v * v)  FILTER (v1 IS NOT NULL) AS sxx1,
               sum(v1 * v1)             AS syy1,
               count(v7)                AS n7,
               sum(v * v7)              AS sxy7,
               sum(v)  FILTER (v7 IS NOT NULL) AS sx7,
               sum(v7)                  AS sy7,
               sum(v * v)  FILTER (v7 IS NOT NULL) AS sxx7,
               sum(v7 * v7)             AS syy7
        FROM lagged
        GROUP BY event_type)
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_lag1,
           round((n1 * sxy1 - sx1 * sy1)
                 / (sqrt(n1 * sxx1 - sx1 * sx1)
                    * sqrt(n1 * syy1 - sy1 * sy1)), 4) AS acf_lag1,
           CAST(n7 AS BIGINT) AS n_lag7,
           round((n7 * sxy7 - sx7 * sy7)
                 / (sqrt(n7 * sxx7 - sx7 * sx7)
                    * sqrt(n7 * syy7 - sy7 * sy7)), 4) AS acf_lag7
    FROM mom
    """,
)
def ts_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of each event type's daily
    series — the seasonality fingerprint (a strong lag-7 ACF says
    "weekly pattern"; it is the statistic behind the seasonal-naive
    forecaster already shipped as ``ts_seasonal_naive``).

    Pearson correlation of the series with its own lag, computed from
    explicit moment sums over 4dp-rounded daily values (identical
    IEEE expressions in both engines — engine ``corr`` builtins use
    different accumulation orders).  One day-grain reduction, one lag
    window, one tiny per-type aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 7).over(w).alias("v7"),
    )

    def acf(vlag, n, sxy, sx, sy, sxx, syy):
        return F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            4,
        )

    mom = lagged.groupBy("event_type").agg(
        F.count("v1").alias("n1"),
        F.sum(F.col("v") * F.col("v1")).alias("sxy1"),
        F.sum(F.when(F.col("v1").isNotNull(), F.col("v"))).alias("sx1"),
        F.sum("v1").alias("sy1"),
        F.sum(
            F.when(F.col("v1").isNotNull(), F.col("v") * F.col("v"))
        ).alias("sxx1"),
        F.sum(F.col("v1") * F.col("v1")).alias("syy1"),
        F.count("v7").alias("n7"),
        F.sum(F.col("v") * F.col("v7")).alias("sxy7"),
        F.sum(F.when(F.col("v7").isNotNull(), F.col("v"))).alias("sx7"),
        F.sum("v7").alias("sy7"),
        F.sum(
            F.when(F.col("v7").isNotNull(), F.col("v") * F.col("v"))
        ).alias("sxx7"),
        F.sum(F.col("v7") * F.col("v7")).alias("syy7"),
    )
    return mom.select(
        "event_type",
        F.col("n1").alias("n_lag1"),
        acf(
            "v1",
            F.col("n1"),
            F.col("sxy1"),
            F.col("sx1"),
            F.col("sy1"),
            F.col("sxx1"),
            F.col("syy1"),
        ).alias("acf_lag1"),
        F.col("n7").alias("n_lag7"),
        acf(
            "v7",
            F.col("n7"),
            F.col("sxy7"),
            F.col("sx7"),
            F.col("sy7"),
            F.col("sxx7"),
            F.col("syy7"),
        ).alias("acf_lag7"),
    )


# --------------------------------------------------------------------------
# Event-type transition matrix (round 4)
# --------------------------------------------------------------------------


@query(
    "report_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events),
    c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE dst IS NOT NULL GROUP BY src, dst)
    SELECT src, dst, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY src), 4) AS p
    FROM c
    """,
)
def report_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    stream: counts and row-normalized probabilities for every observed
    (current type → next type) pair — the behavioral-flow summary
    (where do users go after a click?) behind Sankey/journey charts.

    One window pass (``lead`` over the per-user time order) plus one
    |types|² aggregation: at 100 TB the only corpus-size shuffle is
    the user_id partition sort that every sessionized analysis already
    pays; the transition matrix itself is bounded by the type-alphabet
    squared, and the probability normalization runs over that tiny
    aggregate, not the stream.  Probabilities are one correctly-
    rounded integer division, identical across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    c = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(tot), 4).alias("p"),
    )


# --------------------------------------------------------------------------
# OHLC resampling bars (round 4)
# --------------------------------------------------------------------------


@query(
    "ts_ohlc_bars",
    oracle="""
    WITH k AS (
        SELECT *,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
               lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
        FROM events)
    SELECT event_type,
           date_trunc('hour', ts) AS bar,
           arg_min(value, ord_key) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ord_key) AS close,
           CAST(count(*) AS BIGINT) AS volume
    FROM k
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event type, hour) bar with open/high/
    low/close of ``value`` and row volume — the classic tick→bar
    resample every market-data and metrics pipeline runs.

    ``min_by``/``max_by`` on a zero-padded (epoch_µs, event_id) string
    key (lexicographic = chronological; DuckDB's ``arg_min`` takes no
    composite keys, so both engines use the identical scalar key) pick
    open and close inside the same hash aggregate that computes
    high/low/count
    — one shuffle on the (type, hour) grain, no window sort over the
    raw stream, and the bar count is bounded by types × hours, so the
    output stays tiny no matter how many ticks feed it.  The
    tie-break key makes open/close deterministic even under equal
    timestamps; values pass through unrounded (no arithmetic is
    performed on them).
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bar")
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


# --------------------------------------------------------------------------
# Calendar-gap detection (round 4)
# --------------------------------------------------------------------------


@query(
    "ts_calendar_gaps",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events),
    cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot
            FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, c.slot FROM types t CROSS JOIN cal c),
    seen AS (SELECT DISTINCT event_type, date_trunc('hour', ts) AS slot
             FROM events)
    SELECT g.event_type, g.slot AS missing_hour
    FROM grid g LEFT JOIN seen s
      ON s.event_type = g.event_type AND s.slot = g.slot
    WHERE s.slot IS NULL
    """,
)
def ts_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness screen: every (event type, hour) slot inside the
    stream's observed time span with ZERO events — the silent-feed
    detector a metrics pipeline runs before trusting per-hour charts
    (an empty slot and a missing slot look identical in a groupBy).

    The calendar is synthesized with ``sequence()`` from a 1-row
    bounds aggregate — types × hours rows, generated distributed, no
    driver loop — and anti-joined against the distinct observed slots.
    At 100 TB the observed-slot table is the aggregate's size (types ×
    hours, tiny), so the anti join broadcasts; the only corpus-scale
    work is the distinct-slot aggregation itself.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("slot")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(cal))
    seen = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("slot")
    ).distinct()
    return (
        grid.join(seen, ["event_type", "slot"], "left_anti")
        .select("event_type", F.col("slot").alias("missing_hour"))
    )


# --------------------------------------------------------------------------
# Mann–Kendall trend test (round 4)
# --------------------------------------------------------------------------


@query(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY event_type, day),
    series AS (
        SELECT event_type, list(cents ORDER BY day) AS l
        FROM daily GROUP BY event_type),
    stat AS (
        SELECT event_type, CAST(len(l) AS BIGINT) AS n,
               CAST(list_sum([
                   CAST(list_sum([CASE WHEN l[j] > l[i] THEN 1
                                       WHEN l[j] < l[i] THEN -1
                                       ELSE 0 END
                                  for j in generate_series(i + 1, len(l))])
                        AS BIGINT)
                   for i in generate_series(1, len(l) - 1)]) AS BIGINT) AS s
        FROM series)
    SELECT event_type, n, s,
           round(2.0 * s / (n * (n - 1)), 6) AS kendall_tau
    FROM stat
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type over the daily revenue
    series: S = Σᵢ<ⱼ sign(xⱼ − xᵢ) and Kendall's τ — the
    non-parametric "is this metric trending?" detector that, unlike
    the OLS slope, needs no distributional assumption and shrugs off
    outliers.

    The series is reduced to (type, day) grain FIRST — integer-cents
    sums, so the corpus-scale shuffle is the same daily rollup every
    calendar query pays — and the O(n²) pair scan runs over each
    type's bounded day-count array, row-local inside one codegen
    stage (n = observed days; at n=30 that is 435 integer sign
    comparisons, not a join).  S is an exact integer in both engines;
    τ is one correctly-rounded division.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "cents"))),
            lambda s: s.getField("cents"),
        ).alias("l")
    )
    n = F.size("l")
    sign_sum_i = lambda i: F.aggregate(  # noqa: E731
        F.slice(F.col("l"), i + 1, n),
        F.lit(0).cast("long"),
        lambda acc, xj: acc
        + F.when(xj > F.element_at(F.col("l"), i), 1)
        .when(xj < F.element_at(F.col("l"), i), -1)
        .otherwise(0),
    )
    s_stat = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc + sign_sum_i(i),
    )
    return series.select(
        "event_type",
        n.cast("long").alias("n"),
        s_stat.alias("s"),
        F.round(
            2.0 * s_stat / (n.cast("double") * (n - 1)), 6
        ).alias("kendall_tau"),
    )


@query(
    "ts_ewma_halflife",
    oracle="""
    WITH RECURSIVE daily0 AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY 1, 2),
    daily AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily0),
    r AS (
        SELECT event_type, rn, day, cents,
               CAST(cents AS DOUBLE) AS ewma
        FROM daily WHERE rn = 1
        UNION ALL
        SELECT d.event_type, d.rn, d.day, d.cents,
               d.cents / 2 + r.ewma / 2
        FROM daily d JOIN r ON d.event_type = r.event_type
                           AND d.rn = r.rn + 1)
    SELECT event_type, day, cents, round(ewma, 6) AS ewma
    FROM r
    """,
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average with a one-step half-life
    (α = ½): the standard smoother for noisy operational series.

    α = ½ is chosen deliberately for cross-engine exactness: every fold
    step is ``x/2 + s/2`` — two exact IEEE halvings and one rounded
    add — so Spark's ``aggregate`` fold and the oracle's recursive CTE
    walk bit-identical states.  The recursion runs INSIDE a per-key
    array fold (days are collected per type — bounded by the calendar,
    not the corpus), so the distributed shape is one groupBy plus a
    map-side lambda: nothing iterates driver-side, and a 100 TB events
    table still folds ~365 elements per key per year.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    per = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("s")
    )
    folded = per.select(
        "event_type",
        F.aggregate(
            "s",
            F.expr("CAST(array() AS array<struct<day:date,cents:bigint,ewma:double>>)"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["cents"].alias("cents"),
                        F.when(
                            F.size(acc) == 0, x["cents"].cast("double")
                        )
                        .otherwise(
                            x["cents"] / 2
                            + F.element_at(acc, -1)["ewma"] / 2
                        )
                        .alias("ewma"),
                    )
                ),
            ),
        ).alias("out"),
    )
    e = F.explode("out").alias("e")
    return folded.select("event_type", e).select(
        "event_type",
        F.col("e.day").alias("day"),
        F.col("e.cents").alias("cents"),
        F.round(F.col("e.ewma"), 6).alias("ewma"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH RECURSIVE daily0 AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2),
    daily AS (
        SELECT event_type, day, x,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily0),
    tot AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT)   AS total
        FROM daily GROUP BY 1),
    r AS (
        SELECT d.event_type, d.rn, d.day,
               greatest(CAST(0 AS BIGINT), d.x * t.n - t.total) AS s,
               greatest(CAST(0 AS BIGINT), d.x * t.n - t.total) AS smax,
               CASE WHEN d.x * t.n - t.total > 0 THEN d.day END AS peak_day
        FROM daily d JOIN tot t USING (event_type) WHERE d.rn = 1
        UNION ALL
        SELECT d.event_type, d.rn, d.day,
               greatest(CAST(0 AS BIGINT), r.s + d.x * t.n - t.total),
               CASE WHEN greatest(CAST(0 AS BIGINT),
                                  r.s + d.x * t.n - t.total) > r.smax
                    THEN greatest(CAST(0 AS BIGINT),
                                  r.s + d.x * t.n - t.total)
                    ELSE r.smax END,
               CASE WHEN greatest(CAST(0 AS BIGINT),
                                  r.s + d.x * t.n - t.total) > r.smax
                    THEN d.day ELSE r.peak_day END
        FROM daily d
        JOIN tot t USING (event_type)
        JOIN r ON d.event_type = r.event_type AND d.rn = r.rn + 1),
    last AS (
        SELECT event_type, smax, peak_day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY rn DESC) AS k
        FROM r)
    SELECT l.event_type, t.n AS n_days, l.smax AS cusum_scaled,
           round(l.smax * 1.0 / t.n, 6) AS cusum_mean_units,
           l.peak_day
    FROM last l JOIN tot t USING (event_type)
    WHERE l.k = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection on daily event counts: the
    running sum of deviations above the series mean, reset at zero,
    with the peak and its date — the classic "when did volume shift"
    screen.

    All state is integer: deviations are scaled by n (``x·n − total``)
    so the mean never becomes a float, the fold is
    ``max(0, s + dev)``, and only the final peak is divided back to
    mean units.  Same shape as the EWMA op: per-key array fold, no
    driver iteration, calendar-bounded arrays.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    per = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("total"),
    )
    acc0 = F.expr(
        "named_struct('s', CAST(0 AS BIGINT), 'smax', CAST(-1 AS BIGINT), "
        "'peak_day', CAST(NULL AS DATE))"
    )
    def step(acc, x):
        ns = F.greatest(
            F.lit(0).cast("long"),
            acc["s"] + x["x"] * F.col("n") - F.col("total"),
        )
        better = ns > acc["smax"]
        return F.struct(
            ns.alias("s"),
            F.when(better, ns).otherwise(acc["smax"]).alias("smax"),
            F.when(better, x["day"]).otherwise(acc["peak_day"]).alias("peak_day"),
        )
    folded = per.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.aggregate("s", acc0, step).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("f.smax").alias("cusum_scaled"),
        F.round(F.col("f.smax") / F.col("n_days"), 6).alias(
            "cusum_mean_units"
        ),
        F.col("f.peak_day").alias("peak_day"),
    )


@query(
    "ts_cross_correlation",
    oracle="""
    WITH a AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'click' GROUP BY 1),
    b AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
    lags AS (SELECT unnest([0, 1, 2, 3]) AS lag),
    paired AS (
        SELECT l.lag, a.x, b.y
        FROM lags l
        JOIN a ON TRUE
        JOIN b ON b.day = a.day + CAST(l.lag AS INTEGER)),
    m AS (
        SELECT lag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM paired GROUP BY lag)
    SELECT lag, n,
           round((n * sxy - sx * sy)
                 / sqrt(CAST((n * sxx - sx * sx)
                             * (n * syy - sy * sy) AS DOUBLE)), 6)
               AS xcorr
    FROM m
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two event streams (do clicks
    lead purchases by k days?) at lags 0–3 — the signal behind
    "attribution window" choices.

    Integer-moment Pearson at each lag: the daily series are tiny
    (calendar-sized) aggregates, the lag alignment is a broadcast
    equijoin on shifted dates, and the only floating-point ops are one
    int→double conversion, one sqrt, one division — each correctly
    rounded, so both engines agree to the last bit before the 6 dp
    round.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("x"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("y"))
    )
    lags = spark.range(4).select(F.col("id").cast("int").alias("lag"))
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b.withColumnRenamed("day", "bday"),
            F.col("bday") == F.date_add(F.col("day"), F.col("lag")),
        )
    )
    m = paired.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ).cast("double")
    )
    return m.select("lag", "n", F.round(num / den, 6).alias("xcorr"))


@query(
    "ts_holt_linear",
    oracle="""
    WITH RECURSIVE daily0 AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY 1, 2),
    daily AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily0),
    r AS (
        SELECT event_type, rn, day, cents,
               CAST(cents AS DOUBLE) AS lev,
               CAST(0 AS DOUBLE)     AS trend
        FROM daily WHERE rn = 1
        UNION ALL
        SELECT d.event_type, d.rn, d.day, d.cents,
               d.cents / 2 + (r.lev + r.trend) / 2,
               (d.cents / 2 + (r.lev + r.trend) / 2 - r.lev) / 2
                   + r.trend / 2
        FROM daily d JOIN r ON d.event_type = r.event_type
                           AND d.rn = r.rn + 1),
    last AS (
        SELECT event_type, lev, trend,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY rn DESC) AS k
        FROM r)
    SELECT event_type,
           round(lev, 6)               AS level,
           round(trend, 6)             AS trend,
           round(lev + 7 * trend, 6)   AS forecast_7d
    FROM last WHERE k = 1
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing with α = β = ½ and a
    7-step-ahead forecast — trend-aware forecasting one rung above the
    EWMA, the workhorse for capacity projections.

    Same exactness device as ``ts_ewma_halflife``: both smoothing
    constants are ½, so every recurrence step is halvings and adds —
    Spark's array fold and the oracle's recursive CTE execute the
    identical IEEE op sequence, state stays bit-equal, and only the
    final level/trend round at 6 dp.  Distribution shape: one daily
    aggregate, one per-key calendar-bounded fold.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    per = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("s")
    )
    acc0 = F.expr(
        "named_struct('i', CAST(0 AS INT), 'lev', CAST(0 AS DOUBLE), "
        "'trend', CAST(0 AS DOUBLE))"
    )

    def step(acc, x):
        first = acc["i"] == 0
        lev = F.when(first, x["cents"].cast("double")).otherwise(
            x["cents"] / 2 + (acc["lev"] + acc["trend"]) / 2
        )
        trend = F.when(first, F.lit(0.0)).otherwise(
            (lev - acc["lev"]) / 2 + acc["trend"] / 2
        )
        return F.struct(
            (acc["i"] + 1).alias("i"), lev.alias("lev"), trend.alias("trend")
        )

    folded = per.select(
        "event_type", F.aggregate("s", acc0, step).alias("f")
    )
    return folded.select(
        "event_type",
        F.round(F.col("f.lev"), 6).alias("level"),
        F.round(F.col("f.trend"), 6).alias("trend"),
        F.round(F.col("f.lev") + 7 * F.col("f.trend"), 6).alias(
            "forecast_7d"
        ),
    )


# --------------------------------------------------------------------------
# Event-sequence pattern matching (round 5)
# --------------------------------------------------------------------------

#: (pattern name, regex over per-user event-initial strings:
#: c=click e=error p=purchase s=signup v=view).  Plain regexes whose
#: semantics agree between RE2 (DuckDB) and Java regex (Spark).
SEQ_PATTERNS = (
    ("view_click_purchase", "v.*c.*p"),
    ("signup_then_purchase", "s.*p"),
    ("error_then_purchase", "e.*p"),
    ("view_error_only", "^[ve]+$"),
)


@query(
    "events_sequence_match",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id),
    m AS (
        SELECT count(*) AS n_users,
    """
    + ",\n".join(
        f"""sum(CASE WHEN regexp_matches(seq, '{rx}')
                     THEN 1 ELSE 0 END) AS m{i}"""
        for i, (_, rx) in enumerate(SEQ_PATTERNS)
    )
    + """
        FROM seqs)
    """
    + " UNION ALL ".join(
        f"""
        SELECT '{name}' AS pattern,
               CAST(m{i} AS BIGINT) AS n_matched,
               round(100.0 * m{i} / n_users, 4) AS pct_users
        FROM m
        """
        for i, (name, _) in enumerate(SEQ_PATTERNS)
    ),
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-shaped sequence analytics: encode each user's
    event history as a string of event-type initials (total order
    ts, event_id), then count users whose history matches each of
    {len(SEQ_PATTERNS)} behavioral regexes — funnels with arbitrary
    gaps, pure negative patterns ("never converted"), and retry
    shapes that the pairwise interval-join funnel can't express.

    The encode is one groupBy collecting a per-user array (bounded by
    per-user event count, the natural partition key at 100 TB); all
    patterns then evaluate in a single map-side pass over one row per
    user — adding a pattern costs one regex per user-row, not a new
    join.  Counting is exact; the regex dialect subset used (literals,
    ``.*``, anchored character classes) behaves identically in RE2
    and Java regex.
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.expr(
                            "struct(ts, event_id,"
                            " substr(event_type, 1, 1) AS c)"
                        )
                    )
                ),
                lambda x: x.getField("c"),
            ),
            "",
        ).alias("seq")
    )
    m = seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[
            F.sum(
                F.when(F.col("seq").rlike(rx), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"m{i}")
            for i, (_, rx) in enumerate(SEQ_PATTERNS)
        ],
    )
    stack_args = ", ".join(
        f"'{name}', m{i}" for i, (name, _) in enumerate(SEQ_PATTERNS)
    )
    return m.select(
        F.expr(
            f"stack({len(SEQ_PATTERNS)}, {stack_args})"
            " AS (pattern, n_matched)"
        ),
        "n_users",
    ).select(
        "pattern",
        F.col("n_matched").cast("long").alias("n_matched"),
        F.round(100.0 * F.col("n_matched") / F.col("n_users"), 4).alias(
            "pct_users"
        ),
    )


# --------------------------------------------------------------------------
# Bollinger bands over the daily revenue series (round 5)
# --------------------------------------------------------------------------

BOLL_WINDOW = 7  #: trailing days (inclusive)
BOLL_K = 2  #: band half-width in standard deviations


@query(
    "ts_bollinger_bands",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate),
    w AS (
        SELECT day,
               CAST(count(*) OVER win AS BIGINT)            AS n_days,
               CAST(sum(cents) OVER win AS BIGINT)          AS s1,
               CAST(sum(CAST(cents AS DECIMAL(38, 0)) * cents) OVER win
                    AS DECIMAL(38, 0))                      AS s2
        FROM daily
        WINDOW win AS (ORDER BY day
                       ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING
                            AND CURRENT ROW))
    SELECT day, n_days,
           round(CAST(s1 AS DOUBLE) / n_days / 100, 4) AS mid,
           round(CAST(s1 AS DOUBLE) / n_days / 100
                 + {BOLL_K} * sqrt(CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / n_days / 100, 4) AS upper_band,
           round(CAST(s1 AS DOUBLE) / n_days / 100
                 - {BOLL_K} * sqrt(CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / n_days / 100, 4) AS lower_band
    FROM w
    """,
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily revenue: trailing {BOLL_WINDOW}-day
    mean ± {BOLL_K}σ — the volatility envelope that complements the
    plain moving average (win_moving_avg) and the z-score anomaly
    screen (ts_anomaly_zscore, which uses a *global* σ).

    Mean and population σ both derive from two integer window sums
    over exact cents (Σx, Σx²): σ = √(n·Σx² − (Σx)²)/n, so every
    float enters exactly once per output (int→double conversion,
    sqrt, divisions — all correctly-rounded IEEE ops identical across
    engines).  One shuffle to the daily grain, one sort for the
    window; the daily series is tiny at any corpus scale.  Σx² runs in
    a DECIMAL(38,0) accumulator (the repo's corr-matrix convention —
    BIGINT overflows at sf0.1 daily volumes); the n·Σx² − (Σx)²
    combine then happens in double with the identical expression
    shape on both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    win = (
        Window.orderBy("day")
        .rowsBetween(-(BOLL_WINDOW - 1), Window.currentRow)
    )
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n_days"),
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .over(win)
        .alias("s2"),
    )
    mid_raw = F.col("s1").cast("double") / F.col("n_days") / 100
    sd_term = (
        F.lit(BOLL_K)
        * F.sqrt(
            F.col("n_days").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / F.col("n_days")
        / 100
    )
    return w.select(
        "day",
        "n_days",
        F.round(mid_raw, 4).alias("mid"),
        F.round(mid_raw + sd_term, 4).alias("upper_band"),
        F.round(mid_raw - sd_term, 4).alias("lower_band"),
    )


# --------------------------------------------------------------------------
# STL-lite decomposition: trend + weekday seasonal + residual (round 5)
# --------------------------------------------------------------------------

STL_HALF = 3  #: centered moving-average half-width (full window = 7)


@query(
    "ts_decompose_stl_lite",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate),
    tr AS (
        SELECT day, cents,
               CAST(count(*) OVER win AS BIGINT) AS n_win,
               CAST(sum(cents) OVER win AS BIGINT) AS s1
        FROM daily
        WINDOW win AS (ORDER BY day
                       ROWS BETWEEN {STL_HALF} PRECEDING
                            AND {STL_HALF} FOLLOWING)),
    full_win AS (
        SELECT day, cents, s1,
               7 * cents - s1 AS detr7,
               CAST(datediff('day', DATE '1970-01-05',
                             CAST(day AS DATE)) AS INTEGER) % 7 AS dow
        FROM tr WHERE n_win = {2 * STL_HALF + 1}),
    seas AS (
        SELECT dow,
               CAST(sum(detr7) AS BIGINT) AS sdetr,
               CAST(count(*) AS BIGINT)   AS n_dow
        FROM full_win GROUP BY dow)
    SELECT f.day,
           round(CAST(f.s1 AS DOUBLE) / 7 / 100, 4) AS trend,
           round(CAST(s.sdetr AS DOUBLE) / (7.0 * s.n_dow) / 100, 4)
               AS seasonal,
           round((CAST(f.detr7 AS DOUBLE) / 7
                  - CAST(s.sdetr AS DOUBLE) / (7.0 * s.n_dow)) / 100, 4)
               AS residual
    FROM full_win f JOIN seas s ON s.dow = f.dow
    """,
)
def ts_decompose_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of daily revenue: centered
    7-day moving-average trend, weekday-mean seasonal component of the
    detrended series, and the residual — the classic
    trend/seasonality/noise split behind every seasonal-adjustment
    dashboard, kept exactly reproducible.

    The determinism trick: for days with a full centered window the
    detrended value times 7 is an exact BIGINT (7·cents − Σwin cents),
    so the weekday means aggregate *integers* and every float in the
    output is one fixed expression over integer arguments — no
    per-row rounding of derived floats (the known cross-engine trap)
    and no order-dependent double sums.  Edge days without a full
    window are dropped, as in standard STL.  Cost: one daily-grain
    shuffle, one sort for the centered window, one 7-row broadcast
    join back — independent of order-table size beyond the first
    aggregate.  Weekday comes from epoch-day arithmetic mod 7
    (1970-01-05 anchor = Monday), identical in both engines, unlike
    the engines' dayofweek() conventions.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    win = Window.orderBy("day").rowsBetween(-STL_HALF, STL_HALF)
    tr = daily.select(
        "day",
        "cents",
        F.count(F.lit(1)).over(win).alias("n_win"),
        F.sum("cents").over(win).alias("s1"),
    )
    full_win = tr.filter(F.col("n_win") == 2 * STL_HALF + 1).select(
        "day",
        "s1",
        (7 * F.col("cents") - F.col("s1")).alias("detr7"),
        (
            F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7
        ).alias("dow"),
    )
    seas = full_win.groupBy("dow").agg(
        F.sum("detr7").alias("sdetr"), F.count(F.lit(1)).alias("n_dow")
    )
    j = full_win.join(F.broadcast(seas), "dow")
    seasonal_raw = F.col("sdetr").cast("double") / (7.0 * F.col("n_dow"))
    return j.select(
        "day",
        F.round(F.col("s1").cast("double") / 7 / 100, 4).alias("trend"),
        F.round(seasonal_raw / 100, 4).alias("seasonal"),
        F.round(
            (F.col("detr7").cast("double") / 7 - seasonal_raw) / 100, 4
        ).alias("residual"),
    )


# --------------------------------------------------------------------------
# Clickstream path analysis (round 5)
# --------------------------------------------------------------------------

PATH_LEN = 8
PATH_TOPN = 20


@query(
    "events_user_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM seq WHERE rn <= {PATH_LEN} GROUP BY user_id),
    counted AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n_users
        FROM paths GROUP BY path)
    SELECT path, n_users FROM counted
    QUALIFY row_number() OVER (ORDER BY n_users DESC, path) <= {PATH_TOPN}
    """,
)
def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 opening clickstream paths: each user's first 8 events (by
    timestamp, event_id tie-break) concatenated into a '>'-separated
    path string, ranked by how many users share the exact path.

    The per-user sequence is one window (partitioned by user — no
    global sort); path assembly is sort_array over the ≤8 collected
    (rn, type) structs, so the shuffled payload per user is bounded by
    the path length, not the user's event count.  Distinct paths grow
    combinatorially with corpus size (|event_types|^8 worst case), so
    the final top-N is ``orderBy(...).limit(PATH_TOPN)`` —
    TakeOrderedAndProject (per-partition top-N, driver merge), never a
    single-partition rank window over the unbounded path grain.
    Total order everywhere: (ts, event_id) inside the path,
    (n_users DESC, path) for the ranking.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= PATH_LEN)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    return counted.orderBy(F.desc("n_users"), F.asc("path")).limit(PATH_TOPN)


# --------------------------------------------------------------------------
# First-view → first-purchase conversion latency distribution (round 5)
# --------------------------------------------------------------------------


@query(
    "events_time_to_convert",
    oracle="""
    WITH first_view AS (
        SELECT user_id, min(ts) AS vts
        FROM events WHERE event_type = 'view' GROUP BY user_id),
    conv AS (
        SELECT v.user_id,
               min(epoch_ms(e.ts) - epoch_ms(v.vts)) AS delta_ms
        FROM first_view v
        JOIN events e
          ON e.user_id = v.user_id
         AND e.event_type = 'purchase'
         AND e.ts > v.vts
        GROUP BY v.user_id)
    SELECT CAST(delta_ms // 3600000 AS BIGINT) AS hours_to_convert,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(delta_ms) AS BIGINT) AS min_delta_ms,
           CAST(max(delta_ms) AS BIGINT) AS max_delta_ms
    FROM conv GROUP BY 1
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram: per user, milliseconds from the
    first 'view' to the first subsequent 'purchase', bucketed into
    whole hours.

    Two associative aggregates around one equi-join on user_id (the
    first-view table is a per-user min — at 100 TB both sides are
    hash-partitioned on user_id and the join co-locates; no windows,
    no skew beyond per-user event density).  Latencies are exact
    epoch-millisecond BIGINTs; the hour bucket is integer floor
    division (non-negative deltas, so truncating and flooring agree in
    both engines).
    """
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    conv = (
        fv.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("pts") > F.col("vts")),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.unix_millis("pts") - F.unix_millis("vts")).alias(
                "delta_ms"
            )
        )
    )
    return conv.groupBy(
        F.expr("delta_ms div 3600000").alias("hours_to_convert")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("delta_ms").alias("min_delta_ms"),
        F.max("delta_ms").alias("max_delta_ms"),
    )


# --------------------------------------------------------------------------
# Event-type co-occurrence within user-days (round 5)
# --------------------------------------------------------------------------


@query(
    "events_cooccurrence",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type
        FROM events),
    totals AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM ud GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ud a
        JOIN ud b ON a.user_id = b.user_id AND a.day = b.day
                 AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_both,
           ta.n_days AS n_a, tb.n_days AS n_b,
           round(CAST(p.n_both AS DOUBLE)
                 / (ta.n_days + tb.n_days - p.n_both), 6) AS jaccard
    FROM pairs p
    JOIN totals ta ON ta.event_type = p.type_a
    JOIN totals tb ON tb.event_type = p.type_b
    """,
)
def events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence: for every unordered pair of event
    types, on how many (user, day) grains both occurred, with the
    Jaccard overlap of their active-day sets.

    The corpus collapses to DISTINCT (user, day, type) first — one
    associative dedup — and the pair join is keyed on (user, day), so
    candidate pairs are bounded by |types|² per grain (types is a small
    domain), never by raw event counts; the same shape Market-basket
    co-occurrence takes at 100 TB.  Jaccard is one exact-integer
    division; totals are broadcast back onto the pair table.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).distinct()
    totals = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    a = ud.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = ud.select(
        F.col("user_id").alias("ub"),
        F.col("day").alias("db"),
        F.col("event_type").alias("type_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("day") == F.col("db"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_days").alias("n_a")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_days").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend estimator (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4) AS y
        FROM events GROUP BY 1),
    idx AS (
        SELECT datediff('day', DATE '2024-01-01', day) AS x, y FROM daily),
    slopes AS (
        SELECT a.x AS xa, b.x AS xb,
               (b.y - a.y) / (b.x - a.x) AS s
        FROM idx a JOIN idx b ON b.x > a.x),
    ranked AS (
        SELECT s,
               row_number() OVER (ORDER BY s, xa, xb) AS rn,
               count(*) OVER () AS m
        FROM slopes)
    SELECT CAST(max(m) AS BIGINT) AS n_pairs,
           round((max(CASE WHEN rn = (m + 1) // 2 THEN s END)
                  + max(CASE WHEN rn = (m + 2) // 2 THEN s END)) / 2.0,
                 6) AS sen_slope
    FROM ranked
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of the daily-revenue trend: the median of
    all pairwise slopes — the robust alternative to
    ``ts_trend_forecast``'s OLS line (one wild outlier day moves OLS,
    not the pairwise median).

    The corpus collapses to one row per day first, so the O(d²)
    pairwise stage runs over the day-level series (d days → d(d−1)/2
    slope rows), never over raw events — at 100 TB d grows with the
    retention window, not the data volume.  Determinism: each slope is
    a single IEEE division of identically-computed inputs (4dp-rounded
    daily sums, exact integer day indices), so both engines hold
    bit-identical slope doubles; the median picks rows ⌊(m+1)/2⌋ and
    ⌊(m+2)/2⌋ under the total order (s, xa, xb) and averages them —
    selection arithmetic, no accumulation.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("y"))
    idx = daily.select(
        F.datediff("day", F.lit("2024-01-01").cast("date")).alias("x"), "y"
    )
    a = idx.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = idx.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xb") > F.col("xa")).select(
        "xa",
        "xb",
        (
            (F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))
        ).alias("s"),
    )
    w = Window.orderBy("s", "xa", "xb")
    wall = Window.partitionBy()
    ranked = slopes.select(
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    lo = F.max(
        F.when(F.col("rn") == F.expr("(m + 1) div 2"), F.col("s"))
    )
    hi = F.max(
        F.when(F.col("rn") == F.expr("(m + 2) div 2"), F.col("s"))
    )
    return ranked.agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.round((lo + hi) / 2.0, 6).alias("sen_slope"),
    )


# --------------------------------------------------------------------------
# Maximum drawdown of the daily-revenue curve (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1),
    cum AS (
        SELECT day,
               sum(cents) OVER (ORDER BY day) AS equity
        FROM daily),
    dd AS (
        SELECT day, equity,
               max(equity) OVER (ORDER BY day) AS peak,
               max(equity) OVER (ORDER BY day) - equity AS drawdown
        FROM cum)
    SELECT day AS trough_day, CAST(equity AS BIGINT) AS equity_cents,
           CAST(peak AS BIGINT) AS peak_cents,
           CAST(drawdown AS BIGINT) AS drawdown_cents,
           round(CAST(drawdown AS DOUBLE) / peak, 6) AS drawdown_frac
    FROM dd
    QUALIFY row_number() OVER (ORDER BY drawdown DESC, day) = 1
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily-value curve: the day on
    which the running equity sits furthest (in absolute cents) below
    its running peak — the risk metric every monitoring/finance series
    wants next to its trend.

    Everything before the final division is exact BIGINT: daily sums
    are integer cents, the equity curve and its running peak are
    cumulative-window integer sums over the day-level table (corpus
    reduced by one associative aggregate first), and the argmax row is
    totally ordered by (drawdown DESC, day).  At 100 TB the windows
    run over |days| rows; the corpus pass is one groupBy.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day", F.sum("cents").over(wc).alias("equity")
    )
    dd = cum.select(
        "day",
        "equity",
        F.max("equity").over(wc).alias("peak"),
        (F.max("equity").over(wc) - F.col("equity")).alias("drawdown"),
    )
    return (
        dd.orderBy(F.desc("drawdown"), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("trough_day"),
            F.col("equity").alias("equity_cents"),
            F.col("peak").alias("peak_cents"),
            F.col("drawdown").alias("drawdown_cents"),
            F.round(
                F.col("drawdown").cast("double") / F.col("peak"), 6
            ).alias("drawdown_frac"),
        )
    )


# --------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_holt_winters",
    oracle="""
    WITH RECURSIVE daily0 AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY 1, 2),
    daily AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily0),
    r AS (
        SELECT event_type, rn,
               CAST(cents AS DOUBLE) AS lev,
               CAST(0 AS DOUBLE)     AS trend,
               CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[])
                   AS sarr
        FROM daily WHERE rn = 1
        UNION ALL
        SELECT event_type, rn, lev2,
               (lev2 - lev) / 2 + trend / 2,
               list_append(sarr[2:7],
                           (cents - lev2) / 2 + s_old / 2)
        FROM (
            SELECT d.event_type, d.rn, d.cents,
                   r.lev, r.trend, r.sarr,
                   r.sarr[1] AS s_old,
                   (d.cents - r.sarr[1]) / 2 + (r.lev + r.trend) / 2
                       AS lev2
            FROM daily d
            JOIN r ON d.event_type = r.event_type AND d.rn = r.rn + 1)),
    last AS (
        SELECT event_type, lev, trend, sarr,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY rn DESC) AS k
        FROM r)
    SELECT event_type,
           round(lev, 6)                          AS level,
           round(trend, 6)                        AS trend,
           round(sarr[1], 6)                      AS s_next,
           round(lev + trend + sarr[1], 6)        AS forecast_1d,
           round(lev + 7 * trend + sarr[7], 6)    AS forecast_7d
    FROM last WHERE k = 1
    """,
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing (weekly
    season m = 7, α = β = γ = ½) with 1- and 7-day-ahead forecasts —
    the seasonality-aware rung above ``ts_holt_linear``.

    The smoothing state is (level, trend, last-7-seasonals); every
    update is halvings and adds of previously-identical doubles, so
    Spark's array fold (struct accumulator carrying the 7-slot
    seasonal ring) and the oracle's recursive CTE (list column as the
    ring) execute the identical IEEE op sequence step for step —
    bit-equal state by construction, rounded once at the end.  Cold
    start: level seeds from the first observation, trend and
    seasonals from zero (uniform recursion, no special-cased warmup
    pass).  Distribution shape: one daily associative aggregate over
    the corpus, then a per-key calendar-bounded fold — |days| steps
    per key regardless of raw event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    per = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("s")
    )
    acc0 = F.expr(
        "named_struct('i', CAST(0 AS INT), 'lev', CAST(0 AS DOUBLE), "
        "'trend', CAST(0 AS DOUBLE), "
        "'sarr', array(0.0D, 0.0D, 0.0D, 0.0D, 0.0D, 0.0D, 0.0D))"
    )

    def step(acc, x):
        first = acc["i"] == 0
        s_old = F.element_at(acc["sarr"], 1)
        lev = F.when(first, x["cents"].cast("double")).otherwise(
            (x["cents"] - s_old) / 2 + (acc["lev"] + acc["trend"]) / 2
        )
        trend = F.when(first, F.lit(0.0)).otherwise(
            (lev - acc["lev"]) / 2 + acc["trend"] / 2
        )
        s_new = F.when(first, F.lit(0.0)).otherwise(
            (x["cents"] - lev) / 2 + s_old / 2
        )
        return F.struct(
            (acc["i"] + 1).alias("i"),
            lev.alias("lev"),
            trend.alias("trend"),
            F.concat(F.slice(acc["sarr"], 2, 6), F.array(s_new)).alias(
                "sarr"
            ),
        )

    folded = per.select(
        "event_type", F.aggregate("s", acc0, step).alias("f")
    )
    return folded.select(
        "event_type",
        F.round(F.col("f.lev"), 6).alias("level"),
        F.round(F.col("f.trend"), 6).alias("trend"),
        F.round(F.element_at(F.col("f.sarr"), 1), 6).alias("s_next"),
        F.round(
            F.col("f.lev") + F.col("f.trend")
            + F.element_at(F.col("f.sarr"), 1),
            6,
        ).alias("forecast_1d"),
        F.round(
            F.col("f.lev") + 7 * F.col("f.trend")
            + F.element_at(F.col("f.sarr"), 7),
            6,
        ).alias("forecast_7d"),
    )


# --------------------------------------------------------------------------
# Hampel outlier filter (rolling median ± 3·MAD) (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_hampel_outliers",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    framed AS (
        SELECT event_type, day, cents,
               list(cents) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS frame
        FROM daily),
    scored AS (
        SELECT event_type, day, cents,
               list_sort(frame)[4] AS med
        FROM framed WHERE len(frame) = 7),
    final AS (
        SELECT s.event_type, s.day, s.cents, s.med,
               list_sort(list_transform(f.frame,
                                        v -> abs(v - s.med)))[4] AS mad
        FROM scored s
        JOIN framed f ON f.event_type = s.event_type AND f.day = s.day)
    SELECT event_type, day, cents, med AS med_cents, mad AS mad_cents
    FROM final
    WHERE abs(cents - med) > 3 * mad
    """,
)
def ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter: a day is an outlier when its value sits more than
    3 rolling MADs from the rolling 7-day median — the robust
    replacement for z-score spike detection (one spike inflates a
    stddev but barely moves a median).

    Entirely integer arithmetic: daily sums are exact cents, the
    rolling median is the 4th element of the sorted 7-slot frame
    (selection, not interpolation), the MAD is the same selection over
    absolute deviations, and the flag is an integer comparison — no
    float op anywhere, so the engines cannot diverge.  The frame
    arrays are bounded (7 slots) and the windows run over the
    day-grain table; edge days with partial frames are excluded
    explicitly (len = 7) so both engines skip identical rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    framed = daily.select(
        "event_type",
        "day",
        "cents",
        F.collect_list("cents").over(w).alias("frame"),
    ).filter(F.size("frame") == 7)
    med = F.element_at(F.sort_array("frame"), 4)
    scored = framed.select(
        "event_type", "day", "cents", "frame", med.alias("med")
    )
    mad = F.element_at(
        F.sort_array(
            F.transform("frame", lambda v: F.abs(v - F.col("med")))
        ),
        4,
    )
    return (
        scored.select(
            "event_type",
            "day",
            "cents",
            F.col("med").alias("med_cents"),
            mad.alias("mad_cents"),
        )
        .filter(
            F.abs(F.col("cents") - F.col("med_cents"))
            > 3 * F.col("mad_cents")
        )
    )


# --------------------------------------------------------------------------
# Quadratic trend fit (closed-form normal equations) (round 5)
# --------------------------------------------------------------------------

from covid_19_data_analysis_bigdata_spark.operators.iterative import (  # noqa: E402
    _OLS_DETS,
)


@query(
    "ts_polyfit_quadratic",
    oracle=f"""
    WITH daily AS (
        SELECT datediff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS x,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS y
        FROM events GROUP BY 1),
    m AS (
        SELECT CAST(count(*) AS DOUBLE)        AS n,
               CAST(sum(x) AS DOUBLE)          AS sx1,
               CAST(sum(x * x) AS DOUBLE)      AS sx2,
               CAST(sum(x * x) AS DOUBLE)      AS s11,
               CAST(sum(x * x * x) AS DOUBLE)  AS s12,
               CAST(sum(x * x * x * x) AS DOUBLE) AS s22,
               CAST(sum(y) AS DOUBLE)          AS sy,
               CAST(sum(x * y) AS DOUBLE)      AS s1y,
               CAST(sum(x * x * y) AS DOUBLE)  AS s2y
        FROM daily)
    SELECT CAST(n AS BIGINT) AS n_days,
           round({_OLS_DETS['det0']} / {_OLS_DETS['det']}, 6) AS beta0,
           round({_OLS_DETS['det1']} / {_OLS_DETS['det']}, 6) AS beta1,
           round({_OLS_DETS['det2']} / {_OLS_DETS['det']}, 6) AS beta2,
           round({_OLS_DETS['det1']} / (-2.0 * {_OLS_DETS['det2']}), 6)
               AS vertex_day
    FROM m
    """,
)
def ts_polyfit_quadratic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic trend fit of daily revenue (y = b0 + b1·x + b2·x²) by
    closed-form normal equations — detects acceleration/deceleration
    that the linear ``ts_trend_forecast`` cannot, plus the vertex day
    (where the fitted parabola turns).

    The quadratic design matrix is the 2-feature OLS problem with
    (x, x²) as the features, so the solve reuses the exact
    Cramer-determinant expressions of ``ml_ols_normal_eq`` verbatim:
    eight integer power/cross moments over the day-grain table (all
    < 2⁵³ — x ≤ |days|, y exact cents), one double conversion each,
    identical determinant trees.  The vertex −b1/(2·b2) reduces to
    det1/(−2·det2) — one division, no compounding of rounded betas.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("x")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y")
    )
    x, y = F.col("x"), F.col("y")
    m = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx1"),
        F.sum(x * x).cast("double").alias("sx2"),
        F.sum(x * x).cast("double").alias("s11"),
        F.sum(x * x * x).cast("double").alias("s12"),
        F.sum(x * x * x * x).cast("double").alias("s22"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("s1y"),
        F.sum(x * x * y).cast("double").alias("s2y"),
    )
    c = F.col
    det = c("n") * (c("s11") * c("s22") - c("s12") * c("s12")) - c("sx1") * (
        c("sx1") * c("s22") - c("s12") * c("sx2")
    ) + c("sx2") * (c("sx1") * c("s12") - c("s11") * c("sx2"))
    det0 = c("sy") * (c("s11") * c("s22") - c("s12") * c("s12")) - c("sx1") * (
        c("s1y") * c("s22") - c("s12") * c("s2y")
    ) + c("sx2") * (c("s1y") * c("s12") - c("s11") * c("s2y"))
    det1 = c("n") * (c("s1y") * c("s22") - c("s12") * c("s2y")) - c("sy") * (
        c("sx1") * c("s22") - c("s12") * c("sx2")
    ) + c("sx2") * (c("sx1") * c("s2y") - c("s1y") * c("sx2"))
    det2 = c("n") * (c("s11") * c("s2y") - c("s1y") * c("s12")) - c("sx1") * (
        c("sx1") * c("s2y") - c("s1y") * c("sx2")
    ) + c("sy") * (c("sx1") * c("s12") - c("s11") * c("sx2"))
    return m.select(
        c("n").cast("long").alias("n_days"),
        F.round(det0 / det, 6).alias("beta0"),
        F.round(det1 / det, 6).alias("beta1"),
        F.round(det2 / det, 6).alias("beta2"),
        F.round(det1 / (-2.0 * det2), 6).alias("vertex_day"),
    )


# --------------------------------------------------------------------------
# Variance-ratio random-walk diagnostic (round 5)
# --------------------------------------------------------------------------

VR_K = 5


@query(
    "ts_variance_ratio",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1),
    lagged AS (
        SELECT day, cents,
               lag(cents, 1) OVER (ORDER BY day) AS l1,
               lag(cents, {VR_K}) OVER (ORDER BY day) AS lk
        FROM daily),
    d1 AS (
        SELECT count(*) AS n1,
               CAST(sum(cents - l1) AS BIGINT) AS s1,
               CAST(sum((cents - l1) * (cents - l1)) AS BIGINT) AS q1
        FROM lagged WHERE l1 IS NOT NULL),
    dk AS (
        SELECT count(*) AS nk,
               CAST(sum(cents - lk) AS BIGINT) AS sk,
               CAST(sum((cents - lk) * (cents - lk)) AS BIGINT) AS qk
        FROM lagged WHERE lk IS NOT NULL)
    SELECT CAST(n1 AS BIGINT) AS n_diff1,
           CAST(nk AS BIGINT) AS n_diffk,
           round(((CAST(nk AS DOUBLE) * qk - CAST(sk AS DOUBLE)
                   * CAST(sk AS DOUBLE))
                  / (CAST(nk AS DOUBLE) * CAST(nk AS DOUBLE)))
                 / ({VR_K}.0 * ((CAST(n1 AS DOUBLE) * q1
                                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                                / (CAST(n1 AS DOUBLE)
                                   * CAST(n1 AS DOUBLE)))), 6)
               AS variance_ratio
    FROM d1 CROSS JOIN dk
    """,
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratio VR(k) = Var(k-day diff) / (k ·
    Var(1-day diff)) of the daily-revenue series — the random-walk
    diagnostic: VR ≈ 1 for a memoryless walk, < 1 mean-reverting,
    > 1 trending.

    Both difference populations reduce to three integer sums each
    (count, Σd, Σd²) over the day-grain table; the two variances and
    their ratio are formed in one identical double expression tree
    (exact BIGINT sums converted once — Σd² can exceed 2⁵³ at large
    scale, where both engines round the SAME exact integer to the
    same double, so determinism survives even when exactness doesn't).
    Windows are two lags over |days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cents",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", VR_K).over(w).alias("lk"),
    )
    d1 = lagged.filter(F.col("l1").isNotNull()).agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(F.col("cents") - F.col("l1")).alias("s1"),
        F.sum(
            (F.col("cents") - F.col("l1")) * (F.col("cents") - F.col("l1"))
        ).alias("q1"),
    )
    dk = lagged.filter(F.col("lk").isNotNull()).agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum(F.col("cents") - F.col("lk")).alias("sk"),
        F.sum(
            (F.col("cents") - F.col("lk")) * (F.col("cents") - F.col("lk"))
        ).alias("qk"),
    )
    c = F.col
    var_k = (
        c("nk").cast("double") * c("qk")
        - c("sk").cast("double") * c("sk").cast("double")
    ) / (c("nk").cast("double") * c("nk").cast("double"))
    var_1 = (
        c("n1").cast("double") * c("q1")
        - c("s1").cast("double") * c("s1").cast("double")
    ) / (c("n1").cast("double") * c("n1").cast("double"))
    return d1.crossJoin(dk).select(
        c("n1").alias("n_diff1"),
        c("nk").alias("n_diffk"),
        F.round(var_k / (float(VR_K) * var_1), 6).alias("variance_ratio"),
    )


# --------------------------------------------------------------------------
# Inter-arrival time statistics per event type (round 5)
# --------------------------------------------------------------------------


@query(
    "events_inter_arrival",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id)
                   AS gap_ms
        FROM events),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT)   AS n_gaps,
               CAST(sum(gap_ms) AS BIGINT) AS s1,
               CAST(sum(gap_ms * gap_ms) AS BIGINT) AS s2,
               CAST(min(gap_ms) AS BIGINT) AS min_gap_ms,
               CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
        FROM seq WHERE gap_ms IS NOT NULL
        GROUP BY event_type)
    SELECT event_type, n_gaps, min_gap_ms, max_gap_ms,
           round(CAST(s1 AS DOUBLE) / n_gaps, 6) AS mean_gap_ms,
           round(sqrt(CAST(n_gaps AS DOUBLE) * s2
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 / CAST(s1 AS DOUBLE), 6) AS cv
    FROM m
    """,
)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event type: mean gap, extremes,
    and the coefficient of variation — CV ≈ 1 marks a Poisson-like
    memoryless stream, CV ≫ 1 bursty, CV ≪ 1 metronomic; the traffic
    fingerprint capacity planning reads first.

    Gaps are exact epoch-millisecond integers (the ms grain keeps Σg² inside int64 — µs squares overflow) from one per-type lag
    window (partitioned; at 100 TB a (type, day-bucket) key bounds
    partition height and only bucket boundaries need a stitch pass).
    CV is formed from three exact integer sums in an identical
    expression tree: √(n·Σg² − (Σg)²) / Σg — algebraically
    sd_pop/mean · n/n, so no intermediate mean is materialized and
    rounded.  Σg² stays under 2⁶³ for day-bounded partitions (gaps
    are bounded by the bucket span, the same bound that keeps the
    window partition bounded).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (
            F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)
        ).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_ms").alias("s1"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).alias("s2"),
        F.min("gap_ms").alias("min_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
    )
    c = F.col
    return m.select(
        "event_type",
        "n_gaps",
        "min_gap_ms",
        "max_gap_ms",
        F.round(c("s1").cast("double") / c("n_gaps"), 6).alias(
            "mean_gap_ms"
        ),
        F.round(
            F.sqrt(
                c("n_gaps").cast("double") * c("s2")
                - c("s1").cast("double") * c("s1").cast("double")
            )
            / c("s1").cast("double"),
            6,
        ).alias("cv"),
    )


# --------------------------------------------------------------------------
# Multi-step funnel with step-wise conversion (round 5)
# --------------------------------------------------------------------------


@query(
    "events_funnel_steps",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT v.user_id, v.t1, min(e.ts) AS t2
        FROM v JOIN events e
          ON e.user_id = v.user_id AND e.event_type = 'click'
         AND e.ts > v.t1
        GROUP BY v.user_id, v.t1),
    p AS (
        SELECT c.user_id, c.t1, c.t2, min(e.ts) AS t3
        FROM c JOIN events e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
         AND e.ts > c.t2
        GROUP BY c.user_id, c.t1, c.t2),
    counts AS (
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_click,
               (SELECT count(*) FROM p) AS n_purchase)
    SELECT CAST(n_view AS BIGINT)     AS n_view,
           CAST(n_click AS BIGINT)    AS n_click,
           CAST(n_purchase AS BIGINT) AS n_purchase,
           round(100.0 * n_click / n_view, 6)        AS view_to_click_pct,
           round(100.0 * n_purchase / n_click, 6)    AS click_to_purchase_pct,
           round(100.0 * n_purchase / n_view, 6)     AS overall_pct
    FROM counts
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (first view → first later click →
    first later purchase) with step-wise and overall conversion — the
    product-analytics staple one rung above the two-step
    ``events_funnel_conversion``.

    Each step is a per-user min over an equi-join on user_id against
    the previous step's (bounded, one-row-per-user) frontier — the
    chain co-partitions on the user key end to end, so N funnel steps
    are N co-located joins, never a sequence scan with growing state.
    All counts are exact; conversions are single divisions.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    c = (
        v.join(
            clicks,
            (F.col("cu") == F.col("user_id")) & (F.col("cts") > F.col("t1")),
        )
        .groupBy("user_id", "t1")
        .agg(F.min("cts").alias("t2"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    p = (
        c.join(
            buys,
            (F.col("pu") == F.col("user_id")) & (F.col("pts") > F.col("t2")),
        )
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("pts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    j = nv.crossJoin(nc).crossJoin(np_)
    return j.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(100.0 * F.col("n_click") / F.col("n_view"), 6).alias(
            "view_to_click_pct"
        ),
        F.round(
            100.0 * F.col("n_purchase") / F.col("n_click"), 6
        ).alias("click_to_purchase_pct"),
        F.round(100.0 * F.col("n_purchase") / F.col("n_view"), 6).alias(
            "overall_pct"
        ),
    )


# --------------------------------------------------------------------------
# Per-user longest activity streak (round 5)
# --------------------------------------------------------------------------

STREAK_TOPN = 20


@query(
    "events_active_streak_users",
    oracle=f"""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
    grp AS (
        SELECT user_id, day,
               datediff('day', DATE '1970-01-01', day)
               - row_number() OVER (
                     PARTITION BY user_id ORDER BY day) AS anchor
        FROM act),
    runs AS (
        SELECT user_id, anchor,
               CAST(count(*) AS BIGINT) AS streak_days,
               min(day) AS streak_start
        FROM grp GROUP BY user_id, anchor),
    best AS (
        SELECT user_id, streak_days, streak_start
        FROM runs
        QUALIFY row_number() OVER (
            PARTITION BY user_id
            ORDER BY streak_days DESC, streak_start) = 1)
    SELECT user_id, streak_days, streak_start
    FROM best
    QUALIFY row_number() OVER (
        ORDER BY streak_days DESC, user_id) <= {STREAK_TOPN}
    """,
)
def events_active_streak_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 users with the longest consecutive-day activity streaks
    (and when each streak began) — the engagement metric behind
    'X-day streak' product mechanics.

    Classic gaps-and-islands: distinct (user, day) grain, then the
    day-minus-row_number anchor groups consecutive days into runs with
    ONE per-user window and one aggregate — no self-join, no recursion.
    All arithmetic is exact integer epoch-day; every ranking carries a
    total order.  The corpus touches one DISTINCT; everything after
    runs at the user-day grain.  The final top-20 is
    ``orderBy().limit`` — TakeOrderedAndProject keeps a 20-row heap
    per partition and merges on the driver, so the unbounded user
    population is never sorted in one partition (vs the
    ``Window.orderBy`` rank this replaced).
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    epoch = F.lit("1970-01-01").cast("date")
    wu = Window.partitionBy("user_id").orderBy("day")
    grp = act.select(
        "user_id",
        "day",
        (F.datediff(F.col("day"), epoch) - F.row_number().over(wu)).alias(
            "anchor"
        ),
    )
    runs = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    best = (
        runs.withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") == 1)
        .select("user_id", "streak_days", "streak_start")
    )
    return best.orderBy(F.desc("streak_days"), F.asc("user_id")).limit(
        STREAK_TOPN
    )


# --------------------------------------------------------------------------
# Local-maxima peak detection with integer prominence (round 5)
# --------------------------------------------------------------------------

PEAK_PROM_PCT = 10


@query(
    "ts_peak_detection",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    nbr AS (
        SELECT event_type, day, cents,
               lag(cents)  OVER w AS prev_c,
               lead(cents) OVER w AS next_c
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day, cents,
           prev_c AS prev_cents, next_c AS next_cents
    FROM nbr
    WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
      AND cents > prev_c AND cents > next_c
      AND (cents - greatest(prev_c, next_c)) * 100
          > {PEAK_PROM_PCT} * greatest(prev_c, next_c)
    """,
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maxima peak detection: a day strictly above both
    neighbors whose height clears the taller neighbor by more than
    10% — the spike-cataloging pass that feeds incident review (which
    days DID spike, not just whether today deviates, which is
    ``ts_anomaly_zscore``'s job).

    One lag+lead window per series over the day-grain table; the
    prominence test is exact-integer cross-multiplication
    (Δ·100 > 10·max(neighbors)) — no division, no float threshold
    ambiguity.  Both the window partitioning and the candidate set
    are bounded by |series| × |days|.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    nbr = daily.select(
        "event_type",
        "day",
        "cents",
        F.lag("cents").over(w).alias("prev_c"),
        F.lead("cents").over(w).alias("next_c"),
    ).filter(F.col("prev_c").isNotNull() & F.col("next_c").isNotNull())
    tall = F.greatest(F.col("prev_c"), F.col("next_c"))
    return nbr.filter(
        (F.col("cents") > F.col("prev_c"))
        & (F.col("cents") > F.col("next_c"))
        & ((F.col("cents") - tall) * 100 > PEAK_PROM_PCT * tall)
    ).select(
        "event_type",
        "day",
        "cents",
        F.col("prev_c").alias("prev_cents"),
        F.col("next_c").alias("next_cents"),
    )


# --------------------------------------------------------------------------
# Session bounce rate (round 5)
# --------------------------------------------------------------------------


@query(
    "events_bounce_rate",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g),
    sess AS (
        SELECT user_id, session_no,
               CAST(date_trunc('day', min(ts)) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_no)
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(100.0 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / count(*), 6) AS bounce_pct
    FROM sess GROUP BY day
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of 30-minute-gap sessions that
    contain exactly one event, attributed to the session's start day —
    the engagement-quality headline next to session counts.

    Reuses the gaps-and-islands sessionization (one per-user lag + one
    running sum — no self-join), collapses to session grain, then one
    conditional aggregate per day.  Counts exact, one division.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = g.select(
        "user_id", "ts", F.sum("is_new").over(ws).alias("session_no")
    )
    sess = s.groupBy("user_id", "session_no").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(bounce).alias("n_bounces"),
        F.round(
            100.0 * F.sum(bounce) / F.count(F.lit(1)), 6
        ).alias("bounce_pct"),
    )


# --------------------------------------------------------------------------
# Second-order Markov transitions (round 5)
# --------------------------------------------------------------------------


@query(
    "events_markov_second_order",
    oracle="""
    WITH tri AS (
        SELECT lag(event_type, 2) OVER w AS prev2,
               lag(event_type, 1) OVER w AS prev1,
               event_type AS cur
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    cnt AS (
        SELECT prev2, prev1, cur, CAST(count(*) AS BIGINT) AS n
        FROM tri WHERE prev2 IS NOT NULL
        GROUP BY prev2, prev1, cur)
    SELECT prev2, prev1, cur, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY prev2, prev1), 6) AS p_cond
    FROM cnt
    """,
)
def events_markov_second_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov model of the event stream: counts and
    conditional probabilities of each event type given the TWO
    preceding events in the same user's timeline — what a next-action
    predictor or anomalous-flow detector trains on (first-order
    transitions are ``report_event_transitions``; a second order
    exposes context the first order blends away).

    Two lags over one per-user window (single shuffle on user_id),
    then a group-by on the trigram — the state space is |types|³, so
    the aggregate output is tiny no matter the corpus size.  The
    conditional probability divides two exact BIGINTs per row, and
    the context totals come from a window over the grouped (tiny)
    table, not a second scan.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("prev2"),
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.col("event_type").alias("cur"),
    ).filter(F.col("prev2").isNotNull())
    cnt = tri.groupBy("prev2", "prev1", "cur").agg(
        F.count(F.lit(1)).alias("n")
    )
    ctx = Window.partitionBy("prev2", "prev1")
    return cnt.select(
        "prev2",
        "prev1",
        "cur",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(ctx), 6
        ).alias("p_cond"),
    )


# --------------------------------------------------------------------------
# Stochastic oscillator (%K / %D) (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_stochastic_oscillator",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    ext AS (
        SELECT event_type, day, cents,
               min(cents) OVER w14  AS mn,
               max(cents) OVER w14  AS mx,
               count(*)  OVER w14   AS n14
        FROM daily
        WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
    k AS (
        SELECT event_type, day,
               100.0 * (cents - mn) / (mx - mn) AS kraw
        FROM ext WHERE n14 = 14 AND mx > mn),
    d AS (
        SELECT event_type, day, kraw,
               lag(kraw, 1) OVER w AS k1,
               lag(kraw, 2) OVER w AS k2
        FROM k WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day,
           round(kraw, 6) AS pct_k,
           round((kraw + k1 + k2) / 3.0, 6) AS pct_d
    FROM d WHERE k2 IS NOT NULL
    """,
)
def ts_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator over each event-type's daily value
    series: %K locates today inside the trailing 14-day min–max range
    (0 = at the low, 100 = at the high) and %D smooths %K with a
    3-day mean — the classic overbought/oversold momentum pair.

    One day-grain rollup, one 14-row min/max/count frame, then two
    explicit lags for the smoother — three window passes over the SAME
    per-series partitioning, so one shuffle on event_type total.
    Warm-up rows (frame < 14 days) and flat ranges (max = min) are
    excluded with exact integer tests; %D sums its three unrounded
    doubles in explicit left-to-right lag order so both engines hit
    identical IEEE operations before the single 6 dp round.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w14 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, 0)
    )
    ext = daily.select(
        "event_type",
        "day",
        "cents",
        F.min("cents").over(w14).alias("mn"),
        F.max("cents").over(w14).alias("mx"),
        F.count(F.lit(1)).over(w14).alias("n14"),
    )
    k = ext.filter((F.col("n14") == 14) & (F.col("mx") > F.col("mn"))).select(
        "event_type",
        "day",
        (
            100.0
            * (F.col("cents") - F.col("mn"))
            / (F.col("mx") - F.col("mn"))
        ).alias("kraw"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = k.select(
        "event_type",
        "day",
        "kraw",
        F.lag("kraw", 1).over(w).alias("k1"),
        F.lag("kraw", 2).over(w).alias("k2"),
    ).filter(F.col("k2").isNotNull())
    return d.select(
        "event_type",
        "day",
        F.round(F.col("kraw"), 6).alias("pct_k"),
        F.round(
            (F.col("kraw") + F.col("k1") + F.col("k2")) / 3.0, 6
        ).alias("pct_d"),
    )


# --------------------------------------------------------------------------
# 7-day rolling retention (round 5)
# --------------------------------------------------------------------------


@query(
    "events_rolling_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
    ret AS (
        SELECT a.day,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN b.user_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
        FROM act a
        LEFT JOIN act b ON b.user_id = a.user_id
                       AND b.day = a.day + INTERVAL 7 DAY
        GROUP BY a.day),
    mx AS (SELECT max(day) AS last_day FROM act)
    SELECT day, n_active, n_retained,
           round(100.0 * n_retained / n_active, 6) AS retention_pct
    FROM ret, mx
    WHERE day <= last_day - INTERVAL 7 DAY
    """,
)
def events_rolling_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-7 rolling retention: of the users active on day d, the
    share also active exactly on day d+7 — the growth-team headline
    that monthly cohort retention (``report_retention_cohort``) is too
    coarse to show.

    The stream collapses to the distinct (user, day) activity grid
    first — the only full-data pass — then a self equi-join on
    (user, day+7) over that much smaller grid; both sides hash on
    user_id so the join co-partitions, and days beyond the observable
    horizon are cut against the max-day scalar rather than silently
    reported as churn.  Counts exact, one division per day row.
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    a = act.alias("a")
    b = act.alias("b")
    ret = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.day") == F.date_add(F.col("a.day"), 7)),
            "left",
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                F.when(F.col("b.user_id").isNotNull(), 1).otherwise(0)
            ).alias("n_retained"),
        )
    )
    mx = act.agg(F.max("day").alias("last_day"))
    return (
        ret.crossJoin(F.broadcast(mx))
        .filter(F.col("day") <= F.date_sub(F.col("last_day"), 7))
        .select(
            "day",
            "n_active",
            "n_retained",
            F.round(
                100.0 * F.col("n_retained") / F.col("n_active"), 6
            ).alias("retention_pct"),
        )
    )


# --------------------------------------------------------------------------
# Relative Strength Index (SMA variant) (round 5)
# --------------------------------------------------------------------------

RSI_DAYS = 14


@query(
    "ts_rsi",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    chg AS (
        SELECT event_type, day,
               cents - lag(cents) OVER w AS delta
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    acc AS (
        SELECT event_type, day,
               CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
                    OVER w14 AS BIGINT) AS gains,
               CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
                    OVER w14 AS BIGINT) AS losses,
               count(delta) OVER w14 AS n14
        FROM chg
        WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN {RSI_DAYS - 1} PRECEDING
                            AND CURRENT ROW))
    SELECT event_type, day, gains, losses,
           round(100.0 * gains / (gains + losses), 6) AS rsi
    FROM acc WHERE n14 = {RSI_DAYS} AND gains + losses > 0
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day Relative Strength Index (simple-average variant) per
    event-type series: RSI = 100·G/(G+L) where G and L are the summed
    up-moves and down-moves over the trailing window — the
    overbought/oversold companion to ``ts_stochastic_oscillator``
    (which locates the level; RSI characterizes the moves).

    Day-grain rollup → one lag for deltas → one 14-row frame summing
    gains and losses — all three passes share the per-series
    partitioning, one shuffle total.  Deltas are integer cents, so G
    and L are exact BIGINTs and the identity RSI = 100·G/(G+L) needs
    exactly ONE division (the textbook 100−100/(1+RS) form divides
    twice and loses exactness); warm-up rows are excluded by an exact
    frame count.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    chg = daily.select(
        "event_type",
        "day",
        (F.col("cents") - F.lag("cents").over(w)).alias("delta"),
    )
    w14 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(RSI_DAYS - 1), 0)
    )
    acc = chg.select(
        "event_type",
        "day",
        F.sum(
            F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)
        ).over(w14).alias("gains"),
        F.sum(
            F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0)
        ).over(w14).alias("losses"),
        F.count("delta").over(w14).alias("n14"),
    )
    return acc.filter(
        (F.col("n14") == RSI_DAYS) & (F.col("gains") + F.col("losses") > 0)
    ).select(
        "event_type",
        "day",
        "gains",
        "losses",
        F.round(
            100.0 * F.col("gains") / (F.col("gains") + F.col("losses")), 6
        ).alias("rsi"),
    )


# --------------------------------------------------------------------------
# EWMA crossover signals (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_ewma_crossover",
    oracle="""
    WITH RECURSIVE daily0 AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    daily AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily0),
    r AS (
        SELECT event_type, rn, day,
               CAST(cents AS DOUBLE) AS fast,
               CAST(cents AS DOUBLE) AS slow
        FROM daily WHERE rn = 1
        UNION ALL
        SELECT d.event_type, d.rn, d.day,
               d.cents / 2 + r.fast / 2,
               d.cents / 8 + 7 * (r.slow / 8)
        FROM daily d JOIN r ON d.event_type = r.event_type
                           AND d.rn = r.rn + 1),
    sgn AS (
        SELECT event_type, day,
               CASE WHEN fast > slow THEN 1
                    WHEN fast < slow THEN -1 ELSE 0 END AS s,
               lag(CASE WHEN fast > slow THEN 1
                        WHEN fast < slow THEN -1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY day) AS prev_s
        FROM r)
    SELECT event_type, day,
           CASE WHEN s > prev_s THEN 'golden' ELSE 'death' END AS crossover
    FROM sgn WHERE prev_s IS NOT NULL AND s <> prev_s
    """,
)
def ts_ewma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow EWMA crossover detector: days where the half-life-1
    smoother (α=½) crosses the slower α=⅛ smoother — the golden-cross
    / death-cross momentum signal, here over each event-type's daily
    value series.

    Both smoothers advance inside ONE per-series array fold (the
    ``ts_ewma_halflife`` discipline: days collected per type, bounded
    by the calendar), with steps written as x/2 + s/2 and
    x/8 + 7·(s/8) — halvings are exact IEEE operations and the single
    multiply/add sequence is identical in the oracle's recursive CTE,
    so both engines walk bit-equal (fast, slow) states and the sign
    comparisons agree exactly.  Crossings are then one lag over the
    day-grain signs.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    per = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("s")
    )
    acc0 = F.expr(
        "CAST(array() AS array<struct<day:date,fast:double,slow:double>>)"
    )

    def step(acc, x):
        prev_fast = F.element_at(acc, -1)["fast"]
        prev_slow = F.element_at(acc, -1)["slow"]
        c = x["cents"].cast("double")
        first = F.size(acc) == 0
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    F.when(first, c)
                    .otherwise(c / 2 + prev_fast / 2)
                    .alias("fast"),
                    F.when(first, c)
                    .otherwise(c / 8 + 7 * (prev_slow / 8))
                    .alias("slow"),
                )
            ),
        )

    folded = per.select(
        "event_type", F.explode(F.aggregate("s", acc0, step)).alias("e")
    ).select(
        "event_type",
        F.col("e.day").alias("day"),
        F.when(F.col("e.fast") > F.col("e.slow"), 1)
        .when(F.col("e.fast") < F.col("e.slow"), -1)
        .otherwise(0)
        .alias("s"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    sgn = folded.select(
        "event_type", "day", "s", F.lag("s").over(w).alias("prev_s")
    )
    return sgn.filter(
        F.col("prev_s").isNotNull() & (F.col("s") != F.col("prev_s"))
    ).select(
        "event_type",
        "day",
        F.when(F.col("s") > F.col("prev_s"), "golden")
        .otherwise("death")
        .alias("crossover"),
    )


# --------------------------------------------------------------------------
# XmR (individuals / moving-range) control chart (round 5)
# --------------------------------------------------------------------------


@query(
    "ts_control_chart_xmr",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2),
    mr AS (
        SELECT event_type, day, cents,
               abs(cents - lag(cents) OVER w) AS mrange
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    lim AS (
        SELECT event_type,
               CAST(sum(cents) AS BIGINT)  AS s,
               CAST(count(*) AS BIGINT)    AS n,
               CAST(sum(mrange) AS BIGINT) AS smr,
               CAST(count(mrange) AS BIGINT) AS nmr
        FROM mr GROUP BY event_type)
    SELECT m.event_type, m.day, m.cents,
           round(CAST(l.s AS DOUBLE) / l.n
                 + 2.66 * l.smr / l.nmr, 6) AS ucl,
           round(CAST(l.s AS DOUBLE) / l.n
                 - 2.66 * l.smr / l.nmr, 6) AS lcl,
           CAST(m.cents > CAST(l.s AS DOUBLE) / l.n
                          + 2.66 * l.smr / l.nmr
                OR m.cents < CAST(l.s AS DOUBLE) / l.n
                             - 2.66 * l.smr / l.nmr
                AS BOOLEAN) AS out_of_control
    FROM mr m JOIN lim l ON m.event_type = l.event_type
    """,
)
def ts_control_chart_xmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals + moving-range) control chart per event-type
    series: natural process limits x̄ ± 2.66·m̄R from consecutive-day
    moving ranges, flagging out-of-control days — the SPC chart that
    separates routine variation from special causes, unlike the
    z-score scan (``ts_anomaly_zscore``) whose sigma is inflated by
    the very shifts it hunts.

    One per-series lag pass for moving ranges, one tiny per-series
    aggregate for the limits, then a broadcast join back — the limits
    table is |series| rows, so the join is map-side at any scale.
    Ranges and sums are exact integer cents; the control limits are
    one shared double expression evaluated identically by both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    mr = daily.select(
        "event_type",
        "day",
        "cents",
        F.abs(F.col("cents") - F.lag("cents").over(w)).alias("mrange"),
    )
    lim = mr.groupBy("event_type").agg(
        F.sum("cents").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum("mrange").alias("smr"),
        F.count("mrange").alias("nmr"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    band = 2.66 * F.col("smr") / F.col("nmr")
    return mr.join(F.broadcast(lim), "event_type").select(
        "event_type",
        "day",
        "cents",
        F.round(mean + band, 6).alias("ucl"),
        F.round(mean - band, 6).alias("lcl"),
        (
            (F.col("cents") > mean + band) | (F.col("cents") < mean - band)
        ).alias("out_of_control"),
    )


# --------------------------------------------------------------------------
# Overdispersion (variance-to-mean) test of daily arrival counts (round 5)
# --------------------------------------------------------------------------


@query(
    "events_overdispersion",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT)    AS n_days,
               CAST(sum(c) AS BIGINT)      AS s1,
               CAST(sum(c * c) AS BIGINT)  AS s2
        FROM daily GROUP BY event_type)
    SELECT event_type, n_days, s1 AS n_events,
           round(CAST(s1 AS DOUBLE) / n_days, 6) AS mean_per_day,
           round(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
                 / (CAST(n_days AS DOUBLE) * n_days), 6) AS var_per_day,
           round(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
                 / (CAST(n_days AS DOUBLE) * s1), 6) AS dispersion_idx
    FROM m
    """,
)
def events_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion test of daily arrivals per event type: the
    variance-to-mean (Fisher dispersion) index that checks the Poisson
    assumption behind rate alerting — index ≈ 1 means Poisson traffic
    (``stream_error_rate_alert``'s thresholds are sound); index ≫ 1
    means bursty arrivals and a naive rate alert will page on every
    burst.

    Day-grain counts, then integer moments per series: population
    variance is the division-free (n·Σc² − (Σc)²)/n² form, dispersion
    divides by Σc instead — each one double expression over exact
    BIGINTs, identical in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    var_num = (
        F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1")
    ).cast("double")
    return m.select(
        "event_type",
        "n_days",
        F.col("s1").alias("n_events"),
        F.round(F.col("s1").cast("double") / F.col("n_days"), 6).alias(
            "mean_per_day"
        ),
        F.round(
            var_num / (F.col("n_days").cast("double") * F.col("n_days")), 6
        ).alias("var_per_day"),
        F.round(
            var_num / (F.col("n_days").cast("double") * F.col("s1")), 6
        ).alias("dispersion_idx"),
    )


# --------------------------------------------------------------------------
# Dickey-Fuller-style AR(1) unit-root diagnostic (round 7)
# --------------------------------------------------------------------------


@query(
    "ts_ar1_unit_root",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT)            AS v
        FROM events GROUP BY 1, 2),
    lagged AS (
        SELECT event_type,
               v - lag(v) OVER w AS dy,
               lag(v) OVER w     AS x
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    mom AS (
        SELECT event_type,
               CAST(count(x) AS BIGINT)      AS m,
               CAST(sum(x) AS BIGINT)        AS sx,
               CAST(sum(dy) AS BIGINT)       AS sy,
               CAST(sum(x * x) AS BIGINT)    AS sxx,
               CAST(sum(x * dy) AS BIGINT)   AS sxy,
               CAST(sum(dy * dy) AS BIGINT)  AS syy
        FROM lagged WHERE x IS NOT NULL
        GROUP BY event_type),
    st AS (
        SELECT event_type, m,
               CAST(m * sxx - sx * sx AS DOUBLE) AS sxx_c,
               CAST(m * sxy - sx * sy AS DOUBLE) AS sxy_c,
               CAST(m * syy - sy * sy AS DOUBLE) AS syy_c
        FROM mom)
    SELECT event_type, m AS n_diffs,
           round(sxy_c / sxx_c, 6) AS gamma,
           round((sxy_c / sxx_c)
                 / sqrt(((syy_c - sxy_c * sxy_c / sxx_c) / (m * (m - 2)))
                        * (m / sxx_c)), 6) AS t_df,
           ((sxy_c / sxx_c)
            / sqrt(((syy_c - sxy_c * sxy_c / sxx_c) / (m * (m - 2)))
                   * (m / sxx_c))) < -2.89 AS rejects_unit_root
    FROM st
    """,
)
def ts_ar1_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller-style unit-root diagnostic per event type: regress
    the daily-volume DIFFERENCE on the lagged level (Δv_t = α + γ·v_{t−1})
    and test γ < 0 — a series that mean-reverts (stationary) pulls its
    next change against its level; a random walk doesn't.  The
    stationarity gate run before trusting ``ts_autocorr_lag`` /
    ``ts_trend_forecast`` readouts; −2.89 is the 5% DF critical value
    (drift case, literal pinned in both engines).

    Daily volumes are exact BIGINT counts, so every regression moment
    (Σx, Σy, Σxy, Σx², Σy² over the m = n−1 lag pairs) is an exact
    integer; γ̂, its standard error (via the SSE identity
    SSE·m = Syy − Sxy²/Sxx on the centered moments) and the t ratio
    are one shared double expression over those integers — bit-identical
    cross-engine, so even the boolean threshold flag cannot flap.  One
    bounded day-grain window per type, one tiny aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        (F.col("v") - F.lag("v").over(w)).alias("dy"),
        F.lag("v").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    mom = lagged.groupBy("event_type").agg(
        F.count("x").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    m = F.col("m")
    sxx_c = (m * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    sxy_c = (m * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    syy_c = (m * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    gamma = sxy_c / sxx_c
    t_df = gamma / F.sqrt(
        ((syy_c - sxy_c * sxy_c / sxx_c) / (m * (m - 2))) * (m / sxx_c)
    )
    return mom.select(
        "event_type",
        m.alias("n_diffs"),
        F.round(gamma, 6).alias("gamma"),
        F.round(t_df, 6).alias("t_df"),
        (t_df < -2.89).alias("rejects_unit_root"),
    )


# --------------------------------------------------------------------------
# Correlogram / changepoint / seasonality diagnostics (round 7)
# --------------------------------------------------------------------------

_TYPE_DAILY_SQL = """
    daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT)            AS v
        FROM events GROUP BY 1, 2)
"""


@query(
    "ts_acf_lags",
    oracle=f"""
    WITH {_TYPE_DAILY_SQL},
    lags AS (SELECT CAST(range AS INTEGER) AS lag FROM range(1, 8)),
    pairs AS (
        SELECT a.event_type, l.lag, a.v AS x, b.v AS y
        FROM daily a
        CROSS JOIN lags l
        JOIN daily b
          ON b.event_type = a.event_type AND b.day = a.day - l.lag),
    mom AS (
        SELECT event_type, lag,
               CAST(count(*) AS BIGINT)     AS m,
               CAST(sum(x) AS BIGINT)       AS sx,
               CAST(sum(y) AS BIGINT)       AS sy,
               CAST(sum(x * x) AS BIGINT)   AS sxx,
               CAST(sum(y * y) AS BIGINT)   AS syy,
               CAST(sum(x * y) AS BIGINT)   AS sxy
        FROM pairs GROUP BY 1, 2)
    SELECT event_type, lag, m AS n_pairs,
           round(CAST(m * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                        * CAST(m * syy - sy * sy AS DOUBLE)), 6) AS acf
    FROM mom
    """,
)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlogram: autocorrelation of the per-type daily volume at lags
    1..7 — the diagnostic read before picking an AR order or a seasonal
    window (a lag-7 spike says weekly cycle; a slow decay says trend,
    go difference first — the ``ts_ar1_unit_root`` companion).

    Alignment is by CALENDAR ARITHMETIC, not row adjacency: the lagged
    pair joins on ``day − lag`` so a missing day drops its pairs in
    both engines rather than silently sliding to the previous present
    row (what a ``lag()`` window would do).  The 7 lag offsets are a
    broadcast literal dimension crossed onto the day-grain aggregate —
    the expensive raw-events pass reduces to day grain ONCE, and the
    7-way self-join runs on the tiny (type, day) frame, shuffling on
    its join key.  All six moments per (type, lag) are exact BIGINTs;
    the Pearson ratio is one shared double expression.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("v"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", "day", "lag", F.col("v").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("day").alias("bday"),
        F.col("v").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("bday") == F.date_sub(F.col("day"), F.col("lag"))),
    )
    mom = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = F.col("m")
    num = (m * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (m * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (m * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return mom.select(
        "event_type",
        "lag",
        m.alias("n_pairs"),
        F.round(num / den, 6).alias("acf"),
    )


@query(
    "ts_dow_seasonal_strength",
    oracle=f"""
    WITH {_TYPE_DAILY_SQL},
    bygrp AS (
        SELECT event_type, isodow(day) AS dow,
               CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(v) AS BIGINT)   AS s_g
        FROM daily GROUP BY 1, 2),
    terms AS (
        SELECT event_type,
               CAST(sum(CAST(round(1000000.0 * s_g * s_g / n_g)
                             AS BIGINT)) AS BIGINT) AS grp_micro
        FROM bygrp GROUP BY 1),
    tot AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT)   AS n,
               CAST(sum(v) AS BIGINT)     AS t,
               CAST(sum(v * v) AS BIGINT) AS sq
        FROM daily GROUP BY 1),
    st AS (
        SELECT g.event_type, t.n,
               g.grp_micro
                 - CAST(round(1000000.0 * t.t * t.t / t.n) AS BIGINT)
                   AS ssb_micro,
               1000000 * t.sq
                 - CAST(round(1000000.0 * t.t * t.t / t.n) AS BIGINT)
                   AS sst_micro
        FROM terms g JOIN tot t ON t.event_type = g.event_type)
    SELECT event_type, n AS n_days, ssb_micro, sst_micro,
           round(CAST(ssb_micro AS DOUBLE) / sst_micro, 6) AS eta2
    FROM st
    """,
)
def ts_dow_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength per event type: η² — the share
    of daily-volume variance explained by which weekday it is
    (between-group SSB over total SST).  η²→1 says the series is
    dominated by a weekly cycle (forecast per-dow); η²→0 says don't
    bother — the quantitative gate for ``ts_acf_lags``'s lag-7 read.

    Both sums of squares live in integer MICRO-UNITS (the
    ``ml_cramers_v`` idiom): each per-dow term 10⁶·s_g²/n_g and the
    grand term 10⁶·T²/n are single correctly-rounded divisions of
    exact BIGINTs (every intermediate < 2⁵³, so the doubles are exact;
    DECIMAL(38,0) is the swap-in at SF ≥ 100), and the 7-term sum is
    BIGINT — no float fold order anywhere before the one closing
    division.  Dataflow: one day-grain reduce, two tiny aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("v"))
    bygrp = daily.groupBy(
        "event_type", (F.weekday("day") + 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n_g"), F.sum("v").alias("s_g"))
    terms = bygrp.groupBy("event_type").agg(
        F.sum(
            F.round(
                F.lit(1000000.0) * F.col("s_g") * F.col("s_g") / F.col("n_g")
            ).cast("long")
        ).alias("grp_micro")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("t"),
        F.sum(F.col("v") * F.col("v")).alias("sq"),
    )
    grand = F.round(
        F.lit(1000000.0) * F.col("t") * F.col("t") / F.col("n")
    ).cast("long")
    st = terms.join(tot, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        (F.col("grp_micro") - grand).alias("ssb_micro"),
        (F.lit(1000000) * F.col("sq") - grand).alias("sst_micro"),
    )
    return st.select(
        "event_type",
        "n_days",
        "ssb_micro",
        "sst_micro",
        F.round(
            F.col("ssb_micro").cast("double") / F.col("sst_micro"), 6
        ).alias("eta2"),
    )


# --------------------------------------------------------------------------
# Sweep-line peak session concurrency (round 7)
# --------------------------------------------------------------------------

from covid_19_data_analysis_bigdata_spark.operators.nonparam import (  # noqa: E402
    _cum_below_multi,
)


@query(
    "events_peak_concurrency",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
               CASE WHEN epoch_ms(ts)
                         - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, t_ms,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY t_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM marked),
    iv AS MATERIALIZED (
        SELECT min(t_ms) AS s, max(t_ms) AS e
        FROM sessions GROUP BY user_id, session_no),
    pts AS (
        SELECT s AS t, 1 AS st, 0 AS en FROM iv
        UNION ALL
        SELECT e AS t, 0 AS st, 1 AS en FROM iv),
    ag AS (
        SELECT t, CAST(sum(st) AS BIGINT) AS starts,
                  CAST(sum(en) AS BIGINT) AS ends
        FROM pts GROUP BY t),
    c AS (
        SELECT t,
               CAST(sum(starts) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT)
               - CAST(coalesce(sum(ends) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS conc
        FROM ag)
    SELECT DATE '1970-01-01' + CAST(t // 86400000 AS INTEGER) AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(count(*) AS BIGINT)  AS n_points
    FROM c GROUP BY day
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day, by sweep line: sessionize
    (the ``win_sessionize_batch`` 30-minute-gap rule), turn every
    session into a closed interval [start, end], and sweep the +1/-1
    boundary deltas in time order — concurrency at instant t counts
    sessions with start <= t and end >= t (a session ending exactly at
    t still counts).  The capacity-planning staple (max simultaneous
    users) that naive ``GROUP BY time-bucket`` counting gets wrong
    whenever sessions span buckets.

    Scale design: the running boundary sums come from the distributed
    prefix-sum (:func:`nonparam._cum_below_multi` — range repartition,
    partition-local windows, triangle-join offsets), NOT a global
    window, so the sweep parallelizes over disjoint time ranges at any
    data size; deltas are pre-aggregated per distinct millisecond so
    the order column is unique.  All counting is exact BIGINT.
    """
    ev = load_table(spark, sf_dir, "events")
    t_ms = F.unix_millis("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        t_ms.alias("t_ms"),
        F.when(t_ms - F.lag(t_ms).over(w_order) > 30 * 60 * 1000, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = (
        marked.withColumn("session_no", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_no")
        .agg(F.min("t_ms").alias("s"), F.max("t_ms").alias("e"))
    )
    pts = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("st"), F.lit(0).alias("en")
    ).unionAll(
        iv.select(
            F.col("e").alias("t"),
            F.lit(0).alias("st"),
            F.lit(1).alias("en"),
        )
    )
    ag = pts.groupBy("t").agg(
        F.sum("st").alias("starts"), F.sum("en").alias("ends")
    )
    swept = _cum_below_multi(
        ag, "t", {"starts": "cs_below", "ends": "ce_below"}
    ).withColumn(
        "conc",
        F.col("cs_below") + F.col("starts") - F.col("ce_below"),
    )
    return swept.groupBy(
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr("t div 86400000").cast("int"),
        ).alias("day")
    ).agg(
        F.max("conc").alias("peak_concurrency"),
        F.count(F.lit(1)).alias("n_points"),
    )


# --------------------------------------------------------------------------
# Financial series on the order book (round 7): NPV, Sharpe, beta,
# drawdown duration
# --------------------------------------------------------------------------

#: Daily discount rate for the NPV query (0.1%/day).
NPV_DAILY_RATE = 1.001

#: Shared day-grain revenue series: whole-dollar order totals by day.
_REV_DAILY_SQL = """
    rev AS MATERIALIZED (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS usd
        FROM orders GROUP BY o_orderdate)
"""


def _rev_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, usd): whole-dollar order revenue per order date."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("usd")
    )


@query(
    "ts_npv_discounted",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    t0 AS (SELECT min(day) AS d0 FROM rev),
    terms AS (
        SELECT usd * list_reduce(
                   list_prepend(1.0e0, list_transform(
                       range(CAST(datediff('day', t0.d0, rev.day)
                                  AS BIGINT)),
                       x -> 0.0e0)),
                   (a, x) -> a / {NPV_DAILY_RATE}e0) AS term
        FROM rev CROSS JOIN t0)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           {NPV_DAILY_RATE}e0 - 1 AS daily_rate,
           round(list_reduce(list_prepend(0.0e0, list_sort(list(term))),
               (a, x) -> a + x), 4) AS npv_usd
    FROM terms
    """,
)
def ts_npv_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net present value of the daily order-revenue stream at a fixed
    0.1%/day discount rate, anchored on the first order date — the
    time-value-of-money fold every finance-flavored reference engine
    ships (cash-flow NPV, LTV discounting).

    Portability is the interesting part: ``pow(q, t)`` is a libm call
    with engine-specific rounding, so the discount factor is instead
    built by REPEATED DIVISION — t sequential ``/ 1.001`` steps per
    day (Spark ``F.aggregate`` over ``sequence``, DuckDB
    ``list_reduce`` over ``range``), every step a correctly rounded
    IEEE op in the same order, so each factor is bit-identical.  The
    closing sum folds the sorted term list (the ``ml_anova_oneway``
    idiom).  The spine is day-grain (bounded: ≈2,400 days at any SF),
    so the O(t) fold per day is O(spine²/2) total — constant in the
    row count; daily revenue itself is one partial+final integer
    aggregate over the fact table.
    """
    rev = _rev_daily(spark, sf_dir)
    t0 = rev.agg(F.min("day").alias("d0"))
    t = F.datediff(F.col("day"), F.col("d0"))
    df = F.aggregate(
        F.when(t > 0, F.sequence(F.lit(1), t))
        .otherwise(F.array().cast("array<int>")),
        F.lit(1.0),
        lambda a, x: a / F.lit(NPV_DAILY_RATE),
    )
    terms = rev.crossJoin(F.broadcast(t0)).select(
        (F.col("usd") * df).alias("term")
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.lit(NPV_DAILY_RATE) - F.lit(1)).alias("daily_rate"),
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list("term")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("npv_usd"),
    )


@query(
    "ts_sharpe_ratio",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    r AS (
        SELECT CAST(usd - lag(usd) OVER (ORDER BY day) AS DOUBLE)
                   / lag(usd) OVER (ORDER BY day) AS ret
        FROM rev),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_ret,
               list_reduce(list_prepend(0.0e0, list_sort(list(ret))),
                   (a, x) -> a + x) AS s1,
               list_reduce(list_prepend(0.0e0,
                   list_sort(list(ret * ret))),
                   (a, x) -> a + x) AS s2
        FROM r WHERE ret IS NOT NULL)
    SELECT n_ret,
           round(s1 / n_ret, 6) AS mean_ret,
           round(sqrt((s2 - s1 * s1 / n_ret) / (n_ret - 1)), 6) AS vol,
           round((s1 / n_ret)
                 / sqrt((s2 - s1 * s1 / n_ret) / (n_ret - 1)), 6)
               AS sharpe
    FROM m
    """,
)
def ts_sharpe_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe ratio (zero risk-free rate) of day-over-day simple
    returns on daily order revenue: mean return over sample standard
    deviation — the risk-adjusted-performance summary that belongs
    next to ``ts_max_drawdown`` and ``ts_rsi`` in any financial
    series toolkit.

    Each return is one exact BIGINT difference divided by an exact
    BIGINT (bit-identical cross-engine); Σr and Σr² fold the SORTED
    return lists sequentially (the ``ml_anova_oneway`` idiom — a
    plain SUM of ~2,400 doubles is partition-order dependent), and
    mean/vol/Sharpe are one shared closing expression.  The lag runs
    on the bounded day-grain spine; the fact table is reduced by one
    integer aggregate first.
    """
    rev = _rev_daily(spark, sf_dir)
    w = Window.orderBy("day")
    r = rev.select(
        (
            (F.col("usd") - F.lag("usd").over(w)).cast("double")
            / F.lag("usd").over(w)
        ).alias("ret")
    ).filter(F.col("ret").isNotNull())
    m = r.agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.aggregate(
            F.sort_array(F.collect_list("ret")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s1"),
        F.aggregate(
            F.sort_array(F.collect_list(F.col("ret") * F.col("ret"))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s2"),
    )
    s1, s2, n = F.col("s1"), F.col("s2"), F.col("n_ret")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return m.select(
        "n_ret",
        F.round(s1 / n, 6).alias("mean_ret"),
        F.round(F.sqrt(var), 6).alias("vol"),
        F.round((s1 / n) / F.sqrt(var), 6).alias("sharpe"),
    )


@query(
    "ts_beta_to_market",
    oracle="""
    WITH mkt AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders GROUP BY o_orderdate),
    seg AS (
        SELECT o.o_orderdate AS day,
               CAST(sum(CAST(round(o.o_totalprice) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderdate),
    xy AS (
        SELECT mkt.x, coalesce(seg.y, 0) AS y
        FROM mkt LEFT JOIN seg ON mkt.day = seg.day),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT)     AS sx,
               CAST(sum(y) AS BIGINT)     AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM xy)
    SELECT n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                 6) AS beta,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sxx
                       - CAST(sx AS DOUBLE) * sx) * sx) / n, 4)
               AS alpha_usd,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS corr
    FROM m
    """,
)
def ts_beta_to_market(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta (and alpha, and correlation) of the BUILDING segment's
    daily revenue against total market daily revenue — the CAPM-style
    sensitivity regression y = α + β·x run as a single-pass moment
    computation, the "how much does this segment amplify market
    swings" report.

    The ``agg_corr_exact`` determinism recipe: all five moments are
    exact BIGINT sums in whole dollars (Σx² ≈ 2.4·10¹⁷ at sf0.1 —
    overflow-safe well past sf10; beyond that the units coarsen), and
    β/α/ρ are shared closing double expressions over identical
    integers, so both engines agree bitwise before rounding.  Days
    where the segment booked nothing coalesce to y = 0 via a LEFT
    join on the bounded day spine; moments combine associatively, so
    the whole thing is partial-aggregatable map-side at any scale.
    """
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    usd = F.round(F.col("o_totalprice")).cast("long")
    mkt = od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(usd).alias("x")
    )
    seg = (
        od.join(
            F.broadcast(
                cu.filter(F.col("c_mktsegment") == "BUILDING").select(
                    "c_custkey"
                )
            ),
            od.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(usd).alias("y"))
    )
    xy = mkt.join(seg, "day", "left").select(
        "x", F.coalesce("y", F.lit(0)).alias("y")
    )
    x, y = F.col("x"), F.col("y")
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = nd * F.col("sxy") - sxd * F.col("sy")
    varx_n = nd * F.col("sxx") - sxd * F.col("sx")
    vary_n = nd * F.col("syy") - syd * F.col("sy")
    beta = cov_n / varx_n
    return m.select(
        "n",
        F.round(beta, 6).alias("beta"),
        F.round((syd - beta * F.col("sx")) / F.col("n"), 4).alias(
            "alpha_usd"
        ),
        F.round(cov_n / F.sqrt(varx_n * vary_n), 6).alias("corr"),
    )


#: Underwater streaks reported by ts_drawdown_duration.
DD_TOPK = 5


@query(
    "ts_drawdown_duration",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    dd AS (
        SELECT day,
               row_number() OVER (ORDER BY day) AS pos,
               CASE WHEN usd < max(usd) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)
                    THEN 1 ELSE 0 END AS under
        FROM rev),
    uw AS (
        SELECT day, pos, row_number() OVER (ORDER BY day) AS rn
        FROM dd WHERE under = 1),
    runs AS (
        SELECT min(day) AS start_day, max(day) AS end_day,
               CAST(count(*) AS BIGINT) AS n_days
        FROM uw
        GROUP BY pos - rn)
    SELECT start_day, end_day, n_days
    FROM runs
    ORDER BY n_days DESC, start_day
    LIMIT {DD_TOPK}
    """,
)
def ts_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {DD_TOPK} longest underwater periods of daily order
    revenue: maximal runs of consecutive trading days where revenue
    sits strictly below its running peak — the DURATION face of
    drawdown risk (``ts_max_drawdown`` measures magnitude; recovery
    time is what capacity and cash planning actually ask for).

    Pure integer machinery end to end: the running peak is a
    cumulative MAX of exact BIGINTs over the bounded day spine,
    "underwater" is one integer comparison, and maximal runs are the
    gaps-and-islands identity (calendar-day index minus row number is
    constant exactly on runs of consecutive present days).  Top-{DD_TOPK}
    compiles to TakeOrderedAndProject — no global sort.
    """
    rev = _rev_daily(spark, sf_dir)
    w = Window.orderBy("day")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = rev.select(
        "day",
        F.row_number().over(w).alias("pos"),
        F.when(F.col("usd") < F.max("usd").over(w_run), 1)
        .otherwise(0)
        .alias("under"),
    )
    uw = dd.filter(F.col("under") == 1).withColumn(
        "rn", F.row_number().over(Window.orderBy("day"))
    )
    runs = (
        uw.groupBy((F.col("pos") - F.col("rn")).alias("island"))
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("island")
    )
    return runs.orderBy(F.desc("n_days"), "start_day").limit(DD_TOPK)


# --------------------------------------------------------------------------
# Epidemic-curve analytics (round 7): the reference repo's COVID
# derived-metric family (SURVEY.md §1: daily new cases, growth rate,
# active = confirmed - resolved, doubling time) on the testdata facts.
# --------------------------------------------------------------------------

#: Daily order counts with an integer day index — the "case curve".
_CURVE_SQL = f"""
    curve AS MATERIALIZED (
        SELECT datediff('day', DATE '{EPOCH}', o_orderdate) AS d,
               CAST(count(*) AS BIGINT) AS new_cases
        FROM orders GROUP BY 1)
"""


def _order_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, new_cases): order counts per integer day index."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit(EPOCH).cast("date")).alias(
            "d"
        )
    ).agg(F.count(F.lit(1)).alias("new_cases"))


@query(
    "ts_doubling_time",
    oracle=f"""
    WITH {_CURVE_SQL},
    cum AS MATERIALIZED (
        SELECT d, new_cases,
               CAST(sum(new_cases) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
        FROM curve),
    dt AS (
        SELECT t.d, t.c, CAST(max(s.d) AS BIGINT) AS half_day
        FROM cum t JOIN cum s
          ON s.d <= t.d AND 2 * s.c <= t.c
        GROUP BY t.d, t.c)
    SELECT d AS day_idx, c AS cum_cases,
           CAST(d - half_day AS BIGINT) AS doubling_days
    FROM dt
    """,
)
def ts_doubling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubling time of the cumulative order curve: for each day t,
    how many days since the cumulative count was at most half of
    today's — the headline epidemic-speed metric (reference analog:
    COVID case-count doubling time), in PURE INTEGER form: the
    half-point is the last day s with 2·C(s) ≤ C(t), so no division
    ever happens and both engines agree exactly.

    The corpus collapses to the bounded day spine first (one integer
    aggregate); the cumulative curve is one ordered prefix sum, and
    the half-point lookup is a range self-join + max over
    O(spine²) ≈ 2400² bounded pairs — constant in the fact-table row
    count, the ``ts_npv_discounted`` cost model.  Days that haven't
    yet doubled from day one drop out of the inner join (undefined
    doubling time).
    """
    curve = _order_curve(spark, sf_dir)
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = curve.withColumn(
        "c", F.sum("new_cases").over(w_run)
    ).transform(cached)
    s = cum.select(F.col("d").alias("sd"), F.col("c").alias("sc"))
    dt = (
        cum.join(
            s, (F.col("sd") <= F.col("d")) & (2 * F.col("sc") <= F.col("c"))
        )
        .groupBy("d", "c")
        .agg(F.max("sd").alias("half_day"))
    )
    return dt.select(
        F.col("d").alias("day_idx"),
        F.col("c").alias("cum_cases"),
        (F.col("d") - F.col("half_day")).cast("long").alias(
            "doubling_days"
        ),
    )


@query(
    "ts_growth_ratio_rt",
    oracle=f"""
    WITH {_CURVE_SQL},
    win AS (
        SELECT d,
               CAST(sum(new_cases) OVER (ORDER BY d
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_recent,
               CAST(coalesce(sum(new_cases) OVER (ORDER BY d
                   RANGE BETWEEN 13 PRECEDING AND 7 PRECEDING), 0)
                   AS BIGINT) AS n_prior
        FROM curve)
    SELECT d AS day_idx, n_recent, n_prior,
           round(CAST(n_recent AS DOUBLE) / n_prior, 6) AS growth_ratio
    FROM win
    WHERE n_prior > 0
    """,
)
def ts_growth_ratio_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth ratio of the daily order curve — the
    Rt-style reproduction proxy every epidemic dashboard carries
    (reference analog: COVID growth rate): last-7-days volume over the
    preceding-7-days volume, per day.  RANGE frames over the integer
    day index make the windows CALENDAR-correct across missing days
    (a ROWS frame would silently stretch over gaps).

    The fact table collapses to the bounded day spine first; both
    window sums are exact BIGINTs over that spine, and the single
    division is shared — bit-identical cross-engine.  Days with an
    empty prior week are undefined and dropped.
    """
    curve = _order_curve(spark, sf_dir)
    w_recent = Window.orderBy("d").rangeBetween(-6, 0)
    w_prior = Window.orderBy("d").rangeBetween(-13, -7)
    win = curve.select(
        "d",
        F.sum("new_cases").over(w_recent).alias("n_recent"),
        F.coalesce(
            F.sum("new_cases").over(w_prior), F.lit(0).cast("long")
        ).alias("n_prior"),
    )
    return win.filter(F.col("n_prior") > 0).select(
        F.col("d").alias("day_idx"),
        "n_recent",
        "n_prior",
        F.round(
            F.col("n_recent").cast("double") / F.col("n_prior"), 6
        ).alias("growth_ratio"),
    )


#: Resolution lag (days) for the lagged outcome ratio.
CFR_LAG = 14

#: Daily event-type counts on the events day spine.
_EVENT_CURVE_SQL = f"""
    ecurve AS MATERIALIZED (
        SELECT datediff('day', DATE '{EPOCH}',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_bad,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_done
        FROM events GROUP BY 1)
"""


def _event_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n_open, n_bad, n_done): signup/error/purchase counts per
    integer day index on the events spine."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("d")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("n_open"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_bad"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_done"),
    )


@query(
    "ts_lagged_outcome_ratio",
    oracle=f"""
    WITH {_EVENT_CURVE_SQL},
    cum AS (
        SELECT d,
               CAST(sum(n_open) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c_open,
               CAST(sum(n_bad) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c_bad
        FROM ecurve)
    SELECT t.d AS day_idx, t.c_bad, s.c_open AS c_open_lagged,
           round(CAST(t.c_bad AS DOUBLE) / s.c_open, 6) AS outcome_ratio
    FROM cum t JOIN cum s ON s.d = t.d - {CFR_LAG}
    WHERE s.c_open > 0
    """,
)
def ts_lagged_outcome_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-adjusted outcome ratio: cumulative errors today over
    cumulative signups {CFR_LAG} days earlier — the case-fatality-rate
    construction (reference analog: COVID CFR = deaths / confirmed
    lagged by the resolution delay), which corrects the naive ratio's
    downward bias while outcomes are still in flight.

    Both cumulative curves are exact integer prefix sums over the
    bounded day spine; the lag alignment is one equi-join on the
    integer day index (d = t − {CFR_LAG}), and the single division is
    shared — bit-identical cross-engine.
    """
    curve = _event_curve(spark, sf_dir)
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = curve.select(
        "d",
        F.sum("n_open").over(w_run).alias("c_open"),
        F.sum("n_bad").over(w_run).alias("c_bad"),
    ).transform(cached)
    s = cum.select(
        F.col("d").alias("sd"), F.col("c_open").alias("c_open_lagged")
    )
    return (
        cum.join(s, F.col("sd") == F.col("d") - CFR_LAG)
        .filter(F.col("c_open_lagged") > 0)
        .select(
            F.col("d").alias("day_idx"),
            "c_bad",
            "c_open_lagged",
            F.round(
                F.col("c_bad").cast("double") / F.col("c_open_lagged"),
                6,
            ).alias("outcome_ratio"),
        )
    )


@query(
    "ts_active_outstanding",
    oracle=f"""
    WITH {_EVENT_CURVE_SQL}
    SELECT d AS day_idx,
           CAST(sum(n_open) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_opened,
           CAST(sum(n_bad + n_done) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_resolved,
           CAST(sum(n_open - n_bad - n_done) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS active
    FROM ecurve
    """,
)
def ts_active_outstanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-outstanding balance per day: cumulative signups minus
    cumulative resolutions (errors + purchases) — the reference
    repo's headline derived metric, ``active = confirmed − deaths −
    recovered`` (SURVEY.md §1), transplanted onto the events stream.

    One integer aggregate collapses the corpus to the day spine;
    three prefix sums over that bounded spine produce the opened /
    resolved / active curves — all exact BIGINTs, no floats anywhere.
    """
    curve = _event_curve(spark, sf_dir)
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return curve.select(
        F.col("d").alias("day_idx"),
        F.sum("n_open").over(w_run).alias("cum_opened"),
        F.sum(F.col("n_bad") + F.col("n_done")).over(w_run).alias(
            "cum_resolved"
        ),
        F.sum(
            F.col("n_open") - F.col("n_bad") - F.col("n_done")
        ).over(w_run).alias("active"),
    )


# --------------------------------------------------------------------------
# Forecast-evaluation suite (round 7): pinball, MASE, coverage, Theil U2
# --------------------------------------------------------------------------

#: Pinball-loss quantile (tenths, so the loss stays exact-integer).
PINBALL_TAU_TENTHS = 9


@query(
    "ts_pinball_loss",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    fc AS (
        SELECT day, usd,
               lag(usd, 7) OVER (ORDER BY day) AS yhat
        FROM rev),
    l AS (
        SELECT usd, yhat, usd - yhat AS d FROM fc
        WHERE yhat IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(greatest({PINBALL_TAU_TENTHS} * d,
                             ({PINBALL_TAU_TENTHS} - 10) * d))
                AS BIGINT) AS pinball_tenths,
           round(CAST(sum(greatest({PINBALL_TAU_TENTHS} * d,
                                   ({PINBALL_TAU_TENTHS} - 10) * d))
                      AS DOUBLE) / (10.0 * count(*)), 4)
               AS mean_pinball_usd
    FROM l
    """,
)
def ts_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss at τ = 0.9 of the seasonal-naive
    forecast (same weekday last week) on daily order revenue — the
    scoring rule for quantile forecasts: under-predictions of a P90
    cost 9× what over-predictions do.  The metric every probabilistic
    forecasting backtest reports per quantile.

    Exactness trick: with τ in tenths, 10·pinball =
    Σ max(9·d, −d) over integer errors d — the whole loss is exact
    BIGINT arithmetic and only the final per-day mean divides.  The
    lag runs on the bounded day spine; the fact table is reduced by
    one integer aggregate first.
    """
    rev = _rev_daily(spark, sf_dir)
    w = Window.orderBy("day")
    fc = rev.select(
        "usd", F.lag("usd", 7).over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    d = F.col("usd") - F.col("yhat")
    t = PINBALL_TAU_TENTHS
    loss = F.sum(F.greatest(t * d, (t - 10) * d))
    return fc.agg(
        F.count(F.lit(1)).alias("n_days"),
        loss.alias("pinball_tenths"),
        F.round(
            loss.cast("double") / (F.lit(10.0) * F.count(F.lit(1))), 4
        ).alias("mean_pinball_usd"),
    )


@query(
    "ts_mase_backtest",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    fc AS (
        SELECT usd,
               (lag(usd, 1) OVER (ORDER BY day)
                + lag(usd, 2) OVER (ORDER BY day)
                + lag(usd, 3) OVER (ORDER BY day)
                + lag(usd, 4) OVER (ORDER BY day)
                + lag(usd, 5) OVER (ORDER BY day)
                + lag(usd, 6) OVER (ORDER BY day)
                + lag(usd, 7) OVER (ORDER BY day)) // 7 AS yhat,
               lag(usd, 1) OVER (ORDER BY day) AS ynaive
        FROM rev),
    l AS (SELECT * FROM fc WHERE yhat IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(usd - yhat)) AS BIGINT)   AS mae_model_usd,
           CAST(sum(abs(usd - ynaive)) AS BIGINT) AS mae_naive_usd,
           round(CAST(sum(abs(usd - yhat)) AS DOUBLE)
                 / sum(abs(usd - ynaive)), 6) AS mase
    FROM l
    """,
)
def ts_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE backtest: mean absolute error of a trailing-7-day-mean
    forecast, SCALED by the naive (lag-1) forecast's error — the
    scale-free forecast-accuracy metric (MASE < 1 = beats naive) that
    makes models comparable across series of different magnitude.

    The trailing mean uses integer division (``//``/``div`` — both
    engines truncate identically on positive sums), so model forecast,
    naive forecast, and both absolute-error sums are exact BIGINTs;
    the MASE ratio is the single shared division.  Scored days are
    those with a full 7-day history (yhat defined ⇒ ynaive defined).
    """
    rev = _rev_daily(spark, sf_dir)
    w = Window.orderBy("day")
    lag_sum = sum(
        (F.lag("usd", i).over(w) for i in range(2, 8)),
        F.lag("usd", 1).over(w),
    )
    fc = rev.select(
        "usd",
        lag_sum.alias("lag_total"),
        F.lag("usd", 1).over(w).alias("ynaive"),
    ).select(
        "usd",
        F.expr("lag_total div 7").alias("yhat"),
        "ynaive",
    ).filter(F.col("yhat").isNotNull())
    mae_m = F.sum(F.abs(F.col("usd") - F.col("yhat")))
    mae_n = F.sum(F.abs(F.col("usd") - F.col("ynaive")))
    return fc.agg(
        F.count(F.lit(1)).alias("n_days"),
        mae_m.alias("mae_model_usd"),
        mae_n.alias("mae_naive_usd"),
        F.round(mae_m.cast("double") / mae_n, 6).alias("mase"),
    )


#: Interval-forecast half-width multiplier (tenths of trailing MAD).
COVER_K_TENTHS = 25


@query(
    "ts_interval_coverage",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    fc AS (
        SELECT usd,
               lag(usd, 7) OVER (ORDER BY day) AS center,
               (abs(lag(usd, 1) OVER (ORDER BY day)
                    - lag(usd, 2) OVER (ORDER BY day))
                + abs(lag(usd, 2) OVER (ORDER BY day)
                      - lag(usd, 3) OVER (ORDER BY day))
                + abs(lag(usd, 3) OVER (ORDER BY day)
                      - lag(usd, 4) OVER (ORDER BY day))
                + abs(lag(usd, 4) OVER (ORDER BY day)
                      - lag(usd, 5) OVER (ORDER BY day))
                + abs(lag(usd, 5) OVER (ORDER BY day)
                      - lag(usd, 6) OVER (ORDER BY day))
                + abs(lag(usd, 6) OVER (ORDER BY day)
                      - lag(usd, 7) OVER (ORDER BY day))) // 6
                   AS scale
        FROM rev),
    l AS (
        SELECT usd, center, scale,
               CASE WHEN 10 * abs(usd - center)
                         <= {COVER_K_TENTHS} * scale
                    THEN 1 ELSE 0 END AS covered
        FROM fc WHERE center IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT)      AS n_days,
           CAST(sum(covered) AS BIGINT)  AS n_covered,
           round(CAST(sum(covered) AS DOUBLE) / count(*), 6)
               AS coverage
    FROM l
    """,
)
def ts_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical coverage of a naive interval forecast: the seasonal-
    naive center (same weekday last week) ± 2.5× the trailing mean
    absolute day-over-day change — did the realized value land inside?
    The calibration check every interval forecast needs (a 90%
    interval that covers 60% of days is lying).

    Fully integer: the trailing scale is an integer-division mean of
    absolute differences, and the coverage test cross-multiplies by
    10 (|err|·10 ≤ 25·scale) instead of forming 2.5·scale in floats —
    so membership is exact on both engines and only the final
    coverage rate divides.
    """
    rev = _rev_daily(spark, sf_dir)
    w = Window.orderBy("day")
    lag = lambda i: F.lag("usd", i).over(w)  # noqa: E731
    scale_sum = sum(
        (F.abs(lag(i) - lag(i + 1)) for i in range(2, 7)),
        F.abs(lag(1) - lag(2)),
    )
    fc = rev.select(
        "usd",
        lag(7).alias("center"),
        scale_sum.alias("scale_sum"),
    ).select(
        "usd",
        "center",
        F.expr("scale_sum div 6").alias("scale"),
    ).filter(F.col("center").isNotNull())
    covered = F.when(
        10 * F.abs(F.col("usd") - F.col("center"))
        <= COVER_K_TENTHS * F.col("scale"),
        1,
    ).otherwise(0)
    l = fc.select(covered.alias("covered"))
    return l.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("covered").alias("n_covered"),
        F.round(
            F.sum("covered").cast("double") / F.count(F.lit(1)), 6
        ).alias("coverage"),
    )


@query(
    "ts_theil_u2",
    oracle=f"""
    WITH {_REV_DAILY_SQL},
    fc AS (
        SELECT usd,
               (lag(usd, 1) OVER (ORDER BY day)
                + lag(usd, 2) OVER (ORDER BY day)
                + lag(usd, 3) OVER (ORDER BY day)) // 3 AS yhat,
               lag(usd, 1) OVER (ORDER BY day) AS ynaive
        FROM rev),
    l AS (SELECT * FROM fc WHERE yhat IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum((usd - yhat) * (usd - yhat)) AS BIGINT)
               AS sse_model,
           CAST(sum((usd - ynaive) * (usd - ynaive)) AS BIGINT)
               AS sse_naive,
           round(sqrt(CAST(sum((usd - yhat) * (usd - yhat)) AS DOUBLE)
                      / sum((usd - ynaive) * (usd - ynaive))), 6)
               AS theil_u2
    FROM l
    """,
)
def ts_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 forecast-quality statistic: RMSE of a trailing-3-day
    -mean forecast relative to the no-change forecast — U2 < 1 means
    the model adds information over persistence, the classic go/no-go
    for shipping a forecasting model.

    Squared errors of integer forecasts are exact BIGINT sums
    (day-revenue² ≈ 10¹⁴ × 2,400 days — comfortably inside 2⁶³ past
    sf10); the ratio-then-sqrt is one shared closing expression, so
    both engines agree bitwise before the 6dp round.
    """
    rev = _rev_daily(spark, sf_dir)
    w = Window.orderBy("day")
    lag_sum = (
        F.lag("usd", 1).over(w)
        + F.lag("usd", 2).over(w)
        + F.lag("usd", 3).over(w)
    )
    fc = rev.select(
        "usd",
        lag_sum.alias("lag_total"),
        F.lag("usd", 1).over(w).alias("ynaive"),
    ).select(
        "usd",
        F.expr("lag_total div 3").alias("yhat"),
        "ynaive",
    ).filter(F.col("yhat").isNotNull())
    em = F.col("usd") - F.col("yhat")
    en = F.col("usd") - F.col("ynaive")
    sse_m = F.sum(em * em)
    sse_n = F.sum(en * en)
    return fc.agg(
        F.count(F.lit(1)).alias("n_days"),
        sse_m.alias("sse_model"),
        sse_n.alias("sse_naive"),
        F.round(
            F.sqrt(sse_m.cast("double") / sse_n), 6
        ).alias("theil_u2"),
    )


@query(
    "events_session_percentiles",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
               CASE WHEN epoch_ms(ts)
                         - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, t_ms,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY t_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM marked),
    iv AS (
        SELECT user_id, session_no,
               min(t_ms) AS s, max(t_ms) - min(t_ms) AS dur
        FROM sessions GROUP BY user_id, session_no),
    dows AS (
        SELECT ((s // 86400000) + 3) % 7 AS dow,
               list_sort(list(dur)) AS ds
        FROM iv GROUP BY 1)
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(len(ds) AS BIGINT) AS n_sessions,
           CAST(ds[CAST((len(ds) + 1) // 2 AS INTEGER)] AS BIGINT)
               AS median_ms,
           CAST(ds[CAST((9 * len(ds) + 9) // 10 AS INTEGER)] AS BIGINT)
               AS p90_ms
    FROM dows
    ORDER BY dow
    """,
)
def events_session_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration median and p90 per day-of-week of session
    start — the latency-distribution readout of sessionized traffic
    (are weekend sessions longer?), using the repo's 30-minute-gap
    sessionization rule.

    Determinism discipline: the day-of-week comes from PURE integer
    arithmetic on epoch-ms (``(days_since_epoch + 3) mod 7``, Monday=0
    — engine dayofweek() numberings disagree), and the percentiles are
    integer ORDER-STATISTIC SELECTION over the per-group sorted
    duration list at positions ⌈n/2⌉ and ⌈9n/10⌉ computed with integer
    division (never ``0.9·n`` — the float product can land either side
    of an integer).  The 7 day-of-week groups are a bounded grain, so
    the per-group collect is a few-KB array regardless of corpus size;
    at 100 TB the exact-percentile alternative is the distributed
    rank (distrank) per group, but a 7-group selection never needs it.
    """
    ev = load_table(spark, sf_dir, "events")
    t_ms = F.unix_millis("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        t_ms.alias("t_ms"),
        F.when(t_ms - F.lag(t_ms).over(w_order) > 1800000, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    iv = (
        marked.withColumn("session_no", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("t_ms").alias("s"),
            (F.max("t_ms") - F.min("t_ms")).alias("dur"),
        )
    )
    dows = (
        iv.select(
            F.expr("((s div 86400000) + 3) % 7").alias("dow"), "dur"
        )
        .groupBy("dow")
        .agg(F.sort_array(F.collect_list("dur")).alias("ds"))
    )
    n = F.size("ds").cast("long")
    return dows.select(
        F.col("dow").cast("long").alias("dow"),
        n.alias("n_sessions"),
        F.element_at("ds", F.expr("CAST((size(ds) + 1) div 2 AS INT)"))
        .cast("long")
        .alias("median_ms"),
        F.element_at(
            "ds", F.expr("CAST((9 * size(ds) + 9) div 10 AS INT)")
        )
        .cast("long")
        .alias("p90_ms"),
    ).orderBy("dow")


@query(
    "win_percent_change_yoy",
    oracle="""
    WITH monthly AS (
        SELECT CAST(year(l_shipdate) AS BIGINT)  AS y,
               CAST(month(l_shipdate) AS BIGINT) AS m,
               CAST(sum(CAST(round(l_extendedprice
                                   * (1 - l_discount) * 10000) AS BIGINT))
                    AS BIGINT) AS rev_e4
        FROM lineitem GROUP BY 1, 2),
    l AS (
        SELECT y, m, rev_e4,
               lag(rev_e4) OVER (PARTITION BY m ORDER BY y) AS prev_e4
        FROM monthly)
    SELECT y, m, rev_e4, prev_e4,
           round(100e0 * (rev_e4 - prev_e4) / prev_e4, 6) AS yoy_pct
    FROM l
    WHERE prev_e4 IS NOT NULL
    ORDER BY y, m
    """,
)
def win_percent_change_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per calendar month — the
    seasonality-adjusted growth readout every business dashboard leads
    with (compares each month to the SAME month last year, so seasonal
    shape cancels).

    The lag partitions by MONTH-OF-YEAR and orders by year — 12
    bounded partitions of ≤ #years rows each, never a single global
    series (the de-globalized form of the naive ``lag(12)`` over one
    ordered partition).  Revenue sums in exact integer
    ten-thousandths; the growth ratio is one subtraction and one
    division of exact integers, round(,6).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    monthly = (
        li.select(
            F.year("l_shipdate").cast("long").alias("y"),
            F.month("l_shipdate").cast("long").alias("m"),
            rev.alias("r"),
        )
        .groupBy("y", "m")
        .agg(F.sum("r").cast("long").alias("rev_e4"))
    )
    w = Window.partitionBy("m").orderBy("y")
    return (
        monthly.withColumn("prev_e4", F.lag("rev_e4").over(w))
        .filter(F.col("prev_e4").isNotNull())
        .select(
            "y", "m", "rev_e4", "prev_e4",
            F.round(
                F.lit(100.0)
                * (F.col("rev_e4") - F.col("prev_e4"))
                / F.col("prev_e4"),
                6,
            ).alias("yoy_pct"),
        )
        .orderBy("y", "m")
    )
