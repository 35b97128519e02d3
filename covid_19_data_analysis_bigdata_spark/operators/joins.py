"""Join operators (SURVEY.md §2 category 3).

Reference analog: joining the COVID case table with country/population
lookups.  Physical strategy discipline for 100 TB:

- Bounded dimensions are *broadcast* (`F.broadcast`) — zero shuffle of
  the fact table.
- Large-large joins go sort-merge (`hint("merge")`) — both sides
  shuffle-partitioned on the key; AQE splits skewed partitions.
- Non-equi joins have no hash path (nested loop); they appear here on
  bounded inputs only, and anything quadratic in a *fact* table is
  banned (SURVEY.md §4.3.5) — the scalable as-of variant is a single
  window pass, not a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


@query(
    "join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type, l.l_quantity
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): BroadcastHashJoin, no shuffle of lineitem.

    `part` is a bounded dimension; shipping it to every executor means
    the 100 TB fact side streams through map-side joins untouched.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey, "inner"
    ).select("l_orderkey", "l_linenumber", "p_brand", "p_type", "l_quantity")


@query(
    "join_sortmerge",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join forced to SortMergeJoin via the merge hint.

    A join hint (not a session conf) pins the strategy so the choice
    survives lazy planning regardless of the driver's session settings.
    Both sides hash-partition on the key; AQE handles skew splitting.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return o.hint("merge").join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "o_orderdate", "o_totalprice", "l_linenumber", "l_quantity"
    )


@query(
    "join_multiway_star",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*)                     AS order_cnt,
           round(sum(o.o_totalprice), 4) AS total
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join rollup (country→continent analog).

    All three dimensions broadcast; the only shuffle is the final
    aggregation's — the fact table is never repartitioned for joining.
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT p.p_partkey,
           count(l.l_orderkey)       AS li_cnt,
           round(sum(l.l_quantity), 4) AS sum_qty
    FROM part p LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with null extension: parts with no lineitems keep cnt=0."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(li, li.l_partkey == p.p_partkey, "left")
        .groupBy("p_partkey")
        .agg(
            F.count("l_orderkey").alias("li_cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH hi AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         oc AS (SELECT o_custkey, count(*) AS order_cnt FROM orders GROUP BY o_custkey)
    SELECT coalesce(hi.c_custkey, oc.o_custkey) AS custkey,
           hi.c_acctbal AS acctbal,
           oc.order_cnt AS order_cnt
    FROM hi FULL OUTER JOIN oc ON hi.c_custkey = oc.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer on partially-overlapping key sets, nulls on both sides."""
    c = load_table(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    return hi.join(oc, hi.c_custkey == oc.o_custkey, "full").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        "order_cnt",
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semi join: customers having ≥1 urgent order.

    Left-semi short-circuits on first match and never duplicates rows —
    at scale this beats join+distinct by the whole dedup shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti join: customers with no urgent order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    oracle="""
    SELECT a.r_name AS a_name, b.r_name AS b_name
    FROM region a CROSS JOIN region b
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever on bounded inputs (5×5 here)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("a_name"))
    b = r.select(F.col("r_name").alias("b_name"))
    return a.crossJoin(b)


@query(
    "join_theta_range",
    oracle="""
    SELECT s.s_suppkey AS s_key, t.s_suppkey AS t_key,
           s.s_acctbal AS s_bal, t.s_acctbal AS t_bal
    FROM supplier s JOIN supplier t
      ON s.s_suppkey <> t.s_suppkey
     AND s.s_acctbal BETWEEN t.s_acctbal - 100 AND t.s_acctbal
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join (balance within 100 below another's).

    Physically a BroadcastNestedLoopJoin — acceptable only because
    supplier is a bounded dimension.  The fact-scale analog of this
    pattern must be bucketed first (SURVEY.md §4.3.5).
    """
    sup = load_table(spark, sf_dir, "supplier")
    s = sup.select(
        F.col("s_suppkey").alias("s_key"), F.col("s_acctbal").alias("s_bal")
    )
    t = sup.select(
        F.col("s_suppkey").alias("t_key"), F.col("s_acctbal").alias("t_bal")
    )
    return s.join(
        t,
        (F.col("s_key") != F.col("t_key"))
        & F.col("s_bal").between(F.col("t_bal") - 100, F.col("t_bal")),
    )


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
         views     AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           v.event_id AS view_id
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the NEXT view at-or-after it
    per user (align-two-time-series-on-nearest-date analog).

    Spark has no native ASOF; the scalable form is a single window pass:
    union both streams, sort within user by time, and carry the nearest
    view id backward with ``first(..., ignorenulls=True)`` over the
    following frame.  One shuffle on user_id, zero join blowup — this
    holds at 100 TB where a candidate-pair join would not.  (DuckDB
    cross-checks with its native ASOF JOIN.)

    Direction note: "next at-or-after" rather than "latest at-or-before"
    keeps equal-timestamp semantics identical in both engines; at equal
    ts the view sorts after the purchase via the is_purchase flag and is
    still matched by the >= inequality.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("vid"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_purchase"), F.asc("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn("view_id", F.first("vid", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "view_id",
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (SELECT c_custkey,
                      nullif(c_mktsegment, 'BUILDING') AS seg,
                      c_acctbal
               FROM customer),
    s AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg
          FROM customer)
    SELECT s.seg, count(*) AS cnt, round(sum(c.c_acctbal), 4) AS bal
    FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
    GROUP BY s.seg
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping (the corpus has no
    NULLs, so they are manufactured with ``nullif``).

    Scale note: NULL join keys are the classic hidden skew bomb — every
    NULL row hashes to one reducer.  A null-safe join makes that
    explicit and greppable; when NULL-matching is NOT wanted, filter
    NULLs before the shuffle instead of letting them ride to one
    partition.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    )
    s = c.select("seg").distinct().select(F.col("seg").alias("s_seg"))
    return (
        c.join(s, c.seg.eqNullSafe(s.s_seg))
        .groupBy("s_seg")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("c_acctbal"), 4).alias("bal"),
        )
        .select(F.col("s_seg").alias("seg"), "cnt", "bal")
    )


@query(
    "join_shuffle_hash",
    oracle="""
    SELECT s.s_nationkey,
           count(*)                   AS parts,
           round(sum(p.p_retailprice), 4) AS retail
    FROM part p JOIN supplier s ON p.p_partkey % 100 = s.s_suppkey % 100
    WHERE p.p_size <= 25
    GROUP BY s.s_nationkey
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join — Spark's third join strategy (hint
    ``shuffle_hash``): both sides shuffle on the key, the smaller
    builds an in-memory hash table per partition, no sort.

    Beats sort-merge when one side is much smaller per partition but
    too big to broadcast whole; the per-partition build side must fit
    in executor memory — that is the 100 TB constraint to respect when
    choosing it over merge.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    s = load_table(spark, sf_dir, "supplier")
    joined = p.join(
        s.hint("shuffle_hash"),
        F.pmod(p.p_partkey, F.lit(100)) == F.pmod(s.s_suppkey, F.lit(100)),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("parts"),
        F.round(F.sum("p_retailprice"), 4).alias("retail"),
    )


@query(
    "join_range_binned",
    oracle="""
    WITH u AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01')
    SELECT a.o_orderkey,
           count(b.o_orderkey) AS n_near
    FROM u a
    LEFT JOIN u b
           ON b.o_orderkey <> a.o_orderkey
          AND abs(datediff('day', a.d, b.d)) <= 3
    GROUP BY a.o_orderkey
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join at fact scale via bucketing — the scalable form of
    ``join_theta_range``'s nested-loop band join.

    Each urgent 1996 order counts its neighbors within ±3 days.  A
    naive |Δ| ≤ 3 predicate alone gives a nested-loop over all pairs;
    binning day DIV 7 turns it into an EQUI-join: a ±3-day match
    always lands in the same or an adjacent 7-day bucket, so probing
    the 3 candidate buckets (one small explode on the probe side)
    covers every match, then the exact band predicate filters within
    the bucket.  Candidate volume drops from |A|·|B| to
    |A|·3·(|B|/#buckets) — the bucket width tunes the trade-off, and
    the shuffle is a plain hash partition on the bucket id.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    day = F.datediff(F.col("o_orderdate"), F.lit("1996-01-01").cast("date"))
    u = o.select(F.col("o_orderkey").alias("k"), day.alias("d"))
    probe = u.select(
        "k",
        "d",
        F.explode(
            F.array(
                (F.col("d") - 3).cast("long") / 7,
                F.col("d").cast("long") / 7,
                (F.col("d") + 3).cast("long") / 7,
            )
        ).alias("bucket_raw"),
    ).select(
        "k", "d", F.floor("bucket_raw").cast("long").alias("bucket")
    ).dropDuplicates(["k", "bucket"])
    build = u.select(
        F.col("k").alias("bk"),
        F.col("d").alias("bd"),
        F.floor(F.col("d").cast("long") / 7).cast("long").alias("bucket"),
    )
    hits = (
        probe.join(build, "bucket")
        .filter(
            (F.col("bk") != F.col("k"))
            & (F.abs(F.col("bd") - F.col("d")) <= 3)
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        u.join(hits, "k", "left")
        .select(
            F.col("k").alias("o_orderkey"),
            F.coalesce("n_near", F.lit(0).cast("long")).alias("n_near"),
        )
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'),
    views AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'view'),
    ranked AS (
        SELECT p.event_id AS purchase_id,
               v.event_id AS v_id,
               v.ts       AS v_ts,
               p.ts       AS p_ts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts ASC, v.event_id ASC) AS rn
        FROM purchases p
        JOIN views v
          ON p.user_id = v.user_id AND v.ts >= p.ts)
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CASE WHEN r.v_ts <= p.ts + INTERVAL 1 HOUR
                THEN r.v_id END AS view_id
    FROM purchases p
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.purchase_id = p.event_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: each purchase matches the
    next view at-or-after it per user ONLY if that view arrives within
    one hour — the bounded-lookahead variant every market-data and
    attribution pipeline actually runs (an unbounded as-of happily
    pairs events days apart).

    Same single window pass as ``join_asof`` — the nearest view's
    (id, ts) ride together in one struct carried by
    ``first(ignorenulls)`` so the tolerance gate checks the ts OF THE
    MATCHED VIEW, then the struct is consumed in-plan (scalar output).
    One shuffle on user_id, zero join blowup, tolerance applied as a
    row-local predicate after the match.

    Determinism: ties (two views with identical ts at-or-after a
    purchase) break on event_id asc on BOTH sides — the Spark window
    orders (ts, event_id) and the oracle ranks with row_number() over
    the same keys instead of DuckDB's ASOF JOIN, whose tie choice is
    unspecified.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("event_id").alias("vid"), F.col("ts").alias("vts")),
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_purchase"), F.asc("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nearest = F.first("v", ignorenulls=True).over(w)
    return (
        tagged.withColumn("nv", nearest)
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(
                F.col("nv.vts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
                F.col("nv.vid"),
            ).alias("view_id"),
        )
    )


# --------------------------------------------------------------------------
# Bidirectional nearest-event as-of join (round 4)
# --------------------------------------------------------------------------

NEAREST_TOL_US = 3_600_000_000  #: ±1 h matching window, microseconds


@query(
    "join_asof_nearest",
    oracle=f"""
    WITH t AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'error'
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER wb AS b_us,
               last_value(CASE WHEN event_type = 'error'
                               THEN event_id END IGNORE NULLS)
                   OVER wb AS b_id,
               first_value(CASE WHEN event_type = 'error'
                                THEN epoch_us(ts) END IGNORE NULLS)
                   OVER wf AS f_us,
               first_value(CASE WHEN event_type = 'error'
                                THEN event_id END IGNORE NULLS)
                   OVER wf AS f_id
        FROM events
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    p AS (
        SELECT event_id, user_id,
               CAST(epoch_us(ts) AS BIGINT) - b_us AS gap_b,
               f_us - CAST(epoch_us(ts) AS BIGINT) AS gap_f,
               b_id, f_id
        FROM t WHERE event_type = 'purchase'),
    v AS (
        SELECT *,
               (gap_b IS NOT NULL AND gap_b <= {NEAREST_TOL_US}) AS ok_b,
               (gap_f IS NOT NULL AND gap_f <= {NEAREST_TOL_US}) AS ok_f
        FROM p)
    SELECT event_id, user_id,
           CASE WHEN ok_b AND (NOT ok_f OR gap_b <= gap_f) THEN 'backward'
                WHEN ok_f THEN 'forward'
                ELSE 'none' END AS direction,
           CASE WHEN ok_b AND (NOT ok_f OR gap_b <= gap_f) THEN b_id
                WHEN ok_f THEN f_id END AS nearest_error_id,
           CASE WHEN ok_b AND (NOT ok_f OR gap_b <= gap_f) THEN gap_b
                WHEN ok_f THEN gap_f END AS gap_us
    FROM v
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join, both directions: each purchase is
    matched to the same user's closest 'error' event within ±1 h —
    backward OR forward, whichever is nearer (ties to backward) — the
    diagnosis join ("did an error precede or follow this checkout?")
    that a single-direction as-of cannot express.

    Same single-sort discipline as ``join_asof``: both directions come
    from ONE per-user window ordering (an ignore-nulls carry backward
    and its mirror forward), so there is no purchase⋈error self-join
    and no candidate blow-up on error-bursty users — the exact skew
    that makes the naive range join die at 100 TB.  Gaps are exact
    integer microseconds; the tie rule is integer comparison.
    """
    ev = load_table(spark, sf_dir, "events")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_err = F.col("event_type") == "error"
    us = F.unix_micros("ts")
    t = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_err, us), ignorenulls=True).over(wb).alias("b_us"),
        F.last(F.when(is_err, F.col("event_id")), ignorenulls=True)
        .over(wb)
        .alias("b_id"),
        F.first(F.when(is_err, us), ignorenulls=True).over(wf).alias("f_us"),
        F.first(F.when(is_err, F.col("event_id")), ignorenulls=True)
        .over(wf)
        .alias("f_id"),
    )
    p = t.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (us - F.col("b_us")).alias("gap_b"),
        (F.col("f_us") - us).alias("gap_f"),
        "b_id",
        "f_id",
    )
    ok_b = F.col("gap_b").isNotNull() & (F.col("gap_b") <= NEAREST_TOL_US)
    ok_f = F.col("gap_f").isNotNull() & (F.col("gap_f") <= NEAREST_TOL_US)
    take_b = ok_b & (~ok_f | (F.col("gap_b") <= F.col("gap_f")))
    return p.select(
        "event_id",
        "user_id",
        F.when(take_b, F.lit("backward"))
        .when(ok_f, F.lit("forward"))
        .otherwise(F.lit("none"))
        .alias("direction"),
        F.when(take_b, F.col("b_id"))
        .when(ok_f, F.col("f_id"))
        .alias("nearest_error_id"),
        F.when(take_b, F.col("gap_b"))
        .when(ok_f, F.col("gap_f"))
        .alias("gap_us"),
    )


IV_DAYS = 14  #: campaign window length (days)
IV_BLOCK = 16  #: day-block width for the range-join bucketing


@query(
    "join_range_interval",
    oracle=f"""
    WITH iv AS (
        SELECT o_orderkey AS campaign_id,
               CAST(o_orderdate AS DATE) AS start_day,
               CAST(o_orderdate AS DATE) + CAST({IV_DAYS} AS INTEGER)
                   AS end_day
        FROM orders WHERE o_orderkey % 97 = 0),
    pts AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders)
    SELECT iv.campaign_id,
           CAST(count(*) AS BIGINT)    AS n_orders,
           CAST(sum(p.cents) AS BIGINT) AS total_cents
    FROM iv JOIN pts p
      ON p.day >= iv.start_day AND p.day < iv.end_day
    GROUP BY iv.campaign_id
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: every order landing inside any
    campaign's {IV_DAYS}-day window, aggregated per campaign.

    A naive theta join (``day BETWEEN start AND end``) is a nested loop
    — quadratic and unrunnable at scale.  The shipped plan buckets time
    into {IV_BLOCK}-day blocks: each interval explodes to the 1–2
    blocks it touches (bounded because window ≤ block), each point maps
    to exactly one block, and the join becomes a hash equijoin on the
    block id with the precise range predicate as a post-filter.
    Candidate volume is |points| × (intervals per block), not
    |points| × |intervals| — the standard interval-bucketing rewrite
    every range-join engine (and Spark's own storage-partitioned range
    joins) applies.  The oracle states the naive theta join; identical
    result.
    """
    o = load_table(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    epoch_day = F.datediff(day, F.lit("1970-01-01").cast("date"))
    iv = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("campaign_id"),
        day.alias("start_day"),
        F.date_add(day, IV_DAYS).alias("end_day"),
        epoch_day.alias("start_ed"),
    )
    # window ≤ block ⇒ an interval spans at most 2 blocks.
    iv_blocks = iv.select(
        "campaign_id",
        "start_day",
        "end_day",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("start_ed") / IV_BLOCK),
                    F.floor((F.col("start_ed") + IV_DAYS - 1) / IV_BLOCK),
                )
            )
        ).alias("block"),
    )
    pts = o.select(
        day.alias("day"),
        F.floor(epoch_day / IV_BLOCK).alias("block"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    joined = iv_blocks.join(pts, "block").filter(
        (F.col("day") >= F.col("start_day")) & (F.col("day") < F.col("end_day"))
    )
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


OVL_A_DAYS = 14  #: set-A campaign length
OVL_B_DAYS = 10  #: set-B campaign length
OVL_BLOCK = 16  #: day-block width (≥ both lengths ⇒ ≤2 blocks/interval)


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS a_id,
               CAST(o_orderdate AS DATE) AS a_start,
               CAST(o_orderdate AS DATE) + CAST({OVL_A_DAYS} AS INTEGER)
                   AS a_end
        FROM orders WHERE o_orderkey % 97 = 0),
    b AS (
        SELECT o_orderkey AS b_id,
               CAST(o_orderdate AS DATE) AS b_start,
               CAST(o_orderdate AS DATE) + CAST({OVL_B_DAYS} AS INTEGER)
                   AS b_end
        FROM orders WHERE o_orderkey % 89 = 0)
    SELECT a_id, b_id,
           CAST(date_diff('day', greatest(a_start, b_start),
                          least(a_end, b_end)) AS BIGINT) AS overlap_days
    FROM a JOIN b
      ON a_start < b_end AND b_start < a_end
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: every pair of campaigns (set A × set B)
    whose date ranges intersect, with the overlap length — the schedule-
    conflict / concurrent-exposure query.

    Same bucketing rewrite as ``join_range_interval``, plus the
    dedup-free attribution trick: each interval lands in the ≤2 day
    blocks it touches, the equi-join on block proposes candidates, and
    a pair is COUNTED ONLY in the block containing its overlap start
    (``max(a_start, b_start)`` lies inside both intervals, so exactly
    one shared block owns the pair) — no DISTINCT pass over the
    candidate set, which at scale is the difference between one shuffle
    and two.
    """
    o = load_table(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    ed = F.datediff(day, F.lit("1970-01-01").cast("date"))

    def intervals(modulus, days, p):
        iv = o.filter(F.col("o_orderkey") % modulus == 0).select(
            F.col("o_orderkey").alias(f"{p}_id"),
            day.alias(f"{p}_start"),
            F.date_add(day, days).alias(f"{p}_end"),
            ed.alias(f"{p}_ed"),
        )
        return iv.select(
            f"{p}_id",
            f"{p}_start",
            f"{p}_end",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.col(f"{p}_ed") / OVL_BLOCK),
                        F.floor((F.col(f"{p}_ed") + days - 1) / OVL_BLOCK),
                    )
                )
            ).alias("block"),
        )

    a = intervals(97, OVL_A_DAYS, "a")
    b = intervals(89, OVL_B_DAYS, "b")
    ov_start = F.greatest(F.col("a_start"), F.col("b_start"))
    own_block = F.floor(
        F.datediff(ov_start, F.lit("1970-01-01").cast("date")) / OVL_BLOCK
    )
    return (
        a.join(b, "block")
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
            & (own_block == F.col("block"))
        )
        .select(
            "a_id",
            "b_id",
            F.datediff(
                F.least(F.col("a_end"), F.col("b_end")), ov_start
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )


# --------------------------------------------------------------------------
# Fuzzy string-matching join (Levenshtein within blocked candidates)
# (round 5)
# --------------------------------------------------------------------------

FUZZY_MAXDIST = 3


@query(
    "join_fuzzy_levenshtein",
    oracle=f"""
    WITH pairs AS (
        SELECT a.p_brand,
               a.p_partkey AS a_key, b.p_partkey AS b_key,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM part a
        JOIN part b ON b.p_brand = a.p_brand
                   AND b.p_partkey > a.p_partkey
                   AND abs(length(a.p_name) - length(b.p_name))
                       <= {FUZZY_MAXDIST}),
    stats AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN dist <= {FUZZY_MAXDIST} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_close
        FROM pairs GROUP BY p_brand),
    best AS (
        SELECT p_brand, a_key AS best_a, b_key AS best_b,
               CAST(dist AS BIGINT) AS best_dist
        FROM pairs
        QUALIFY row_number() OVER (
            PARTITION BY p_brand ORDER BY dist, a_key, b_key) = 1)
    SELECT s.p_brand, s.n_pairs, s.n_close,
           b.best_a, b.best_b, b.best_dist
    FROM stats s JOIN best b USING (p_brand)
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-matching join: per brand, how many length-banded
    part-name pairs sit within Levenshtein distance 3, and the closest
    such pair — the entity-resolution primitive for names that
    token-level dedup (``llm_dedup_ngram``) misses (one-character typos
    inside a word).

    BLOCKING is the scale story: candidates come from an equi-join on
    (brand, name-length band) with bands of width ``FUZZY_MAXDIST+1``
    probed at offsets {-1, 0, +1} — any pair with length difference
    ≤ ``FUZZY_MAXDIST`` (a NECESSARY condition for edit distance
    ≤ ``FUZZY_MAXDIST``) lands in exactly one probed band combination,
    so recall over close pairs is exact and never all-pairs.  Unlike a
    brand-only block (constant 25 block keys → O(n²/25) candidates),
    block count here grows with the data: block size is capped by the
    per-(brand, 4-char length band) population, so candidate volume
    stays near-linear at 100 TB.  The edit distance is a JVM built-in
    over the blocked pairs; Levenshtein is exact integer arithmetic —
    identical in both engines — and every ranking orders on
    (dist, a_key, b_key).  The oracle expresses the identical banded
    candidate set via the |len(a)-len(b)| ≤ {FUZZY_MAXDIST} predicate.
    """
    band = FUZZY_MAXDIST + 1
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        "p_brand",
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
        F.floor(F.length("p_name") / band).alias("a_band"),
    ).withColumn("probe", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    # The part table arrives as ONE small parquet split, but the work is
    # CPU-bound (|candidates| × levenshtein) — spread the probe side across
    # the cluster by block key.  An explicit partition count marks the
    # shuffle REPARTITION_BY_NUM, which AQE deliberately leaves uncoalesced.
    a = a.repartition(32, "p_brand", "a_band", "probe")
    b = p.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        F.floor(F.length("p_name") / band).alias("b_band"),
    )
    pairs = (
        a.join(
            b,
            (F.col("b_brand") == F.col("p_brand"))
            & (F.col("b_band") == F.col("a_band") + F.col("probe")),
        )
        .filter(
            (F.col("b_key") > F.col("a_key"))
            & (
                F.abs(F.length("a_name") - F.length("b_name"))
                <= FUZZY_MAXDIST
            )
        )
        .select(
            "p_brand",
            "a_key",
            "b_key",
            F.levenshtein("a_name", "b_name").alias("dist"),
        )
        # Persisted: the per-brand stats aggregate AND the best-pair
        # window both consume the scored candidates — unpersisted, the
        # levenshtein pass (the dominant cost) executed twice.
        .transform(cached)
    )
    stats = pairs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("dist") <= FUZZY_MAXDIST, 1).otherwise(0)
        ).alias("n_close"),
    )
    wb = Window.partitionBy("p_brand").orderBy("dist", "a_key", "b_key")
    best = (
        pairs.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(
            "p_brand",
            F.col("a_key").alias("best_a"),
            F.col("b_key").alias("best_b"),
            F.col("dist").cast("long").alias("best_dist"),
        )
    )
    return stats.join(best, "p_brand")


# --------------------------------------------------------------------------
# Grid-blocked spatial neighbor join (round 5)
# --------------------------------------------------------------------------

GRID_CELL = 16          # cell edge; must be >= NEAR_DIST for 3x3 coverage
NEAR_DIST = 12          # Chebyshev neighborhood radius
SPATIAL_USERS = 400     # derived-point population bound for the demo


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
        SELECT DISTINCT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 256 AS x,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))
                    AS BIGINT) % 256 AS y
        FROM events WHERE user_id < {SPATIAL_USERS}),
    cells AS (
        SELECT p.user_id, p.x, p.y,
               (p.x // {GRID_CELL}) + dx AS cx,
               (p.y // {GRID_CELL}) + dy AS cy
        FROM pts p,
             (SELECT unnest([-1, 0, 1]) AS dx) a,
             (SELECT unnest([-1, 0, 1]) AS dy) b),
    pairs AS (
        SELECT c.user_id AS a_id, q.user_id AS b_id,
               greatest(abs(c.x - q.x), abs(c.y - q.y)) AS cheb
        FROM cells c
        JOIN pts q ON q.x // {GRID_CELL} = c.cx
                  AND q.y // {GRID_CELL} = c.cy
                  AND q.user_id > c.user_id)
    SELECT DISTINCT a_id, b_id, CAST(cheb AS BIGINT) AS cheb
    FROM pairs WHERE cheb <= {NEAR_DIST}
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial neighbor join: all point pairs within
    Chebyshev distance {NEAR_DIST} on a derived 256×256 plane, found
    by hashing each point into {GRID_CELL}px cells and equi-joining
    each point's 3×3 cell neighborhood — the standard trick that turns
    an all-pairs distance predicate into a hash join (geohash /
    S2-cell blocking), the same candidate-then-verify shape as the
    registry's LSH and gram-blocked fuzzy joins but on coordinates.

    Cell edge ≥ radius guarantees every qualifying pair shares one of
    the 9 probed cells (pigeonhole) — exact recall, no distance scan.
    Coordinates derive from the portable md5 hash (this corpus has no
    geo columns; the blocking dataflow is the point).  Candidate
    volume is 9·|P|·density per cell, never |P|²; the verify step is
    an exact integer Chebyshev test.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    pts = (
        ev.filter(F.col("user_id") < SPATIAL_USERS)
        .select(
            "user_id",
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 256)
            .alias("x"),
            (F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % 256)
            .alias("y"),
        )
        .distinct()
    )
    offsets = spark.range(-1, 2).select(
        F.col("id").alias("dx")
    ).crossJoin(spark.range(-1, 2).select(F.col("id").alias("dy")))
    cells = pts.crossJoin(F.broadcast(offsets)).select(
        F.col("user_id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.floor(F.col("x") / GRID_CELL) + F.col("dx")).alias("cx"),
        (F.floor(F.col("y") / GRID_CELL) + F.col("dy")).alias("cy"),
    )
    q = pts.select(
        F.col("user_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / GRID_CELL).alias("cx"),
        F.floor(F.col("y") / GRID_CELL).alias("cy"),
    )
    cheb = F.greatest(
        F.abs(F.col("ax") - F.col("bx")), F.abs(F.col("ay") - F.col("by"))
    )
    return (
        cells.join(q, ["cx", "cy"])
        .filter(F.col("b_id") > F.col("a_id"))
        .select("a_id", "b_id", cheb.alias("cheb"))
        .filter(F.col("cheb") <= NEAR_DIST)
        .distinct()
    )


#: Neighbors reported per point by the grid kNN join.
KNN_GRID_K = 3


@query(
    "join_knn_grid",
    oracle=f"""
    WITH pts AS (
        SELECT DISTINCT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 256 AS x,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))
                    AS BIGINT) % 256 AS y
        FROM events WHERE user_id < {SPATIAL_USERS}),
    cells AS (
        SELECT p.user_id, p.x, p.y,
               (p.x // {GRID_CELL}) + dx AS cx,
               (p.y // {GRID_CELL}) + dy AS cy
        FROM pts p,
             (SELECT unnest([-1, 0, 1]) AS dx) a,
             (SELECT unnest([-1, 0, 1]) AS dy) b),
    pairs AS (
        SELECT DISTINCT c.user_id, q.user_id AS neighbor_id,
               greatest(abs(c.x - q.x), abs(c.y - q.y)) AS cheb
        FROM cells c
        JOIN pts q ON q.x // {GRID_CELL} = c.cx
                  AND q.y // {GRID_CELL} = c.cy
                  AND q.user_id <> c.user_id),
    ranked AS (
        SELECT user_id, neighbor_id, CAST(cheb AS BIGINT) AS cheb,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY cheb, neighbor_id) AS rk
        FROM pairs WHERE cheb <= {GRID_CELL})
    SELECT user_id, neighbor_id, cheb, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {KNN_GRID_K}
    """,
)
def join_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius k-nearest-neighbor join on the derived point
    plane: each point's {KNN_GRID_K} nearest neighbors within
    Chebyshev radius {GRID_CELL}, found through the same 3×3-cell
    blocking as ``join_spatial_grid`` — the kNN-join shape (geo
    nearest-store, sensor nearest-station) expressed as candidate
    generation + per-point heap instead of an all-pairs distance sort.

    Bounding the radius at one cell edge is what makes blocked kNN
    EXACT (pigeonhole: any pair within the radius shares a probed
    cell) and is the standard production contract — unbounded kNN
    needs ring expansion whose cost is unbounded on sparse regions.
    Candidates are ranked by a window PARTITIONED BY the probe point
    (per-key state = that point's candidate count), with the total
    (cheb, neighbor_id) order making the cut deterministic; all
    distances are exact integers on the hash-derived plane.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    pts = (
        ev.filter(F.col("user_id") < SPATIAL_USERS)
        .select(
            "user_id",
            (
                F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 256
            ).alias("x"),
            (
                F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % 256
            ).alias("y"),
        )
        .distinct()
        .transform(cached)
    )
    deltas = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    cells = pts.crossJoin(F.broadcast(deltas)).select(
        "user_id",
        "x",
        "y",
        (F.expr(f"x div {GRID_CELL}") + F.col("dx")).alias("cx"),
        (F.expr(f"y div {GRID_CELL}") + F.col("dy")).alias("cy"),
    )
    q = pts.select(
        F.col("user_id").alias("neighbor_id"),
        F.expr(f"x div {GRID_CELL}").alias("qcx"),
        F.expr(f"y div {GRID_CELL}").alias("qcy"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
    )
    pairs = (
        cells.join(
            q,
            (F.col("qcx") == F.col("cx"))
            & (F.col("qcy") == F.col("cy"))
            & (F.col("neighbor_id") != F.col("user_id")),
        )
        .select(
            "user_id",
            "neighbor_id",
            F.greatest(
                F.abs(F.col("x") - F.col("qx")),
                F.abs(F.col("y") - F.col("qy")),
            ).alias("cheb"),
        )
        .distinct()
        .filter(F.col("cheb") <= GRID_CELL)
    )
    w = Window.partitionBy("user_id").orderBy("cheb", "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= KNN_GRID_K)
        .select("user_id", "neighbor_id", "cheb", "rk")
    )
