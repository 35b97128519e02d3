"""Projection / filter / cleaning / sort / set operators (SURVEY.md §2
categories 2, 6, 7).

Reference analogs: column select + computed metrics, date filtering,
null cleanup and type casts of the COVID frame, top-N country tables.
Everything here stays inside whole-stage codegen (no Python in the row
path) and keeps predicates sargable so parquet pushdown engages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


# --------------------------------------------------------------------------
# Category 2 — projection, filter, cleaning
# --------------------------------------------------------------------------


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + computed columns + alias (revenue = extprice × (1 − disc)).

    Per-row IEEE double arithmetic with identical operation order is
    bit-deterministic across engines, so the raw products are emitted —
    rounding here would *introduce* mismatches (Spark rounds HALF_UP,
    DuckDB half-even).  Rounding is reserved for order-dependent
    aggregates (SURVEY.md §5.3.3).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 30
    """,
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single sargable predicate — reaches the parquet reader as a pushed filter."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice BETWEEN 10000 AND 150000)
       OR (o_orderpriority LIKE '1-%' AND o_orderstatus IN ('O', 'P')
           AND NOT o_totalprice < 5000)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/IN/BETWEEN/LIKE/NOT combined predicate."""
    o = load_table(spark, sf_dir, "orders")
    pred = (
        (F.col("o_orderstatus") == "F")
        & F.col("o_totalprice").between(10000, 150000)
    ) | (
        F.col("o_orderpriority").like("1-%")
        & F.col("o_orderstatus").isin("O", "P")
        & ~(F.col("o_totalprice") < 5000)
    )
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@query(
    "filter_null_handling",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
                                                                AS bal_filled,
           nullif(c_mktsegment, 'BUILDING')                     AS seg_nb,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL
                                                                AS is_neg
    FROM customer
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull/coalesce/nullif + na.fill semantics.

    The corpus has no nulls (FIXTURES.md), so nulls are manufactured
    in-query: negative balances become NULL, then repaired with
    ``na.fill`` — the reference's missing-value cleanup step.
    """
    c = load_table(spark, sf_dir, "customer")
    bal_pos = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    out = c.select(
        "c_custkey",
        bal_pos.alias("bal_pos"),
        bal_pos.alias("bal_filled"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        bal_pos.isNull().alias("is_neg"),
    )
    return out.na.fill({"bal_filled": 0.0})


@query(
    "dedup_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT row dedup — partial+final hash aggregate underneath."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
    )


@query(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(floor(l_quantity) AS INTEGER)  AS qty_int,
           CAST(l_shipdate AS DATE)            AS ship_date,
           CAST(l_orderkey AS VARCHAR)         AS key_str,
           CAST(CAST(l_partkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(l_linenumber AS DOUBLE)        AS line_dbl
    FROM lineitem
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit casts string↔int↔double↔date (reference's inferSchema cleanup).

    Note: double→int casts are written as ``floor`` first — Spark
    truncates while DuckDB rounds, so the raw cast is not portable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_partkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


@query(
    "sample_rows",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE (o_orderkey * 1103515245 + 12345) % 1000000007 % 1000 < 100
    """,
)
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample (reference analog: EDA eyeballing).

    Keyed LCG-style hash sampling instead of ``df.sample``: the bucket
    ``(k·a + c) mod p mod 1000`` is exact integer arithmetic, identical
    in every engine, so the sample is reproducible across runs, engines
    and partitionings — the property a training-data pipeline needs for
    repeatable holdouts.  (Seeded ``df.sample`` is deterministic only
    within one engine; per-partition RNG draws have no cross-engine
    oracle.)  Pure column expression: filter-pushed, scale-free.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.col("o_orderkey") * 1103515245 + 12345) % 1000000007 % 1000
    return o.filter(bucket < 100).select("o_orderkey", "o_totalprice")


@query(
    "sample_stratified",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM orders
    WHERE (o_orderkey * 1103515245 + 12345) % 1000000007 % 1000
          < CASE o_orderstatus WHEN 'F' THEN 200
                               WHEN 'O' THEN 50
                               ELSE 0 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum fractions.

    The ``df.sampleBy`` analog with the same portable keyed hash as
    ``sample_rows``, so each stratum's draw is reproducible across
    engines and partitionings: 20% of finished orders, 5% of open
    ones, none of the rest — the class-rebalancing primitive for
    training-set construction.  Pure column predicate: filter-pushed,
    no shuffle, scale-free.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.col("o_orderkey") * 1103515245 + 12345) % 1000000007 % 1000
    frac = (
        F.when(F.col("o_orderstatus") == "F", 200)
        .when(F.col("o_orderstatus") == "O", 50)
        .otherwise(0)
    )
    return o.filter(bucket < frac).select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# Category 6 — sort, limit, top-k
# --------------------------------------------------------------------------


@query(
    "sort_multikey",
    oracle="SELECT c_custkey, c_nationkey, c_acctbal FROM customer",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, desc-nulls-last + asc mix.

    The driver's hash is order-insensitive so the oracle is the same
    row *set*; the point is exercising SortExec (a full range-partition
    exchange + per-partition sort at scale).
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(F.desc_nulls_last("c_acctbal"), F.asc("c_custkey"))
    )


@query(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by totalprice (top-10 countries analog).

    Compiles to TakeOrderedAndProject: each partition keeps a 10-row
    heap, the driver merges heaps — no global sort, no full shuffle, so
    it is O(k) memory at any scale.  Tie-break on o_orderkey so both
    engines select identical rows.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination slice over a total order."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(10)
    )


# --------------------------------------------------------------------------
# Category 7 — set operations (customer segment slices)
# --------------------------------------------------------------------------


def _building(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


def _high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )


_BUILDING_SQL = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_HIBAL_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"


@query("set_union_all", oracle=f"{_BUILDING_SQL} UNION ALL {_HIBAL_SQL}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle at all, partitions are simply concatenated."""
    return _building(spark, sf_dir).unionAll(_high_balance(spark, sf_dir))


@query("set_union_distinct", oracle=f"{_BUILDING_SQL} UNION {_HIBAL_SQL}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + distinct (one hash aggregate)."""
    return (
        _building(spark, sf_dir).union(_high_balance(spark, sf_dir)).distinct()
    )


@query("set_intersect", oracle=f"{_BUILDING_SQL} INTERSECT {_HIBAL_SQL}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in both slices (set semantics)."""
    return _building(spark, sf_dir).intersect(_high_balance(spark, sf_dir))


@query("set_except", oracle=f"{_BUILDING_SQL} EXCEPT ALL {_HIBAL_SQL}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in BUILDING but not high-balance (bag semantics)."""
    return _building(spark, sf_dir).exceptAll(_high_balance(spark, sf_dir))


@query(
    "set_union_by_name",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of frames whose column ORDER differs — resolved by name."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_acctbal"
    )
    b = c.filter(F.col("c_acctbal") > 5000).select("c_acctbal", "c_custkey")
    return a.unionByName(b)


@query(
    "set_except_all",
    oracle="""
    SELECT l_orderkey, l_partkey FROM lineitem
    EXCEPT ALL
    SELECT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics difference: EXCEPT ALL subtracts *multiplicities*
    instead of deduplicating — a row appearing 3 times minus 1 match
    survives twice.

    Distinct from ``set_except``: no implicit dedup, so the result
    preserves duplicate facts.  Spark plans it as a count-per-key
    aggregate on each side plus a replicate — one shuffle per side,
    same as the DISTINCT variant.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_partkey")
    )
    return li.exceptAll(returned)


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_discount > 0.02
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection: each row survives min(count_left,
    count_right) times."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_orderkey", "l_suppkey")
    b = li.filter(F.col("l_discount") > 0.02).select(
        "l_orderkey", "l_suppkey"
    )
    return a.intersectAll(b)


# --------------------------------------------------------------------------
# Deterministic fixed-k reservoir sample (round 5)
# --------------------------------------------------------------------------

RESERVOIR_K = 500


@query(
    "sample_reservoir_topk",
    oracle=f"""
    SELECT event_id, event_type, value,
           row_number() OVER (
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
               AS sample_rank
    FROM events
    QUALIFY row_number() OVER (
        ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
        <= {RESERVOIR_K}
    """,
)
def sample_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample without replacement: the k=500 rows
    with the smallest md5(event_id) — a deterministic 'reservoir' that
    is independent of partitioning, row order, and engine, unlike
    rand()-seeded reservoirs.

    Spark executes the orderBy+limit as TakeOrderedAndProject: each
    partition keeps its local top-k heap and only k rows per partition
    travel to the final merge, so at 100 TB the cost is one linear
    scan plus a k·P-row reduction — no full sort, no shuffle of the
    corpus.  The rank column is re-derived on the 500-row result
    (single tiny partition, exact same (md5, event_id) total order the
    selection used).
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    sampled = (
        ev.select("event_id", "event_type", "value", h.alias("h"))
        .orderBy("h", "event_id")
        .limit(RESERVOIR_K)
    )
    w = Window.orderBy("h", "event_id")
    return sampled.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("sample_rank"),
    )
