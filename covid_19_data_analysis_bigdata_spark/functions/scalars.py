"""Scalar function families (SURVEY.md §2 category 8).

Reference analogs: country-name cleanup, date parsing/bucketing, rate
math, severity banding, API-JSON parsing.  One query per family, each
emitting several function results as aliased columns.  Everything stays
JVM-side inside whole-stage codegen — no Python in the row path.

Cross-engine portability notes baked in below (learned by probing):
- day-of-week: Spark is 1=Sunday, DuckDB 0=Sunday → both converted to
  ISO (1=Monday..7=Sunday).
- DuckDB regexp_replace needs the explicit ``'g'`` flag to match
  Spark's replace-all default.
- DuckDB map extraction ``m['k']`` yields a single-element list.
- round() on *stored* data is avoided (HALF_UP vs half-even divergence);
  round appears only after transcendental functions where binary
  halfway cases cannot occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table


@query(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS name_upper,
           lower(c_mktsegment)                    AS seg_lower,
           trim(concat('  ', c_name, ' '))        AS name_trimmed,
           substring(c_name, 1, 8)                AS name_prefix,
           concat_ws('|', c_mktsegment, c_name)   AS seg_name,
           CAST(length(c_name) AS INTEGER)        AS name_len,
           replace(c_name, 'Customer', 'C')       AS name_short,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded
    FROM customer
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/concat_ws/length/replace/lpad."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias(
            "name_short"
        ),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias(
            "nation_padded"
        ),
    )


@query(
    "str_split_regex",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1)                    AS first_word,
           split_part(p_name, ' ', 2)                    AS second_word,
           regexp_extract(p_brand, '([0-9]+)', 1)        AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g')   AS devoweled,
           starts_with(p_name, 'small')                  AS is_small,
           contains(p_type, 'ECO')                       AS is_eco
    FROM part
    """,
)
def str_split_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/regexp_extract/regexp_replace/startswith/contains."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.startswith(F.col("p_name"), F.lit("small")).alias("is_small"),
        F.contains(F.col("p_type"), F.lit("ECO")).alias("is_eco"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)     AS yr,
           CAST(month(o_orderdate) AS INTEGER)    AS mth,
           CAST(day(o_orderdate) AS INTEGER)      AS dom,
           CAST(quarter(o_orderdate) AS INTEGER)  AS qtr,
           CAST(isodow(o_orderdate) AS INTEGER)   AS iso_dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           CAST(date_diff('month', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS months_since,
           CAST(o_orderdate AS DATE) + 30         AS plus_30d,
           last_day(CAST(o_orderdate AS DATE))    AS month_end
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/ISO-dow/dayofyear/date_trunc/datediff/
    date_add/months-since/last_day (date-bucketing analog)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    dd = d.cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mth"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        # Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday.
        (((F.dayofweek(d) + 5) % 7) + 1).alias("iso_dow"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(dd, F.lit("1995-01-01").cast("date")).alias("days_since"),
        (
            (F.year(d) * 12 + F.month(d)) - F.lit(1995 * 12 + 1)
        ).alias("months_since"),
        F.date_add(dd, 30).alias("plus_30d"),
        F.last_day(dd).alias("month_end"),
    )


@query(
    "ts_funcs",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) // 1000                   AS epoch_sec,
           epoch_ms(ts)                           AS epoch_msec,
           CAST(hour(ts) AS INTEGER)              AS hr,
           CAST(minute(ts) AS INTEGER)            AS mins,
           epoch_ms(ts + INTERVAL 1 HOUR)         AS plus_1h_ms,
           epoch_ms(date_trunc('hour', ts))       AS hour_bucket_ms
    FROM events
    """,
)
def ts_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix epoch / hour / minute / interval arithmetic on event time.

    All timestamp-valued results leave as epoch-ms integers — the
    common grain of Spark's µs and DuckDB's ns clocks (SURVEY.md §5.3.4).
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.expr("unix_millis(ts) DIV 1000").alias("epoch_sec"),
        F.unix_millis(ts).alias("epoch_msec"),
        F.hour(ts).alias("hr"),
        F.minute(ts).alias("mins"),
        F.unix_millis(ts + F.expr("INTERVAL 1 HOUR")).alias("plus_1h_ms"),
        F.unix_millis(F.date_trunc("hour", ts)).alias("hour_bucket_ms"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000)               AS abs_centered,
           CAST(ceil(l_quantity / 7) AS BIGINT)       AS ceil_weeks,
           CAST(floor(l_quantity / 7) AS BIGINT)      AS floor_weeks,
           round(sqrt(l_extendedprice), 6)            AS sqrt_price,
           round(pow(l_discount + 1, 3), 6)           AS pow_disc,
           round(ln(l_extendedprice), 6)              AS ln_price,
           round(exp(l_discount), 6)                  AS exp_disc,
           greatest(l_quantity, CAST(l_linenumber AS DOUBLE)) AS biggest,
           least(l_quantity, CAST(l_linenumber AS DOUBLE))    AS smallest,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign,
           CAST(l_orderkey % 7 AS BIGINT)             AS key_mod
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/pow/ln/exp/greatest/least/sign/mod.

    Transcendentals (sqrt/pow/ln/exp) are rounded to 6dp: libm vs JVM
    Math may differ in the last ulp; binary doubles never land exactly
    on a decimal halfway point after a transcendental, so the rounding
    itself is portable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000).alias("abs_centered"),
        F.ceil(q / 7).alias("ceil_weeks"),
        F.floor(q / 7).alias("floor_weeks"),
        F.round(F.sqrt(price), 6).alias("sqrt_price"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("pow_disc"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.greatest(q, F.col("l_linenumber").cast("double")).alias("biggest"),
        F.least(q, F.col("l_linenumber").cast("double")).alias("smallest"),
        F.signum(price - 30000).alias("price_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'critical'
                WHEN o_totalprice >= 50000  THEN 'high'
                WHEN o_totalprice >= 10000  THEN 'medium'
                ELSE 'low' END                          AS severity,
           CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS state,
           nullif(o_orderstatus, 'P')                    AS status_np,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL
                THEN 'known' ELSE 'pending' END          AS nvl2_style
    FROM orders
    """,
)
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder / if / nullif / nvl / nvl2 (severity banding)."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.when(price >= 150000, "critical")
        .when(price >= 50000, "high")
        .when(price >= 10000, "medium")
        .otherwise("low")
        .alias("severity"),
        F.expr("if(o_orderstatus = 'F', 'final', 'open')").alias("state"),
        status_np.alias("status_np"),
        F.expr("nvl(nullif(o_orderstatus, 'P'), 'PENDING')").alias(
            "status_filled"
        ),
        F.expr("nvl2(nullif(o_orderstatus, 'P'), 'known', 'pending')").alias(
            "nvl2_style"
        ),
    )


@query(
    "hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text)                 AS text_md5,
           sha256(text)              AS text_sha256,
           md5(concat(lang, source)) AS meta_md5
    FROM documents
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content hashes — the dedup keys of category 10.

    md5/sha2 are spec-identical across engines; xxhash64/crc32 are
    seeded differently per engine and are kept out of checked output.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat("lang", "source")).alias("meta_md5"),
    )


@query(
    "array_funcs",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CAST(len(words) AS INTEGER)              AS n_words,
           array_to_string(list_slice(words, 1, 3), '|')    AS first3,
           list_contains(words, 'data')             AS has_data,
           CAST(list_position(words, 'data') AS BIGINT) AS pos_data,
           array_to_string(list_sort(list_distinct(words)), '|') AS vocab,
           array_to_string(
               list_sort(list_distinct(list_cat(list_slice(words, 1, 2),
                                                list_slice(words, -2, -1)))),
               '|')                                  AS ends
    FROM w
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/slice/contains/position/distinct/sort/union on word arrays.

    All list-valued results are '|'-joined to scalar strings on the way
    out: the array ops run inside the plan, but the emitted cells stay
    hashable for any result-comparison harness.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.concat_ws("|", F.slice(words, 1, 3)).alias("first3"),
        F.array_contains(words, "data").alias("has_data"),
        F.array_position(words, "data").alias("pos_data"),
        F.concat_ws("|", F.array_sort(F.array_distinct(words))).alias("vocab"),
        F.concat_ws(
            "|",
            F.array_sort(
                F.array_distinct(
                    F.concat(F.slice(words, 1, 2), F.slice(words, -2, 2))
                )
            ),
        ).alias("ends"),
    )


@query(
    "array_hof",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')), 6)                                       AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_aggregate(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               'sum'), 6)                                        AS vec_sum,
           round(CAST(embedding[1] AS DOUBLE) * 2, 6)            AS d1,
           round(CAST(embedding[2] AS DOUBLE) * 2, 6)            AS d2,
           round(CAST(embedding[3] AS DOUBLE) * 2, 6)            AS d3
    FROM embeddings
    """,
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order transform/filter/aggregate on embedding vectors.

    Elements are cast float→double INSIDE the lambdas so both engines
    accumulate in double (SURVEY.md §1.3.3); reductions are sequential
    left-to-right in both, so 6dp rounding closes the gap.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    emb,
                    F.lit(0.0),
                    lambda acc, x: acc + dbl(x) * dbl(x),
                )
            ),
            6,
        ).alias("l2_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x)), 6
        ).alias("vec_sum"),
        # transform() runs in-plan; the doubled head is emitted as one
        # scalar column per element so every output cell stays hashable.
        *[
            F.round(
                F.element_at(F.transform(emb, lambda x: dbl(x) * 2), i), 6
            ).alias(f"d{i}")
            for i in (1, 2, 3)
        ],
    )


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(
               map_keys(MAP(['k'], [CAST(props->>'$.k' AS BIGINT)])),
               ',')                                                AS prop_keys,
           MAP(['k'], [CAST(props->>'$.k' AS BIGINT)])['k'][1]     AS k_value,
           CAST(cardinality(MAP(['k'], [CAST(props->>'$.k' AS BIGINT)]))
                AS INTEGER)                                        AS map_size
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map/map_keys/element_at/size over parsed event props.

    DuckDB's map extraction returns the bare value (Spark's element_at
    likewise), so the two agree; the map itself is not emitted — map
    cell encodings differ across drivers.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k").cast("bigint")
    )
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.size(m).alias("map_size"),
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           props->>'$.k'                        AS k_str,
           CAST(props->>'$.k' AS BIGINT)        AS k_int,
           CAST(json_valid(props) AS BOOLEAN)   AS is_valid
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json-with-schema / validity (API-JSON parsing)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_int"),
        F.get_json_object("props", "$.k").isNotNull().alias("is_valid"),
    )


@query(
    "safe_arith_funcs",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / nullif(o_custkey % 3, 0), 4) AS safe_div,
           TRY_CAST(o_orderpriority AS BIGINT)               AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num
    FROM orders
    """,
)
def safe_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide / try_cast degrade to NULL.

    Under ANSI mode these return NULL instead of raising (division by
    zero, bad casts) — mandatory on dirty 100 TB inputs, where one
    malformed row must not kill a 1000-executor stage.

    A third of the divisors are zero (custkey mod 3) and degrade
    gracefully to NULL; `'1-URGENT'` fails the full cast but its first
    character parses.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide("o_totalprice", F.pmod(F.col("o_custkey"), F.lit(3))),
            4,
        ).alias("safe_div"),
        F.col("o_orderpriority").try_cast("bigint").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias(
            "prio_num"
        ),
    )


@query(
    "bit_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                   AS low_byte,
           o_orderkey | 4096                  AS with_flag,
           xor(o_orderkey, o_orderkey >> 3)   AS mixed,
           o_orderkey << 2                    AS shifted,
           bit_count(o_orderkey)              AS popcount
    FROM orders
    WHERE o_orderkey % 41 = 0
    """,
)
def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family: AND/OR/XOR, shifts, popcount — the
    primitives under bitmap indexes, bloom filters, and hash mixing
    (exact integer ops, trivially identical across engines).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 41 == 0
    )
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.shiftright(k, 3)).alias("mixed"),
        F.shiftleft(k, 2).alias("shifted"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "json_variant_funcs",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT)        AS k_val,
           CAST(props->>'$.missing' AS BIGINT)  AS k_missing,
           CAST(props->>'$.k' AS BIGINT) % 10   AS k_mod
    FROM events
    WHERE event_id % 97 = 0
    """,
)
def json_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT access: ``parse_json`` once, then typed
    path extraction with ``variant_get`` / ``try_variant_get``.

    VARIANT (Spark 4) is the scale answer to JSON columns: the value is
    parsed once into a binary encoding at ingest, and every downstream
    path access is a cheap binary probe instead of a per-query string
    re-parse — at 100 TB the difference between one parse and one parse
    per predicate.  ``try_variant_get`` on an absent path degrades to
    NULL (errors never abort a petabyte scan); the extracted value
    feeds normal integer arithmetic.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 97 == 0
    )
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        (k % 10).alias("k_mod"),
    )


@query(
    "gen_funcs",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderkey % 100 = 0)
    SELECT o_orderkey, 'price' AS metric,
           CAST(o_totalprice AS VARCHAR) AS val
    FROM base
    UNION ALL
    SELECT o_orderkey, 'date', CAST(o_orderdate AS VARCHAR) FROM base
    """,
)
def gen_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator surface: ``stack`` — one wide row fanned into N
    (metric, value) rows inside the projection, the generator behind
    SQL ``LATERAL VIEW``-style melts (the expression-level sibling of
    the UNPIVOT clause, usable anywhere a column expression is).

    A generator is a row-local constant fan-out in the same stage as
    the scan — no shuffle, no UDF; at 100 TB the cost is exactly the
    ×N output rows, nothing else.  Values are cast to string on both
    sides so heterogeneous metrics share one column with identical
    rendering.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 100 == 0
    )
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'price', CAST(o_totalprice AS STRING),"
            "         'date',  CAST(o_orderdate  AS STRING))"
        ).alias("metric", "val"),
    )


@query(
    "map_hof_funcs",
    oracle="""
    WITH m AS (
        SELECT event_id,
               MAP(['clicks', 'views'],
                   [CAST(props->>'$.k' AS BIGINT),
                    CAST(props->>'$.k' AS BIGINT) * 2]) AS counters
        FROM events WHERE event_id % 20 = 0)
    SELECT event_id,
           CAST(counters['clicks'][1] * 10 AS BIGINT)  AS clicks_x10,
           CAST(counters['views'][1] * 10 AS BIGINT)   AS views_x10,
           CAST(counters['clicks'][1] * 11 AS BIGINT) AS zipped_sum,
           array_to_string(
               list_sort(map_keys(counters)), ',') AS keys_csv
    FROM m
    """,
)
def map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: ``transform_values`` rescales every
    counter in place and ``map_zip_with`` merges two maps entry-wise —
    the idioms for feature-bag columns (per-key counters) where
    exploding to rows just to touch values would shuffle the corpus.

    All map compute is row-local inside codegen.  Maps leave the query
    as deterministic scalars/sorted keys (map iteration order is not a
    contract in either engine — exporting a raw map would hash
    differently run to run; this is the repo's map-output rule).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 20 == 0
    )
    k = F.get_json_object("props", "$.k").cast("long")
    m = ev.select(
        "event_id",
        F.create_map(
            F.lit("clicks"), k, F.lit("views"), k * 2
        ).alias("counters"),
    )
    scaled = F.transform_values(F.col("counters"), lambda _, v: v * 10)
    # merge the raw and rescaled bags entry-wise: k + 10k per key
    zipped = F.map_zip_with(
        F.col("counters"), scaled, lambda _, a, b: a + b
    )
    return m.select(
        "event_id",
        F.element_at(scaled, "clicks").alias("clicks_x10"),
        F.element_at(scaled, "views").alias("views_x10"),
        F.element_at(zipped, "clicks").alias("zipped_sum"),
        F.concat_ws(
            ",", F.array_sort(F.map_keys(F.col("counters")))
        ).alias("keys_csv"),
    )


@query(
    "csv_funcs",
    oracle="""
    SELECT event_id,
           event_type || ',' || CAST(user_id AS VARCHAR) AS csv_line,
           string_split(event_type || ',' || CAST(user_id AS VARCHAR),
                        ',')[1] AS parsed_type,
           CAST(string_split(event_type || ',' ||
                             CAST(user_id AS VARCHAR), ',')[2] AS BIGINT)
               AS parsed_user
    FROM events WHERE event_id % 25 = 0
    """,
)
def csv_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV expression surface: ``to_csv`` serializes a struct to one
    delimited line and ``from_csv`` parses it back with a declared
    schema — embedded-CSV columns (a CSV payload INSIDE a row: log
    envelopes, export blobs) handled as expressions, without a file
    boundary or a second scan.

    Both directions are row-local codegen; ``from_csv`` takes an
    explicit schema string (inference inside an expression would be a
    per-row disaster).  The oracle mirrors the round-trip with string
    building/splitting since DuckDB has no expression-level CSV
    codec — the CONTENT contract is identical.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 25 == 0
    )
    line = F.to_csv(F.struct(F.col("event_type"), F.col("user_id")))
    parsed = F.from_csv(line, F.lit("t STRING, u BIGINT"))
    return ev.select(
        "event_id",
        line.alias("csv_line"),
        parsed.getField("t").alias("parsed_type"),
        parsed.getField("u").alias("parsed_user"),
    )


# --------------------------------------------------------------------------
# Business-day arithmetic from epoch-day congruences (round 5)
# --------------------------------------------------------------------------

#: Count of days k in [a, b) with k ≡ r (mod 7), epoch-day arithmetic.
#: 1970-01-01 is a Thursday, so dow(k) = (k + 4) % 7 with 0 = Sunday;
#: Saturday ⇒ k ≡ 2 (mod 7), Sunday ⇒ k ≡ 3 (mod 7).  The +70000
#: offset keeps every operand positive so floor-div and truncating-div
#: agree in both engines.
_DOW_COUNT = (
    "(( {b} - {r} + 70000 ) div 7 - ( {a} - {r} + 70000 ) div 7)"
)


@query(
    "date_business_days",
    oracle="""
    WITH d AS (
        SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               datediff('day', DATE '1970-01-01',
                        CAST(o.o_orderdate AS DATE)) AS a,
               datediff('day', DATE '1970-01-01',
                        CAST(l.l_shipdate AS DATE)) AS b
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate),
    bd AS (
        SELECT month,
               (b - a)
               - ((b - 2 + 70000) // 7 - (a - 2 + 70000) // 7)
               - ((b - 3 + 70000) // 7 - (a - 3 + 70000) // 7)
                   AS bdays
        FROM d)
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(bdays) AS BIGINT) AS total_bdays,
           round(CAST(sum(bdays) AS DOUBLE) / count(*), 6) AS avg_bdays,
           CAST(max(bdays) AS BIGINT) AS max_bdays
    FROM bd GROUP BY month
    """,
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business days between order and ship date per order month —
    weekday-only SLA arithmetic in closed form (no per-day explode, no
    calendar table): weekend days in [order, ship) are counted by the
    modular-congruence identity countDow(a,b,r) = ⌊(b−r+C)/7⌋ −
    ⌊(a−r+C)/7⌋ over epoch days, so each row costs O(1) regardless of
    the interval length — at 100 TB this is the difference between a
    projection and a 100× row explosion.

    All arithmetic is exact integer (epoch days, floor divisions kept
    positive by the constant offset so both engines' division
    semantics coincide); the only division is the final per-month
    mean.  A holiday calendar would join a broadcast dim on top —
    orthogonal to the weekday identity.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")
    d = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("a"),
            F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("b"),
        )
    )
    sat = F.expr(_DOW_COUNT.format(a="a", b="b", r=2))
    sun = F.expr(_DOW_COUNT.format(a="a", b="b", r=3))
    bd = d.select(
        "month",
        ((F.col("b") - F.col("a")) - sat - sun).alias("bdays"),
    )
    return bd.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("bdays").alias("total_bdays"),
        F.round(
            F.sum("bdays").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bdays"),
        F.max("bdays").alias("max_bdays"),
    )
