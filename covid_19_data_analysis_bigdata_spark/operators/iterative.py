"""Iterative distributed algorithms + sort-clustered storage layout.

``ml_kmeans_lloyd`` is the engine's iterative-algorithm pattern: the
mutable state between iterations is the centroid table (k × 64 doubles,
broadcast, O(1) in corpus size); each Lloyd step is one broadcast
cross-join argmin + one partial+final aggregate over the corpus.  The
iteration count is fixed and unrolled into a single lazy plan — at
100 TB each iteration is one linear pass, and nothing besides the
centroids ever sits on the driver.

``sink_parquet_sorted`` is the zone-map layout lever: range-partition +
sort-within-partitions on the filter column before writing, so parquet
row-group min/max stats make selective scans skip almost everything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.operators.llm import _cosine, _d
from covid_19_data_analysis_bigdata_spark.sources.io import (
    fixture_dir,
    load_table,
)

KMEANS_ITERS = 2

_DIST_SQL = "sum((e.val - c.c) * (e.val - c.c))"


def _kmeans_iter_sql(i: int) -> str:
    """CTEs for one unrolled Lloyd iteration (assign → recompute)."""
    prev = "cent0" if i == 0 else f"cent{i}"
    return f"""
    dist{i} AS (
        SELECT e.vec_id, c.cluster, {_DIST_SQL} AS d2
        FROM ex e JOIN {prev} c ON e.ord = c.ord
        GROUP BY e.vec_id, c.cluster),
    asg{i} AS (
        SELECT vec_id, cluster
        FROM dist{i}
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, cluster) = 1),
    cent{i + 1} AS (
        SELECT a.cluster, e.ord, avg(e.val) AS c
        FROM ex e JOIN asg{i} a USING (vec_id)
        GROUP BY a.cluster, e.ord)
    """


@query(
    "ml_kmeans_lloyd",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, ord, CAST(embedding[ord] AS DOUBLE) AS val
        FROM embeddings, generate_series(1, 64) AS t(ord)),
    cent0 AS (
        SELECT label AS cluster, ord, avg(val) AS c
        FROM ex GROUP BY label, ord),
    {",".join(_kmeans_iter_sql(i) for i in range(KMEANS_ITERS))}
    SELECT a.cluster,
           count(DISTINCT a.vec_id)  AS n_members,
           round(sum(e.val) / 64, 6) AS mean_component
    FROM asg{KMEANS_ITERS - 1} a JOIN ex e USING (vec_id)
    GROUP BY a.cluster
    """,
)
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means, {KMEANS_ITERS} Lloyd iterations, deterministic init
    from the per-label centroids (no random seeding — SURVEY.md §5.3.5).

    Per iteration: broadcast the k×64 centroid table, assign every
    vector to its nearest centroid (argmin with cluster tie-break),
    recompute centroids as per-(cluster, dimension) means.  Emits each
    final cluster's size and mean component value.

    r15 (VERDICT r14 item 2): the r14 ``spread`` on this scan was
    re-measured with an isolated same-session alternating A/B
    (plans/r15/ab_spread.json: spread-on 1.997 s vs spread-off
    1.699 s median, cleanly separated samples — spread LOSES 0.85×)
    and dropped.  Since the r14 argmin → map-side min(struct) rewrite,
    the per-iteration assign folds k rows per vector before any
    exchange, so the un-cached ``e`` consumer no longer needs wide
    scan parallelism and the repartition exchange (paid once per
    Lloyd iteration) was pure cost.  The driver's 8-vs-32-core ratio
    (1.02, PERF_r14 scaling block) independently corroborates: no
    core sensitivity at this corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    # Persisted (r14, guide §5): the 64×-exploded component table feeds
    # FOUR consumers (seed centroids, each iteration's recompute, the
    # final rollup); unpersisted each one re-scans and re-explodes the
    # corpus.  Eviction merely recomputes, so the persist is a pure
    # speedup at any scale.
    ex = (
        e.select(
            "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
        )
        .select("vec_id", "label", "pos", _d(F.col("val")).alias("val"))
        .transform(cached)
    )

    cent = (
        ex.groupBy(F.col("label").alias("cluster"), "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
    )

    dist2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda x, c: (_d(x) - c) * (_d(x) - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    assigned = None
    for _ in range(KMEANS_ITERS):
        # argmin as min(struct(d2, cluster)) — the PQ trainer's assign
        # idiom (r14, guide §2.3): lexicographic struct-min IS the
        # (d2 asc, cluster asc) order the window used, but it partial-
        # aggregates map-side (k rows per vector fold to 1 before the
        # exchange) instead of shuffling and sorting every (vector,
        # cluster) pair through a window.
        assigned = (
            e.crossJoin(F.broadcast(cent))
            .select(
                "vec_id",
                F.struct(dist2.alias("d2"), F.col("cluster")).alias("s"),
            )
            .groupBy("vec_id")
            .agg(F.min("s").getField("cluster").alias("cluster"))
        )
        cent = (
            ex.join(assigned, "vec_id")
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s.getField("c"),
                ).alias("centroid")
            )
        )

    return (
        ex.join(assigned, "vec_id")
        .groupBy("cluster")
        .agg(
            # count(*) div 64 == countDistinct(vec_id): every vector
            # contributes exactly its 64 exploded components, so the
            # exact-distinct's Expand + extra exchange buy nothing
            # (r14, guide §2.3 — shuffle fewer bytes).
            F.expr("count(*) div 64").alias("n_members"),
            F.round(F.sum("val") / 64, 6).alias("mean_component"),
        )
    )


@query(
    "sink_parquet_sorted",
    oracle="""
    SELECT l_linestatus,
           count(*)                  AS cnt,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
    GROUP BY l_linestatus
    """,
)
def sink_parquet_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered parquet layout: range-partition + sort within
    partitions on ``l_shipdate`` before writing, then read back with a
    narrow date filter.

    Clustering by the dominant filter column tightens every row-group's
    min/max envelope, so the pushed-down predicate skips row groups
    wholesale (zone-map pruning) — the complement of directory-level
    pruning (``sink_parquet_partitioned``) for columns too dense to be
    partition keys.
    """
    out = os.path.join(fixture_dir(sf_dir, "sink"), "lineitem_by_shipdate")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "lineitem")
            .repartitionByRange(8, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(out)
        )
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


PR_ITERS = 3
PR_SCALE = 1_000_000


def _pr_iter_sql(i: int) -> str:
    """One unrolled integer-exact PageRank step (distribute → collect)."""
    return f"""
    r{i + 1} AS (
        SELECT n.node,
               CAST(150000 + (85 * coalesce(
                        sum((r.r * e.w) // o.ow), 0)) // 100 AS BIGINT) AS r
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN r{i} r  ON r.node = e.src
        LEFT JOIN outw o  ON o.src = e.src
        GROUP BY n.node)
    """


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS MATERIALIZED (
        -- MATERIALIZED: ~20 iteration CTEs reference this; without it
        -- DuckDB re-evaluates the fact join per reference (the round-7
        -- sweep measured 89-324 s oracle-side; materialized it is ~4 s)
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               count(*) AS w
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2),
    outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
    nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
    {",".join(_pr_iter_sql(i) for i in range(PR_ITERS))}
    SELECT n.node AS n_nationkey, n.n_name, r.r AS pagerank
    FROM nodes n JOIN r{PR_ITERS} r ON r.node = n.node
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph, {PR_ITERS} unrolled
    iterations in exact fixed-point integer arithmetic.

    The graph is *aggregated out of the fact tables first*: one pass
    over lineitem⋈orders⋈customer⋈supplier collapses ~N rows into a
    ≤25×24-edge weighted digraph (supplier nation → customer nation,
    weight = line count).  Iteration then runs over bounded tables
    only — at 100 TB the expensive part is the single fact
    aggregation, and the loop cost is independent of corpus size.

    Determinism across engines: ranks are scaled BIGINTs ({PR_SCALE} =
    1.0) and every step uses integer division (``div`` / ``//``), so
    both engines walk the identical lattice — no float summation
    order to diverge (damping 0.85 becomes ×85 ÷100 in integers).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .transform(cached)  # ≤600 rows; reused every iteration — never rescan facts
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # r15 (guide §2.4): the out-weight is a property of the edge list,
    # not of the iteration — join it into the cached edge table ONCE
    # instead of broadcasting `outw` inside every iteration (was one
    # extra broadcast build per round; measured same-session
    # alternating A/B at sf0.1: 2.144 s -> 1.721 s median of 5,
    # values identical).  `edges_w` stays ≤ |nation|² rows by
    # construction.
    edges_w = edges.join(F.broadcast(outw), "src").transform(cached)
    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    ranks = nodes.select(
        "node", F.lit(PR_SCALE).cast("long").alias("r")
    )
    for _ in range(PR_ITERS):
        # ranks is nation-grain (≤ |nation| rows) BY CONSTRUCTION at
        # any corpus size, so the iteration join is an explicit
        # broadcast (r14, guide §3.1): the static planner cannot size
        # these derived frames and was emitting SortMergeJoin + two
        # exchanges per iteration that AQE then had to demote at
        # runtime.
        contrib = (
            edges_w.join(F.broadcast(ranks), edges_w.src == ranks.node)
            .select("dst", F.expr("(r * w) div ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            F.broadcast(contrib), nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(150000).cast("long")
                + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
            ).alias("r"),
        )
    return ranks.join(F.broadcast(nodes), "node").select(
        F.col("node").alias("n_nationkey"), "n_name", F.col("r").alias("pagerank")
    )


def _copurchase_base(spark: SparkSession, sf_dir: str):
    """Undirected co-purchase graph shared by every graph operator:
    returns ``(edges, deg)``.

    - ``edges``: distinct part pairs co-occurring in an order (u < v),
      persisted — orders of magnitude smaller than the fact table; AQE
      sizes post-distinct partitions from the ACTUAL edge volume (a
      hard-coded coalesce here once froze parallelism at 100× the
      edges).
    - ``deg``: |V| rows, persisted — feeds the orientation joins and
      any final aggregate (n_edges = sum(d) div 2, so no extra pass).

    Consumers that only need the undirected edge list (k-core peeling)
    call this directly and skip the two orientation joins of
    :func:`_copurchase_oriented`.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Array-side pair expansion (round 7): one groupBy collapses each
    # order to its sorted distinct part set, and u<v pairs explode from
    # transform/slice inside codegen — replacing the distinct +
    # sort-merge self-join build (two more shuffles and a join).  The
    # per-order expansion is quadratic only in ORDER SIZE, which is
    # bounded by basket size at any corpus scale (the skew knob is the
    # order, not the catalog), and the result is the identical edge
    # set the oracles' self-join CTE produces.
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_expr = (
        "flatten(transform(ps, (a, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "b -> struct(a AS u, b AS v))))"
    )
    edges = (
        per_order.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .distinct()
        .transform(cached)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .transform(cached)
    )
    return edges, deg


def _copurchase_oriented(spark: SparkSession, sf_dir: str):
    """Degree-oriented co-purchase graph shared by the triangle-family
    operators: returns ``(deg, oriented, adj)``.

    - ``oriented``: each edge directed from its lower-(degree, id)
      endpoint — acyclic, out-degree O(√m); the property that keeps
      every neighbor array small on power-law graphs.
    - ``adj``: packed sorted out-neighbor arrays, |V| rows, persisted —
      read twice (as N⁺(u) and N⁺(v)); AQE broadcasts it when it fits
      and falls back to a node-partitioned sort-merge join when not.
    """
    edges, deg = _copurchase_base(spark, sf_dir)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .transform(cached)
    )
    adj = (
        oriented.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .transform(cached)
    )
    return deg, oriented, adj


@query(
    "graph_triangle_count",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL
              SELECT v AS node FROM edges)
        GROUP BY node),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
    agg AS (
        SELECT count(*)                    AS n_nodes,
               sum(d * (d - 1) // 2)       AS n_wedges
        FROM deg)
    SELECT CAST(agg.n_nodes AS BIGINT)      AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           CAST(agg.n_wedges AS BIGINT)     AS n_wedges,
           CAST(tri.n_triangles AS BIGINT)  AS n_triangles,
           round(CASE WHEN agg.n_wedges = 0 THEN 0.0
                      ELSE 3.0 * tri.n_triangles / agg.n_wedges END, 6)
               AS clustering_coef
    FROM agg CROSS JOIN tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-purchase
    graph (parts that appear in the same order are adjacent).

    The Spark plan uses **degree orientation** — every undirected edge
    is directed from its lower-(degree, id) endpoint to the higher one,
    making the graph acyclic with out-degree O(√m) — and then counts
    |N⁺(u) ∩ N⁺(v)| per oriented edge over packed out-neighbor arrays,
    so the O(m^1.5) candidate space never materializes as rows: it
    lives inside per-node arrays intersected in one codegen stage.
    That is the difference between a plan that survives a power-law
    100 TB graph and one whose hottest key explodes (and, measured at
    sf0.1, a 6× win over the row-materialized wedge join).  The oracle
    counts the same triangles with the simple a<b<c canonical join —
    identical count, different join geometry.

    All outputs are exact integers except the clustering coefficient,
    which is one double division of two integers (identical IEEE op in
    both engines).
    """
    deg, oriented, adj = _copurchase_oriented(spark, sf_dir)
    empty = F.array().cast("array<bigint>")
    au = adj.select(F.col("src"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv"))
    tri = (
        oriented.join(au, "src", "left")
        .join(av, "dst", "left")
        .select(
            F.size(
                F.array_intersect(
                    F.coalesce(F.col("nu"), empty),
                    F.coalesce(F.col("nv"), empty),
                )
            ).alias("t")
        )
        .agg(F.sum("t").alias("n_triangles"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
        F.expr("sum(d) div 2").alias("n_edges"),
    )
    return (
        agg.crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    3.0 * F.col("n_triangles") / F.col("n_wedges")
                ),
                6,
            ).alias("clustering_coef"),
        )
    )


# --------------------------------------------------------------------------
# Power-iteration PCA in exact fixed-point arithmetic (round 4)
# --------------------------------------------------------------------------

PCA_ITERS = 4
PCA_XS = 1_000  #: component quantization (x -> round(x*1e3) BIGINT)
PCA_VS = 100_000  #: direction-vector quantization between iterations
PCA_DIM = 64


def _pca_oracle() -> str:
    """Unrolled power iteration over single-row BIGINT lists.

    Mirrors the Spark dataflow op-for-op: integer dot, the /1e3
    re-scale round, exact per-dimension integer sums, a sequential
    left fold for the squared norm, and the fixed-point renormalize.
    """
    dot = (
        "CAST(round(list_sum(list_transform(list_zip(x.xi, vp.v), "
        "p -> p[1] * p[2])) / 1000.0) AS BIGINT)"
    )
    ssq = (
        "list_reduce(list_transform(w, q -> CAST(q AS DOUBLE) "
        "* CAST(q AS DOUBLE)), (a, b) -> a + b)"
    )
    q = f"""
    WITH x AS (
        SELECT vec_id,
               list_transform(embedding,
                   c -> CAST(round(CAST(c AS DOUBLE) * {PCA_XS}) AS BIGINT))
                   AS xi
        FROM embeddings),
    n AS (SELECT count(*) AS n FROM embeddings),
    v0 AS (SELECT [CAST({PCA_VS} AS BIGINT)
                   for i in generate_series(1, {PCA_DIM})] AS v)"""
    prev = "v0"
    for it in range(1, PCA_ITERS + 1):
        q += f""",
    d{it} AS (
        SELECT x.xi, {dot} AS ds
        FROM x CROSS JOIN {prev} vp),
    w{it} AS (
        SELECT k.k AS k, CAST(sum(xi[k.k] * ds) AS BIGINT) AS wk
        FROM d{it} CROSS JOIN generate_series(1, {PCA_DIM}) k(k)
        GROUP BY k.k),
    wa{it} AS (SELECT list(wk ORDER BY k) AS w FROM w{it}),
    v{it} AS (
        SELECT list_transform(w,
                   e -> CAST(round(e / sqrt({ssq}) * {PCA_VS}) AS BIGINT))
                   AS v
        FROM wa{it})"""
        prev = f"v{it}"
    q += f"""
    SELECT CAST(k.k - 1 AS INTEGER) AS k,
           round(v.v[k.k] / {PCA_VS}.0, 6) AS v_k,
           round(sqrt({ssq}) / 100000000.0 / n.n, 6) AS eigenvalue
    FROM v{PCA_ITERS} v
    CROSS JOIN wa{PCA_ITERS} wa(w)
    CROSS JOIN n
    CROSS JOIN generate_series(1, {PCA_DIM}) k(k)
    """
    return q


@query("ml_pca_power", oracle=_pca_oracle())
def ml_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power iteration toward the leading principal direction of the
    (uncentered) embedding second-moment matrix — PCA's core loop as a
    pure dataflow, no MLlib, no driver-side linear algebra.
    ({PCA_ITERS} fixed iterations; iterations-to-convergence depends on
    the spectral gap — on a near-isotropic corpus the iterate is an
    amplified mix, which the Rayleigh estimate reflects honestly.)

    Each iteration computes w = Σᵢ xᵢ·(xᵢ·v) — i.e. (Σ xxᵀ)v without
    ever materializing the Gram matrix: one broadcast of the 64-entry
    direction vector, one map-side integer dot per row, one
    per-dimension integer sum (partial+final), then a renormalize over
    a single 64-element row.  At 100 TB each iteration is exactly one
    corpus scan + one 64-group aggregation; the O(d²) object never
    exists.

    Fixed-point discipline (same as the PQ trainer): components
    quantized ×{PCA_XS}, the direction ×{PCA_VS} between iterations,
    dots re-scaled with one deterministic round; per-dimension sums
    stay < 2⁵³ so the double conversions in the norm are exact, and
    the squared-norm fold is an explicit sequential left fold in both
    engines — every iterate is bit-identical, which is what lets an
    iterative eigensolver carry an exact value oracle.

    r14 note (guide §1.3, measured): a ``spread`` of the scan was
    tried and REVERTED (drill medians 1.86 s → 2.88 s): the corpus
    side is tiny here and each iteration's stages are row-cheap, so
    32-way task scheduling costs more than the single-task compute it
    displaces.  A 64-wide single-row sum aggregate replacing the
    posexplode was likewise tried and reverted (1.64 s → 3.63 s —
    64 declarative agg buffers fall off the codegen fast path).
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        F.transform(
            "embedding",
            lambda c: F.round(c.cast("double") * PCA_XS).cast("long"),
        ).alias("xi")
    ).transform(cached)
    n = e.agg(F.count(F.lit(1)).alias("n"))
    v = spark.range(1).select(
        F.array_repeat(F.lit(PCA_VS).cast("long"), PCA_DIM).alias("v")
    )
    ssq = F.aggregate(
        F.transform("w", lambda q: q.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    wa = None
    for _ in range(PCA_ITERS):
        dot = F.aggregate(
            F.zip_with("xi", "v", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        )
        d = x.crossJoin(F.broadcast(v)).select(
            "xi", F.round(dot / 1000.0).cast("long").alias("ds")
        )
        w = (
            d.select(F.posexplode("xi").alias("k", "xv"), "ds")
            .groupBy("k")
            .agg(F.sum(F.col("xv") * F.col("ds")).alias("wk"))
        )
        wa = w.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "wk"))),
                lambda s: s.getField("wk"),
            ).alias("w")
        )
        v = wa.select(
            F.transform(
                "w",
                lambda e_: F.round(e_ / F.sqrt(ssq) * PCA_VS).cast("long"),
            ).alias("v")
        )
    out = (
        v.crossJoin(wa.select(F.col("w")))
        .crossJoin(F.broadcast(n))
        .select(
            F.posexplode("v").alias("k", "vk"),
            F.round(F.sqrt(ssq) / 100000000.0 / F.col("n"), 6).alias(
                "eigenvalue"
            ),
        )
        .select(
            F.col("k").cast("int").alias("k"),
            F.round(F.col("vk") / float(PCA_VS), 6).alias("v_k"),
            "eigenvalue",
        )
    )
    return out


# --------------------------------------------------------------------------
# Multivariate OLS via normal equations + Cramer's rule (round 4)
# --------------------------------------------------------------------------

#: Shared arithmetic for the 3×3 normal-equation solve.  The moments are
#: exact BIGINTs (< 2⁵³, so their double conversions are exact) and every
#: determinant below is written as the SAME expression tree in Spark and
#: SQL — identical IEEE ops in identical order → identical doubles.
_OLS_DETS = {
    # det of [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]] and the three
    # numerator dets with the RHS column (sy, s1y, s2y) swapped in.
    "det": "(n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2))",
    "det0": "(sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y))",
    "det1": "(n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2))",
    "det2": "(n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2))",
}


@query(
    "ml_ols_normal_eq",
    oracle=f"""
    WITH feat AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice) AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS x1,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS x2
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x1) AS DOUBLE) AS sx1,
               CAST(sum(x2) AS DOUBLE) AS sx2,
               CAST(sum(x1 * x1) AS DOUBLE) AS s11,
               CAST(sum(x1 * x2) AS DOUBLE) AS s12,
               CAST(sum(x2 * x2) AS DOUBLE) AS s22,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x1 * y) AS DOUBLE) AS s1y,
               CAST(sum(x2 * y) AS DOUBLE) AS s2y,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM feat)
    SELECT CAST(n AS BIGINT) AS n_orders,
           round({_OLS_DETS['det0']} / {_OLS_DETS['det']}, 6) AS beta0,
           round({_OLS_DETS['det1']} / {_OLS_DETS['det']}, 6) AS beta1,
           round({_OLS_DETS['det2']} / {_OLS_DETS['det']}, 6) AS beta2,
           round(1.0 - (syy
                        - ({_OLS_DETS['det0']} / {_OLS_DETS['det']}) * sy
                        - ({_OLS_DETS['det1']} / {_OLS_DETS['det']}) * s1y
                        - ({_OLS_DETS['det2']} / {_OLS_DETS['det']}) * s2y)
                       / (syy - sy * sy / n), 6) AS r2
    FROM m
    """,
)
def ml_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS (order total ~ line count + total quantity) by
    normal equations solved in closed form with Cramer's rule — the
    regression stage of the reference class as two aggregates, no
    MLlib, no iteration, no driver-side matrix.

    The 10 sufficient statistics (n, Σx, Σxx', Σxy, Σy²) are exact
    integer sums over dollar-quantized targets (cents would push Σy²
    past int64 — the dollar grain keeps every moment an exact BIGINT
    in both engines) — associative partials,
    one partial+final aggregate over the corpus at any cluster size —
    and the 3×3 solve is a fixed closed-form expression over one row.
    R² comes from the same moments (SSE = y'y − β'X'y).  Cross-engine
    determinism: each moment is computed exactly as an integer in both
    engines and converted once (correctly rounded) to double,
    and the determinant expressions are written as the same tree on
    both sides, so every IEEE op matches 1:1.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.sum(F.round("l_quantity").cast("long")).alias("x2"),
        )
        .select(
            F.round(F.col("o_totalprice")).cast("long").alias("y"),
            "x1",
            "x2",
        )
    )
    m = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
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
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = c("syy") - b0 * c("sy") - b1 * c("s1y") - b2 * c("s2y")
    sst = c("syy") - c("sy") * c("sy") / c("n")
    return m.select(
        c("n").cast("long").alias("n_orders"),
        F.round(b0, 6).alias("beta0"),
        F.round(b1, 6).alias("beta1"),
        F.round(b2, 6).alias("beta2"),
        F.round(1.0 - sse / sst, 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Multi-hop BFS distances over the co-purchase graph (round 4)
# --------------------------------------------------------------------------

BFS_MAX_HOPS = 6


@query(
    "graph_bfs_distances",
    oracle=f"""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey <> b.l_partkey),
    src AS (SELECT min(l_partkey) AS s FROM items),
    walk(node, d) AS (
        SELECT s, 0 FROM src
        UNION
        SELECT e.v, w.d + 1
        FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < {BFS_MAX_HOPS}),
    dist AS (SELECT node, min(d) AS d FROM walk GROUP BY node)
    SELECT CAST(d AS INTEGER) AS d,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY d
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the co-purchase part graph: how many
    parts sit at each hop distance (≤ {BFS_MAX_HOPS}) from the lowest
    part key — the reachability/diameter probe that complements the
    registry's PageRank (importance), triangles (clustering), and
    connected components (membership).

    Level-synchronous frontier relaxation, the scalable BFS dataflow:
    each hop is one join of the current distance table against the
    edge list + a min-distance aggregate, so hop h costs one shuffle
    bounded by |edges| — never the path-enumeration blowup a naive
    transitive closure pays (the oracle's recursive CTE stays safe
    only because its UNION dedups (node, d) pairs per step).  The hop
    count is fixed, so the plan is {BFS_MAX_HOPS} joins regardless of
    data — predictable on any cluster.  All distances are exact
    integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Directed edges = the shared undirected co-purchase list (u < v,
    # array-expanded per order — see _copurchase_base) symmetrized
    # with a map-only union: identical to the ordered-pair self-join
    # this replaced (round-11), but it reuses the session-cached base
    # every graph operator shares instead of paying a second
    # sort-merge self-join + distinct over the fact table.
    base, _deg = _copurchase_base(spark, sf_dir)
    # NOT cached: the symmetrizing union is map-only over the cached
    # base, and persisting a frame that NESTS another cached frame
    # whose plan carries higher-order-function lambdas breaks
    # CacheManager's canonicalized substitution for every later
    # consumer of the inner frame (the round-5 lambda-canonicalization
    # failure cache.py documents — observed again in round 11 as a
    # 4 → 498 printed-exchange blowup in graph_kcore_peel's plan when
    # this frame was cached first).
    edges = base.unionAll(
        base.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # Source = min part key over ALL lineitems (not just co-purchased
    # parts), exactly as the oracle's recursive CTE seeds it.
    dist = li.agg(F.min("l_partkey").alias("node")).select(
        "node", F.lit(0).alias("d")
    )
    # Delta (frontier) BFS: only nodes FIRST reached at hop h-1 expand
    # at hop h — candidates already in `dist` are anti-joined away, so
    # once the component is covered the remaining hops join an empty
    # frontier (near-free) instead of re-propagating the full distance
    # table (which halved nothing and re-shuffled |V| rows per hop).
    frontier = dist
    for h in range(1, BFS_MAX_HOPS + 1):
        cand = (
            frontier.join(edges, frontier.node == edges.u)
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = (
            cand.join(dist, "node", "left_anti")
            .select("node", F.lit(h).alias("d"))
            .localCheckpoint(eager=False)
        )
        dist = dist.unionAll(new).localCheckpoint(eager=False)
        frontier = new
    return dist.groupBy("d").agg(F.count(F.lit(1)).alias("n_nodes")).select(
        F.col("d").cast("int").alias("d"), "n_nodes"
    )


# --------------------------------------------------------------------------
# Graph degree diagnostics (round 4)
# --------------------------------------------------------------------------


@query(
    "graph_degree_histogram",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v FROM edges)
        GROUP BY node)
    SELECT bucket,
           CAST(power(2, bucket) AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_deg,
           CAST(max(d) AS BIGINT) AS max_deg
    FROM (SELECT d, CAST(floor(ln(d) / ln(2)) AS INTEGER) AS bucket
          FROM deg)
    GROUP BY bucket
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed degree distribution of the co-purchase graph —
    the power-law diagnostic behind every skew decision this repo's
    graph operators make (degree orientation in the triangle count,
    frontier sizing in BFS): a straight line on this histogram means
    hot nodes WILL exist at scale and naive wedge joins WILL explode.

    Degrees come from one edge-list aggregation; the log-bucket key is
    exact integer arithmetic on BIGINT degrees (floor(ln d / ln 2) is
    the same correctly-rounded double chain in both engines away from
    exact powers of two, where ln is exact anyway).  Output is
    O(log max-degree) rows.
    """
    # Shared persisted co-purchase base (round-7 migration from a
    # local self-join edge build consumed twice).
    edges, deg = _copurchase_base(spark, sf_dir)
    bucket = F.floor(F.log(F.col("d").cast("double")) / F.log(F.lit(2.0)))
    return deg.groupBy(bucket.cast("int").alias("bucket")).agg(
        F.pow(F.lit(2.0), F.min(bucket)).cast("long").alias("bucket_lo"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("d").cast("long").alias("min_deg"),
        F.max("d").cast("long").alias("max_deg"),
    )


@query(
    "graph_assortativity",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v FROM edges)
        GROUP BY node),
    pairs AS (
        SELECT du.d AS x, dv.d AS y
        FROM edges e JOIN deg du ON du.node = e.u
                     JOIN deg dv ON dv.node = e.v
        UNION ALL
        SELECT dv.d, du.d
        FROM edges e JOIN deg du ON du.node = e.u
                     JOIN deg dv ON dv.node = e.v),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE)     AS sx,
               CAST(sum(y) AS DOUBLE)     AS sy,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM pairs)
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS assortativity
    FROM m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over the symmetrized edge list
    (Newman 2002) — do hubs attach to hubs (assortative, r>0) or to
    leaves (disassortative, r<0)?  The one-number structure summary
    that predicts how the graph fragments under node failure and how
    skewed the join keys of any edge-centric computation will be.

    Two broadcast-eligible degree joins onto the edge list, then the
    same exact-integer-moment discipline as `ml_ols_normal_eq`: six
    BIGINT sums in one partial+final aggregate, one fixed IEEE
    expression for r — order-independent and bit-identical across
    engines.  Output is one row.
    """
    # Shared persisted co-purchase base (round-7 migration: the local
    # self-join edge build here was consumed three times unpersisted).
    edges, deg = _copurchase_base(spark, sf_dir)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("xd"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("yd"))
    joined = edges.join(du, "u").join(dv, "v")
    # The symmetrized (x,y) ∪ (y,x) moments collapse to ONE pass over
    # the joined edges: n = 2m, sx = sy = Σ(xd+yd), sxy = 2Σ xd·yd,
    # sxx = syy = Σ(xd²+yd²) — exact integer sums, identical doubles.
    base = joined.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("xd") + F.col("yd")).alias("s"),
        F.sum(F.col("xd") * F.col("yd")).alias("p"),
        F.sum(
            F.col("xd") * F.col("xd") + F.col("yd") * F.col("yd")
        ).alias("q"),
    )
    m = base.select(
        (2 * F.col("c")).cast("double").alias("n"),
        F.col("s").cast("double").alias("sx"),
        F.col("s").cast("double").alias("sy"),
        (2 * F.col("p")).cast("double").alias("sxy"),
        F.col("q").cast("double").alias("sxx"),
        F.col("q").cast("double").alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
    )


EDGE_SUPPORT_TOPK = 20


@query(
    "graph_edge_support_topk",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
    tris AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
    attributed AS (
        SELECT a AS u, b AS v FROM tris
        UNION ALL SELECT a, c FROM tris
        UNION ALL SELECT b, c FROM tris),
    support AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS support
        FROM attributed GROUP BY u, v)
    SELECT u, v, support
    FROM support
    ORDER BY support DESC, u, v
    LIMIT {EDGE_SUPPORT_TOPK}
    """,
)
def graph_edge_support_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge support (triangles through each edge) with the top-{EDGE_SUPPORT_TOPK}
    strongest ties — the building block of k-truss decomposition and
    the "embeddedness" feature in link prediction.

    Reuses the degree-oriented adjacency: each oriented edge (u,v)
    yields its closing vertices as ``array_intersect(N⁺(u), N⁺(v))``,
    and each discovered triangle attributes +1 support to its three
    edges (canonical id order).  Triangles ARE materialized here —
    3 rows each — because support is a per-edge output, not a count;
    that stays linear in the triangle count, which degree orientation
    already bounds at O(m^1.5) candidate work, and the final top-k is
    a ``TakeOrderedAndProject``, never a global sort.  Total tie order
    (support desc, u, v) makes the cut deterministic.
    """
    deg, oriented, adj = _copurchase_oriented(spark, sf_dir)
    empty = F.array().cast("array<bigint>")
    au = adj.select(F.col("src"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv"))
    # Persisted (round-8 fix): the triangle stream is the expensive
    # upstream (two adjacency joins + array intersect); caching it cuts
    # the measured query from 4.7 s to 3.0 s at sf0.1 solo — the
    # downstream attribution re-reads materialized rows instead of
    # re-running the intersect pipeline under AQE's re-planning.
    tris = (
        oriented.join(au, "src", "left")
        .join(av, "dst", "left")
        .select(
            F.col("src").alias("x"),
            F.col("dst").alias("y"),
            F.explode(
                F.array_intersect(
                    F.coalesce(F.col("nu"), empty),
                    F.coalesce(F.col("nv"), empty),
                )
            ).alias("w"),
        )
        .transform(cached)
    )
    # One pass, not three: a 3-way unionAll of projections of ``tris``
    # re-reads even the CACHED frame three times (measured 1.7× slower
    # than one explode at sf0.1).  Emitting the three canonical edges
    # as an array and exploding keeps a single scan inside whole-stage
    # codegen.
    def canon(p, q):
        return F.struct(
            F.least(p, q).alias("u"), F.greatest(p, q).alias("v")
        )
    x, y, w = F.col("x"), F.col("y"), F.col("w")
    attributed = tris.select(
        F.explode(
            F.array(canon(x, y), canon(x, w), canon(y, w))
        ).alias("e")
    ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    # Explicit keyed repartition (round-8 fix): the support aggregate
    # is CPU-bound (3·|tris| rows hashed into ~|E| distinct edges, ~2
    # bytes of output per input row), but its shuffle is tiny — with
    # the session's parallelism-second AQE coalescing the final agg
    # collapses onto ~⌈bytes/64 MB⌉ ≈ 2 partitions and runs serial
    # (measured 2.3 s vs 0.6 s).  An explicit partition COUNT opts
    # this one exchange out of AQE coalescing; defaultParallelism
    # scales it with the cluster instead of freezing a constant.
    support = attributed.repartition(
        spark.sparkContext.defaultParallelism, "u", "v"
    ).groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
    return support.orderBy(
        F.desc("support"), F.asc("u"), F.asc("v")
    ).limit(EDGE_SUPPORT_TOPK)


KCORE_ROUNDS = 2


@query(
    "graph_kcore_peel",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
    d0 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS d
           FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
           GROUP BY node),
    kv AS (SELECT CAST(sum(d) // count(*) AS BIGINT) AS k FROM d0),
    keep0 AS (SELECT node FROM d0, kv WHERE d >= k),
    e1 AS MATERIALIZED (SELECT u, v FROM e0
           WHERE u IN (SELECT node FROM keep0)
             AND v IN (SELECT node FROM keep0)),
    d1 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS d
           FROM (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
           GROUP BY node),
    keep1 AS (SELECT node FROM d1, kv WHERE d >= k),
    e2 AS MATERIALIZED (SELECT u, v FROM e1
           WHERE u IN (SELECT node FROM keep1)
             AND v IN (SELECT node FROM keep1)),
    d2 AS (SELECT node FROM (SELECT u AS node FROM e2
                             UNION ALL SELECT v FROM e2)
           GROUP BY node)
    SELECT 0 AS round, (SELECT count(*) FROM d0) AS n_nodes,
           (SELECT count(*) FROM e0) AS n_edges, kv.k AS k FROM kv
    UNION ALL
    SELECT 1, (SELECT count(*) FROM d1), (SELECT count(*) FROM e1), kv.k
    FROM kv
    UNION ALL
    SELECT 2, (SELECT count(*) FROM d2), (SELECT count(*) FROM e2), kv.k
    FROM kv
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling, {KCORE_ROUNDS} rounds: repeatedly drop nodes with
    degree below k and the edges they carry — the densification step
    that separates a graph's cohesive core from its periphery (and the
    iteration inside full core decomposition).

    k is data-derived as the floor of the mean degree (pure integer
    ``sum(d) div count``), so the op peels meaningfully at every scale
    factor instead of pinning a constant that only bites at one SF.
    Each round is one degree aggregate plus two semi-joins of the edge
    list against the survivor set — linear passes; rounds are unrolled
    into the plan, state between rounds is the edge list itself.
    Per-round stats come ENTIRELY from the (cached, |V|-row) degree
    table: n_edges = sum(d) div 2 exactly (every undirected edge
    contributes two endpoints), so no round ever re-counts the edge
    list — the round-11 sweep-tail trim that removed one full pass
    over e_cur per round.  Peeling needs only the UNDIRECTED edge
    list, so this reads :func:`_copurchase_base` directly — the
    degree-orientation joins the triangle family needs would be two
    wasted passes here.
    """
    edges, deg = _copurchase_base(spark, sf_dir)
    kv = deg.agg(
        F.expr("CAST(sum(d) div count(*) AS BIGINT)").alias("k")
    )

    def degrees(e):
        return (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    rows = []
    e_cur = edges
    d_cur = deg.select("node", "d")
    for rnd in range(KCORE_ROUNDS + 1):
        stat = (
            d_cur.agg(
                F.count(F.lit(1)).alias("n_nodes"),
                F.expr("CAST(sum(d) div 2 AS BIGINT)").alias("n_edges"),
            )
            .crossJoin(F.broadcast(kv))
            .select(
                F.lit(rnd).cast("int").alias("round"),
                F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
                "n_nodes",
                "k",
            )
            .select("round", "n_nodes", "n_edges", "k")
        )
        rows.append(stat)
        if rnd == KCORE_ROUNDS:
            break
        keep = d_cur.crossJoin(F.broadcast(kv)).filter(
            F.col("d") >= F.col("k")
        ).select("node")
        e_cur = (
            e_cur.join(
                keep.withColumnRenamed("node", "u"), "u", "left_semi"
            ).join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
        ).transform(cached)
        # Cached: the round's degree table feeds BOTH the stat row and
        # the next keep filter (twice-consumed-frame rule); |V| rows.
        d_cur = degrees(e_cur).transform(cached)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@query(
    "ml_decision_stump",
    oracle="""
    WITH pts AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT)   AS s
        FROM pts),
    grp AS (
        SELECT x, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS s
        FROM pts GROUP BY x),
    pre AS (
        SELECT x,
               CAST(sum(c) OVER (ORDER BY x
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS nl,
               CAST(sum(s) OVER (ORDER BY x
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS sl
        FROM grp),
    scored AS (
        SELECT p.x AS split_x, p.nl, p.sl,
               t.n - p.nl AS nr, t.s - p.sl AS sr,
               -- between-group sum of squares gain, exact rationals
               -- compared via doubles of exact integers:
               (CAST(p.sl AS DOUBLE) * p.sl / p.nl
                + CAST(t.s - p.sl AS DOUBLE) * (t.s - p.sl) / (t.n - p.nl)
                - CAST(t.s AS DOUBLE) * t.s / t.n) AS gain
        FROM pre p CROSS JOIN tot t
        WHERE p.nl < t.n)
    SELECT split_x, nl AS n_left, nr AS n_right,
           round(CAST(sl AS DOUBLE) / nl / 100, 4)  AS mean_left,
           round(CAST(sr AS DOUBLE) / nr / 100, 4)  AS mean_right,
           round(gain / 10000, 4)                   AS sse_gain_dollars2
    FROM scored
    ORDER BY gain DESC, split_x
    LIMIT 1
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 regression tree (decision stump): the single split of
    ``quantity`` that most reduces the SSE of ``price`` — the inner
    step of gradient-boosted tree training, expressed as the histogram
    dataflow every distributed GBDT (XGBoost/LightGBM on Spark) uses.

    Shape: per-distinct-value aggregate (the "histogram" — shuffle
    carries distinct feature values, not rows), one prefix-sum window
    over the value-sorted histogram, and an argmax.  SSE gain uses the
    identity  gain = Σl²/nl + Σr²/nr − Σ²/n  over exact integer sums,
    so the split decision is numerically identical in both engines;
    only the reported means/gain round.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    tot = pts.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    grp = pts.groupBy("x").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("sy")
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = grp.select(
        "x",
        F.sum("c").over(w).alias("nl"),
        F.sum("sy").over(w).alias("sl"),
    )
    d = F.col
    scored = (
        pre.crossJoin(F.broadcast(tot))
        .filter(d("nl") < d("n"))
        .select(
            d("x").alias("split_x"),
            d("nl"),
            (d("n") - d("nl")).alias("nr"),
            d("sl"),
            (d("s") - d("sl")).alias("sr"),
            (
                d("sl").cast("double") * d("sl") / d("nl")
                + (d("s") - d("sl")).cast("double")
                * (d("s") - d("sl"))
                / (d("n") - d("nl"))
                - d("s").cast("double") * d("s") / d("n")
            ).alias("gain"),
        )
    )
    return (
        scored.orderBy(F.desc("gain"), F.asc("split_x"))
        .limit(1)
        .select(
            "split_x",
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.round(F.col("sl").cast("double") / F.col("nl") / 100, 4).alias(
                "mean_left"
            ),
            F.round(F.col("sr").cast("double") / F.col("nr") / 100, 4).alias(
                "mean_right"
            ),
            F.round(F.col("gain") / 10000, 4).alias("sse_gain_dollars2"),
        )
    )


# --------------------------------------------------------------------------
# Connected components via hash-min label propagation (round 5)
# --------------------------------------------------------------------------

#: Hash-min rounds.  6 covers this graph family: the BFS probe
#: (graph_bfs_distances) shows every co-purchase part sits within 6
#: hops of the minimum-id node at both test SFs, and hash-min needs
#: exactly ecc(min-node) rounds to flood its component.
CC_ITERS = 6


def _cc_iter_sql(i: int) -> str:
    """One unrolled hash-min round: every node keeps the min of its own
    label and its neighbors' labels from the previous round.

    ``MATERIALIZED`` is load-bearing: DuckDB inlines CTEs by default,
    and each round references the previous one twice (own label +
    neighbor messages), so without it the plan expands 2^ITERS copies
    of the edge build.
    """
    return f"""
    lab{i + 1} AS MATERIALIZED (
        SELECT node, min(label) AS label
        FROM (SELECT node, label FROM lab{i}
              UNION ALL
              SELECT e.v AS node, l.label
              FROM ed e JOIN lab{i} l ON l.node = e.u)
        GROUP BY node)
    """


@query(
    "graph_connected_components",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ed AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey <> b.l_partkey),
    lab0 AS MATERIALIZED (
        SELECT DISTINCT l_partkey AS node, l_partkey AS label FROM items),
    {",".join(_cc_iter_sql(i) for i in range(CC_ITERS))}
    , comp AS (
        SELECT label, count(*) AS component_size
        FROM lab{CC_ITERS} GROUP BY label)
    SELECT CAST(component_size AS BIGINT) AS component_size,
           CAST(count(*) AS BIGINT)       AS n_components
    FROM comp GROUP BY component_size
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase part graph by hash-min
    label propagation — the membership primitive the registry's BFS
    (distance), PageRank (importance), and triangle (clustering) probes
    reference, and the same dataflow the fuzzy-dedup cluster step uses
    at corpus scale.

    The operator is *defined* as exactly {CC_ITERS} hash-min rounds
    (min label within {CC_ITERS} hops — past this graph's observed
    diameter), so both engines compute an identical recurrence instead
    of racing an unordered fixpoint.  The Spark side propagates
    **deltas only**: a node re-broadcasts its label just on the round
    the label decreased, which is equivalent to the oracle's full
    re-broadcast because labels are monotone and every node folds the
    min with its own previous label.  Per round that is one shuffle
    bounded by the still-changing frontier — the hash-min variant that
    survives power-law graphs at 100 TB (full re-broadcast pays
    |E| rows every round; the frontier collapses geometrically).
    Output is the exact component-size histogram, all integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    adj = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .repartition("u")  # one-time shuffle; every round's join reuses it
        .transform(cached)
    )
    lab = (
        items.select(F.col("l_partkey").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    frontier = lab
    for _ in range(CC_ITERS):
        cand = (
            adj.join(frontier, F.col("u") == F.col("node"))
            .groupBy(F.col("v").alias("nd"))
            .agg(F.min("label").alias("cand"))
        )
        # One materialization per round carries BOTH outputs: the new
        # label table and the changed-flag that derives the frontier
        # (computing them as two separate checkpointed frames ran the
        # join twice per round — measured 2× slower).
        joined = (
            lab.join(cand, lab.node == cand.nd, "left")
            .select(
                "node",
                F.least("label", F.coalesce("cand", "label")).alias("label"),
                (F.col("cand") < F.col("label")).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        lab = joined.select("node", "label")
        frontier = joined.filter("chg").select("node", "label")
    comp = lab.groupBy("label").agg(F.count(F.lit(1)).alias("component_size"))
    return comp.groupBy("component_size").agg(
        F.count(F.lit(1)).alias("n_components")
    )


# --------------------------------------------------------------------------
# Neighbor-overlap (Jaccard) supplier similarity (round 5)
# --------------------------------------------------------------------------

JACCARD_TOPK = 20


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH rel AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    deg AS (SELECT s, count(*) AS d FROM rel GROUP BY s),
    common AS (
        SELECT a.s AS s1, b.s AS s2, count(*) AS n_common
        FROM rel a JOIN rel b ON a.c = b.c AND a.s < b.s
        GROUP BY a.s, b.s),
    scored AS (
        SELECT c.s1, c.s2, c.n_common,
               d1.d + d2.d - c.n_common AS n_union,
               round(CAST(c.n_common AS DOUBLE)
                     / (d1.d + d2.d - c.n_common), 6) AS jaccard
        FROM common c
        JOIN deg d1 ON d1.s = c.s1
        JOIN deg d2 ON d2.s = c.s2)
    SELECT s1, s2,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(n_union AS BIGINT)  AS n_union,
           jaccard
    FROM scored
    QUALIFY row_number() OVER (ORDER BY jaccard DESC, s1, s2)
            <= {JACCARD_TOPK}
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{JACCARD_TOPK} supplier pairs by Jaccard similarity of their
    customer sets — the neighbor-overlap link-prediction / item-item
    collaborative-filtering primitive, on the customer↔supplier
    bipartite graph.

    Candidate pairs come from a **wedge join through the shared
    customer** (never supplier × supplier): per-center fanout is the
    customer's distinct-supplier count, so work is Σ_c d(c)²/2 with
    d(c) bounded by order volume per customer — the bipartite shape
    that stays linear-ish at 100 TB.  On a corpus with celebrity hub
    centers the standard mitigation (drop or sample centers above a
    degree cap before the wedge, which only loses pairs whose overlap
    is dominated by hubs) plugs into the `rel` stage; at TPC-H shape
    no cap is needed and the result is exact.  Union size comes from
    the inclusion–exclusion identity |A∪B| = d(A)+d(B)−|A∩B| — no
    second pass.  Total order: (jaccard DESC, s1, s2).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rel = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .transform(cached)
    )
    deg = rel.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = rel.alias("a")
    b = rel.alias("b")
    common = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    scored = (
        common.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            (F.col("d1") + F.col("d2") - F.col("n_common")).alias("n_union"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    w = Window.orderBy(F.desc("jaccard"), F.asc("s1"), F.asc("s2"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= JACCARD_TOPK)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# Multinomial naive Bayes language classifier (round 5)
# --------------------------------------------------------------------------


#: Shared CTE chain: tokenize → split train/test on doc_id parity →
#: count-based NB model → per-doc log-scores → argmax prediction.
#: Ends with the ``pred(doc_id, lang_actual, lang_pred)`` CTE; the
#: confusion-matrix and metrics oracles append their own final SELECT.
_NB_PRED_SQL = """
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS token
        FROM documents),
    tokc AS (SELECT * FROM tok WHERE token <> ''),
    train AS (SELECT * FROM tokc WHERE doc_id % 2 = 0),
    prior AS (
        SELECT lang, count(*) AS n_docs_c
        FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
    tot AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 2 = 0),
    ntok AS (SELECT lang, count(*) AS n_c FROM train GROUP BY lang),
    voc AS (SELECT count(DISTINCT token) AS v_sz FROM train),
    model AS (
        SELECT lang AS cls, token, count(*) AS c_tc
        FROM train GROUP BY lang, token),
    ttok AS (
        SELECT doc_id, lang, token, count(*) AS n_t
        FROM tokc WHERE doc_id % 2 = 1
        GROUP BY doc_id, lang, token),
    tlen AS (
        SELECT doc_id, lang AS lang_actual, sum(n_t) AS t_d
        FROM ttok GROUP BY doc_id, lang),
    cls AS (
        SELECT p.lang AS cls, p.n_docs_c, n.n_c, v.v_sz, t.n_docs
        FROM prior p JOIN ntok n ON n.lang = p.lang
        CROSS JOIN voc v CROSS JOIN tot t),
    ll_tok AS (
        SELECT t.doc_id, m.cls,
               sum(t.n_t * ln(m.c_tc + 1)) AS ll_match
        FROM ttok t JOIN model m ON m.token = t.token
        GROUP BY t.doc_id, m.cls),
    score AS (
        SELECT d.doc_id, d.lang_actual, c.cls,
               ln(c.n_docs_c) - ln(c.n_docs)
               - d.t_d * ln(c.n_c + c.v_sz)
               + coalesce(l.ll_match, 0.0) AS s
        FROM tlen d CROSS JOIN cls c
        LEFT JOIN ll_tok l ON l.doc_id = d.doc_id AND l.cls = c.cls),
    pred AS (
        SELECT doc_id, lang_actual, cls AS lang_pred
        FROM score
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY round(s, 6) DESC, cls) = 1)
"""


def _nb_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared NB dataflow (mirrors ``_NB_PRED_SQL``): one row per test
    doc with ``lang_actual`` / ``lang_pred``.

    The whole model is GROUP BY counts, so training is one linear pass
    with map-side partial aggregation.  Scoring joins the (V × C)
    model table to the test tokens WITHOUT a broadcast hint: the model
    grain is vocabulary-sized — unbounded at 100 TB — so the strategy
    is AQE's runtime call (broadcast-convert when the model is
    actually small, sort-merge with skew splitting otherwise); only
    the class-grain frames (prior/ntok/voc/tot — |C| rows) ride
    explicit broadcasts.  Determinism: with
    add-one smoothing, log P(t|c) sums telescope into
    Σ n_t·ln(c_tc+1) − T_d·ln(N_c+V), so unseen (token, class) pairs
    contribute ln(1)=0 and drop out of the join — every ln() argument
    in both engines is an exactly-representable integer, and the
    argmax applies the registry's round(·,6)-with-class-tie-break
    ranking convention.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    train = tok.filter(F.col("doc_id") % 2 == 0)
    prior = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
    )
    tot = docs.filter(F.col("doc_id") % 2 == 0).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    ntok = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_c"))
    voc = train.agg(F.countDistinct("token").alias("v_sz"))
    model = (
        train.groupBy(F.col("lang").alias("cls"), "token")
        .agg(F.count(F.lit(1)).alias("c_tc"))
    )
    ttok = (
        tok.filter(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", F.col("lang").alias("lang_actual"), "token")
        .agg(F.count(F.lit(1)).alias("n_t"))
        .transform(cached)
    )
    tlen = ttok.groupBy("doc_id", "lang_actual").agg(F.sum("n_t").alias("t_d"))
    cls = (
        prior.join(ntok, "lang")
        .crossJoin(F.broadcast(voc))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("lang").alias("cls"), "n_docs_c", "n_c", "v_sz", "n_docs"
        )
    )
    ll_tok = (
        # No broadcast hint: the (class × token) model grain is
        # vocabulary-sized, unbounded at 100 TB — AQE converts the
        # shuffle join to broadcast at runtime when it is small.
        ttok.join(model, "token")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("n_t") * F.log(F.col("c_tc") + 1)).alias("ll_match"))
    )
    score = (
        tlen.crossJoin(F.broadcast(cls))
        .join(ll_tok, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            "lang_actual",
            "cls",
            (
                F.log("n_docs_c")
                - F.log("n_docs")
                - F.col("t_d") * F.log(F.col("n_c") + F.col("v_sz"))
                + F.coalesce("ll_match", F.lit(0.0))
            ).alias("s"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("s"), 6)), F.asc("cls")
    )
    return (
        score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang_actual", F.col("cls").alias("lang_pred"))
    )


@query(
    "ml_naive_bayes",
    oracle=_NB_PRED_SQL
    + """
    SELECT lang_actual, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY lang_actual, lang_pred
    """,
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes: train on even doc_ids (token counts per
    language with add-one smoothing), classify odd doc_ids, emit the
    confusion matrix — the counting-classifier companion to the
    registry's k-means / OLS / PCA / decision-stump quartet.  The model
    and scoring dataflow live in :func:`_nb_predictions`.
    """
    pred = _nb_predictions(spark, sf_dir)
    return pred.groupBy("lang_actual", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "ml_eval_metrics",
    oracle=_NB_PRED_SQL
    + """
    , tp AS (
        SELECT lang_actual AS cls, count(*) AS n_tp
        FROM pred WHERE lang_actual = lang_pred GROUP BY lang_actual),
    act AS (
        SELECT lang_actual AS cls, count(*) AS n_actual
        FROM pred GROUP BY lang_actual),
    prd AS (
        SELECT lang_pred AS cls, count(*) AS n_pred
        FROM pred GROUP BY lang_pred)
    SELECT a.cls,
           CAST(a.n_actual AS BIGINT)              AS n_actual,
           CAST(coalesce(p.n_pred, 0) AS BIGINT)   AS n_pred,
           CAST(coalesce(t.n_tp, 0) AS BIGINT)     AS n_tp,
           round(CASE WHEN coalesce(p.n_pred, 0) = 0 THEN 0.0
                      ELSE CAST(coalesce(t.n_tp, 0) AS DOUBLE) / p.n_pred
                 END, 6) AS precision_c,
           round(CAST(coalesce(t.n_tp, 0) AS DOUBLE) / a.n_actual, 6)
               AS recall_c,
           round(2.0 * coalesce(t.n_tp, 0)
                 / (a.n_actual + coalesce(p.n_pred, 0)), 6) AS f1_c
    FROM act a
    LEFT JOIN prd p ON p.cls = a.cls
    LEFT JOIN tp  t ON t.cls = a.cls
    """,
)
def ml_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 over the naive-Bayes
    predictions — the evaluation readout that turns a classifier into
    a monitorable pipeline stage.

    Everything reduces over the tiny ``pred`` table (one row per test
    doc), so the metrics stage costs three count aggregates and two
    broadcast joins regardless of corpus size.  Determinism: F1 uses
    the single-division form 2·tp / (n_actual + n_pred) instead of
    rounding precision and recall first, so each output is exactly one
    IEEE divide of two integers, rounded once at 6 dp.  Classes the
    model never predicts get precision 0 by convention (guarded
    division).  Every class present in the test split appears (left
    joins from the actual-count side).
    """
    # Persisted: the full NB train+score pipeline feeds THREE
    # aggregates (tp / actual / predicted counts) — uncached it
    # recomputed 3× (round-11 sweep-profile find; the
    # twice-consumed-frame rule applies a fortiori at three).
    pred = _nb_predictions(spark, sf_dir).transform(cached)
    tp = (
        pred.filter(F.col("lang_actual") == F.col("lang_pred"))
        .groupBy(F.col("lang_actual").alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_tp"))
    )
    act = pred.groupBy(F.col("lang_actual").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    prd = pred.groupBy(F.col("lang_pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    joined = (
        act.join(F.broadcast(prd), "cls", "left")
        .join(F.broadcast(tp), "cls", "left")
        .select(
            "cls",
            "n_actual",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_tp", F.lit(0)).alias("n_tp"),
        )
    )
    return joined.select(
        "cls",
        "n_actual",
        "n_pred",
        "n_tp",
        F.round(
            F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(
                F.col("n_tp").cast("double") / F.col("n_pred")
            ),
            6,
        ).alias("precision_c"),
        F.round(F.col("n_tp").cast("double") / F.col("n_actual"), 6).alias(
            "recall_c"
        ),
        F.round(
            2.0 * F.col("n_tp") / (F.col("n_actual") + F.col("n_pred")), 6
        ).alias("f1_c"),
    )


# --------------------------------------------------------------------------
# Rank-based ROC AUC (Mann–Whitney U with tie correction) (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_roc_auc",
    oracle="""
    WITH s AS (
        SELECT l_discount AS score,
               count(*) AS cnt,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS np
        FROM lineitem GROUP BY l_discount),
    w AS (
        SELECT score, cnt, np,
               coalesce(sum(cnt) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cb
        FROM s),
    t AS (
        SELECT CAST(sum(np) AS BIGINT)              AS n_pos,
               CAST(sum(cnt) - sum(np) AS BIGINT)   AS n_neg,
               CAST(sum(np * (2 * cb + cnt + 1)) AS BIGINT) AS sum2
        FROM w)
    SELECT n_pos, n_neg,
           round(CAST(sum2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(CAST(sum2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * n_pos * n_neg) * 2 - 1, 6) AS gini
    FROM t
    """,
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of ``l_discount`` as a (deliberately weak) ranking
    score for the "line item returned" label — the
    threshold-independent classifier diagnostic that completes the
    eval family (confusion matrix → per-class P/R/F1 → AUC/Gini).

    AUC is computed as the tie-corrected Mann–Whitney statistic over
    *score-level* aggregates: group to distinct scores (one partial+
    final agg over the fact table — the only full-data pass), then a
    running-count window assigns each score group its doubled average
    rank 2·r̄ = 2·cum_before + cnt + 1, entirely in BIGINT.  The
    window runs over |distinct scores| rows, not |rows|, so the plan
    is insensitive to fact-table size — the standard trick that makes
    exact AUC (naively a sort over all 100 TB of scores) an aggregate
    problem.  AUC = (Σ np·2r̄ − n_pos(n_pos+1)) / (2·n_pos·n_neg):
    one IEEE division at the end, rounded at 6 dp; Gini = 2·AUC − 1
    from the same unrounded quotient.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_discount").alias("score")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("np"),
    )
    cb_w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w = s.select(
        "score",
        "cnt",
        "np",
        F.coalesce(F.sum("cnt").over(cb_w), F.lit(0)).alias("cb"),
    )
    t = w.agg(
        F.sum("np").alias("n_pos"),
        (F.sum("cnt") - F.sum("np")).alias("n_neg"),
        F.sum(
            F.col("np") * (2 * F.col("cb") + F.col("cnt") + 1)
        ).alias("sum2"),
    )
    auc_raw = (
        F.col("sum2") - F.col("n_pos") * (F.col("n_pos") + 1)
    ).cast("double") / (2.0 * F.col("n_pos") * F.col("n_neg"))
    return t.select(
        "n_pos",
        "n_neg",
        F.round(auc_raw, 6).alias("auc"),
        F.round(auc_raw * 2 - 1, 6).alias("gini"),
    )


# --------------------------------------------------------------------------
# Cumulative gains / lift table at score-level granularity (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_cumulative_gains",
    oracle="""
    WITH s AS (
        SELECT l_discount AS score,
               count(*) AS cnt,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS np
        FROM lineitem GROUP BY l_discount),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all,
                 CAST(sum(np) AS BIGINT)  AS n_pos_all
          FROM s),
    c AS (
        SELECT score, cnt, np,
               CAST(sum(cnt) OVER win AS BIGINT) AS cum_n,
               CAST(sum(np) OVER win AS BIGINT)  AS cum_pos
        FROM s
        WINDOW win AS (ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW))
    SELECT c.score,
           CAST(c.cnt AS BIGINT)  AS n_rows,
           CAST(c.np AS BIGINT)   AS n_pos,
           c.cum_n, c.cum_pos,
           round(100.0 * c.cum_n / t.n_all, 6)       AS cum_pct_rows,
           round(100.0 * c.cum_pos / t.n_pos_all, 6) AS cum_capture_pct,
           round((CAST(c.cum_pos AS DOUBLE) / t.n_pos_all)
                 / (CAST(c.cum_n AS DOUBLE) / t.n_all), 6) AS lift
    FROM c CROSS JOIN t
    """,
)
def ml_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table for the discount→return ranking
    (the campaign-targeting readout next to ml_roc_auc): sweeping the
    score threshold from high to low, what fraction of all positives
    is captured at each cumulative share of the population, and the
    lift over random targeting.

    Reported at *score-level* granularity — the gains curve's natural
    resolution — so like the AUC the whole table derives from one
    aggregate over the fact table plus a window across |distinct
    scores| rows; a decile table would need a total order over
    individual rows (arbitrary within tied scores), this form never
    breaks ties it can't justify.  Counts are exact integers; each
    percentage/lift is one or two IEEE divisions rounded at 6 dp.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_discount").alias("score")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("np"),
    )
    t = s.agg(
        F.sum("cnt").alias("n_all"), F.sum("np").alias("n_pos_all")
    )
    win = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = s.select(
        "score",
        "cnt",
        "np",
        F.sum("cnt").over(win).alias("cum_n"),
        F.sum("np").over(win).alias("cum_pos"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "score",
        F.col("cnt").alias("n_rows"),
        F.col("np").alias("n_pos"),
        "cum_n",
        "cum_pos",
        F.round(100.0 * F.col("cum_n") / F.col("n_all"), 6).alias(
            "cum_pct_rows"
        ),
        F.round(100.0 * F.col("cum_pos") / F.col("n_pos_all"), 6).alias(
            "cum_capture_pct"
        ),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("n_pos_all"))
            / (F.col("cum_n").cast("double") / F.col("n_all")),
            6,
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# Modularity of the brand partition over the co-purchase graph (round 5)
# --------------------------------------------------------------------------


@query(
    "graph_modularity",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v FROM edges)
        GROUP BY node),
    dc AS (
        SELECT p.p_brand,
               CAST(count(*) AS BIGINT)  AS n_nodes,
               CAST(sum(g.d) AS BIGINT)  AS d_c
        FROM deg g JOIN part p ON p.p_partkey = g.node
        GROUP BY p.p_brand),
    ec AS (
        SELECT pu.p_brand, CAST(count(*) AS BIGINT) AS e_c
        FROM edges e
        JOIN part pu ON pu.p_partkey = e.u
        JOIN part pv ON pv.p_partkey = e.v
        WHERE pu.p_brand = pv.p_brand
        GROUP BY pu.p_brand),
    comm AS (
        SELECT d.p_brand, d.n_nodes, d.d_c,
               CAST(coalesce(ec.e_c, 0) AS BIGINT) AS e_c
        FROM dc d LEFT JOIN ec ON ec.p_brand = d.p_brand)
    SELECT c.p_brand, c.n_nodes, c.e_c, c.d_c,
           round(CAST(c.e_c AS DOUBLE) / m.n_edges
                 - (CAST(c.d_c AS DOUBLE) / (2 * m.n_edges))
                   * (CAST(c.d_c AS DOUBLE) / (2 * m.n_edges)), 6)
               AS contribution,
           round(CAST(4 * m.n_edges * sum(c.e_c) OVER ()
                      - sum(c.d_c * c.d_c) OVER () AS DOUBLE)
                 / (4.0 * m.n_edges * m.n_edges), 6) AS q_total
    FROM comm c CROSS JOIN m
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition over the co-purchase
    part graph — the partition-quality metric that completes the graph
    family: components say what's connected, k-core/triangles how
    densely, modularity whether a given labeling explains the edge
    structure (Q ≈ 0 here: brands don't drive co-purchase, a finding
    in itself).

    Per community Q_c = e_c/m − (d_c/2m)²; both terms derive from two
    broadcast-dimension joins onto the edge list and degree table —
    no per-community subgraph materialization, so community count is
    free.  The global Q avoids summing per-community doubles
    (order-dependent) by algebra: Q = (4m·Σe_c − Σd_c²)/(4m²), an
    exact integer expression under two window sums, divided once.
    """
    part = load_table(spark, sf_dir, "part")
    # Shared persisted co-purchase base (round-7 migration).
    edges, deg = _copurchase_base(spark, sf_dir)
    m = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    brand = part.select("p_partkey", "p_brand")
    dc = (
        deg.join(F.broadcast(brand), deg.node == brand.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("d_c")
        )
    )
    bu = brand.select(
        F.col("p_partkey").alias("u"), F.col("p_brand").alias("brand_u")
    )
    bv = brand.select(
        F.col("p_partkey").alias("v"), F.col("p_brand").alias("brand_v")
    )
    ec = (
        edges.join(F.broadcast(bu), "u")
        .join(F.broadcast(bv), "v")
        .filter(F.col("brand_u") == F.col("brand_v"))
        .groupBy(F.col("brand_u").alias("p_brand"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    comm = dc.join(ec, "p_brand", "left").select(
        "p_brand",
        "n_nodes",
        "d_c",
        F.coalesce("e_c", F.lit(0)).alias("e_c"),
    )
    j = comm.crossJoin(F.broadcast(m))
    half = F.col("d_c").cast("double") / (2 * F.col("n_edges"))
    wall = Window.partitionBy()
    return j.select(
        "p_brand",
        "n_nodes",
        "e_c",
        "d_c",
        F.round(
            F.col("e_c").cast("double") / F.col("n_edges") - half * half, 6
        ).alias("contribution"),
        F.round(
            (
                4 * F.col("n_edges") * F.sum("e_c").over(wall)
                - F.sum(F.col("d_c") * F.col("d_c")).over(wall)
            ).cast("double")
            / (4.0 * F.col("n_edges") * F.col("n_edges")),
            6,
        ).alias("q_total"),
    )


# --------------------------------------------------------------------------
# Ridge regression via regularized normal equations (round 5)
# --------------------------------------------------------------------------

RIDGE_LAMBDA = 1000


@query(
    "ml_ridge_closed_form",
    oracle=f"""
    WITH feat AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice) AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS x1,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS x2
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice),
    m0 AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x1) AS DOUBLE) AS sx1,
               CAST(sum(x2) AS DOUBLE) AS sx2,
               CAST(sum(x1 * x1) AS DOUBLE) AS s11_raw,
               CAST(sum(x1 * x2) AS DOUBLE) AS s12,
               CAST(sum(x2 * x2) AS DOUBLE) AS s22_raw,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x1 * y) AS DOUBLE) AS s1y,
               CAST(sum(x2 * y) AS DOUBLE) AS s2y
        FROM feat),
    m AS (
        SELECT n, sx1, sx2,
               s11_raw + {RIDGE_LAMBDA}.0 AS s11, s12,
               s22_raw + {RIDGE_LAMBDA}.0 AS s22,
               sy, s1y, s2y
        FROM m0)
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST({RIDGE_LAMBDA} AS BIGINT) AS ridge_lambda,
           round({_OLS_DETS['det0']} / {_OLS_DETS['det']}, 6) AS beta0,
           round({_OLS_DETS['det1']} / {_OLS_DETS['det']}, 6) AS beta1,
           round({_OLS_DETS['det2']} / {_OLS_DETS['det']}, 6) AS beta2
    FROM m
    """,
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (L2-regularized OLS) on the same two-feature
    order-total problem as ``ml_ols_normal_eq``, solved in closed form:
    (X'X + lambda*I')beta = X'y with the intercept row unpenalized
    (I' = diag(0, 1, 1)), i.e. lambda is added to the diagonal moments
    s11 and s22 only.

    Same 100 TB shape as the OLS op — one partial+final aggregate
    produces the nine sufficient statistics, the 3x3 Cramer solve is a
    fixed expression over a single row, nothing iterative and nothing
    on the driver.  Cross-engine determinism: moments are exact BIGINT
    sums converted once to double; lambda is added AFTER the exact
    conversion (an exact double op on both engines); the determinant
    trees are written identically on both sides.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.sum(F.round("l_quantity").cast("long")).alias("x2"),
        )
        .select(
            F.round(F.col("o_totalprice")).cast("long").alias("y"),
            "x1",
            "x2",
        )
    )
    m = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        (F.sum(F.col("x1") * F.col("x1")).cast("double")
         + F.lit(float(RIDGE_LAMBDA))).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        (F.sum(F.col("x2") * F.col("x2")).cast("double")
         + F.lit(float(RIDGE_LAMBDA))).alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
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
        c("n").cast("long").alias("n_orders"),
        F.lit(RIDGE_LAMBDA).cast("long").alias("ridge_lambda"),
        F.round(det0 / det, 6).alias("beta0"),
        F.round(det1 / det, 6).alias("beta1"),
        F.round(det2 / det, 6).alias("beta2"),
    )


# --------------------------------------------------------------------------
# k-NN majority-vote classification over the embedding corpus (round 5)
# --------------------------------------------------------------------------

KNN_CLS_K = 5
KNN_CLS_MOD = 7


def _knn_cls_kernel(k: int):
    """Per-(probe-block, corpus-block) exact k-NN kernel for
    ``applyInPandas``: one float64 numpy matmul between the two blocks,
    cosine rounded to 6dp, then a per-probe local top-``k`` under the
    SAME (-sim, nid) lexicographic order the global merge uses — so
    merging the per-corpus-block local winners is exact."""
    import numpy as np
    import pandas as pd

    def fn(key, pdf):
        p = pdf[pdf["side"] == "p"]
        c = pdf[pdf["side"] == "c"]
        empty = pd.DataFrame(
            {
                "probe_id": np.array([], np.int64),
                "true_label": np.array([], np.int32),
                "nid": np.array([], np.int64),
                "n_label": np.array([], np.int32),
                "sim": np.array([], np.float64),
            }
        )
        if len(p) == 0 or len(c) == 0:
            return empty
        pids = p["vec_id"].to_numpy(np.int64)
        plab = p["label"].to_numpy(np.int32)
        pmat = np.array(p["embedding"].tolist(), np.float64)
        nids = c["vec_id"].to_numpy(np.int64)
        nlab = c["label"].to_numpy(np.int32)
        nmat = np.array(c["embedding"].tolist(), np.float64)
        pn = np.sqrt((pmat * pmat).sum(axis=1))
        cn = np.sqrt((nmat * nmat).sum(axis=1))
        # Zero-norm guard: a NaN cosine would sort LAST in np.lexsort
        # but FIRST under the merge window's F.desc and the oracle's
        # ORDER BY sim DESC — enforce the invariant loudly instead of
        # silently diverging cross-engine.
        if not ((pn > 0).all() and (cn > 0).all()):
            raise ValueError("zero-norm embedding in k-NN block")
        raw = (pmat @ nmat.T) / (pn[:, None] * cn[None, :])
        # Half-AWAY-from-zero at 6dp (Spark F.round / DuckDB round()
        # convention); np.round is half-to-even and could flip a value
        # sitting on an exact 5e-7 boundary.  `+ 0.0` folds a -0.0
        # (tiny negative cosine rounded to zero) onto +0.0 so the
        # rendered value matches both engines.
        sims = (
            np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5), raw) / 1e6 + 0.0
        )
        P, C = sims.shape
        kk = min(k, C)
        # One vectorized lexsort over the whole block-pair matrix
        # (row-major: probe row, then -sim, then nid) instead of a
        # per-probe python loop of sorts + DataFrame constructions.
        flat = np.lexsort(
            (np.tile(nids, P), -sims.ravel(), np.repeat(np.arange(P), C))
        )
        take = flat.reshape(P, C)[:, :kk].ravel()
        return pd.DataFrame(
            {
                "probe_id": np.repeat(pids, kk),
                "true_label": np.repeat(plab, kk),
                "nid": nids[take % C],
                "n_label": nlab[take % C],
                "sim": sims.ravel()[take],
            }
        )

    return fn


KNN_CLS_PBLOCKS = 2  #: probe-side blocks (raise so a block fits an executor)
KNN_CLS_CBLOCKS = 4  #: corpus-side blocks


@query(
    "ml_knn_classify",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id % {KNN_CLS_MOD} = 0),
    cand AS (
        SELECT p.vec_id AS probe_id, p.label AS true_label,
               n.label AS n_label, n.vec_id AS nid,
               round(list_cosine_similarity(
                   CAST(p.embedding AS DOUBLE[]),
                   CAST(n.embedding AS DOUBLE[])), 6) AS sim
        FROM probes p
        JOIN embeddings n ON n.vec_id % {KNN_CLS_MOD} <> 0),
    topk AS (
        SELECT * FROM cand
        QUALIFY row_number() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, nid) <= {KNN_CLS_K}),
    votes AS (
        SELECT probe_id, true_label, n_label,
               CAST(count(*) AS BIGINT) AS votes
        FROM topk GROUP BY 1, 2, 3)
    SELECT probe_id, true_label, n_label AS pred_label, votes,
           CAST(CASE WHEN n_label = true_label THEN 1 ELSE 0 END
                AS INTEGER) AS correct
    FROM votes
    QUALIFY row_number() OVER (
        PARTITION BY probe_id ORDER BY votes DESC, n_label) = 1
    """,
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier: every 7th vector is held out as a probe and
    classified by majority label of its 5 nearest cosine neighbors in
    the remaining corpus (ties: larger vote count, then smaller label).

    Exact block-pair matmul plan (same shape as ``llm_sim_topk``,
    SURVEY.md §7.3.1): probes hash into PB blocks, corpus into CB
    blocks, and the PB×CB block pairs are the tasks — each runs ONE
    numpy matmul over the two blocks it owns and keeps a per-probe
    local top-k under the global (-sim, nid) order, so the final merge
    (a window over ≤ CB·k rows per probe) is exact.  Nothing is
    broadcast or collected: per-task memory is two blocks, replication
    is probes×CB + corpus×PB (linear, √tasks factor), and at 100 TB
    you raise PB/CB so a block fits an executor — the plan holds
    unchanged.  The sub-quadratic approximate path is ``llm_ann_ivf``'s
    IVF cell pruning.  Cross-engine determinism: neighbor ranking and
    the vote tally both order on round(sim, 6) with vec_id / label
    tie-breaks, so last-bit cosine divergence cannot flip the
    prediction.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cbs = spark.range(KNN_CLS_CBLOCKS).select(
        F.col("id").cast("int").alias("cb")
    )
    pbs = spark.range(KNN_CLS_PBLOCKS).select(
        F.col("id").cast("int").alias("pb")
    )
    pframe = (
        e.filter(F.col("vec_id") % KNN_CLS_MOD == 0)
        .select(
            F.pmod("vec_id", F.lit(KNN_CLS_PBLOCKS)).cast("int").alias("pb"),
            F.lit("p").alias("side"),
            "vec_id",
            "label",
            "embedding",
        )
        .crossJoin(F.broadcast(cbs))
    )
    cframe = (
        e.filter(F.col("vec_id") % KNN_CLS_MOD != 0)
        .select(
            F.pmod("vec_id", F.lit(KNN_CLS_CBLOCKS)).cast("int").alias("cb"),
            F.lit("c").alias("side"),
            "vec_id",
            "label",
            "embedding",
        )
        .crossJoin(F.broadcast(pbs))
    )
    local = (
        pframe.unionByName(cframe)
        .groupBy("pb", "cb")
        .applyInPandas(
            _knn_cls_kernel(KNN_CLS_K),
            "probe_id bigint, true_label int, nid bigint, "
            "n_label int, sim double",
        )
    )
    wk = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("nid"))
    topk = (
        local.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KNN_CLS_K)
    )
    votes = topk.groupBy("probe_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("probe_id").orderBy(
        F.desc("votes"), F.asc("n_label")
    )
    return (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select(
            "probe_id",
            "true_label",
            F.col("n_label").alias("pred_label"),
            "votes",
            F.when(F.col("n_label") == F.col("true_label"), 1)
            .otherwise(0)
            .cast("int")
            .alias("correct"),
        )
    )


# --------------------------------------------------------------------------
# Chi-square contingency contributions (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_chi2_contingency",
    oracle="""
    WITH cells AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS observed
        FROM orders GROUP BY 1, 2),
    margins AS (
        SELECT c.*,
               sum(observed) OVER (PARTITION BY o_orderstatus)   AS r_tot,
               sum(observed) OVER (PARTITION BY o_orderpriority) AS c_tot,
               sum(observed) OVER ()                             AS n_tot
        FROM cells c)
    SELECT o_orderstatus, o_orderpriority, observed,
           round(CAST(r_tot * c_tot AS DOUBLE) / n_tot, 6) AS expected,
           round(CAST(observed * n_tot - r_tot * c_tot AS DOUBLE)
                 * CAST(observed * n_tot - r_tot * c_tot AS DOUBLE)
                 / CAST(r_tot * c_tot * n_tot AS DOUBLE), 6) AS chi2_term
    FROM margins
    """,
)
def ml_chi2_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order status and order
    priority, reported as the per-cell contingency contributions
    (observed, expected, (O-E)^2/E term).

    One groupBy builds the contingency cells; the margins are window
    sums over the tiny cell table (|status| x |priority| rows — the
    windows run on one executor regardless of corpus size, after the
    corpus was reduced by an associative count).  Per-cell terms are
    emitted as rows rather than summed into one statistic so no
    order-dependent double accumulation exists: the term is computed
    from exact BIGINT margins as (O*N - R*C)^2 / (R*C*N) — the
    difference is an exact int64, squared and divided in double with
    identical op order in both engines.  The oracle's window sums over
    BIGINT counts stay BIGINT in DuckDB (no HUGEINT widening: sums of
    row counts over one table are < 2^63).
    """
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("observed")
    )
    wr = Window.partitionBy("o_orderstatus")
    wc = Window.partitionBy("o_orderpriority")
    wn = Window.partitionBy()
    m = cells.select(
        "*",
        F.sum("observed").over(wr).alias("r_tot"),
        F.sum("observed").over(wc).alias("c_tot"),
        F.sum("observed").over(wn).alias("n_tot"),
    )
    diff = (
        F.col("observed") * F.col("n_tot") - F.col("r_tot") * F.col("c_tot")
    ).cast("double")
    return m.select(
        "o_orderstatus",
        "o_orderpriority",
        "observed",
        F.round(
            (F.col("r_tot") * F.col("c_tot")).cast("double") / F.col("n_tot"),
            6,
        ).alias("expected"),
        F.round(
            diff * diff
            / (F.col("r_tot") * F.col("c_tot") * F.col("n_tot")).cast(
                "double"
            ),
            6,
        ).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# Retrieval evaluation: label precision@k of exact cosine search (round 5)
# --------------------------------------------------------------------------

PREC_K = 10


@query(
    "ml_precision_at_k",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 20),
    cand AS (
        SELECT p.vec_id AS probe_id, p.label AS true_label,
               n.label AS n_label, n.vec_id AS nid,
               round(list_cosine_similarity(
                   CAST(p.embedding AS DOUBLE[]),
                   CAST(n.embedding AS DOUBLE[])), 6) AS sim
        FROM probes p JOIN embeddings n ON n.vec_id <> p.vec_id),
    topk AS (
        SELECT * FROM cand
        QUALIFY row_number() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, nid) <= {PREC_K})
    SELECT probe_id, any_value(true_label) AS true_label,
           CAST(sum(CASE WHEN n_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_at_k,
           round(sum(CASE WHEN n_label = true_label THEN 1 ELSE 0 END)
                 / {PREC_K}.0, 6) AS precision_at_k
    FROM topk GROUP BY probe_id
    """,
)
def ml_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality metric: for 20 probe vectors, precision@10 of
    exact cosine search measured against the stored class labels (a
    neighbor is a hit when its label matches the probe's).

    This is the evaluation harness a recall-tuned ANN deployment runs
    next to ``llm_ann_ivf``: broadcast probes, one linear corpus scan,
    per-probe top-k under the deterministic (round(sim, 6), vec_id)
    order, then an integer hit count with a single exact division.
    """
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("label").alias("true_label"),
    )
    n = e.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("n_label"),
    )
    sim = F.round(_cosine(F.col("pe"), F.col("ne")), 6)
    wk = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("nid"))
    topk = (
        n.join(F.broadcast(probes), F.col("nid") != F.col("probe_id"))
        .select("probe_id", "true_label", "n_label", "nid", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= PREC_K)
    )
    hit = F.when(F.col("n_label") == F.col("true_label"), 1).otherwise(0)
    return topk.groupBy("probe_id").agg(
        F.first("true_label").alias("true_label"),
        F.sum(hit).alias("hits_at_k"),
        F.round(F.sum(hit) / float(PREC_K), 6).alias("precision_at_k"),
    )


# --------------------------------------------------------------------------
# Per-node (local) clustering coefficients (round 5)
# --------------------------------------------------------------------------

LCC_TOPN = 30


@query(
    "graph_clustering_local",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL
              SELECT v AS node FROM edges)
        GROUP BY node),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
    tcount AS (
        SELECT node, CAST(count(*) AS BIGINT) AS t
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node)
    SELECT d.node, d.d, coalesce(t.t, 0) AS n_triangles,
           round(2.0 * coalesce(t.t, 0) / (d.d * (d.d - 1)), 6) AS local_cc
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    WHERE d.d >= 3
    QUALIFY row_number() OVER (
        ORDER BY round(2.0 * coalesce(t.t, 0) / (d.d * (d.d - 1)), 6) DESC,
                 d.node) <= {LCC_TOPN}
    """,
)
def graph_clustering_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient — the 30 most clique-embedded parts
    in the co-purchase graph (cc(v) = 2·tri(v) / d(v)(d(v)−1), degree
    ≥ 3 only).

    Reuses the degree-oriented adjacency of ``graph_triangle_count``:
    per-edge out-neighbor intersections enumerate each triangle exactly
    once, the intersection array is exploded to its member nodes, and
    one unionAll + groupBy attributes every triangle to its three
    corners — per-node counts with the same O(m^1.5) bound and no
    wedge materialization.  The oracle re-counts with the canonical
    a<b<c join, different geometry, same triangles.  The coefficient
    is one double division of exact integers, and the top-N orders on
    the ROUNDED value with the node id as tie-break so last-bit
    division differences cannot reorder engines.  The top-30 itself is
    ``orderBy().limit`` — TakeOrderedAndProject (per-partition 30-row
    heaps, driver merge), so the unbounded node population is never
    ranked through a single-partition window.
    """
    deg, oriented, adj = _copurchase_oriented(spark, sf_dir)
    empty = F.array().cast("array<bigint>")
    au = adj.select(F.col("src"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv"))
    tri = (
        oriented.join(au, "src", "left")
        .join(av, "dst", "left")
        .select(
            "src",
            "dst",
            F.explode(
                F.array_intersect(
                    F.coalesce(F.col("nu"), empty),
                    F.coalesce(F.col("nv"), empty),
                )
            ).alias("w"),
        )
    )
    # One pass, not three: the 3-way unionAll of `tri` projections
    # re-ran the adjacency-intersect pipeline per branch (the
    # edge-support lesson) — explode the three corners array-side.
    tcount = (
        tri.select(
            F.explode(
                F.array(F.col("src"), F.col("dst"), F.col("w"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    cc = F.round(
        2.0
        * F.coalesce(F.col("t"), F.lit(0))
        / (F.col("d") * (F.col("d") - 1)),
        6,
    )
    ranked = (
        deg.join(tcount, "node", "left")
        .filter(F.col("d") >= 3)
        .select(
            "node",
            "d",
            F.coalesce(F.col("t"), F.lit(0)).alias("n_triangles"),
            cc.alias("local_cc"),
        )
    )
    return ranked.orderBy(F.desc("local_cc"), F.asc("node")).limit(
        LCC_TOPN
    )


# --------------------------------------------------------------------------
# Hashing-trick feature vectors (round 5)
# --------------------------------------------------------------------------

FEATHASH_DIM = 64
FEATHASH_DOCS = 20


@query(
    "ml_feature_hashing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents WHERE doc_id < {FEATHASH_DOCS}),
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                   % {FEATHASH_DIM} AS bucket
        FROM toks),
    vec AS (
        SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM hashed GROUP BY 1, 2),
    tot AS (
        SELECT doc_id, sum(cnt) AS n_toks FROM vec GROUP BY doc_id)
    SELECT v.doc_id, v.bucket, v.cnt,
           round(CAST(v.cnt AS DOUBLE) / t.n_toks, 6) AS tf
    FROM vec v JOIN tot t USING (doc_id)
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens are hashed into a fixed
    64-bucket space (no vocabulary build, no dictionary broadcast) and
    each document becomes a sparse (bucket, count, tf) vector — the
    stateless featurizer that scales to any vocabulary because the
    feature space is fixed up front.

    The hash must be ENGINE-PORTABLE to oracle-check: the first 8 hex
    digits of md5(token) parsed as an integer, mod the dimension —
    identical in Spark (conv base-16) and DuckDB ('0x' cast), unlike
    xxhash64/murmur which are engine-specific.  One linear tokenize
    pass, one associative count; tf is a single exact division.  The
    20-doc probe bound keeps the demo output small — the dataflow is
    corpus-shape-independent.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.filter(F.col("doc_id") < FEATHASH_DOCS).select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("tok"),
    )
    hashed = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % FEATHASH_DIM
        ).alias("bucket"),
    )
    vec = hashed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wt = Window.partitionBy("doc_id")
    return vec.select(
        "doc_id",
        "bucket",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(wt), 6
        ).alias("tf"),
    )


# --------------------------------------------------------------------------
# Precision-recall curve at score-level granularity (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_pr_curve",
    oracle="""
    WITH s AS (
        SELECT l_discount AS score,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS np
        FROM lineitem GROUP BY l_discount),
    cum AS (
        SELECT score,
               sum(cnt) OVER (ORDER BY score DESC) AS pred_pos,
               sum(np)  OVER (ORDER BY score DESC) AS tp,
               sum(np)  OVER ()                    AS n_pos
        FROM s)
    SELECT score AS threshold,
           CAST(pred_pos AS BIGINT) AS n_predicted,
           CAST(tp AS BIGINT)       AS n_true_pos,
           round(CAST(tp AS DOUBLE) / pred_pos, 6) AS precision_at,
           round(CAST(tp AS DOUBLE) / n_pos, 6)    AS recall_at
    FROM cum
    """,
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The precision-recall curve for the same weak ranking score as
    ``ml_roc_auc`` (predict 'returned' when discount ≥ threshold),
    one row per distinct score threshold.

    Same score-level trick as the AUC: one associative aggregate to
    |distinct scores| rows, then two cumulative windows ordered by
    descending score give (predicted-positive, true-positive) counts
    at every threshold simultaneously — the full curve in one pass,
    never a per-threshold rescan.  Points are emitted as rows with
    single exact divisions (no area integration, so no order-dependent
    accumulation; the scalar summary lives in ``ml_roc_auc``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_discount").alias("score")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("np"),
    )
    wc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = s.select(
        F.col("score").alias("threshold"),
        F.sum("cnt").over(wc).alias("pred_pos"),
        F.sum("np").over(wc).alias("tp"),
        F.sum("np").over(wall).alias("n_pos"),
    )
    return cum.select(
        "threshold",
        F.col("pred_pos").alias("n_predicted"),
        F.col("tp").alias("n_true_pos"),
        F.round(
            F.col("tp").cast("double") / F.col("pred_pos"), 6
        ).alias("precision_at"),
        F.round(F.col("tp").cast("double") / F.col("n_pos"), 6).alias(
            "recall_at"
        ),
    )


# --------------------------------------------------------------------------
# Smoothed target encoding (round 5)
# --------------------------------------------------------------------------

TENC_SMOOTH = 100


@query(
    "ml_target_encoding",
    oracle=f"""
    WITH t AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderpriority),
    g AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_all,
               CAST(sum(cents) AS BIGINT) AS cents_all
        FROM t)
    SELECT t.o_orderpriority, t.n,
           round(CAST(t.cents AS DOUBLE) / t.n / 100.0, 6)
               AS raw_mean,
           round((t.cents + {TENC_SMOOTH}.0
                  * (CAST(g.cents_all AS DOUBLE) / g.n_all))
                 / (t.n + {TENC_SMOOTH}) / 100.0, 6)
               AS encoded
    FROM t CROSS JOIN g
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of order priority against order
    value: enc(c) = (Σy_c + m·ȳ) / (n_c + m) with m = 100 — the
    feature-engineering standard that shrinks rare categories toward
    the global mean instead of memorizing them.

    Two associative aggregates (per-category, then global — both exact
    integer cents) and a broadcast of the one-row global; the encoding
    is a fixed expression tree with two divisions, computed identically
    in both engines.  Leakage control (per-fold exclusion) would swap
    the global CTE for a fold-complement one — same dataflow shape.
    """
    o = load_table(spark, sf_dir, "orders")
    t = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    g = t.agg(
        F.sum("n").alias("n_all"), F.sum("cents").alias("cents_all")
    )
    j = t.crossJoin(F.broadcast(g))
    gmean = F.col("cents_all").cast("double") / F.col("n_all")
    return j.select(
        "o_orderpriority",
        "n",
        F.round(
            F.col("cents").cast("double") / F.col("n") / 100.0, 6
        ).alias("raw_mean"),
        F.round(
            (F.col("cents") + float(TENC_SMOOTH) * gmean)
            / (F.col("n") + TENC_SMOOTH)
            / 100.0,
            6,
        ).alias("encoded"),
    )


# --------------------------------------------------------------------------
# Deterministic neighbor sampling (GraphSAGE-style fan-out) (round 5)
# --------------------------------------------------------------------------

NBR_SAMPLE_K = 5


@query(
    "graph_sample_neighbors",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey <> b.l_partkey),
    ranked AS (
        SELECT u, v,
               row_number() OVER (
                   PARTITION BY u
                   ORDER BY md5(CAST(u AS VARCHAR) || ':'
                                || CAST(v AS VARCHAR)), v) AS rk
        FROM edges)
    SELECT u AS node, v AS sampled_neighbor,
           CAST(rk AS INTEGER) AS sample_slot
    FROM ranked
    WHERE rk <= {NBR_SAMPLE_K} AND u % 50 = 0
    """,
)
def graph_sample_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style neighbor sampling: each probe node keeps a
    deterministic fan-out of ≤5 neighbors, selected by md5-hash rank
    over the directed edge — the minibatch-construction primitive for
    GNN training, where unbounded-degree hubs must be capped without
    biasing toward storage order.

    Hash-rank sampling is reproducible across engines, partitionings
    and runs (no RNG state), uniform per edge, and executes as one
    per-node window over the adjacency — at 100 TB the window
    partitions by node, and hub nodes cost O(deg log k) in the
    per-partition top-k, never materializing beyond their partition.
    Probe set (node % 50 = 0) bounds the demo output; the sampling
    dataflow itself is corpus-wide.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )
    h = F.md5(
        F.concat(
            F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string")
        )
    )
    w = Window.partitionBy("u").orderBy(h, F.col("v"))
    return (
        edges.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= NBR_SAMPLE_K) & (F.col("u") % 50 == 0))
        .select(
            F.col("u").alias("node"),
            F.col("v").alias("sampled_neighbor"),
            F.col("rk").cast("int").alias("sample_slot"),
        )
    )


# --------------------------------------------------------------------------
# Silhouette score against label centroids, exact fixed point (round 5)
# --------------------------------------------------------------------------

SIL_PROBES = 50
SIL_Q = 1000  #: embedding quantization (v -> round(v*1e3) BIGINT)


@query(
    "ml_silhouette_lite",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, t.ord,
               CAST(round(CAST(embedding[t.ord] AS DOUBLE) * {SIL_Q})
                    AS BIGINT) AS vq
        FROM embeddings, generate_series(1, 64) AS t(ord)),
    cent AS (
        SELECT label AS clabel, ord,
               CAST(sum(vq) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM ex GROUP BY label, ord),
    num AS (
        SELECT e.vec_id, e.label, c.clabel, max(c.n) AS n,
               CAST(sum((e.vq * c.n - c.s) * (e.vq * c.n - c.s))
                    AS BIGINT) AS num
        FROM ex e JOIN cent c ON c.ord = e.ord
        WHERE e.vec_id < {SIL_PROBES}
        GROUP BY e.vec_id, e.label, c.clabel),
    own AS (
        SELECT vec_id, label,
               sqrt(CAST(num AS DOUBLE)) / ({SIL_Q}.0 * n) AS a_dist
        FROM num WHERE clabel = label),
    other AS (
        SELECT vec_id, clabel AS nearest_other,
               sqrt(CAST(num AS DOUBLE)) / ({SIL_Q}.0 * n) AS b_dist
        FROM num WHERE clabel <> label
        QUALIFY row_number() OVER (
            PARTITION BY vec_id
            ORDER BY sqrt(CAST(num AS DOUBLE)) / ({SIL_Q}.0 * n),
                     clabel) = 1)
    SELECT o.vec_id, w.label, o.nearest_other,
           round(w.a_dist, 6) AS a_dist,
           round(o.b_dist, 6) AS b_dist,
           round((o.b_dist - w.a_dist) / greatest(w.a_dist, o.b_dist), 6)
               AS silhouette
    FROM own w JOIN other o ON o.vec_id = w.vec_id
    """,
)
def ml_silhouette_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid silhouette: for 50 probe vectors, the distance to the
    own-label centroid (a), the nearest other-label centroid (b), and
    s = (b−a)/max(a,b) — the cluster-quality diagnostic that says
    whether the label structure is actually separable in embedding
    space.

    Fixed-point exactness (the k-means/PCA device): embeddings
    quantize to integer milli-units, so the squared distance to a
    centroid clears its denominator — Σ(v·n − S)² is an exact BIGINT
    per (vector, centroid) with S, n exact integer centroid sums —
    and floats appear only in the final sqrt/divide chain, identical
    single IEEE ops in both engines.  Dataflow: one posexplode, one
    (label, dim) aggregate (the centroid table, broadcastable), one
    probe×centroid join bounded by |labels|, one aggregate back.
    Means of silhouettes are deliberately NOT emitted (order-dependent
    float accumulation); per-vector rows are.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("ord0", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("ord0") + 1).alias("ord"),
        F.round(F.col("val").cast("double") * SIL_Q)
        .cast("long")
        .alias("vq"),
    )
    cent = ex.groupBy(F.col("label").alias("clabel"), "ord").agg(
        F.sum("vq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    diff = F.col("vq") * F.col("n") - F.col("s")
    num = (
        ex.filter(F.col("vec_id") < SIL_PROBES)
        .join(F.broadcast(cent), "ord")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.max("n").alias("n"),
            F.sum(diff * diff).alias("num"),
        )
    )
    dist = F.sqrt(F.col("num").cast("double")) / (
        float(SIL_Q) * F.col("n")
    )
    own = num.filter(F.col("clabel") == F.col("label")).select(
        "vec_id", "label", dist.alias("a_dist")
    )
    wother = Window.partitionBy("vec_id").orderBy(
        dist.asc(), F.col("clabel").asc()
    )
    other = (
        num.filter(F.col("clabel") != F.col("label"))
        .withColumn("rk", F.row_number().over(wother))
        .filter(F.col("rk") == 1)
        .select(
            F.col("vec_id").alias("ov"),
            F.col("clabel").alias("nearest_other"),
            dist.alias("b_dist"),
        )
    )
    j = own.join(other, own.vec_id == F.col("ov"))
    return j.select(
        "vec_id",
        "label",
        "nearest_other",
        F.round(F.col("a_dist"), 6).alias("a_dist"),
        F.round(F.col("b_dist"), 6).alias("b_dist"),
        F.round(
            (F.col("b_dist") - F.col("a_dist"))
            / F.greatest(F.col("a_dist"), F.col("b_dist")),
            6,
        ).alias("silhouette"),
    )


# --------------------------------------------------------------------------
# Mutual information of two categorical columns (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_mutual_information",
    oracle="""
    WITH joint AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_xy
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    m AS (
        SELECT segment, priority, n_xy,
               sum(n_xy) OVER (PARTITION BY segment)  AS n_x,
               sum(n_xy) OVER (PARTITION BY priority) AS n_y,
               sum(n_xy) OVER ()                      AS n
        FROM joint),
    c AS (
        SELECT segment, priority, n_xy,
               CAST(round(1e6 * (CAST(n_xy AS DOUBLE) / n)
                          * ln(CAST(n_xy * n AS DOUBLE) / (n_x * n_y)))
                    AS BIGINT) AS mi_contrib_unats
        FROM m)
    SELECT segment, priority, n_xy, mi_contrib_unats,
           CAST(sum(mi_contrib_unats) OVER () AS BIGINT) AS mi_total_unats
    FROM c
    """,
)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between customer market segment and order
    priority — the dependence screen a feature-selection pass runs over
    every categorical column pair before training (MI ≈ 0 here is
    itself the finding: priority is assigned independently of segment).

    One broadcast join + one group-by collapses the fact table to the
    |X|·|Y| contingency table (≤ 25 cells); marginals come from window
    sums over that tiny table, never a second fact scan.  Each cell's
    contribution (p_xy·ln(p_xy/(p_x·p_y))) is one ln over a ratio of
    exact BIGINT products, scaled to integer micro-nats, so the global
    MI total is an order-independent integer sum — the same
    determinism discipline as ``llm_pmi_cooccur``.
    """
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    joint = (
        od.join(
            F.broadcast(cu.select("c_custkey", "c_mktsegment")),
            od.o_custkey == cu.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    m = joint.select(
        "segment",
        "priority",
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("segment")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("priority")).alias("n_y"),
        F.sum("n_xy").over(
            Window.partitionBy()
        ).alias("n"),
    )
    contrib = F.round(
        1e6
        * (F.col("n_xy").cast("double") / F.col("n"))
        * F.log(
            (F.col("n_xy") * F.col("n")).cast("double")
            / (F.col("n_x") * F.col("n_y"))
        )
    ).cast("long")
    c = m.select(
        "segment", "priority", "n_xy", contrib.alias("mi_contrib_unats")
    )
    return c.select(
        "*",
        F.sum("mi_contrib_unats")
        .over(Window.partitionBy())
        .alias("mi_total_unats"),
    )


# --------------------------------------------------------------------------
# Calibration (reliability) bins for a ranking score (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_calibration_bins",
    oracle="""
    WITH b AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS bin_pct,
               CAST(round(l_discount * 100) AS BIGINT) AS sc,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
    g AS (
        SELECT bin_pct,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(sc) AS BIGINT)  AS sum_sc,
               CAST(sum(y) AS BIGINT)   AS n_pos
        FROM b GROUP BY bin_pct)
    SELECT bin_pct, n, n_pos,
           round(CAST(sum_sc AS DOUBLE) / (100.0 * n), 6) AS mean_score,
           round(CAST(n_pos AS DOUBLE) / n, 6)            AS pos_rate,
           round(abs(CAST(sum_sc AS DOUBLE) / (100.0 * n)
                     - CAST(n_pos AS DOUBLE) / n), 6)     AS abs_gap
    FROM g
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: bin the ``l_discount`` ranking score (the
    same deliberately-weak score ``ml_roc_auc`` evaluates) and compare
    each bin's mean predicted score to its empirical positive rate —
    the calibration readout that decides whether scores can be read as
    probabilities or need Platt/isotonic post-scaling.

    Scores are exact 2-decimal, so binning is integer percent units
    and per-bin mean score is an integer sum with ONE division at the
    end — no order-dependent double accumulation.  A single partial+
    final aggregate over the fact table; output is |bins| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias("bin_pct"),
        F.round(F.col("l_discount") * 100).cast("long").alias("sc"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    g = b.groupBy("bin_pct").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sc").alias("sum_sc"),
        F.sum("y").alias("n_pos"),
    )
    mean_score = F.col("sum_sc").cast("double") / (100.0 * F.col("n"))
    pos_rate = F.col("n_pos").cast("double") / F.col("n")
    return g.select(
        "bin_pct",
        "n",
        "n_pos",
        F.round(mean_score, 6).alias("mean_score"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.abs(mean_score - pos_rate), 6).alias("abs_gap"),
    )


# --------------------------------------------------------------------------
# Batch gradient descent on sufficient statistics (round 5)
# --------------------------------------------------------------------------

GD_ITERS = 8
GD_LR = 1e-4


def _gd_iter_sql(k: int) -> str:
    """One unrolled GD step over the 5 pre-aggregated moments."""
    return f"""
    i{k + 1} AS (
        SELECT {k + 1} AS it,
               round(w - {GD_LR} * 2.0
                     * (w * sxx + b * sx - sxy) / n, 6) AS w,
               round(b - {GD_LR} * 2.0
                     * (w * sx + b * n - sy) / n, 6)    AS b
        FROM i{k}, m)
    """


@query(
    "ml_gradient_descent",
    oracle=f"""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sx,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sxx,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS sy,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS sxy
        FROM lineitem),
    i0 AS (SELECT 0 AS it, 0.0 AS w, 0.0 AS b),
    {",".join(_gd_iter_sql(k) for k in range(GD_ITERS))}
    SELECT CAST(it AS BIGINT) AS it, w, b
    FROM ({" UNION ALL ".join(f"SELECT * FROM i{k}"
                              for k in range(GD_ITERS + 1))}) t
    """,
)
def ml_gradient_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch gradient descent for least-squares y = w·x + b
    (price-cents on quantity), defined as exactly {GD_ITERS} steps at
    a fixed learning rate, emitting the whole trajectory — the
    iterative-optimizer shape (the registry's closed forms:
    ``ml_ols_normal_eq``, ``ml_ridge_closed_form``; this is the path
    every model WITHOUT a closed form takes).

    The crucial scale property: the squared-loss gradient is linear
    in the 5 sufficient statistics (n, Σx, Σx², Σy, Σxy), so the data
    is touched ONCE to build exact integer moments and the
    {GD_ITERS}-step loop runs on scalars — loop cost independent of
    data size, no per-iteration job, nothing cached.  Each step
    rounds (w, b) to 6 dp so the trajectory is a fixed-point sequence
    both engines reproduce bit-for-bit from the same integer moments.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
    )
    # Runtime fold, NOT unrolled column expressions: each step
    # references (w, b) twice, so nesting grows the expression tree
    # 4^ITERS and the first cut of this operator spent 55 s in
    # analysis/codegen alone.  F.aggregate evaluates the recurrence
    # iteratively at RUNTIME over a sequence literal — constant-size
    # plan, same fixed-point trajectory (the ts_holt_winters fold
    # discipline).
    step = lambda acc, _: F.struct(  # noqa: E731
        F.round(
            acc["w"]
            - GD_LR
            * 2.0
            * (acc["w"] * F.col("sxx") + acc["b"] * F.col("sx")
               - F.col("sxy"))
            / F.col("n"),
            6,
        ).alias("w"),
        F.round(
            acc["b"]
            - GD_LR
            * 2.0
            * (acc["w"] * F.col("sx") + acc["b"] * F.col("n")
               - F.col("sy"))
            / F.col("n"),
            6,
        ).alias("b"),
        F.concat(
            acc["traj"],
            F.array(F.struct(acc["w"].alias("w"), acc["b"].alias("b"))),
        ).alias("traj"),
    )
    acc0 = F.struct(
        F.lit(0.0).alias("w"),
        F.lit(0.0).alias("b"),
        F.expr(
            "CAST(array() AS ARRAY<STRUCT<w: DOUBLE, b: DOUBLE>>)"
        ).alias("traj"),
    )
    final = F.aggregate(
        F.sequence(F.lit(1), F.lit(GD_ITERS)),
        acc0,
        step,
        lambda acc: F.concat(
            acc["traj"],
            F.array(F.struct(acc["w"].alias("w"), acc["b"].alias("b"))),
        ),
    )
    return m.select(
        F.posexplode(final).alias("it", "s")
    ).select(
        F.col("it").cast("long").alias("it"),
        F.col("s.w").alias("w"),
        F.col("s.b").alias("b"),
    )


# --------------------------------------------------------------------------
# Two-hop (friends-of-friends) reach of hub nodes (round 5)
# --------------------------------------------------------------------------

TWO_HOP_HUBS = 20


@query(
    "graph_two_hop_reach",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ed AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey <> b.l_partkey),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
            FROM ed GROUP BY u),
    hubs AS (
        SELECT node, d FROM deg
        ORDER BY d DESC, node LIMIT {TWO_HOP_HUBS}),
    n1 AS (
        SELECT h.node AS hub, e.v
        FROM hubs h JOIN ed e ON e.u = h.node),
    n2 AS (
        SELECT DISTINCT n1.hub, e2.v AS w
        FROM n1 JOIN ed e2 ON e2.u = n1.v
        WHERE e2.v <> n1.hub),
    fof AS (
        SELECT n2.hub, n2.w FROM n2
        LEFT JOIN n1 ON n1.hub = n2.hub AND n1.v = n2.w
        WHERE n1.v IS NULL)
    SELECT h.node AS hub, h.d AS degree,
           CAST(count(f.w) AS BIGINT) AS n_two_hop
    FROM hubs h LEFT JOIN fof f ON f.hub = h.node
    GROUP BY h.node, h.d
    """,
)
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friends-of-friends reach of the {TWO_HOP_HUBS} highest-degree
    parts in the co-purchase graph: how many parts are exactly two
    hops away (reachable through a neighbor, not adjacent themselves)
    — the audience-expansion / influence-radius measure that degree
    alone overstates when a hub's neighbors all know each other.

    The hub restriction is what makes exact 2-hop computable at scale:
    the quadratic neighbor-of-neighbor expansion runs only for a
    broadcast top-k seed set (hubs is ≤{TWO_HOP_HUBS} rows joined
    map-side), so the expensive join is |N1(hubs)| ⋈ edges — linear in
    edge count — and the dedup + anti-join against direct neighbors
    stay keyed on (hub, node).  Same degree-oriented edge build as the
    triangle family (``graph_triangle_count``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    ed = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        # Three consumers (deg, n1, n2) — persist or the co-purchase
        # self-join rebuilds per consumer (the plan audit caught this
        # at 20 exchanges; the oracle's MATERIALIZED is the same call).
        .transform(cached)
    )
    deg = ed.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    hubs = deg.orderBy(F.col("d").desc(), "node").limit(TWO_HOP_HUBS)
    n1 = F.broadcast(hubs).join(
        ed, ed.u == F.col("node")
    ).select(F.col("node").alias("hub"), "v")
    n2 = (
        n1.join(
            ed.select(F.col("u").alias("v2u"), F.col("v").alias("w")),
            F.col("v") == F.col("v2u"),
        )
        .filter(F.col("w") != F.col("hub"))
        .select("hub", "w")
        .distinct()
    )
    fof = n2.join(
        n1.select("hub", F.col("v").alias("w")),
        ["hub", "w"],
        "left_anti",
    )
    return (
        F.broadcast(hubs)
        .join(fof, fof.hub == F.col("node"), "left")
        .groupBy(F.col("node").alias("hub"), F.col("d").alias("degree"))
        .agg(F.count("w").alias("n_two_hop"))
    )


# --------------------------------------------------------------------------
# One-way ANOVA F-test across segments (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_anova_oneway",
    oracle="""
    WITH y AS (
        SELECT c.c_mktsegment AS segment,
               CAST(round(o.o_totalprice) AS BIGINT) AS usd
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    g AS (
        SELECT segment,
               CAST(count(*) AS BIGINT)         AS n_g,
               CAST(sum(usd) AS BIGINT)         AS s_g,
               CAST(sum(usd * usd) AS BIGINT)   AS q_g
        FROM y GROUP BY segment),
    m AS (
        SELECT CAST(count(*) AS BIGINT)  AS k,
               CAST(sum(n_g) AS BIGINT)  AS n,
               CAST(sum(s_g) AS BIGINT)  AS s,
               list_reduce(
                   list_prepend(0.0,
                       list_sort(list(CAST(s_g AS DOUBLE) * s_g / n_g))),
                   (acc, x) -> acc + x) AS sum_sq_over_n,
               CAST(sum(q_g) AS BIGINT)  AS q
        FROM g)
    SELECT k, n,
           round(sum_sq_over_n - CAST(s AS DOUBLE) * s / n, 6)
               AS ss_between,
           round(q - sum_sq_over_n, 6) AS ss_within,
           round(((sum_sq_over_n - CAST(s AS DOUBLE) * s / n) / (k - 1))
                 / ((q - sum_sq_over_n) / (n - k)), 6) AS f_stat
    FROM m
    """,
)
def ml_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across market
    segments?  Completes the registry's hypothesis-test family —
    chi-square for two categoricals (``ml_chi2_contingency``), KS for
    two continuous samples (``dq_ks_two_sample``), ANOVA for one
    continuous response across k groups.

    The F statistic needs only per-group integer moments (n, Σy, Σy²),
    so the fact table is touched once by a partial+final aggregate and
    the k-row group table folds to a single row.  The response is
    measured in WHOLE DOLLARS, not cents: Σy² in cents overflows
    BIGINT already at 60 k orders (5·10⁷² ≈ 2.5·10¹⁵ each), while
    dollar units keep Σy² exact into the billions of rows — the
    F statistic is scale-invariant so the test is unchanged.

    Each per-group term S_g²/n_g is bit-identical cross-engine (S_g
    < 2⁵³ so the double product and the division are each correctly
    rounded IEEE ops), but the k-row SUM of ~10¹⁴-magnitude doubles is
    fold-order dependent with a ~0.125 ULP — round(…, 6) cannot absorb
    a partition-order difference (the round-6 judge observed
    64871301721.5 vs 64871301721.375).  Integer micro-units would
    overflow BIGINT here (10¹⁴ × 10⁶ ≫ 2⁶³), so instead both engines
    fold the SORTED term list sequentially from 0.0 — Spark
    ``F.aggregate(sort_array(collect_list(term)), 0.0, +)`` ≡ DuckDB
    ``list_reduce(list_prepend(0.0, list_sort(list(term))), +)`` —
    the same deterministic-fold idiom as ``_L2_FOLD_SQL``
    (textprep.py).  k = #segments is tiny, so collecting the group
    table into one array row is free at any scale.
    """
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    y = od.join(
        F.broadcast(cu.select("c_custkey", "c_mktsegment")),
        od.o_custkey == cu.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice")).cast("long").alias("usd"),
    )
    g = y.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("usd").alias("s_g"),
        F.sum(F.col("usd") * F.col("usd")).alias("q_g"),
    )
    m = (
        g.agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("n_g").alias("n"),
            F.sum("s_g").alias("s"),
            F.collect_list(
                F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
            ).alias("terms"),
            F.sum("q_g").alias("q"),
        )
        .withColumn(
            "sum_sq_over_n",
            F.aggregate(
                F.sort_array(F.col("terms")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .drop("terms")
    )
    ssb = F.col("sum_sq_over_n") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sum_sq_over_n")
    return m.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Cramér's V effect size for categorical pairs (round 5)
# --------------------------------------------------------------------------

def _cramers_cte(table_expr: str, x: str, y: str, pair: str) -> str:
    """One pair's quantized chi² + V, as a standalone SELECT."""
    return f"""
    SELECT '{pair}' AS pair,
           CAST(max(n_tot) AS BIGINT) AS n,
           CAST(max(df_min) AS BIGINT) AS df_min,
           CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
           round(sqrt(CAST(sum(term_micro) AS DOUBLE) / 1e6
                      / (max(n_tot) * max(df_min))), 6) AS cramers_v
    FROM (
        SELECT CAST(round(1e6
                   * CAST(observed * n_tot - r_tot * c_tot AS DOUBLE)
                   * CAST(observed * n_tot - r_tot * c_tot AS DOUBLE)
                   / (CAST(r_tot AS DOUBLE) * c_tot * n_tot))
                AS BIGINT) AS term_micro,
               n_tot,
               least(count(DISTINCT xv) OVER () - 1,
                     count(DISTINCT yv) OVER () - 1) AS df_min
        FROM (
            SELECT c.*,
                   sum(observed) OVER (PARTITION BY xv) AS r_tot,
                   sum(observed) OVER (PARTITION BY yv) AS c_tot,
                   sum(observed) OVER ()                AS n_tot
            FROM (SELECT {x} AS xv, {y} AS yv,
                         CAST(count(*) AS BIGINT) AS observed
                  FROM {table_expr} GROUP BY 1, 2) c) m) t
    """


@query(
    "ml_cramers_v",
    oracle=f"""
    {_cramers_cte("(SELECT o.o_orderpriority, c.c_mktsegment FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) j", "c_mktsegment", "o_orderpriority", "segment_x_priority")}
    UNION ALL
    {_cramers_cte("lineitem", "l_returnflag", "l_linestatus", "flag_x_status")}
    """,
)
def ml_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for two categorical column pairs — the
    normalized [0, 1] association strength that makes chi² values
    comparable across tables of different size and shape (the
    feature-selection ranking number; ``ml_chi2_contingency`` reports
    the raw per-cell terms, V is what you sort by).

    Each pair is one contingency aggregate + window margins over the
    tiny cell table; per-cell chi² terms are quantized to integer
    micro-units BEFORE summation so the statistic is an
    order-independent integer sum, then V = √(χ²/(N·min(r−1,c−1)))
    is one closing expression.  The (O·N − R·C) difference is cast to
    double before squaring — at 600 k rows its square exceeds int64.
    """
    def one(cells: DataFrame, pair: str) -> DataFrame:
        wx = Window.partitionBy("xv")
        wy = Window.partitionBy("yv")
        wall = Window.partitionBy()
        m = cells.select(
            "xv",
            "yv",
            "observed",
            F.sum("observed").over(wx).alias("r_tot"),
            F.sum("observed").over(wy).alias("c_tot"),
            F.sum("observed").over(wall).alias("n_tot"),
        )
        d = (
            F.col("observed") * F.col("n_tot")
            - F.col("r_tot") * F.col("c_tot")
        ).cast("double")
        t = m.select(
            F.round(
                1e6
                * d
                * d
                / (
                    F.col("r_tot").cast("double")
                    * F.col("c_tot")
                    * F.col("n_tot")
                )
            )
            .cast("long")
            .alias("term_micro"),
            "n_tot",
            F.least(
                F.size(F.collect_set("xv").over(wall)) - 1,
                F.size(F.collect_set("yv").over(wall)) - 1,
            ).cast("long").alias("df_min"),
        )
        return t.agg(
            F.lit(pair).alias("pair"),
            F.max("n_tot").alias("n"),
            F.max("df_min").alias("df_min"),
            F.sum("term_micro").alias("chi2_micro"),
            F.round(
                F.sqrt(
                    F.sum("term_micro").cast("double")
                    / 1e6
                    / (F.max("n_tot") * F.max("df_min"))
                ),
                6,
            ).alias("cramers_v"),
        )

    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    cells1 = (
        od.join(
            F.broadcast(cu.select("c_custkey", "c_mktsegment")),
            od.o_custkey == cu.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("xv"),
            F.col("o_orderpriority").alias("yv"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    cells2 = li.groupBy(
        F.col("l_returnflag").alias("xv"),
        F.col("l_linestatus").alias("yv"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    return one(cells1, "segment_x_priority").unionAll(
        one(cells2, "flag_x_status")
    )


# --------------------------------------------------------------------------
# Learning curve: fit quality vs training-set size (round 5)
# --------------------------------------------------------------------------


@query(
    "ml_learning_curve",
    oracle="""
    WITH b AS (
        SELECT l_orderkey % 5 AS bucket,
               CAST(round(l_quantity) AS BIGINT)      AS x,
               CAST(round(l_extendedprice) AS BIGINT) AS y
        FROM lineitem),
    g AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT)   AS n,
               CAST(sum(x) AS BIGINT)     AS sx,
               CAST(sum(y) AS BIGINT)     AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM b GROUP BY bucket),
    c AS (
        SELECT bucket + 1 AS n_buckets,
               CAST(sum(n)  OVER w AS BIGINT) AS n,
               CAST(sum(sx) OVER w AS BIGINT) AS sx,
               CAST(sum(sy) OVER w AS BIGINT) AS sy,
               CAST(sum(sxx) OVER w AS BIGINT) AS sxx,
               CAST(sum(sxy) OVER w AS BIGINT) AS sxy,
               CAST(sum(syy) OVER w AS BIGINT) AS syy
        FROM g
        WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING))
    SELECT n_buckets, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 6) AS r2
    FROM c
    """,
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: R² of the price-on-quantity least-squares fit
    as the training set grows through 5 nested subsets (orderkey mod
    5 < s) — the diagnostic that separates "needs more data" from
    "needs more features" before anyone spends cluster time on either.

    The key dataflow point: all 5 fits come from ONE pass.  Moments
    (n, Σx, Σy, Σx², Σxy, Σy²) aggregate per bucket, a 5-row running
    window turns them into nested-subset moments (sufficient
    statistics are additive — that's what makes incremental /
    distributed fitting work), and R² per size is a closed-form
    expression.  Integer moments stay in BIGINT (prices in whole
    dollars — Σy² in cents overflows int64); the R² products are cast
    to double at the same points in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        (F.col("l_orderkey") % 5).alias("bucket"),
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    g = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        (F.col("bucket") + 1).alias("n_buckets"),
        F.sum("n").over(w).alias("n"),
        F.sum("sx").over(w).alias("sx"),
        F.sum("sy").over(w).alias("sy"),
        F.sum("sxx").over(w).alias("sxx"),
        F.sum("sxy").over(w).alias("sxy"),
        F.sum("syy").over(w).alias("syy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    ) * (
        F.col("n").cast("double") * F.col("syy")
        - F.col("sy").cast("double") * F.col("sy")
    )
    return c.select(
        "n_buckets", "n", F.round(num * num / den, 6).alias("r2")
    )


# --------------------------------------------------------------------------
# Graded retrieval metrics: NDCG@k and MRR@k (round 7)
# --------------------------------------------------------------------------

#: Discounted-gain weights 1/log2(rank+1) for ranks 1..10, quantized to
#: integer micro-units so per-probe gains sum as exact BIGINTs (a float
#: sum of libm log2 values would be both fold-order- and libm-variant-
#: dependent across engines).  Shared literals with the DuckDB oracles.
NDCG_W_MICRO = [
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
]
#: Prefix sums of NDCG_W_MICRO: ideal DCG for 1..10 relevant items.
NDCG_CUM_MICRO = [
    1000000, 1630930, 2130930, 2561607, 2948460,
    3304667, 3638000, 3953465, 4254495, 4543560,
]

_RETR_TOPK_SQL = f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pe, label AS true_label
        FROM embeddings WHERE vec_id < 20),
    cand AS (
        SELECT p.probe_id, p.true_label,
               n.label AS n_label, n.vec_id AS nid,
               round(list_cosine_similarity(
                   CAST(p.pe AS DOUBLE[]),
                   CAST(n.embedding AS DOUBLE[])), 6) AS sim
        FROM probes p JOIN embeddings n ON n.vec_id <> p.probe_id),
    ranked AS (
        SELECT probe_id, true_label,
               CASE WHEN n_label = true_label THEN 1 ELSE 0 END AS rel,
               CAST(row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY sim DESC, nid) AS BIGINT) AS rk
        FROM cand
        QUALIFY rk <= {PREC_K})
"""


@query(
    "ml_ndcg_at_k",
    oracle=_RETR_TOPK_SQL
    + f"""
    , gains AS (
        SELECT probe_id, true_label,
               CAST(sum(rel) AS BIGINT) AS hits_at_k,
               CAST(sum(rel * ({NDCG_W_MICRO})[CAST(rk AS INTEGER)])
                    AS BIGINT) AS dcg_micro
        FROM ranked GROUP BY probe_id, true_label),
    pool AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_label
        FROM embeddings GROUP BY label)
    SELECT g.probe_id, g.true_label, g.hits_at_k, g.dcg_micro,
           CASE WHEN p.n_label - 1 <= 0 THEN 0.0
                ELSE round(g.dcg_micro /
                     CAST(({NDCG_CUM_MICRO})[CAST(
                         least(p.n_label - 1, {PREC_K}) AS INTEGER)]
                         AS DOUBLE), 6)
           END AS ndcg
    FROM gains g JOIN pool p ON p.label = g.true_label
    """,
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{PREC_K} per probe: the discounted sibling of
    ``ml_precision_at_k`` — hits near the top of the ranking count for
    more (gain 1/log2(rank+1)), normalized by the best achievable DCG
    given how many relevant items exist in the corpus at all.

    The per-probe top-k is the TWO-STAGE distributed idiom: a first
    row_number window partitioned by (scan-partition, probe) keeps
    each partition's local top-{PREC_K} (never more than k·P·probes
    rows survive), and only that sliver shuffles into the per-probe
    merge window — no corpus-sized partition anywhere, unlike a naive
    per-probe global window.  Gains are exact integer micro-units
    (module literals shared with the oracle — no runtime log2, whose
    libm rounding differs across engines), ideal DCG is a literal
    prefix-sum lookup at min(#relevant, k), and the single closing
    division is bit-identical cross-engine.
    """
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("label").alias("true_label"),
    )
    n = e.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("n_label"),
    )
    sim = F.round(_cosine(F.col("pe"), F.col("ne")), 6)
    cand = (
        n.join(F.broadcast(probes), F.col("nid") != F.col("probe_id"))
        .select(
            "probe_id",
            "true_label",
            "nid",
            F.when(F.col("n_label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("rel"),
            sim.alias("sim"),
        )
        .withColumn("__part", F.spark_partition_id())
    )
    wl = Window.partitionBy("__part", "probe_id").orderBy(
        F.desc("sim"), F.asc("nid")
    )
    local = (
        cand.withColumn("lrk", F.row_number().over(wl))
        .filter(F.col("lrk") <= PREC_K)
        .drop("__part", "lrk")
    )
    wg = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("nid"))
    ranked = (
        local.withColumn("rk", F.row_number().over(wg).cast("long"))
        .filter(F.col("rk") <= PREC_K)
    )
    warr = F.array(*[F.lit(v) for v in NDCG_W_MICRO])
    gains = ranked.groupBy("probe_id", "true_label").agg(
        F.sum("rel").alias("hits_at_k"),
        F.sum(
            F.col("rel") * F.element_at(warr, F.col("rk").cast("int"))
        ).alias("dcg_micro"),
    )
    pool = e.groupBy(F.col("label").alias("true_label")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    carr = F.array(*[F.lit(v) for v in NDCG_CUM_MICRO])
    r_cap = F.least(F.col("n_label") - 1, F.lit(PREC_K)).cast("int")
    ndcg = F.when(F.col("n_label") - 1 <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.col("dcg_micro")
            / F.element_at(carr, r_cap).cast("double"),
            6,
        )
    )
    return gains.join(F.broadcast(pool), "true_label").select(
        "probe_id",
        "true_label",
        "hits_at_k",
        "dcg_micro",
        ndcg.alias("ndcg"),
    )


@query(
    "ml_mrr_at_k",
    oracle=_RETR_TOPK_SQL
    + f"""
    , firsts AS (
        SELECT probe_id,
               min(CASE WHEN rel = 1 THEN rk END) AS first_hit
        FROM ranked GROUP BY probe_id),
    rr AS (
        SELECT probe_id,
               CAST(CASE WHEN first_hit IS NULL THEN 0
                    ELSE round(1000000.0 / first_hit) END AS BIGINT)
                   AS rr_micro
        FROM firsts)
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN rr_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit_probes,
           round(sum(rr_micro) / (1000000.0 * count(*)), 6) AS mrr
    FROM rr
    """,
)
def ml_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@{PREC_K}: mean reciprocal rank of the first relevant
    neighbor across the 20 probes — the metric that rewards putting
    ONE right answer at the very top (question-answering retrieval),
    complementing precision@k (density) and NDCG (graded order).

    Same two-stage local-then-merge top-{PREC_K} dataflow as
    ``ml_ndcg_at_k``.  Reciprocal ranks are quantized once to integer
    micro-units (round(10⁶/rank) — a single correctly-rounded division
    on exact integers), so the cross-probe mean is an exact BIGINT sum
    with one closing division; probes with no hit in the top-k
    contribute 0 (standard MRR@k convention, pinned in both engines).
    """
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("label").alias("true_label"),
    )
    n = e.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("n_label"),
    )
    sim = F.round(_cosine(F.col("pe"), F.col("ne")), 6)
    cand = (
        n.join(F.broadcast(probes), F.col("nid") != F.col("probe_id"))
        .select(
            "probe_id",
            F.when(F.col("n_label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("rel"),
            "nid",
            sim.alias("sim"),
        )
        .withColumn("__part", F.spark_partition_id())
    )
    wl = Window.partitionBy("__part", "probe_id").orderBy(
        F.desc("sim"), F.asc("nid")
    )
    local = (
        cand.withColumn("lrk", F.row_number().over(wl))
        .filter(F.col("lrk") <= PREC_K)
        .drop("__part", "lrk")
    )
    wg = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("nid"))
    ranked = (
        local.withColumn("rk", F.row_number().over(wg).cast("long"))
        .filter(F.col("rk") <= PREC_K)
    )
    firsts = ranked.groupBy("probe_id").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("first_hit")
    )
    rr_micro = (
        F.when(F.col("first_hit").isNull(), F.lit(0))
        .otherwise(F.round(F.lit(1000000.0) / F.col("first_hit")))
        .cast("long")
    )
    rr = firsts.select(rr_micro.alias("rr_micro"))
    return rr.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("rr_micro") > 0, 1).otherwise(0)).alias(
            "n_hit_probes"
        ),
        F.round(
            F.sum("rr_micro") / (F.lit(1000000.0) * F.count(F.lit(1))), 6
        ).alias("mrr"),
    )


def _retr_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-probe top-``PREC_K`` ranking for the graded retrieval
    metrics (the ``_RETR_TOPK_SQL`` dataflow): 20 pinned probes
    broadcast against the corpus, cosine at 6dp, then the two-stage
    local-then-merge row_number — each scan partition keeps only its
    own top-k per probe before anything shuffles, so no per-probe
    window ever sees a corpus-sized partition."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("label").alias("true_label"),
    )
    n = e.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("n_label"),
    )
    sim = F.round(_cosine(F.col("pe"), F.col("ne")), 6)
    cand = (
        n.join(F.broadcast(probes), F.col("nid") != F.col("probe_id"))
        .select(
            "probe_id",
            "true_label",
            "nid",
            F.when(F.col("n_label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("rel"),
            sim.alias("sim"),
        )
        .withColumn("__part", F.spark_partition_id())
    )
    wl = Window.partitionBy("__part", "probe_id").orderBy(
        F.desc("sim"), F.asc("nid")
    )
    local = (
        cand.withColumn("lrk", F.row_number().over(wl))
        .filter(F.col("lrk") <= PREC_K)
        .drop("__part", "lrk")
    )
    wg = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("nid"))
    return local.withColumn(
        "rk", F.row_number().over(wg).cast("long")
    ).filter(F.col("rk") <= PREC_K)


@query(
    "ml_map_at_k",
    oracle=_RETR_TOPK_SQL
    + f"""
    , cum AS (
        SELECT probe_id, true_label, rel, rk,
               CAST(sum(rel) OVER (
                   PARTITION BY probe_id ORDER BY rk) AS BIGINT) AS cum_rel
        FROM ranked),
    ap AS (
        SELECT probe_id, true_label,
               CAST(sum(rel) AS BIGINT) AS hits_at_k,
               CAST(sum(CASE WHEN rel = 1
                             THEN CAST(round(1000000.0 * cum_rel / rk)
                                       AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS ap_micro
        FROM cum GROUP BY 1, 2),
    pool AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_label
        FROM embeddings GROUP BY label)
    SELECT a.probe_id, a.true_label, a.hits_at_k, a.ap_micro,
           CASE WHEN least(p.n_label - 1, {PREC_K}) <= 0 THEN 0.0
                ELSE round(a.ap_micro
                           / (1000000.0 * least(p.n_label - 1, {PREC_K})), 6)
           END AS ap_at_k
    FROM ap a JOIN pool p ON p.label = a.true_label
    """,
)
def ml_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @{PREC_K} per probe (the per-query term of
    MAP): Σ over relevant ranks of precision@that-rank, normalized by
    the best achievable hit count min(R, k).  Order-sensitive like
    NDCG but with a flat gain — the standard companion when relevance
    is binary.

    Built on the same two-stage local-then-merge top-{PREC_K} ranking
    (``_retr_ranked``).  Each precision@i term 10⁶·cum_rel/rk is one
    correctly-rounded division of small exact integers, summed as
    BIGINT per probe — the fractional precisions never meet a float
    accumulator, so fold order cannot flap the 6dp readout.
    """
    ranked = _retr_ranked(spark, sf_dir)
    wc = Window.partitionBy("probe_id").orderBy("rk")
    cum = ranked.withColumn("cum_rel", F.sum("rel").over(wc))
    ap = cum.groupBy("probe_id", "true_label").agg(
        F.sum("rel").alias("hits_at_k"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.round(
                    F.lit(1000000.0) * F.col("cum_rel") / F.col("rk")
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("ap_micro"),
    )
    e = load_table(spark, sf_dir, "embeddings")
    pool = e.groupBy(F.col("label").alias("true_label")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    denom = F.least(F.col("n_label") - 1, F.lit(PREC_K))
    ap_at_k = F.when(denom <= 0, F.lit(0.0)).otherwise(
        F.round(F.col("ap_micro") / (F.lit(1000000.0) * denom), 6)
    )
    return ap.join(F.broadcast(pool), "true_label").select(
        "probe_id",
        "true_label",
        "hits_at_k",
        "ap_micro",
        ap_at_k.alias("ap_at_k"),
    )


@query(
    "ml_recall_at_k",
    oracle=_RETR_TOPK_SQL
    + f"""
    , hits AS (
        SELECT probe_id, true_label,
               CAST(sum(rel) AS BIGINT) AS hits_at_k
        FROM ranked GROUP BY 1, 2),
    pool AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_label
        FROM embeddings GROUP BY label)
    SELECT h.probe_id, h.true_label, h.hits_at_k,
           p.n_label - 1 AS n_relevant,
           CASE WHEN p.n_label - 1 <= 0 THEN 0.0
                ELSE round(CAST(h.hits_at_k AS DOUBLE)
                           / (p.n_label - 1), 6) END AS recall_at_k,
           h.hits_at_k > 0 AS hit
    FROM hits h JOIN pool p ON p.label = h.true_label
    """,
)
def ml_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall @{PREC_K} per probe — what fraction of ALL same-label
    corpus items made the top-{PREC_K} — plus the hit-rate flag
    (any hit at all, the coverage metric batch-ANN papers report).
    Completes the retrieval-metric quartet: precision (density), NDCG
    (graded order), MRR (first hit), recall (coverage).

    Same two-stage ranking; the readout is an exact integer count over
    the per-label pool size (one broadcast join), with a single
    closing division — nothing to quantize.
    """
    ranked = _retr_ranked(spark, sf_dir)
    hits = ranked.groupBy("probe_id", "true_label").agg(
        F.sum("rel").alias("hits_at_k")
    )
    e = load_table(spark, sf_dir, "embeddings")
    pool = e.groupBy(F.col("label").alias("true_label")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    n_rel = F.col("n_label") - 1
    recall = F.when(n_rel <= 0, F.lit(0.0)).otherwise(
        F.round(F.col("hits_at_k").cast("double") / n_rel, 6)
    )
    return hits.join(F.broadcast(pool), "true_label").select(
        "probe_id",
        "true_label",
        "hits_at_k",
        n_rel.alias("n_relevant"),
        recall.alias("recall_at_k"),
        (F.col("hits_at_k") > 0).alias("hit"),
    )


# --------------------------------------------------------------------------
# HITS hubs/authorities on the nation trade graph (round 7)
# --------------------------------------------------------------------------

HITS_ITERS = 4
HITS_SCALE = 1_000_000

#: Directed nation-level trade edges (supplier nation -> customer
#: nation, weight = line count) — the ``graph_pagerank`` base.
_TRADE_EDGES_SQL = """
    edges AS MATERIALIZED (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               count(*) AS w
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2)
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted nation trade graph (persisted; ≤600 rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .transform(cached)
    )


def _hits_iter_sql(i: int) -> str:
    """One unrolled integer-exact HITS step (authority then hub, each
    max-rescaled to HITS_SCALE via a window max — a scalar subquery
    would reference the previous CTE twice and re-evaluate the whole
    chain exponentially on the oracle side)."""
    return f"""
    ar{i + 1} AS (
        SELECT n.node,
               coalesce(sum(e.w * h.h), 0) AS araw
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN h{i} h  ON h.node = e.src
        GROUP BY n.node),
    a{i + 1} AS (
        SELECT node,
               CAST((araw * {HITS_SCALE}) // max(araw) OVER ()
                    AS BIGINT) AS a
        FROM ar{i + 1}),
    hr{i + 1} AS (
        SELECT n.node,
               coalesce(sum(e.w * a.a), 0) AS hraw
        FROM nodes n
        LEFT JOIN edges e ON e.src = n.node
        LEFT JOIN a{i + 1} a ON a.node = e.dst
        GROUP BY n.node),
    h{i + 1} AS (
        SELECT node,
               CAST((hraw * {HITS_SCALE}) // max(hraw) OVER ()
                    AS BIGINT) AS h
        FROM hr{i + 1})
    """


@query(
    "graph_hits_scores",
    oracle=f"""
    WITH {_TRADE_EDGES_SQL},
    nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
    h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS h FROM nodes),
    {",".join(_hits_iter_sql(i) for i in range(HITS_ITERS))}
    SELECT n.node AS n_nationkey, n.n_name,
           h.h AS hub_score, a.a AS authority_score
    FROM nodes n
    JOIN h{HITS_ITERS} h ON h.node = n.node
    JOIN a{HITS_ITERS} a ON a.node = n.node
    """,
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities on the nation trade graph: a nation
    is a strong HUB when it supplies nations that are strong buyers,
    and a strong AUTHORITY when it buys from strong suppliers — the
    directional complement to ``graph_pagerank`` on the same edges
    (PageRank mixes both roles into one score).

    Same scale architecture as PageRank: ONE fact-table aggregation
    collapses the corpus to a ≤25×24 weighted digraph, then
    HITS_ITERS unrolled mutual-reinforcement rounds run over bounded
    tables only.  Determinism: scores are BIGINT fixed-point
    (HITS_SCALE = 1.0); each half-round is an exact integer
    sum-product followed by one max-rescale in integer division —
    both engines walk the identical lattice, no float normalization
    (the usual L2 norm is a libm sqrt whose accumulation order isn't
    portable).  araw·SCALE stays under 2⁶³ through ~sf1; beyond that
    the scale constant coarsens.
    """
    edges = _trade_edges(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation")
    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    h = nodes.select(
        "node", F.lit(HITS_SCALE).cast("long").alias("h")
    )
    a = None
    for _ in range(HITS_ITERS):
        # Every frame in the loop is nation-grain (≤ |nation| rows) or
        # edge-grain (≤ |nation|² rows) BY CONSTRUCTION — broadcast
        # them explicitly (r14, guide §3.1) so the static plan skips
        # the per-half-round SortMergeJoin exchanges AQE had to demote.
        araw = (
            nodes.join(F.broadcast(edges), edges.dst == nodes.node, "left")
            .join(F.broadcast(h.select(F.col("node").alias("hn"), "h")),
                  F.col("src") == F.col("hn"), "left")
            .groupBy("node")
            .agg(
                F.coalesce(
                    F.sum(F.col("w") * F.col("h")), F.lit(0)
                ).alias("araw")
            )
        )
        # Window max, not a crossJoin with an aggregate of the same
        # frame: a second reference would recompute the lineage every
        # iteration and the unrolled plan grows exponentially.  The
        # window is |V| rows (bounded nation grain).
        a = araw.select(
            "node",
            F.expr(
                f"(araw * {HITS_SCALE}) div (max(araw) OVER ())"
            ).alias("a"),
        )
        hraw = (
            nodes.join(F.broadcast(edges), edges.src == nodes.node, "left")
            .join(F.broadcast(a.select(F.col("node").alias("an"), "a")),
                  F.col("dst") == F.col("an"), "left")
            .groupBy("node")
            .agg(
                F.coalesce(
                    F.sum(F.col("w") * F.col("a")), F.lit(0)
                ).alias("hraw")
            )
        )
        h = hraw.select(
            "node",
            F.expr(
                f"(hraw * {HITS_SCALE}) div (max(hraw) OVER ())"
            ).alias("h"),
        )
    return (
        nodes.join(h, "node")
        .join(a.withColumnRenamed("a", "a_fin"), "node")
        .select(
            F.col("node").alias("n_nationkey"),
            "n_name",
            F.col("h").alias("hub_score"),
            F.col("a_fin").alias("authority_score"),
        )
    )


# --------------------------------------------------------------------------
# Hop-bounded closeness centrality on the nation trade graph (round 7)
# --------------------------------------------------------------------------

#: BFS rounds for the all-pairs distance closure.  The undirected
#: nation trade graph is dense (diameter ≤ 2 at every test SF); 3
#: rounds bound the closure for safety, and the query's semantics are
#: explicitly "closeness within ≤ CLOSE_HOPS hops" (k-bounded
#: closeness), so the result is well-defined on any graph.
CLOSE_HOPS = 3


def _close_iter_sql(i: int) -> str:
    """One unrolled min-plus round.  MATERIALIZED is load-bearing:
    d{i} is referenced twice (carry + expand) and an inlined CTE would
    re-evaluate the whole chain exponentially."""
    return f"""
    d{i + 1} AS MATERIALIZED (
        SELECT src, dst, min(d) AS d FROM (
            SELECT src, dst, d FROM d{i}
            UNION ALL
            SELECT d{i}.src, e2.v AS dst, d{i}.d + 1 AS d
            FROM d{i} JOIN e2 ON d{i}.dst = e2.u
        ) GROUP BY src, dst)
    """


@query(
    "graph_closeness_centrality",
    oracle=f"""
    WITH {_TRADE_EDGES_SQL},
    e2 AS MATERIALIZED (
        SELECT src AS u, dst AS v FROM edges
        UNION
        SELECT dst AS u, src AS v FROM edges),
    nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
    d0 AS MATERIALIZED (
        SELECT node AS src, node AS dst, 0 AS d FROM nodes
        UNION
        SELECT u AS src, v AS dst, 1 AS d FROM e2),
    {",".join(_close_iter_sql(i) for i in range(CLOSE_HOPS - 1))},
    m AS (
        SELECT src,
               CAST(count(*) AS BIGINT)  AS n_reachable,
               CAST(sum(d) AS BIGINT)    AS total_dist,
               CAST(max(d) AS BIGINT)    AS eccentricity
        FROM d{CLOSE_HOPS - 1} GROUP BY src)
    SELECT n.node AS n_nationkey, n.n_name,
           m.n_reachable, m.total_dist, m.eccentricity,
           CASE WHEN m.total_dist > 0
                THEN round(CAST(m.n_reachable - 1 AS DOUBLE)
                           / m.total_dist, 6)
                ELSE 0.0 END AS closeness
    FROM nodes n JOIN m ON m.src = n.node
    """,
)
def graph_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded closeness centrality (plus eccentricity) of every
    nation in the undirected trade graph: (reachable−1)/Σdistance
    over the ≤{CLOSE_HOPS}-hop ball — "which nations sit closest to
    the whole trade network".  All-pairs BFS by unrolled min-plus
    closure, the same aggregate-first architecture as
    ``graph_pagerank``: one fact pass collapses the corpus to ≤25
    nodes, then every round joins bounded tables.

    Each round's frontier table is persisted on the Spark side and
    MATERIALIZED on the oracle side — the round input is referenced
    twice (carry ∪ expand), and without the barrier both engines
    would re-evaluate the lineage exponentially (the
    ``graph_pagerank`` oracle lesson).  Distances are exact small
    integers; the one division in closeness is shared.
    """
    edges = _trade_edges(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation")
    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    e2 = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        .distinct()
        .transform(cached)
    )
    d = (
        nodes.select(
            F.col("node").alias("src"),
            F.col("node").alias("dst"),
            F.lit(0).alias("d"),
        )
        .union(e2.select("u", "v", F.lit(1)))
        .groupBy("src", "dst")
        .agg(F.min("d").alias("d"))
        .transform(cached)
    )
    for _ in range(CLOSE_HOPS - 1):
        ext = d.join(e2, d.dst == e2.u).select(
            "src", F.col("v").alias("dst"), (F.col("d") + 1).alias("d")
        )
        d = (
            d.select("src", "dst", "d")
            .union(ext)
            .groupBy("src", "dst")
            .agg(F.min("d").alias("d"))
            .transform(cached)
        )
    m = d.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_reachable"),
        F.sum("d").alias("total_dist"),
        F.max("d").cast("long").alias("eccentricity"),
    )
    return nodes.join(m, nodes.node == m.src).select(
        F.col("node").alias("n_nationkey"),
        "n_name",
        "n_reachable",
        "total_dist",
        "eccentricity",
        F.when(
            F.col("total_dist") > 0,
            F.round(
                (F.col("n_reachable") - 1).cast("double")
                / F.col("total_dist"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("closeness"),
    )


# --------------------------------------------------------------------------
# Trade-graph reciprocity (round 7)
# --------------------------------------------------------------------------

@query(
    "graph_reciprocity",
    oracle=f"""
    WITH {_TRADE_EDGES_SQL},
    r AS (
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_recip
        FROM edges a
        LEFT JOIN edges b ON b.src = a.dst AND b.dst = a.src)
    SELECT n_edges, n_recip,
           round(CAST(n_recip AS DOUBLE) / n_edges, 6) AS reciprocity
    FROM r
    """,
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the directed nation trade graph: the share
    of supplier→customer nation edges whose reverse edge also exists —
    the standard directed-graph symmetry diagnostic (1.0 = every trade
    relation is two-way).

    The corpus collapses to the ≤25×24 aggregated digraph first (one
    fact pass), so the reverse-edge self-join touches ≤600 rows; at
    unbounded node grain the same join keys on (dst, src) and
    shuffles both sides identically — still one co-partitioned join.
    Pure integer counting plus one shared division.
    """
    edges = _trade_edges(spark, sf_dir)
    rev = edges.select(
        F.col("src").alias("b_src"), F.col("dst").alias("b_dst")
    )
    j = edges.join(
        rev,
        (F.col("b_src") == F.col("dst")) & (F.col("b_dst") == F.col("src")),
        "left",
    )
    r = j.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            F.when(F.col("b_src").isNotNull(), 1).otherwise(0)
        ).alias("n_recip"),
    )
    return r.select(
        "n_edges",
        "n_recip",
        F.round(
            F.col("n_recip").cast("double") / F.col("n_edges"), 6
        ).alias("reciprocity"),
    )


# --------------------------------------------------------------------------
# Preferential-attachment link prediction (round 7)
# --------------------------------------------------------------------------

#: Candidate pool (highest-degree parts) and reported pair count.
PA_POOL = 50
PA_TOPK = 10


@query(
    "graph_pref_attachment",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
    deg AS MATERIALIZED (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL
              SELECT v AS node FROM edges)
        GROUP BY node),
    pool AS MATERIALIZED (
        SELECT node, d FROM deg
        ORDER BY d DESC, node LIMIT {PA_POOL}),
    cand AS (
        SELECT a.node AS u, b.node AS v, a.d * b.d AS pa_score,
               a.d AS deg_u, b.d AS deg_v
        FROM pool a JOIN pool b ON a.node < b.node
        WHERE NOT EXISTS (
            SELECT 1 FROM edges e
            WHERE e.u = a.node AND e.v = b.node))
    SELECT u, v, deg_u, deg_v, CAST(pa_score AS BIGINT) AS pa_score
    FROM cand
    ORDER BY pa_score DESC, u, v
    LIMIT {PA_TOPK}
    """,
)
def graph_pref_attachment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preferential-attachment link prediction: among the {PA_POOL}
    highest-degree parts, the {PA_TOPK} NOT-yet-co-purchased pairs
    with the largest degree product deg(u)·deg(v) — "which popular
    parts will show up in a basket together next".  Completes the
    link-prediction family (``graph_jaccard_neighbors`` and
    ``graph_resource_allocation`` score OBSERVED pairs; this scores
    absent ones, which is the actual prediction task).

    Scoring absent pairs naively is O(|V|²); the semantics are
    therefore DEFINED on the top-{PA_POOL}-degree candidate pool —
    the standard blocking for degree-monotone scores, and exactly the
    piece that keeps the operator scale-free: the pool comes from a
    TakeOrderedAndProject over the degree table, candidate pairs are
    pool², and the existing-edge exclusion is one left-anti join.
    Degrees and scores are exact BIGINTs; the ordering is total.
    """
    edges, deg = _copurchase_base(spark, sf_dir)
    pool = deg.orderBy(F.desc("d"), "node").limit(PA_POOL)
    a = pool.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    b = pool.select(F.col("node").alias("v"), F.col("d").alias("deg_v"))
    cand = (
        a.join(b, F.col("u") < F.col("v"))
        .join(edges, ["u", "v"], "left_anti")
        .select(
            "u",
            "v",
            "deg_u",
            "deg_v",
            (F.col("deg_u") * F.col("deg_v")).alias("pa_score"),
        )
    )
    return cand.orderBy(F.desc("pa_score"), "u", "v").limit(PA_TOPK)


# --------------------------------------------------------------------------
# Katz centrality (round 7)
# --------------------------------------------------------------------------

KATZ_ITERS = 3
KATZ_SCALE = 1_000_000


def _katz_iter_sql(i: int) -> str:
    """One unrolled Katz step: s <- SCALE + (A^T s) div 2 (attenuation
    1/2 by exact integer halving)."""
    return f"""
    kz{i + 1} AS (
        SELECT n.node,
               CAST({KATZ_SCALE} + coalesce(sum(k.s), 0) // 2
                    AS BIGINT) AS s
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN kz{i} k ON k.node = e.src
        GROUP BY n.node)
    """


@query(
    "graph_katz_centrality",
    oracle=f"""
    WITH {_TRADE_EDGES_SQL},
    nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
    kz0 AS (SELECT node, CAST({KATZ_SCALE} AS BIGINT) AS s FROM nodes),
    {",".join(_katz_iter_sql(i) for i in range(KATZ_ITERS))}
    SELECT n.node AS n_nationkey, n.n_name, k.s AS katz_score
    FROM nodes n JOIN kz{KATZ_ITERS} k ON k.node = n.node
    """,
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the (unweighted) nation trade digraph:
    influence = Σ_k α^k · (walks of length k into the node), with
    attenuation α = 1/2 — the centrality that, unlike PageRank, does
    not dilute by out-degree, and unlike HITS, scores walk mass rather
    than mutual reinforcement.  Completes the centrality family
    (degree / PageRank / HITS / closeness / Katz).

    Same architecture as ``graph_pagerank``: one fact aggregation to
    the ≤25-node graph, then {KATZ_ITERS} unrolled iterations over
    bounded tables.  α = 1/2 is deliberate: each step is
    ``SCALE + (Σ in-neighbor scores) div 2`` — EXACT integer halving,
    so both engines walk an identical lattice with no float geometric
    series anywhere; the truncation after {KATZ_ITERS} hops is the
    query's documented contract (α^4 terms < 7% of the base here).
    """
    edges = _trade_edges(spark, sf_dir).select("src", "dst")
    n = load_table(spark, sf_dir, "nation")
    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    s = nodes.select(
        "node", F.lit(KATZ_SCALE).cast("long").alias("s")
    )
    for _ in range(KATZ_ITERS):
        s = (
            nodes.join(edges, edges.dst == nodes.node, "left")
            .join(
                s.select(F.col("node").alias("sn"), "s"),
                F.col("src") == F.col("sn"),
                "left",
            )
            .groupBy("node")
            .agg(
                (
                    F.lit(KATZ_SCALE)
                    + F.expr("coalesce(sum(s), 0) div 2")
                ).cast("long").alias("s")
            )
        )
    return nodes.join(s, "node").select(
        F.col("node").alias("n_nationkey"),
        "n_name",
        F.col("s").alias("katz_score"),
    )


# --------------------------------------------------------------------------
# Rank-biased overlap between two revenue rankings (round 7)
# --------------------------------------------------------------------------

#: RBO evaluation depth and persistence parameter p = 1/2 (chosen so
#: every weight p^(d-1) is an exact power of two).
RBO_DEPTH = 20


def _rbo_year_sql(year: int, alias: str) -> str:
    return f"""
    {alias} AS (
        SELECT l_partkey, row_number() OVER (
                   ORDER BY sum(CAST(round(l_extendedprice
                       * (1 - l_discount) * 10000) AS BIGINT)) DESC,
                   l_partkey) AS rk
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
          AND l_shipdate <  TIMESTAMP '{year + 1}-01-01'
        GROUP BY l_partkey
        ORDER BY sum(CAST(round(l_extendedprice
                       * (1 - l_discount) * 10000) AS BIGINT)) DESC,
                 l_partkey
        LIMIT {RBO_DEPTH})
    """


@query(
    "ml_rank_biased_overlap",
    oracle=f"""
    WITH {_rbo_year_sql(1996, "ra")},
    {_rbo_year_sql(1997, "rb")},
    j AS (
        SELECT greatest(ra.rk, rb.rk) AS dmax
        FROM ra JOIN rb ON ra.l_partkey = rb.l_partkey),
    spine AS (SELECT unnest(range(1, {RBO_DEPTH} + 1)) AS d),
    inter AS (
        SELECT s.d,
               CAST((SELECT count(*) FROM j WHERE j.dmax <= s.d)
                    AS BIGINT) AS inter_d
        FROM spine s),
    terms AS (
        SELECT inter_d,
               CAST(inter_d AS DOUBLE)
                   / (d * CAST(2 AS BIGINT) ** (d - 1)) AS term,
               d
        FROM inter)
    SELECT CAST({RBO_DEPTH} AS BIGINT) AS depth,
           CAST(max(CASE WHEN d = {RBO_DEPTH} THEN inter_d END)
                AS BIGINT) AS n_common,
           round(0.5 * list_reduce(list_prepend(0.0,
                     list_sort(list(term))), (a, b) -> a + b), 6)
               AS rbo
    FROM terms
    """,
)
def ml_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p = 1/2) between the top-{RBO_DEPTH}
    revenue part rankings of 1996 and 1997 — the top-weighted
    rank-similarity measure built for INDEFINITE rankings (Kendall τ
    needs identical item sets; RBO gracefully weights agreement at the
    top, which is what "did our bestsellers change?" actually asks).

    p = 1/2 is deliberate: every weight p^(d-1) is an exact power of
    two, so each term inter_d / (d·2^(d-1)) is ONE division of exact
    integers (revenues ranked in exact decimils; prefix-intersection
    sizes are integer counts of joined ranks with max(r_a, r_b) ≤ d),
    and the depth-{RBO_DEPTH} sum folds the sorted term list.  Both
    top lists compile to TakeOrderedAndProject; the d-spine is a
    {RBO_DEPTH}-row constant.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def year_top(year: int, rk_name: str) -> DataFrame:
        rev = F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long")
        ).alias("rev")
        top = (
            li.filter(
                (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .groupBy("l_partkey")
            .agg(rev)
            .orderBy(F.desc("rev"), "l_partkey")
            .limit(RBO_DEPTH)
        )
        w = Window.orderBy(F.desc("rev"), "l_partkey")
        return top.select(
            "l_partkey", F.row_number().over(w).alias(rk_name)
        )
    ra = year_top(1996, "ra")
    rb = year_top(1997, "rb")
    j = ra.join(rb, "l_partkey").select(
        F.greatest(F.col("ra"), F.col("rb")).alias("dmax")
    )
    by_d = j.groupBy("dmax").agg(F.count(F.lit(1)).alias("c"))
    spine = spark.range(1, RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("d")
    )
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    inter = (
        spine.join(by_d, spine.d == by_d.dmax, "left")
        .select("d", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn("inter_d", F.sum("c").over(w_run))
    )
    terms = inter.select(
        "d",
        "inter_d",
        (
            F.col("inter_d").cast("double")
            / (
                F.col("d").cast("long")
                * F.expr("shiftleft(CAST(1 AS BIGINT), d - 1)")
            )
        ).alias("term"),
    )
    return terms.agg(
        F.lit(RBO_DEPTH).cast("long").alias("depth"),
        F.max(
            F.when(F.col("d") == RBO_DEPTH, F.col("inter_d"))
        ).alias("n_common"),
        F.round(
            0.5
            * F.aggregate(
                F.sort_array(F.collect_list("term")),
                F.lit(0.0),
                lambda a, b: a + b,
            ),
            6,
        ).alias("rbo"),
    )


PERCEPTRON_ITERS = 3


def _perceptron_oracle() -> str:
    """Unrolled batch-perceptron CTE chain (one level per iteration).

    Each level cross-joins the previous 1-row weight vector onto the
    feature relation, sums y·x over margin-violating rows, and emits
    the updated weights — a LINEAR chain (each CTE referenced once by
    the next level plus once by the output union; MATERIALIZED stops
    DuckDB's inliner from re-evaluating the chain per reference).
    """
    feats = """
    feats AS MATERIALIZED (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS x2,
               CASE WHEN l_discount >= 0.05 THEN 1 ELSE -1 END AS y
        FROM lineitem)"""
    ctes = [feats, "w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)"]
    outs = []
    for t in range(1, PERCEPTRON_ITERS + 1):
        ctes.append(f"""
    w{t} AS MATERIALIZED (
        SELECT CAST(w{t-1}.b + sum(CASE WHEN y * (w{t-1}.b + w{t-1}.w1 * x1 + w{t-1}.w2 * x2) <= 0
                           THEN y ELSE 0 END) AS BIGINT) AS b,
               CAST(w{t-1}.w1 + sum(CASE WHEN y * (w{t-1}.b + w{t-1}.w1 * x1 + w{t-1}.w2 * x2) <= 0
                            THEN y * x1 ELSE 0 END) AS BIGINT) AS w1,
               CAST(w{t-1}.w2 + sum(CASE WHEN y * (w{t-1}.b + w{t-1}.w1 * x1 + w{t-1}.w2 * x2) <= 0
                            THEN y * x2 ELSE 0 END) AS BIGINT) AS w2,
               CAST(sum(CASE WHEN y * (w{t-1}.b + w{t-1}.w1 * x1 + w{t-1}.w2 * x2) <= 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_mis
        FROM feats, w{t-1}
        GROUP BY w{t-1}.b, w{t-1}.w1, w{t-1}.w2)""")
        outs.append(
            f"SELECT CAST({t} AS BIGINT) AS iter, n_mis, b, w1, w2 FROM w{t}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(outs) + "\nORDER BY iter"


@query("ml_batch_perceptron", oracle=_perceptron_oracle())
def ml_batch_perceptron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch perceptron, {PERCEPTRON_ITERS} full-gradient epochs: the
    linear classifier trained by summing y·x over ALL margin-violating
    rows per epoch (the batch form of Rosenblatt's update — identical
    information to one distributed gradient step on the perceptron
    loss), predicting whether a line carries a meaningful discount
    from (quantity, price-band) features.

    Iterative-ML-on-Spark shape: the weight vector is a 1-ROW frame
    cross-joined (broadcast) onto the feature relation; each epoch is
    ONE scan + ONE global aggregate, and nothing ever leaves the JVM —
    no driver-side collect inside the loop, so the same code runs with
    a 100 TB feature table (epochs = linear passes).  Exactness: every
    feature, label, margin, and update is BIGINT (the price band is
    ``floor(price/1000)`` — one IEEE division then floor, identical in
    both engines), so the trajectory is bit-reproducible and the
    oracle's unrolled CTE chain lands on identical weights.
    """
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("x2"),
        F.when(F.col("l_discount") >= 0.05, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
    ).transform(cached)
    w = None  # 1-row frame (b, w1, w2)
    out = None
    for t in range(1, PERCEPTRON_ITERS + 1):
        if w is None:
            joined = feats.select(
                "x1", "x2", "y",
                F.lit(0).cast("long").alias("b"),
                F.lit(0).cast("long").alias("w1"),
                F.lit(0).cast("long").alias("w2"),
            )
        else:
            joined = feats.crossJoin(F.broadcast(w))
        margin_bad = (
            F.col("y")
            * (
                F.col("b")
                + F.col("w1") * F.col("x1")
                + F.col("w2") * F.col("x2")
            )
            <= 0
        )
        upd = joined.groupBy("b", "w1", "w2").agg(
            F.sum(F.when(margin_bad, F.col("y")).otherwise(0)).alias("db"),
            F.sum(
                F.when(margin_bad, F.col("y") * F.col("x1")).otherwise(0)
            ).alias("dw1"),
            F.sum(
                F.when(margin_bad, F.col("y") * F.col("x2")).otherwise(0)
            ).alias("dw2"),
            F.sum(F.when(margin_bad, 1).otherwise(0)).alias("n_mis"),
        )
        w_next = upd.select(
            (F.col("b") + F.col("db")).cast("long").alias("b"),
            (F.col("w1") + F.col("dw1")).cast("long").alias("w1"),
            (F.col("w2") + F.col("dw2")).cast("long").alias("w2"),
            F.col("n_mis").cast("long").alias("n_mis"),
        ).transform(cached)
        row = w_next.select(
            F.lit(t).cast("long").alias("iter"), "n_mis", "b", "w1", "w2"
        )
        out = row if out is None else out.unionAll(row)
        w = w_next.select("b", "w1", "w2")
    return out.orderBy("iter")


# --------------------------------------------------------------------------
# Two-sample tests and effect sizes (round 9, batch 75)
# --------------------------------------------------------------------------

#: The two-sample pair used by the Welch-t / effect-size queries —
#: unequal n AND unequal variance across these segments in the test
#: fixture, which is exactly the regime Welch's correction exists for.
_TWOSAMPLE_SEGS = ("BUILDING", "MACHINERY")

_TWOSAMPLE_MOMENTS_SQL = f"""
    y AS (
        SELECT c.c_mktsegment AS segment,
               CAST(round(o.o_totalprice) AS BIGINT) AS usd
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_TWOSAMPLE_SEGS[0]}', '{_TWOSAMPLE_SEGS[1]}')),
    g AS (
        SELECT segment,
               CAST(count(*) AS BIGINT)       AS n_g,
               CAST(sum(usd) AS BIGINT)       AS s_g,
               CAST(sum(usd * usd) AS BIGINT) AS q_g
        FROM y GROUP BY segment),
    m AS (
        SELECT min(CASE WHEN segment = '{_TWOSAMPLE_SEGS[0]}' THEN n_g END) AS n1,
               min(CASE WHEN segment = '{_TWOSAMPLE_SEGS[0]}' THEN s_g END) AS s1,
               min(CASE WHEN segment = '{_TWOSAMPLE_SEGS[0]}' THEN q_g END) AS q1,
               min(CASE WHEN segment = '{_TWOSAMPLE_SEGS[1]}' THEN n_g END) AS n2,
               min(CASE WHEN segment = '{_TWOSAMPLE_SEGS[1]}' THEN s_g END) AS s2,
               min(CASE WHEN segment = '{_TWOSAMPLE_SEGS[1]}' THEN q_g END) AS q2
        FROM g),
    v AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / n1 AS m1,
               CAST(s2 AS DOUBLE) / n2 AS m2,
               (q1 - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
               (q2 - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2
        FROM m)
"""


def _twosample_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of exact two-sample moments (n, mean, variance per
    group) for the Welch/effect-size family, from a single
    partial+final aggregate over the fact table.

    Whole-dollar response (the ``ml_anova_oneway`` discipline): Σy²
    in dollars stays below 2⁵³ into the billions of rows, so the
    BIGINT→DOUBLE widenings below are exact; S² is formed as the
    double product ``CAST(s AS DOUBLE) * s / n`` (two correctly
    rounded IEEE ops, bit-identical cross-engine) because the integer
    square would overflow BIGINT first.
    """
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    y = od.join(
        F.broadcast(
            cu.filter(F.col("c_mktsegment").isin(*_TWOSAMPLE_SEGS)).select(
                "c_custkey", "c_mktsegment"
            )
        ),
        od.o_custkey == cu.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice")).cast("long").alias("usd"),
    )
    g = y.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("usd").alias("s_g"),
        F.sum(F.col("usd") * F.col("usd")).alias("q_g"),
    )

    def pick(seg: str, col: str):
        return F.min(F.when(F.col("segment") == seg, F.col(col)))

    m = g.agg(
        pick(_TWOSAMPLE_SEGS[0], "n_g").alias("n1"),
        pick(_TWOSAMPLE_SEGS[0], "s_g").alias("s1"),
        pick(_TWOSAMPLE_SEGS[0], "q_g").alias("q1"),
        pick(_TWOSAMPLE_SEGS[1], "n_g").alias("n2"),
        pick(_TWOSAMPLE_SEGS[1], "s_g").alias("s2"),
        pick(_TWOSAMPLE_SEGS[1], "q_g").alias("q2"),
    )
    return m.select(
        "n1",
        "n2",
        (F.col("s1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n2")).alias("m2"),
        (
            (F.col("q1") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("q2") - F.col("s2").cast("double") * F.col("s2") / F.col("n2"))
            / (F.col("n2") - 1)
        ).alias("v2"),
    )


@query(
    "ml_welch_ttest",
    oracle=f"""
    WITH {_TWOSAMPLE_MOMENTS_SQL},
    se AS (SELECT n1, n2, m1, m2, v1, v2,
                  v1 / n1 + v2 / n2 AS se2
           FROM v)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(se2), 6) AS t_stat,
           round((se2 * se2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch
    FROM se
    """,
)
def ml_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does mean order value differ
    between the {BUILDING, MACHINERY} segments?  The two-sample
    member of the registry's hypothesis-test family (k-group F:
    ``ml_anova_oneway``; paired ranks: ``ml_wilcoxon_signed_rank``;
    unpaired ranks: ``ml_mannwhitney_u``) — Welch is the
    default-correct form when group variances differ, reporting the
    Welch–Satterthwaite degrees of freedom alongside t.

    One scan, one 2-group partial+final aggregate; every downstream
    expression is scalar IEEE arithmetic on a single row, written as
    the identical expression tree in both engines (each division /
    product / sqrt is a correctly rounded op on exact inputs, so the
    6dp rounding is cosmetic, not load-bearing).
    """
    v = _twosample_moments(spark, sf_dir)
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    va = F.col("v1") / F.col("n1")
    vb = F.col("v2") / F.col("n2")
    return v.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            (se2 * se2)
            / (va * va / (F.col("n1") - 1) + vb * vb / (F.col("n2") - 1)),
            6,
        ).alias("df_welch"),
    )


@query(
    "ml_effect_size_d",
    oracle=f"""
    WITH {_TWOSAMPLE_MOMENTS_SQL},
    p AS (SELECT n1, n2, m1, m2,
                 ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2) AS sp2
          FROM v)
    SELECT n1, n2,
           round((m1 - m2) / sqrt(sp2), 6) AS cohens_d,
           round(((m1 - m2) / sqrt(sp2))
                 * (1.0e0 - 3.0e0 / (4 * (n1 + n2 - 2) - 1)), 6) AS hedges_g
    FROM p
    """,
)
def ml_effect_size_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the same two-segment contrast as
    ``ml_welch_ttest``: Cohen's d on the pooled SD, plus Hedges' g
    (the small-sample bias correction J = 1 − 3/(4·df − 1), df =
    n₁+n₂−2).  Significance tests answer "is there a difference";
    effect sizes answer "does it matter" — A/B readouts report both.

    Same one-scan moment dataflow as the t-test; the pooled variance
    combines the two exact group variances with integer weights, and
    every scalar op afterwards is the identical correctly rounded
    expression tree in both engines (float literals written ``e0`` on
    the DuckDB side so nothing quantizes to DECIMAL).
    """
    v = _twosample_moments(spark, sf_dir)
    sp2 = (
        (F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2")
    ) / (F.col("n1") + F.col("n2") - 2)
    d = (F.col("m1") - F.col("m2")) / F.sqrt(sp2)
    j = F.lit(1.0) - F.lit(3.0) / (4 * (F.col("n1") + F.col("n2") - 2) - 1)
    return v.select(
        "n1",
        "n2",
        F.round(d, 6).alias("cohens_d"),
        F.round(d * j, 6).alias("hedges_g"),
    )


@query(
    "ml_two_proportion_ztest",
    oracle="""
    WITH g AS (
        SELECT l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM lineitem
        GROUP BY l_linestatus),
    m AS (
        SELECT min(CASE WHEN l_linestatus = 'O' THEN n END) AS n1,
               min(CASE WHEN l_linestatus = 'O' THEN x END) AS x1,
               min(CASE WHEN l_linestatus = 'F' THEN n END) AS n2,
               min(CASE WHEN l_linestatus = 'F' THEN x END) AS x2
        FROM g),
    p AS (
        SELECT n1, x1, n2, x2,
               CAST(x1 AS DOUBLE) / n1 AS p1,
               CAST(x2 AS DOUBLE) / n2 AS p2,
               CAST(x1 + x2 AS DOUBLE) / (n1 + n2) AS pp
        FROM m)
    SELECT n1, x1, n2, x2,
           round(p1, 6) AS p1,
           round(p2, 6) AS p2,
           round((p1 - p2)
                 / sqrt(pp * (1.0e0 - pp) * (1.0e0 / n1 + 1.0e0 / n2)),
                 6) AS z_stat
    FROM p
    """,
)
def ml_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test: do open-status (O) and
    finished-status (F) lineitems return (``l_returnflag = 'R'``) at
    different rates?  The categorical
    counterpart of ``ml_welch_ttest`` — the test behind every
    conversion-rate A/B readout (``report_ab_test_lift`` reports the
    lift; this reports the statistic that gates it).

    The entire test reduces to four exact BIGINT counts from one
    filtered partial+final aggregate — the 100 TB cost is one
    map-side-combined scan; the z expression is a fixed scalar tree
    on one row (pooled p̂, correctly rounded divisions, one sqrt),
    bit-identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("x"),
        )
    )

    def pick(status: str, col: str):
        return F.min(F.when(F.col("l_linestatus") == status, F.col(col)))

    m = g.agg(
        pick("O", "n").alias("n1"),
        pick("O", "x").alias("x1"),
        pick("F", "n").alias("n2"),
        pick("F", "x").alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return m.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(z, 6).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Chatterjee's xi rank correlation (round 9, batch 76)
# --------------------------------------------------------------------------


@query(
    "ml_xi_correlation",
    oracle="""
    WITH y AS (
        SELECT c.c_custkey,
               n.n_name,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
               CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                             0) AS BIGINT) AS yv
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, n.n_name, c.c_acctbal),
    r AS (
        SELECT n_name,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY x, c_custkey) AS xpos,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY yv, x, c_custkey) AS yrank
        FROM y),
    d AS (
        SELECT n_name,
               abs(yrank - lag(yrank) OVER (PARTITION BY n_name
                                            ORDER BY xpos)) AS step
        FROM r),
    s AS (
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(step) AS BIGINT) AS s
        FROM d GROUP BY n_name)
    SELECT n_name, n_customers,
           round(1.0e0 - 3.0e0 * s / (n_customers * n_customers - 1), 6)
               AS xi
    FROM s ORDER BY n_name
    """,
)
def ml_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's ξ rank correlation (Chatterjee 2020, JASA) between
    customer account balance and total order value, per nation —
    unlike Pearson/Spearman/Kendall (``agg_corr_exact``,
    ``ml_spearman_corr``, ``ml_kendall_tau``), ξ is asymmetric and
    detects ARBITRARY functional dependence (oscillating, non-
    monotone), converging to 0 iff independent and 1 iff y is a
    measurable function of x: ξ = 1 − 3·Σ|r_{i+1} − r_i| / (n² − 1)
    with the r sequence walked in x order.

    Determinism: both rank sequences are ``row_number`` with total
    tie-break chains (x, custkey) / (y, x, custkey) — the repo's
    ranking convention — so Σ|Δr| is an exact integer both engines
    agree on, and ξ is two correctly rounded IEEE ops.  Scale shape:
    one fact aggregate, then nation-partitioned windows (rank + one
    lag — sorts distribute across the nation grain; for a single
    global ξ at extreme n the same dataflow runs on the
    ``global_rank`` range-partition machinery instead).
    """
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    na = load_table(spark, sf_dir, "nation")
    y = (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(od, od.o_custkey == cu.c_custkey, "left")
        .groupBy("c_custkey", "n_name", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                F.lit(0),
            ).alias("yv")
        )
        .select(
            "c_custkey",
            "n_name",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
            "yv",
        )
    )
    r = y.select(
        "n_name",
        F.row_number()
        .over(Window.partitionBy("n_name").orderBy("x", "c_custkey"))
        .alias("xpos"),
        F.row_number()
        .over(Window.partitionBy("n_name").orderBy("yv", "x", "c_custkey"))
        .alias("yrank"),
    )
    d = r.select(
        "n_name",
        F.abs(
            F.col("yrank")
            - F.lag("yrank").over(Window.partitionBy("n_name").orderBy("xpos"))
        ).alias("step"),
    )
    s = d.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("step").alias("s"),
    )
    nn = F.col("n_customers")
    return s.select(
        "n_name",
        "n_customers",
        F.round(F.lit(1.0) - F.lit(3.0) * F.col("s") / (nn * nn - 1), 6).alias(
            "xi"
        ),
    ).orderBy("n_name")


# --------------------------------------------------------------------------
# Isotonic regression via the exact minimax formula (round 9, batch 78)
# --------------------------------------------------------------------------


@query(
    "ml_isotonic_calibration",
    oracle="""
    WITH g AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1),
    c AS (
        SELECT bin, n, pos,
               CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS idx,
               CAST(sum(n)   OVER (ORDER BY bin) AS BIGINT) AS cn,
               CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        FROM g),
    seg AS (
        SELECT a.idx AS j, b.idx AS k,
               CAST(b.cp - a.cp + a.pos AS DOUBLE)
                   / (b.cn - a.cn + a.n) AS mean_jk
        FROM c a JOIN c b ON a.idx <= b.idx),
    inner_min AS (
        SELECT c.idx AS i, seg.j, min(seg.mean_jk) AS lo
        FROM c JOIN seg ON seg.j <= c.idx AND seg.k >= c.idx
        GROUP BY c.idx, seg.j),
    iso AS (SELECT i, max(lo) AS iso FROM inner_min GROUP BY i)
    SELECT c.bin, c.n,
           round(CAST(c.pos AS DOUBLE) / c.n, 6) AS raw_rate,
           round(iso.iso, 6) AS iso_rate
    FROM c JOIN iso ON iso.i = c.idx
    ORDER BY c.bin
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression of return rate on discount — the monotone
    calibration fit (Zadrozny & Elkan 2002) behind probability
    calibration and dose-response curves, computed EXACTLY via the
    minimax identity iso(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) —
    provably equal to the pool-adjacent-violators solution, but with
    no sequential merge loop, so it is fully declarative and
    engine-portable.

    Scale shape: the corpus is touched once by a partial+final
    aggregate into the ~11-row discount-percent spine; the cubic
    minimax grid runs on that BOUNDED spine (≤ bins³ ≈ 1.3k rows —
    constant, corpus-independent), which is exactly the regime where
    O(bins³) beats a sequential PAVA at cluster scale: no iteration,
    no driver round-trips.  Every segment mean is one correctly
    rounded division of exact BIGINTs, and min/max over identical
    double sets are engine-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy(
            F.round(F.col("l_discount") * 100).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("pos"),
        )
    )
    w = Window.orderBy("bin")
    c = g.select(
        "bin",
        "n",
        "pos",
        F.row_number().over(w).cast("long").alias("idx"),
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    ).transform(cached)  # 11-row spine feeds the pair grid twice + output
    a = c.select(
        F.col("idx").alias("j"),
        F.col("n").alias("na"),
        F.col("pos").alias("pa"),
        F.col("cn").alias("cna"),
        F.col("cp").alias("cpa"),
    )
    b = c.select(
        F.col("idx").alias("k"),
        F.col("cn").alias("cnb"),
        F.col("cp").alias("cpb"),
    )
    seg = a.join(b, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("cpb") - F.col("cpa") + F.col("pa")).cast("double")
            / (F.col("cnb") - F.col("cna") + F.col("na"))
        ).alias("mean_jk"),
    )
    inner = (
        c.select(F.col("idx").alias("i"))
        .join(seg, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("mean_jk").alias("lo"))
    )
    iso = inner.groupBy("i").agg(F.max("lo").alias("iso"))
    return (
        c.join(iso, c.idx == iso.i)
        .select(
            "bin",
            "n",
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )
