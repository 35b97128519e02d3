"""LLM-data-pipeline operators (SURVEY.md §2 category 10).

Driver-mandated extension surface: dedup (exact + MinHash-LSH fuzzy),
similarity search (pairs / top-k / k-NN / centroids / semantic
grouping), and text analysis (tokens, TF-IDF, stats, n-grams) over the
``documents`` and ``embeddings`` tables.

Scale design (SURVEY.md §4.3.5): nothing here is quadratic in table
size on the shuffle path —
- fuzzy dedup prunes candidate pairs through LSH band buckets (an
  ordinary groupBy, shuffle-partitioned by band signature);
- top-k similarity uses a blocked numpy matmul inside ``mapInPandas``
  (Arrow-vectorized, per-partition top-k, then a global merge of k-row
  heaps); the broadcast side is what an IVF/LSH index replaces at
  100 TB;
- k-NN broadcasts the bounded probe set, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table, spread

TOPK = 20
KNN_K = 5
FUZZY_TAU = 0.5
MINHASH_PERMS = 32
LSH_BANDS = 16  # 16 bands × 2 rows: P(miss | J=0.9) ≈ 3e-12
#: Per-bucket neighbor cap for the LSH candidate self-join.  A bucket of
#: size s ≤ LSH_BUCKET_CAP+1 emits exactly its full s·(s−1)/2 pair set
#: (identical to an uncapped join — the test corpora never exceed this),
#: while a boilerplate mega-bucket degrades to a banded join bounded at
#: s·cap pairs instead of s² — each member pairs with its `cap` nearest
#: doc_id neighbors, which keeps every member path-connected to the rest
#: of the bucket, so downstream cluster/keep-best decisions are
#: unaffected.  Without this, one 10M-doc boilerplate bucket in a 100 TB
#: corpus would emit 5·10¹³ candidate pairs from a single task.
LSH_BUCKET_CAP = 64

#: Hard bound on how many bucket members take part in the windowed
#: (neighbor-cap) pairing.  The flattened pair array of one bucket row
#: is the real per-task memory blowup — O(size · cap) structs — so it
#: is built from only the first LSH_BUCKET_MAXB members (≤ 4096·64·24 B
#: ≈ 6 MB per row); every member PAST the bound still emits one star
#: pair to the bucket's minimum doc_id, so a mass-duplicate mega-bucket
#: stays a single connected component at O(1) extra structs per member.
#: Test corpora never approach 4096-member buckets, so oracle output is
#: bit-identical to the unbounded form.
LSH_BUCKET_MAXB = 4096


def _d(x: Column) -> Column:
    return x.cast("double")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot / sqrt(|a|²·|b|²), accumulated in double."""
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def _words(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def _pair_group_frame(vecs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Replicate block-tagged vectors into block-pair group rows.

    ``vecs`` carries (blk, vec_id, embedding); ``pairs`` is the tiny
    candidate block-pair table (bi <= bj) and is broadcast.  Side 'a'
    rows carry block bi's vectors, side 'b' rows block bj's (omitted
    when bi == bj — the group fn self-pairs side 'a').  Grouping the
    result by (bi, bj) shuffles each task exactly the two blocks it
    compares: per-task memory is O(2·block), never O(corpus), so the
    plan holds at any scale by choosing the block count.
    """
    bp = F.broadcast(pairs)
    a = bp.join(vecs, bp["bi"] == vecs["blk"]).select(
        "bi", "bj", F.lit("a").alias("side"), "vec_id", "embedding"
    )
    b = (
        bp.filter(F.col("bi") < F.col("bj"))
        .join(vecs, bp["bj"] == vecs["blk"])
        .select("bi", "bj", F.lit("b").alias("side"), "vec_id", "embedding")
    )
    return a.unionByName(b)


def _pair_sims_fn(tau=None, topk=None, out_col="sim"):
    """Per-block-pair cosine kernel for ``applyInPandas``.

    One numpy matmul between the two blocks; emits (min_id, max_id, sim)
    rounded to 6dp, optionally threshold-filtered (``tau``) and/or
    locally pruned to the per-group top-k under the full
    (-sim, a_id, b_id) ordering — so a global merge with the same
    ordering is exact.
    """
    import numpy as np
    import pandas as pd

    def fn(key, pdf):
        bi, bj = key
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        empty = pd.DataFrame(
            {
                "a_id": np.array([], np.int64),
                "b_id": np.array([], np.int64),
                out_col: np.array([], np.float64),
            }
        )
        if len(a) == 0 or (bi != bj and len(b) == 0):
            return empty
        aids = a["vec_id"].to_numpy(np.int64)
        amat = np.array(a["embedding"].tolist(), np.float64)
        if bi == bj:
            bids, bmat = aids, amat
        else:
            bids = b["vec_id"].to_numpy(np.int64)
            bmat = np.array(b["embedding"].tolist(), np.float64)
        anorm = np.sqrt((amat * amat).sum(axis=1))
        bnorm = np.sqrt((bmat * bmat).sum(axis=1))
        sims = np.round(
            (amat @ bmat.T) / (anorm[:, None] * bnorm[None, :]), 6
        )
        if bi == bj:
            keep = aids[:, None] < bids[None, :]
        else:
            keep = np.ones_like(sims, dtype=bool)
        if tau is not None:
            keep &= sims >= tau
        r, c = np.nonzero(keep)
        if len(r) == 0:
            return empty
        u, v = aids[r], bids[c]
        a_id, b_id = np.minimum(u, v), np.maximum(u, v)
        s = sims[r, c]
        if topk is not None and len(s) > topk:
            order = np.lexsort((b_id, a_id, -s))[:topk]
            a_id, b_id, s = a_id[order], b_id[order], s[order]
        return pd.DataFrame({"a_id": a_id, "b_id": b_id, out_col: s})

    return fn


def _shingles(words: Column) -> Column:
    """Distinct word-trigram shingles of a document."""
    return F.array_distinct(
        F.when(
            F.size(words) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(words, i),
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT md5(text)   AS content_hash,
           min(doc_id) AS keep_id,
           count(*)    AS copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keeping the smallest doc_id.

    One partial+final hash aggregate on md5(text) — at 100 TB the hash
    groupBy shards the content space evenly across the cluster (no hot
    keys: md5 is uniform).
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("copies"),
    )


#: The exhaustive fuzzy-pair SQL (CTE body), shared by the fuzzy-dedup
#: oracle and the dedup-cluster oracle (textprep.llm_dedup_clusters).
FUZZY_PAIRS_CTES = f"""
    w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
          FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                 for i in generate_series(1, len(words)-2)])
                      AS shingles
           FROM w WHERE len(words) >= 3),
    tok AS (SELECT doc_id, unnest(shingles) AS tok FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS i
              FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    fuzzy_pairs AS (
        SELECT ai AS a_id, bi AS b_id,
               round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON ai = sa.doc_id
        JOIN sizes sb ON bi = sb.doc_id
        WHERE i * 1.0 / (sa.n + sb.n - i) >= {FUZZY_TAU})
"""


def _lsh_candidate_pairs(bands: DataFrame, cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Bucket-cohabiting candidate pairs from an LSH band table
    ``(doc_id, band, sig)``, with a per-bucket quadratic-blowup guard.

    Each ``(band, sig)`` bucket is collapsed to its sorted member-id
    array by ONE hash aggregate, and the pairs are generated
    ARRAY-SIDE — ``transform(ids, (a, i) -> transform(slice(ids, i+2,
    cap), …))`` pairs every member with its next ``cap`` neighbors in
    doc_id order, entirely inside whole-stage codegen.  Buckets of
    ≤ cap+1 members emit exactly their full s·(s−1)/2 pair set —
    identical output to an uncapped self-join, which is what the
    exhaustive-SQL oracles verify at test scale.  Larger buckets are
    near-certain mass duplicates; the cap bounds them at s·cap pairs
    while the overlapping neighbor windows keep the bucket one
    connected component, so cluster-level dedup decisions (keep-best,
    cluster sizes) are preserved.  See SCALE.md §LSH for the 100 TB
    failure mode the cap removes.

    Scale note: this replaced a row_number window + rn-banded
    self-join (round 7) — one aggregate instead of a window shuffle
    plus a sort-merge self-join, with the same (band, sig) hash
    partitioning, so bucket members still co-locate and nothing
    corpus-sized crosses a single partition.

    Memory bound (round 8): the windowed pairing runs over only the
    first :data:`LSH_BUCKET_MAXB` members, so the flattened pair array
    a single bucket row materializes is ≤ MAXB·cap structs (~6 MB)
    instead of size·cap (unbounded).  Members past the bound each emit
    ONE star pair to the bucket's minimum doc_id — O(1) structs per
    member — which keeps a mega-bucket one connected component for
    cluster-grain dedup.  The residual per-row object is the collected
    id array itself: 8 bytes/member (a pathological 10M-duplicate
    bucket = 80 MB in one agg buffer — survivable, and such a bucket
    means the corpus is 10M copies of one page).  Buckets ≤ MAXB emit
    output bit-identical to the unbounded form (star pairs are a
    subset of the windowed pairs there is nothing to add to).
    """
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    maxb = int(LSH_BUCKET_MAXB)
    win = (
        f"flatten(transform(slice(ids, 1, {maxb}), (a, i) -> "
        f"transform(slice(ids, i + 2, {int(cap)}), "
        f"b -> struct(a AS a_id, b AS b_id))))"
    )
    overflow = (
        f"transform(slice(ids, {maxb} + 1, "
        f"greatest(size(ids) - {maxb}, 0)), "
        f"b -> struct(element_at(ids, 1) AS a_id, b AS b_id))"
    )
    return (
        buckets.select(
            F.explode(F.expr(f"concat({win}, {overflow})")).alias("p")
        )
        .select(F.col("p.a_id").alias("a_id"), F.col("p.b_id").alias("b_id"))
        .distinct()
    )


@query(
    "llm_dedup_fuzzy",
    oracle=f"""
    WITH {FUZZY_PAIRS_CTES}
    SELECT a_id, b_id, jaccard FROM fuzzy_pairs
    """,
)
def llm_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: trigram shingles → MinHash → LSH bands →
    candidate pairs → exact-Jaccard verify ≥ τ.

    100 TB design: the all-pairs space is never materialized — LSH band
    buckets (an ordinary groupBy on the band signature) shuffle-
    partition the candidate space, and only bucket-cohabiting pairs are
    verified.  With 32 permutations in 16 bands × 2 rows, recall at
    J ≥ 0.9 is 1 − (1 − 0.81)¹⁶ ≈ 1 − 3·10⁻¹², so the LSH output
    hash-matches the exhaustive-SQL oracle.

    The verify stage recomputes *exact* Jaccard from the true shingle
    sets (integer set sizes → bit-deterministic double division), so
    LSH false positives never reach the output.

    Composition note (64× scalebench reading, SCALE.md): verify cost is
    linear in the TRUE pair count, which is quadratic in per-document
    duplication — so at 100 TB this op composes AFTER
    ``llm_dedup_exact`` (hash-collapse identical texts first), leaving
    the verify stage only genuinely-fuzzy candidates.  The 64× rung
    measures the uncomposed worst case (every doc 64-way duplicated)
    and is sublinear in output even there.

    r14 (guide §2.5): the documents scan is ``spread`` — shingling and
    the 32-permutation MinHash are CPU-dense map work on few bytes,
    and the local single-row-group layout otherwise runs the whole
    signature stage (and the cached shingle table's partitioning that
    every verify join inherits) on one task.
    """
    d = spread(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", _shingles(_words()).alias("shingles"))
        .filter(F.size("shingles") > 0)
        # The shingle table feeds three consumers (minhash, and both
        # sides of the verify join); persisting it collapses the DAG
        # from ~4 full re-shingling passes to one.
        .transform(cached)
    )

    # MinHash signatures computed ARRAY-SIDE (r14, guide §2.4): each
    # permutation's min is an array_min over the document's own shingle
    # array, so the signature stage is pure map work in the same stage
    # as the (cached) shingle projection — the previous explode +
    # 32-min groupBy shuffled every shingle occurrence just to bring a
    # document's tokens back together, a co-location the array already
    # has.  Values are bit-identical (same xxhash64 calls, min is
    # order-free); one exchange leaves the plan here and the removed
    # shuffle is corpus-token-grain at any scale.
    def _perm_min(i: int) -> Column:
        # single-arg lambda: a second parameter would flip pyspark's
        # transform() into its (element, index) form and shadow the
        # permutation constant with the array index.
        return F.array_min(
            F.transform("shingles", lambda t: F.xxhash64(F.lit(i), t))
        )

    minhash = sh.select(
        "doc_id",
        *[_perm_min(i).alias(f"h{i}") for i in range(MINHASH_PERMS)],
    )
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("sig"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    bands = (
        minhash.select("doc_id", F.explode(band_structs).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
        # Single consumer since the round-7 array-side pair generation
        # (no self-join) — no persist needed.
    )

    cand = _lsh_candidate_pairs(bands)

    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    verified = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sa") + F.size("sb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= FUZZY_TAU)
    )
    return verified.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@query(
    "llm_sim_cosine_pairs",
    oracle="""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
               AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def llm_sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity of adjacent-id vector pairs via SQL lambdas
    (float→double casts inside the lambdas, SURVEY.md §1.3.3)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select(
            "a_id",
            "b_id",
            F.round(_cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
    )


@query(
    "llm_sim_topk",
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
               AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY sim DESC, a_id, b_id
    LIMIT {TOPK}
    """,
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most-similar vector pairs via exact block-pair merge.

    Exact block-pair plan (SURVEY.md §7.3.1 / §4.3 rule 4 — nothing is
    ever collected to the driver): vectors are hashed into B blocks,
    the B·(B+1)/2 block pairs are the tasks, and each task runs ONE
    numpy matmul over the two blocks it owns, pruned to a local top-k
    under the same (-sim, a_id, b_id) order the global merge uses — so
    the final TakeOrderedAndProject over ≤ B²·k tiny rows is exact.
    Per-task memory is two blocks, never the corpus; at 100 TB you
    raise B so a block fits an executor, and the same plan holds.  The
    sub-quadratic approximate path is ``llm_ann_ivf``.
    """
    B = 8
    e = load_table(spark, sf_dir, "embeddings").select(
        F.pmod("vec_id", F.lit(B)).cast("int").alias("blk"),
        "vec_id",
        "embedding",
    )
    bi = spark.range(B).select(F.col("id").cast("int").alias("bi"))
    bj = spark.range(B).select(F.col("id").cast("int").alias("bj"))
    pairs = bi.join(bj, F.col("bi") <= F.col("bj"))
    grouped = _pair_group_frame(e, pairs)
    local = grouped.groupBy("bi", "bj").applyInPandas(
        _pair_sims_fn(topk=TOPK, out_col="sim"),
        "a_id bigint, b_id bigint, sim double",
    )
    return local.orderBy(F.desc("sim"), F.asc("a_id"), F.asc("b_id")).limit(
        TOPK
    )


@query(
    "llm_knn_per_query",
    oracle=f"""
    WITH probes AS (SELECT * FROM embeddings WHERE vec_id < 10)
    SELECT p.vec_id AS probe_id, n.vec_id AS neighbor_id,
           round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                        CAST(n.embedding AS DOUBLE[])), 6)
               AS sim
    FROM probes p JOIN embeddings n ON n.vec_id <> p.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY p.vec_id
        ORDER BY round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                              CAST(n.embedding AS DOUBLE[])), 6)
                 DESC, n.vec_id) <= {KNN_K}
    """,
)
def llm_knn_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN: top-5 cosine neighbors for each of 10 probe vectors.

    The probe set is broadcast (bounded); the corpus streams through a
    map-side nested-loop — no corpus shuffle, linear in corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    sim = F.round(_cosine(F.col("pe"), F.col("ne")), 6)
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        n.join(F.broadcast(probes), F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .drop("rk")
    )


_CENTROID_EX_SQL = """
    ex AS (SELECT vec_id, label, ord,
                  CAST(embedding[ord] AS DOUBLE) AS val
           FROM embeddings, generate_series(1, 64) AS t(ord)),
    cent AS (SELECT label, ord, avg(val) AS c FROM ex GROUP BY label, ord)
"""


@query(
    "llm_centroids",
    oracle=f"""
    WITH {_CENTROID_EX_SQL}
    SELECT e.vec_id, e.label,
           round(sqrt(sum((e.val - c.c) * (e.val - c.c))), 6) AS dist
    FROM ex e JOIN cent c ON e.label = c.label AND e.ord = c.ord
    GROUP BY e.vec_id, e.label
    """,
)
def llm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + each vector's euclidean distance to its own
    centroid.

    Dataflow: posexplode → per-(label, dimension) mean (one partial+
    final agg) → re-assemble the 64-dim centroid arrays → broadcast
    join back to vectors → zip_with distance.  Centroids are tiny
    (10×64) regardless of corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.avg(_d(F.col("val"))).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("centroid"),
                lambda x, c: (_d(x) - c) * (_d(x) - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        e.join(F.broadcast(cent), "label")
        .select("vec_id", "label", F.round(dist, 6).alias("dist"))
    )


@query(
    "llm_semantic_groupby",
    oracle=f"""
    WITH {_CENTROID_EX_SQL},
    dists AS (
        SELECT e.vec_id, e.label, c.label AS clabel,
               sum((e.val - c.c) * (e.val - c.c)) AS dist2
        FROM ex e JOIN cent c ON e.ord = c.ord
        GROUP BY e.vec_id, e.label, c.label),
    assigned AS (
        SELECT vec_id, label, clabel AS assigned_label
        FROM dists
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist2, clabel) = 1)
    SELECT label, assigned_label, count(*) AS cnt
    FROM assigned GROUP BY label, assigned_label
    """,
)
def llm_semantic_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-bucketed grouping: assign each vector to the nearest
    label centroid, emit the (true label × assigned label) confusion
    counts.

    Two-phase dataflow: the centroid table (10 rows) is broadcast; the
    argmin over 10 candidate centroids is a per-row operation — the
    corpus is scanned once, never self-joined.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.avg(_d(F.col("val"))).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
        .select(F.col("label").alias("clabel"), "centroid")
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
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("clabel"))
    return (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "label", "clabel", dist2.alias("dist2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("label", F.col("clabel").alias("assigned_label"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "llm_text_tokens",
    oracle="""
    SELECT tok, count(*) AS cnt, count(DISTINCT doc_id) AS docs
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents)
    GROUP BY tok
    """,
)
def llm_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + per-token corpus counts (the canonical first Spark job)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_words()).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("doc_id").alias("docs"),
        )
    )


@query(
    "llm_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, round(tfidf, 6) AS tfidf
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY round(tfidf, 6) DESC, term) <= 3
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-term TF-IDF, top-3 terms per document.

    Exact dataflow (explode → tf → df → scoring join) rather than
    MLlib's HashingTF: hashed features are irreproducible across
    engines.  The df table is derived FROM tf — tf has exactly one row
    per (doc, term), so ``tf.groupBy(term).count()`` IS the document
    frequency, with no countDistinct and no second pass over the token
    explode.  The scoring join carries NO broadcast hint: the term
    TYPE table is unbounded at 100 TB (10⁸–10⁹ whitespace-token types
    of web text, per llm_build_vocab), so nothing term-grain may be
    hard-coded onto one executor; AQE broadcast-converts at runtime
    when df is actually small, and skew-splits the stopword-term
    partitions of a sort-merge join — mitigation a count window
    PARTITIONED BY term (one task per hot term, no AQE) cannot get.
    Only the 1-row corpus count n is an explicit broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_words()).alias("term"))
    # Persisted: tf feeds BOTH the df aggregate and the scoring join
    # (round-7 twice-consumed-frame sweep; the cache moved from tok to
    # tf when df became a tf derivative).
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(cached)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    tfidf = F.col("tf") * (
        F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", F.round(tfidf, 6).alias("tfidf"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )


@query(
    "llm_text_stats",
    oracle="""
    SELECT lang,
           CAST(floor(n_chars / 100.0) AS INTEGER) AS len_bucket,
           count(*)                                AS cnt,
           round(avg(n_chars), 4)                  AS avg_chars,
           min(n_chars)                            AS min_chars,
           max(n_chars)                            AS max_chars,
           count(DISTINCT source)                  AS n_sources
    FROM documents
    GROUP BY lang, len_bucket
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-histogram stats (descriptive-stats analog)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            F.floor(F.col("n_chars") / 100.0).cast("int").alias("len_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query(
    "llm_ngrams",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
               FROM documents),
    bg AS (SELECT doc_id,
                  unnest([words[i] || ' ' || words[i+1]
                          for i in generate_series(1, len(words)-1)]) AS bigram
           FROM w WHERE len(words) >= 2)
    SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
    """,
)
def llm_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram extraction + corpus counts."""
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "llm_multimodal_struct",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           round(sqrt(list_aggregate(
               list_transform(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')), 6) AS vec_norm
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.lang IN ('en', 'es')
      AND CAST(e.embedding[1] AS DOUBLE) > 0
    """,
)
def llm_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: documents ⋈ embeddings into a struct
    column, filtered by language + a vector-component predicate
    (the corpus vectors are unit-normalized, so the norm itself is
    emitted as a sanity column rather than filtered on).

    The struct models a multimodal record (text + typed metadata +
    vector); binary media columns would ride the same shape (see
    functions/udfs.py for the decode plumbing).  Output is flattened —
    nested struct cells don't compare portably across drivers.
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    m = F.struct(
        F.col("text"), F.col("lang"), F.col("n_chars"), F.col("embedding")
    ).alias("m")
    norm = F.sqrt(
        F.aggregate(
            F.col("m.embedding").cast("array<double>").alias("emb"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        d.join(e, e.vec_id == d.doc_id)
        .select("doc_id", m)
        .select(
            "doc_id",
            "m.lang",
            "m.n_chars",
            F.round(norm, 6).alias("vec_norm"),
            F.element_at(F.col("m.embedding"), 1).cast("double").alias("e0"),
        )
        .filter(F.col("m.lang").isin("en", "es") & (F.col("e0") > 0))
        .select("doc_id", F.col("lang"), F.col("n_chars"), "vec_norm")
    )


@query(
    "llm_inverted_index",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
    postings AS (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id)
                   AS rk,
               count(*) OVER (PARTITION BY term) AS df
        FROM tok)
    SELECT term, df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS head_postings
    FROM postings
    WHERE rk <= 5 AND df >= 10
    GROUP BY term, df
    """,
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + the head of
    the sorted posting list — the structure under exact-match search,
    keyword decontamination, and BM25.

    Dataflow: distinct (doc, term) pairs (the only corpus-sized
    shuffle), then per-term windows keyed on the SAME partition key
    (term) so df-count, head-truncation, and the ordered string fold
    all ride one Exchange.  Postings are emitted as a flat
    comma-joined string — at scale each term's full posting list would
    be a partitioned parquet sink, not a driver row.  Rare terms
    (df < 10) are filtered AFTER df is known, mirroring vocabulary
    min-frequency cuts.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(_words()).alias("term")).distinct()
    )
    w_term = Window.partitionBy("term")
    ranked = tok.select(
        "term",
        "doc_id",
        F.row_number()
        .over(w_term.orderBy("doc_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(w_term).alias("df"),
    ).filter((F.col("rk") <= 5) & (F.col("df") >= 10))
    return ranked.groupBy("term", "df").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("head_postings")
    )


@query(
    "llm_pmi_cooccur",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
               FROM documents),
    pairs AS (
        SELECT doc_id,
               unnest([CASE WHEN words[i] <= words[i+1]
                            THEN words[i] || ' ' || words[i+1]
                            ELSE words[i+1] || ' ' || words[i] END
                       for i in generate_series(1, len(words) - 1)
                       if words[i] <> words[i+1]]
                      ||
                      [CASE WHEN words[i] <= words[i+2]
                            THEN words[i] || ' ' || words[i+2]
                            ELSE words[i+2] || ' ' || words[i] END
                       for i in generate_series(1, len(words) - 2)
                       if words[i] <> words[i+2]]) AS pair
        FROM w),
    pc AS (SELECT pair, count(*) AS c_uv FROM pairs GROUP BY pair),
    uni AS (
        SELECT unnest(words) AS tok FROM w),
    uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
    tot AS (SELECT (SELECT count(*) FROM uni)  AS t,
                   (SELECT sum(c_uv) FROM pc)  AS p)
    SELECT string_split(pc.pair, ' ')[1] AS u,
           string_split(pc.pair, ' ')[2] AS v,
           pc.c_uv,
           round(ln((CAST(pc.c_uv AS DOUBLE) * tot.t * tot.t)
                    / (CAST(tot.p AS DOUBLE) * cu.c * cv.c)), 6) AS pmi
    FROM pc
    JOIN uc cu ON cu.tok = string_split(pc.pair, ' ')[1]
    JOIN uc cv ON cv.tok = string_split(pc.pair, ' ')[2]
    CROSS JOIN tot
    WHERE pc.c_uv >= 5
    """,
)
def llm_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of co-occurring word pairs within a
    ±2-token window — the classic collocation / word-association score
    that seeds embedding-era pipelines (PMI-weighted co-occurrence
    matrices are what SVD/word2vec factorize).

    Pairs are generated *inside each document's token array* with a
    higher-order ``transform``+``flatten`` (no positional self-join:
    the candidate space never leaves the row, so there is no shuffle
    proportional to pairs — only the final pair-count aggregation).
    Pairs are normalized unordered (lexicographic least/greatest), and
    PMI = ln(c_uv·T² / (P·c_u·c_v)) is one double expression over
    exact integer counts, rounded 6dp, identical in both engines.
    The unigram-count joins carry NO broadcast hint — the token TYPE
    table is unbounded at 100 TB, so AQE picks the strategy at runtime
    (see the inline note at the scoring join); only the 1-row totals
    frame is an explicit broadcast.
    """
    # Tokenize ONCE into a projected column.  The round-2 version indexed
    # the raw `split(lower(text))` expression with per-position
    # `element_at` lambdas; Catalyst inlined the split into every
    # element_at, re-tokenizing the whole document per token — O(len²)
    # work per row (17 s warm at sf0.1).  zip_with over two shifted
    # slices evaluates the array a constant number of times per row.
    d = load_table(spark, sf_dir, "documents").select(_words().alias("words"))
    words = F.col("words")

    # Forward skip-grams at distance k, normalized unordered,
    # identical tokens dropped; built per-row then exploded.
    def skip(k: int):
        n = F.greatest(F.size(words) - k, F.lit(0))
        return F.filter(
            F.zip_with(
                F.slice(words, 1, n),
                F.slice(words, k + 1, n),
                lambda a, b: F.when(
                    a != b,
                    F.concat_ws(" ", F.least(a, b), F.greatest(a, b)),
                ),
            ),
            lambda x: x.isNotNull(),
        )

    pairs = d.select(
        F.explode(F.concat(skip(1), skip(2))).alias("pair")
    )
    # Persisted: pc (the skip-gram explode + count — the dominant
    # stage) and uc each feed two consumers (their scalar totals and
    # the scoring join); unpersisted, the pair explosion executed
    # twice (the round-7 edge-support lesson).  T = Σ uc.c replaces a
    # second full corpus explode for the token total.
    pc = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c_uv"))
        .transform(cached)
    )
    uc = (
        d.select(F.explode(words).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(cached)
    )
    tot = uc.agg(F.sum("c").alias("t")).crossJoin(
        pc.agg(F.sum("c_uv").alias("p"))
    )
    split = F.split(F.col("pair"), " ")
    scored = (
        pc.filter(F.col("c_uv") >= 5)
        .select(
            split.getItem(0).alias("u"),
            split.getItem(1).alias("v"),
            "c_uv",
        )
        # No broadcast hints on the unigram-count joins: the token
        # TYPE table is unbounded at 100 TB (the pair-side c_uv >= 5
        # filter bounds the PROBE side, not uc), so AQE decides at
        # runtime — broadcast-convert when uc is actually small,
        # skew-split the Zipf-head tokens of a sort-merge join
        # otherwise (the llm_perplexity_bigram template,
        # curation.py's model joins).  Only the 1-row totals frame
        # stays an explicit broadcast.
        .join(uc.select(F.col("tok").alias("u"),
                        F.col("c").alias("cu")), "u")
        .join(uc.select(F.col("tok").alias("v"),
                        F.col("c").alias("cv")), "v")
        .crossJoin(F.broadcast(tot))
    )
    pmi = F.log(
        (F.col("c_uv").cast("double") * F.col("t") * F.col("t"))
        / (F.col("p").cast("double") * F.col("cu") * F.col("cv"))
    )
    return scored.select("u", "v", "c_uv", F.round(pmi, 6).alias("pmi"))


SWEEP_TAUS = (0.5, 0.7, 0.9)


@query(
    "llm_dedup_tau_sweep",
    oracle=f"""
    WITH {FUZZY_PAIRS_CTES},
    taus AS (SELECT CAST(unnest([{", ".join(str(t) for t in SWEEP_TAUS)}]) AS DOUBLE) AS tau)
    SELECT taus.tau,
           CAST(count(p.a_id) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT p.b_id) AS BIGINT) AS n_droppable
    FROM taus LEFT JOIN fuzzy_pairs p ON p.jaccard >= taus.tau
    GROUP BY taus.tau
    """,
)
def llm_dedup_tau_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sensitivity sweep: pair counts and droppable-doc
    counts at Jaccard thresholds {SWEEP_TAUS}, all derived from ONE
    LSH candidate pass — the tuning curve you inspect before fixing τ
    for a production dedup (too low merges near-topics, too high
    leaves boilerplate twins; the knee of this curve is the answer).

    Composes :func:`llm_dedup_fuzzy`'s verified pair set (already
    exact-Jaccard scored) with a broadcast threshold table — the sweep
    costs one O(pairs) pass on top of the candidate generation the
    single-τ dedup already pays, so evaluating three thresholds is not
    3× the work.  ``n_droppable`` counts distinct higher-id docs in
    qualifying pairs (the keep-lowest convention's upper bound on
    removals).  Counts are exact integers; the τ gates compare the
    6dp-rounded Jaccard both engines already agree on.
    """
    pairs = llm_dedup_fuzzy(spark, sf_dir).select("a_id", "b_id", "jaccard")
    taus = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in SWEEP_TAUS])).alias("tau")
    )
    return (
        taus.join(
            pairs, pairs.jaccard >= F.col("tau"), "left"
        )
        .groupBy("tau")
        .agg(
            F.count("a_id").alias("n_pairs"),
            F.countDistinct("b_id").alias("n_droppable"),
        )
    )


# --------------------------------------------------------------------------
# Matryoshka truncation diagnostics (round 7)
# --------------------------------------------------------------------------

#: Prefix-dimension truncation levels evaluated (full dim is 64).
MRL_LEVELS = [8, 16, 32]

_SUMSQ_FOLD_SQL = (
    "list_reduce(list_prepend(0.0, list_transform({v}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)"
)


@query(
    "llm_matryoshka_eval",
    oracle=f"""
    WITH lv AS (SELECT unnest([{", ".join(map(str, MRL_LEVELS))}]) AS k),
    r AS (
        SELECT lv.k,
               sqrt({_SUMSQ_FOLD_SQL.format(v="e.embedding[1:lv.k]")}
                    / {_SUMSQ_FOLD_SQL.format(v="e.embedding")})
                   AS retained
        FROM embeddings e CROSS JOIN lv
        WHERE {_SUMSQ_FOLD_SQL.format(v="e.embedding")} > 0)
    SELECT CAST(k AS INTEGER) AS k,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(list_reduce(list_prepend(0.0,
                     list_sort(list(retained))), (a, b) -> a + b)
                 / count(*), 6) AS mean_retained,
           round(min(retained), 6) AS min_retained
    FROM r GROUP BY k
    """,
)
def llm_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation diagnostics: how much of each embedding's
    L2 energy survives keeping only the first k of 64 dimensions, for
    k ∈ {MRL_LEVELS} — the evaluation behind Matryoshka representation
    learning's core promise (serve a prefix of the vector at a
    fraction of the cost).  For a vector and its own prefix, cosine
    similarity equals exactly the retained-norm ratio ‖x₁..k‖/‖x‖, so
    this IS the truncation-fidelity curve.

    Per-vector sums of squares fold sequentially (the ``_L2_FOLD_SQL``
    idiom — Spark ``F.aggregate`` ≡ DuckDB ``list_reduce``) with every
    FLOAT component cast to DOUBLE first (the float4-promotion ULP
    trap), so each retained ratio is bit-identical cross-engine; the
    per-level mean folds the SORTED ratio list.  One narrow pass over
    the corpus × 3 levels, embarrassingly parallel.
    """
    e = load_table(spark, sf_dir, "embeddings")

    def sumsq(col):
        return F.aggregate(
            F.transform(
                col, lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    lv = spark.range(0, len(MRL_LEVELS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in MRL_LEVELS]),
            F.col("id").cast("int") + 1,
        ).alias("k")
    )
    full = sumsq(F.col("embedding"))
    pref = sumsq(F.expr("slice(embedding, 1, k)"))
    r = (
        e.crossJoin(F.broadcast(lv))
        .filter(full > 0)
        .select("k", F.sqrt(pref / full).alias("retained"))
    )
    return r.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list("retained")),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_retained"),
        F.round(F.min("retained"), 6).alias("min_retained"),
    )
