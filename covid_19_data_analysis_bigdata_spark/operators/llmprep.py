"""LLM training-set assembly operators: chunk, pack, decontaminate,
vocab.

The last mile of a training-data pipeline after dedup/quality/text
analysis (operators/textprep.py): slice documents into context-window
chunks, pack short documents into fixed-size training sequences, drop
documents that leak evaluation content, and build the frequency-ranked
vocabulary.

Everything is per-row array math or one window/aggregate pass —
linear, partial+final, no Python.  Chunk identity uses the portable
polynomial hash (see textprep) so chunks can be traced across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.operators.distrank import global_rank
from covid_19_data_analysis_bigdata_spark.operators.llm import _shingles, _words
from covid_19_data_analysis_bigdata_spark.operators.retrieval import _tri_grams
from covid_19_data_analysis_bigdata_spark.operators.textprep import (
    _MARKER_VALUES,
    _POLY_SQL,
    LANG_MARKERS,
    _polyhash,
)
from covid_19_data_analysis_bigdata_spark.sources.io import load_table

CHUNK = 32  # tokens per chunk
STRIDE = 24  # chunk start stride (CHUNK - STRIDE = 8 tokens overlap)
PACK_BIN = 256  # tokens per packed training sequence
DECON_MIN_HITS = 2  # shingle overlaps that disqualify a document
EVAL_DOCS = 5  # doc_id < 5 plays the held-out eval set


@query(
    "llm_chunk_documents",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
               FROM documents),
    ks AS (
        SELECT doc_id, words,
               unnest(range(0,
                   CAST(greatest(ceil((len(words) - {CHUNK}) / {STRIDE}.0), 0)
                        AS BIGINT) + 1)) AS k
        FROM w),
    chunks AS (
        SELECT doc_id,
               CAST(k AS BIGINT) AS chunk_idx,
               list_slice(words, k * {STRIDE} + 1,
                          k * {STRIDE} + {CHUNK}) AS chunk
        FROM ks)
    SELECT doc_id, chunk_idx,
           len(chunk) AS n_tokens,
           {_POLY_SQL.format(col="array_to_string(chunk, ' ')")} AS chunk_hash
    FROM chunks
    """,
)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: slide a {CHUNK}-token window with
    stride {STRIDE} ({CHUNK - STRIDE}-token overlap) over each
    document, emitting per-chunk token counts and a traceable chunk
    hash.

    Chunk count per document is ⌈(n−C)/S⌉+1 — computed arithmetically,
    so the explode is exactly sized (no filter-after-generate waste).
    Per-row array slicing only; chunking 100 TB is one codegen'd scan.
    """
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    n_chunks = F.greatest(
        F.ceil((F.size(words) - CHUNK) / float(STRIDE)), F.lit(0)
    ).cast("long")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks),
                lambda k: F.struct(
                    k.cast("long").alias("chunk_idx"),
                    F.slice(words, k * STRIDE + 1, CHUNK).alias("chunk"),
                ),
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.chunk").alias("n_tokens"),
        _polyhash(F.array_join("c.chunk", " ")).alias("chunk_hash"),
    )


@query(
    "llm_pack_sequences",
    oracle=f"""
    WITH w AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tok
               FROM documents),
    c AS (SELECT doc_id, n_tok,
                 sum(n_tok) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
          FROM w)
    SELECT CAST(floor((cum - n_tok) / {PACK_BIN}.0) AS BIGINT) AS seq_id,
           count(*)     AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id)  AS first_doc,
           max(doc_id)  AS last_doc
    FROM c
    GROUP BY seq_id
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents in doc_id order and cut
    every {PACK_BIN} tokens — each document's sequence is determined by
    the running token total before it (contiguous packing, the
    deterministic streaming cousin of first-fit bin packing).

    Global cumsum WITHOUT the single-partition window trap: a plain
    ``Window.orderBy`` funnels the whole corpus through one task.
    Instead: bucket by doc_id range, per-bucket window cumsum, and add
    each bucket's broadcast prefix offset (#buckets scalars — bounded
    regardless of corpus size).  The bucket is derived arithmetically
    from doc_id (monotone: every id in bucket p precedes every id in
    bucket p+1), so the two consumers of the frame recompute identical
    assignments — no dependence on the engine's partition placement.
    The result is identical to the global window for any bucket count.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_words())
    base = d.select("doc_id", n_tok.alias("n_tok"))
    span = base.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    pid = F.least(
        F.lit(7),
        F.floor(
            (F.col("doc_id") - F.col("lo"))
            * 8
            / (F.col("hi") - F.col("lo") + 1)
        ),
    ).cast("int")
    t = (
        base.crossJoin(F.broadcast(span))
        .withColumn("pid", pid)
        .drop("lo", "hi")
    )
    part_sums = t.groupBy("pid").agg(F.sum("n_tok").alias("psum"))
    w_prefix = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The prefix window runs over #partitions rows, not the corpus.
    offsets = part_sums.select(
        "pid",
        (F.sum("psum").over(w_prefix) - F.col("psum")).alias("offset"),
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.join(F.broadcast(offsets), "pid").withColumn(
        "cum", F.col("offset") + F.sum("n_tok").over(w_local)
    )
    seq = F.floor((F.col("cum") - F.col("n_tok")) / float(PACK_BIN)).cast(
        "long"
    )
    return (
        c.groupBy(seq.alias("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "llm_decontaminate",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
               FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                 for i in generate_series(1, len(words)-2)])
                      AS shingles
           FROM w WHERE len(words) >= 3),
    eval_set AS (SELECT DISTINCT unnest(shingles) AS sh FROM sh
                 WHERE doc_id < {EVAL_DOCS}),
    hits AS (SELECT t.doc_id, count(DISTINCT t.sh) AS n_hits
             FROM (SELECT doc_id, unnest(shingles) AS sh FROM sh
                   WHERE doc_id >= {EVAL_DOCS}) t
             JOIN eval_set e ON t.sh = e.sh
             GROUP BY t.doc_id)
    SELECT s.doc_id,
           coalesce(h.n_hits, 0) AS n_hits,
           CAST(coalesce(h.n_hits, 0) >= {DECON_MIN_HITS} AS BOOLEAN)
               AS contaminated
    FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
    WHERE s.doc_id >= {EVAL_DOCS}
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval decontamination: flag training documents sharing ≥
    {DECON_MIN_HITS} word-trigram shingles with the held-out eval set
    (doc_id < {EVAL_DOCS} stands in for the benchmark corpus).

    The eval shingle set is a broadcast dimension (bounded by eval-set
    size, not corpus size); the overlap count is one token join +
    aggregate — the same linear shape however large training gets.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = (
        # Two-step projection: materialize the word array BEFORE the
        # shingle transform (an unmaterialized split inside the indexed
        # lambda re-tokenizes the document per position — the known
        # O(len²) Catalyst inlining trap), and persist — the frame
        # feeds the eval set, the train explode, AND the final join,
        # which unpersisted meant three full shingling passes (the
        # round-5 bench isolation showed 22 s/run at sf0.1 for what is
        # one ~2 s computation).
        d.select("doc_id", _words().alias("words"))
        .select("doc_id", _shingles(F.col("words")).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .transform(cached)
    )
    eval_set = (
        sh.filter(F.col("doc_id") < EVAL_DOCS)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") >= EVAL_DOCS)
    hits = (
        train.select("doc_id", F.explode("shingles").alias("sh"))
        .join(F.broadcast(eval_set), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_hits"))
    )
    return (
        train.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= DECON_MIN_HITS).alias(
                "contaminated"
            ),
        )
    )


@query(
    "llm_build_vocab",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    freq AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok)
    SELECT tok,
           freq,
           row_number() OVER (ORDER BY freq DESC, tok) AS vocab_id
    FROM freq
    QUALIFY vocab_id <= 100
    """,
)
def llm_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary build: top-100 tokens by corpus
    frequency with dense ids (freq desc, token asc tie-break — the
    id assignment every tokenizer build performs).

    Token counting is partial+final; the top-100 cut happens via the
    distributed top-k heap (``TakeOrderedAndProject``) BEFORE the id
    window, so the single-partition rank only ever sees 100 rows —
    at web scale the raw type count (misspellings, junk) is not
    actually bounded, the pruned vocabulary is.
    """
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(_words()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("tok")).limit(100)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    return top.withColumn("vocab_id", F.row_number().over(w))


@query(
    "llm_clean_corpus",
    oracle=f"""
    WITH w AS (SELECT doc_id, text,
                      string_split(lower(text), ' ') AS words
               FROM documents),
    markers(tok, mlang) AS (VALUES {_MARKER_VALUES}),
    tok AS (SELECT doc_id, unnest(words) AS tok FROM w),
    scores AS (SELECT t.doc_id, m.mlang, count(*) AS hits
               FROM tok t JOIN markers m USING (tok)
               GROUP BY 1, 2),
    best AS (SELECT doc_id, mlang
             FROM scores
             QUALIFY row_number() OVER (PARTITION BY doc_id
                                        ORDER BY hits DESC, mlang) = 1),
    dup AS (SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
            FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([words[i] || ' ' || words[i+1] || ' ' ||
                                 words[i+2]
                                 for i in generate_series(1, len(words)-2)])
                      AS shingles
           FROM w WHERE len(words) >= 3),
    eval_set AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
                 WHERE doc_id < {EVAL_DOCS}),
    hits AS (SELECT t.doc_id, count(DISTINCT t.s) AS n_hits
             FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                   WHERE doc_id >= {EVAL_DOCS}) t
             JOIN eval_set e USING (s)
             GROUP BY t.doc_id)
    SELECT w.doc_id,
           len(w.words)                       AS n_words,
           coalesce(b.mlang, 'unk')           AS pred_lang,
           CAST(w.doc_id <> d.keep_id AS BOOLEAN) AS is_dup,
           coalesce(h.n_hits, 0)              AS n_eval_hits,
           CAST(len(w.words) >= 20
                AND coalesce(b.mlang, 'unk') = 'en'
                AND w.doc_id = d.keep_id
                AND w.doc_id >= {EVAL_DOCS}
                AND coalesce(h.n_hits, 0) < {DECON_MIN_HITS}
                AS BOOLEAN)                   AS kept
    FROM w
    JOIN dup d USING (doc_id)
    LEFT JOIN best b USING (doc_id)
    LEFT JOIN hits h ON w.doc_id = h.doc_id
    """,
)
def llm_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: one audit frame, four filters.

    The C4-style assembly line as a single lazy plan — minimum length,
    language ID (marker argmax = 'en'), exact dedup (keep the smallest
    doc_id per content hash), and eval decontamination (< {DECON_MIN_HITS}
    shared trigram shingles with the held-out set) — emitting one row
    per document with each signal and the final ``kept`` verdict, so
    the drop reason is always auditable (the property a production
    pipeline needs more than the kept list itself).

    Scale shape: two broadcast dimensions (markers, eval shingles), two
    hash aggregates (lang scores, content groups), everything else
    per-row array math; no operator materializes pairs or collects.
    """
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    n_words = F.size(words)

    markers = spark.createDataFrame(
        [(w, lang) for lang, ws in LANG_MARKERS.items() for w in ws],
        "tok string, mlang string",
    )
    tok = d.select("doc_id", F.explode(words).alias("tok"))
    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("hits"), F.asc("mlang")
    )
    best = (
        tok.join(F.broadcast(markers), "tok")
        .groupBy("doc_id", "mlang")
        .agg(F.count(F.lit(1)).alias("hits"))
        .withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select("doc_id", "mlang")
    )

    keep_ids = d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id")
    )
    dup = d.select("doc_id", F.md5("text").alias("content_hash")).join(
        keep_ids, "content_hash"
    )

    sh = (
        # Materialized-words projection + persist: the shingle frame
        # feeds both the eval set and the train-side hit count, and an
        # unmaterialized tokenizer inside the shingle lambda re-splits
        # the document per position (the same O(len²) inlining trap
        # fixed in llm_decontaminate — 16 s/run at sf0.1 before).
        d.select("doc_id", words.alias("w"))
        .select("doc_id", _shingles(F.col("w")).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .transform(cached)
    )
    eval_set = (
        sh.filter(F.col("doc_id") < EVAL_DOCS)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") >= EVAL_DOCS)
        .select("doc_id", F.explode("shingles").alias("s"))
        .join(F.broadcast(eval_set), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_hits"))
    )

    pred = F.coalesce("mlang", F.lit("unk"))
    n_eval_hits = F.coalesce("n_hits", F.lit(0))
    kept = (
        (n_words >= 20)
        & (pred == "en")
        & (F.col("doc_id") == F.col("keep_id"))
        & (F.col("doc_id") >= EVAL_DOCS)
        & (n_eval_hits < DECON_MIN_HITS)
    )
    return (
        d.join(dup.select("doc_id", "keep_id"), "doc_id")
        .join(best, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_words.alias("n_words"),
            pred.alias("pred_lang"),
            (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
            n_eval_hits.alias("n_eval_hits"),
            kept.alias("kept"),
        )
    )


#: Target mixture: up/down-sampling rate per source bucket, in permille.
MIX_PERMILLE = {0: 1000, 1: 500, 2: 200, 3: 100}
_MIX_CASE_SQL = (
    "CASE (CAST(substr(source, 4) AS BIGINT) % 4) "
    + " ".join(f"WHEN {k} THEN {v}" for k, v in MIX_PERMILLE.items())
    + " END"
)


@query(
    "llm_dataset_mix",
    oracle=f"""
    WITH tagged AS (
        SELECT source,
               {_MIX_CASE_SQL} AS permille,
               (doc_id * 2654435761) % 1000 AS bucket
        FROM documents)
    SELECT source,
           permille          AS target_permille,
           count(*)          AS n_total,
           CAST(sum(CASE WHEN bucket < permille THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           round(sum(CASE WHEN bucket < permille THEN 1 ELSE 0 END)
                 * 1000.0 / count(*), 4) AS realized_permille
    FROM tagged
    GROUP BY 1, 2
    """,
)
def llm_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixture sampling: hit per-source target rates with a
    deterministic hash gate — the pretraining data-mix step (keep all
    of the rare high-quality source, 10% of the crawl).

    Each source bucket gets a permille rate; a document survives iff
    ``(doc_id · 2654435761) mod 1000 < rate`` — a Knuth multiplicative
    hash, so the gate is a pure row-local integer predicate: no
    shuffle, no RNG state, reproducible across engines, runs, and
    cluster sizes, and any subset of the corpus makes the identical
    keep decision (critical when the mix is re-applied incrementally).
    The output audits realized vs target rates per source.
    """
    d = load_table(spark, sf_dir, "documents")
    permille = F.expr(_MIX_CASE_SQL)
    bucket = (F.col("doc_id") * F.lit(2654435761).cast("long")) % 1000
    kept = F.when(bucket < F.col("permille"), 1).otherwise(0)
    return (
        d.select("source", permille.alias("permille"), bucket.alias("bucket"))
        .groupBy("source", "permille")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("bucket") < F.col("permille"), 1).otherwise(0)
            ).alias("n_kept"),
        )
        .select(
            "source",
            F.col("permille").alias("target_permille"),
            "n_total",
            "n_kept",
            F.round(F.col("n_kept") * 1000.0 / F.col("n_total"), 4).alias(
                "realized_permille"
            ),
        )
    )


@query(
    "llm_embedding_quantize",
    oracle="""
    WITH m AS (
        SELECT vec_id,
               len(embedding) AS n_dims,
               list_aggregate(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
        FROM embeddings),
    q AS (
        SELECT e.vec_id, m.n_dims, m.mx,
               list_transform(e.embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 127 / m.mx)
                             AS BIGINT)) AS qv
        FROM embeddings e JOIN m USING (vec_id)
        WHERE m.mx > 0)
    SELECT vec_id, n_dims,
           round(127 / mx, 6)            AS inv_scale,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           list_aggregate(qv, 'min')     AS q_min,
           list_aggregate(qv, 'max')     AS q_max
    FROM q
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4×
    storage/bandwidth lever for vector search at corpus scale.

    Per vector: scale by 127/max|x| and round each component to an
    integer in [-127, 127].  Pure array expressions (transform/
    aggregate lambdas) — no explode, no shuffle, one codegen stage
    per row.  Cross-engine exactness: components widen float→double
    identically, multiply-before-divide keeps the scaled values
    bit-identical, and both engines round half away from zero; the
    check emits the quantized vector's (sum, min, max) signature as
    scalar columns (nested outputs are barred from oracle queries).
    """
    from covid_19_data_analysis_bigdata_spark.operators.llm import _d

    e = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(_d(x))))
    qv = F.transform(
        "embedding",
        lambda x: F.round(_d(x) * 127 / F.col("mx")).cast("long"),
    )
    q_sum = F.aggregate(
        F.col("qv"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("n_dims"),
            mx.alias("mx"),
            "embedding",
        )
        .filter(F.col("mx") > 0)
        .withColumn("qv", qv)
        .select(
            "vec_id",
            "n_dims",
            F.round(F.lit(127.0) / F.col("mx"), 6).alias("inv_scale"),
            q_sum.alias("q_sum"),
            F.array_min("qv").alias("q_min"),
            F.array_max("qv").alias("q_max"),
        )
    )


@query(
    "llm_bpe_merge_pairs",
    oracle="""
    WITH wf AS (
        SELECT tok, count(*) AS freq
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY tok),
    chars AS (SELECT tok, freq, string_split(tok, '') AS cs FROM wf),
    pairs AS (
        SELECT freq,
               unnest([cs[i] || cs[i+1]
                       for i in generate_series(1, len(cs)-1)]) AS pair
        FROM chars WHERE len(cs) >= 2)
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 50
    """,
)
def llm_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, step one: corpus-weighted adjacent
    symbol-pair counts — the statistic whose argmax becomes the next
    merge rule.

    The classic two-level reduction: token frequencies first (the word
    table is vastly smaller than the corpus), then each *distinct*
    token explodes into its character pairs weighted by that frequency
    — so the expensive explode runs over the vocabulary, not the
    corpus.  Top-50 via ``TakeOrderedAndProject`` with a total
    (count, pair) order.
    """
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(_words()).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cs = F.split(F.col("tok"), "")
    pairs = F.when(
        F.length("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("tok") - 1),
            lambda i: F.concat(F.element_at(cs, i), F.element_at(cs, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        wf.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# Tokenizer-economics: vocabulary coverage curve (round 4)
# --------------------------------------------------------------------------

COVERAGE_KS = (1, 5, 10, 20, 30)


@query(
    "llm_tokenizer_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS t
                 FROM documents),
    freq AS (SELECT t, count(*) AS f FROM tok GROUP BY t),
    ranked AS (SELECT t, f,
                      row_number() OVER (ORDER BY f DESC, t) AS rk
               FROM freq),
    tot AS (SELECT sum(f) AS total, count(*) AS n_terms FROM freq)
    SELECT k.k,
           CAST(least(k.k, tot.n_terms) AS BIGINT) AS vocab_size,
           CAST(sum(r.f) AS BIGINT) AS covered_tokens,
           round(CAST(sum(r.f) AS DOUBLE) / tot.total, 4) AS coverage
    FROM (SELECT unnest([{", ".join(str(k) for k in COVERAGE_KS)}]) AS k) k
    JOIN ranked r ON r.rk <= k.k
    CROSS JOIN tot
    GROUP BY k.k, tot.n_terms, tot.total
    """,
)
def llm_tokenizer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocab budget K,
    the fraction of the corpus token stream covered by the K most
    frequent terms (frequency desc, term asc tie) — the economics
    behind choosing a tokenizer vocab size (what OOV/byte-fallback
    rate would a K-entry vocab pay on this corpus?).

    One corpus-scale token aggregation; everything after runs on at
    most max(COVERAGE_KS) rows.  Coverage only needs ranks ≤ max(K),
    so the vocabulary is pre-pruned with ``orderBy(...).limit(max K)``
    — TakeOrderedAndProject (per-partition top-K, driver merge of K
    rows per partition), never a single-partition rank window over the
    full vocabulary: at 100 TB web text the whitespace-token type
    count is 10⁸–10⁹ (see ``llm_build_vocab``), which no one executor
    should sort or broadcast.  The totals still aggregate the FULL
    frequency table (one partial+final agg).  Counts are exact
    integers; each coverage is one correctly-rounded division.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
    freq = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
        .transform(cached)  # feeds the top-K prune AND the totals
    )
    # Bounded-grain window: ≤ max(COVERAGE_KS) rows after the limit.
    top = freq.orderBy(F.desc("f"), F.asc("t")).limit(max(COVERAGE_KS))
    ranked = top.select(
        "t",
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("t")))
        .alias("rk"),
    )
    tot = freq.agg(
        F.sum("f").alias("total"), F.count(F.lit(1)).alias("n_terms")
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in COVERAGE_KS])).alias("k")
    )
    return (
        ks.join(F.broadcast(ranked), F.col("rk") <= F.col("k"))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n_terms", "total")
        .agg(F.sum("f").alias("covered_tokens"))
        .select(
            F.col("k").cast("int").alias("k"),
            F.least(F.col("k"), F.col("n_terms"))
            .cast("long")
            .alias("vocab_size"),
            F.col("covered_tokens").cast("long").alias("covered_tokens"),
            F.round(
                F.col("covered_tokens").cast("double") / F.col("total"), 4
            ).alias("coverage"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic training-shard assignment (round 4)
# --------------------------------------------------------------------------

N_SHARDS = 8


@query(
    "llm_dataset_shard_assign",
    oracle=f"""
    WITH assigned AS (
        SELECT {_POLY_SQL.format(col="CAST(doc_id AS VARCHAR)")}
                   % {N_SHARDS} AS shard,
               len(string_split(lower(text), ' ')) AS n_tokens
        FROM documents),
    per AS (SELECT shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            FROM assigned GROUP BY shard),
    bal AS (SELECT max(n_tokens) AS mx, min(n_tokens) AS mn FROM per)
    SELECT CAST(per.shard AS INTEGER) AS shard,
           per.n_docs, per.n_tokens,
           round(CAST(bal.mx AS DOUBLE) / bal.mn, 4) AS balance_ratio
    FROM per CROSS JOIN bal
    """,
)
def llm_dataset_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for distributed training: every
    document lands in shard ``polyhash(doc_id) % {N_SHARDS}``, with
    per-shard doc/token counts and the global max/min token balance
    ratio — the sharding step between a curated corpus and N data-
    loader workers, where a skewed shard stalls every training step
    behind the slowest reader.

    The gate is row-local (no shuffle decides membership — documents
    can be written straight to their shard with
    ``partitionBy("shard")``); the stats are one {N_SHARDS}-group
    aggregate plus a 1-row balance summary broadcast back.  Hash
    assignment is stable across engines, runs, and incremental
    appends — a random or round-robin assignment reshuffles history
    on every backfill, silently changing what each worker has seen.
    """
    d = load_table(spark, sf_dir, "documents")
    assigned = d.select(
        (_polyhash(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
        F.size(F.split(F.lower("text"), " ")).alias("n_tokens"),
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    bal = per.agg(
        F.max("n_tokens").alias("mx"), F.min("n_tokens").alias("mn")
    )
    return per.crossJoin(F.broadcast(bal)).select(
        F.col("shard").cast("int").alias("shard"),
        "n_docs",
        "n_tokens",
        F.round(F.col("mx").cast("double") / F.col("mn"), 4).alias(
            "balance_ratio"
        ),
    )


# --------------------------------------------------------------------------
# Zipf-law fit over the trigram vocabulary (round 4)
# --------------------------------------------------------------------------

ZIPF_SCALE = 100_000  #: fixed-point scale for ln(rank)/ln(freq)


@query(
    "llm_vocab_zipf_fit",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    g AS (SELECT unnest([array_to_string(ws[i:i+2], ' ')
                         for i in generate_series(1, len(ws) - 2)]) AS t
          FROM w WHERE len(ws) >= 3),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM g GROUP BY t),
    ranked AS (SELECT f,
                      row_number() OVER (ORDER BY f DESC, t) AS rk
               FROM freq),
    pts AS (SELECT CAST(round(ln(rk) * {ZIPF_SCALE}) AS BIGINT) AS x,
                   CAST(round(ln(f) * {ZIPF_SCALE}) AS BIGINT) AS y
            FROM ranked),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(x) AS DOUBLE) AS sx,
                 CAST(sum(y) AS DOUBLE) AS sy,
                 CAST(sum(x * y) AS DOUBLE) AS sxy,
                 CAST(sum(x * x) AS DOUBLE) AS sxx,
                 CAST(sum(y * y) AS DOUBLE) AS syy
          FROM pts)
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(-(n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS zipf_exponent,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def llm_vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the trigram vocabulary: OLS slope of
    ln(freq) on ln(rank), reported as the Zipf exponent with the fit
    R² — the distribution diagnostic behind vocabulary sizing and
    coverage planning (`llm_tokenizer_coverage` shows WHERE the mass
    is; this says HOW FAST the tail decays, and an exponent far from
    ~1 flags a synthetic or truncated corpus).

    Log-points are quantized to round(ln·{ZIPF_SCALE}) BIGINTs, so the
    regression moments are exact integer sums (associative partials —
    the same fixed-point OLS discipline as `ml_ols_normal_eq`, here
    applied to transcendental inputs: the ln calls agree across
    engines and the 1e-5 quantization absorbs any final-ulp
    disagreement risk at rounding boundaries).  The fit needs EVERY
    rank (the whole log-log line, not a top-K prefix), and the trigram
    type grain is unbounded at web scale, so the rank is
    :func:`distrank.global_rank` — the two-pass range-partitioned
    distributed rank (per-partition row_number + broadcast offsets),
    never a single-partition ``Window.orderBy`` over all types.
    """
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    n_g = F.greatest(F.size("w") - 2, F.lit(0))
    tri = F.zip_with(
        F.slice("w", 1, n_g),
        F.zip_with(
            F.slice("w", 2, n_g),
            F.slice("w", 3, n_g),
            lambda b, c: F.concat_ws(" ", b, c),
        ),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    g = (
        d.select(ws.alias("w"))
        .filter(F.size("w") >= 3)
        .select(F.explode(tri).alias("t"))
    )
    freq = g.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    ranked = global_rank(freq, [F.desc("f"), F.asc("t")], rank_col="rk")
    pts = ranked.select(
        F.round(F.log(F.col("rk").cast("double")) * ZIPF_SCALE)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * ZIPF_SCALE)
        .cast("long")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(-num / denx, 6).alias("zipf_exponent"),
        F.round((num * num) / (denx * deny), 6).alias("r2"),
    )


TOKEN_BUDGET = 20_000  #: per-source token cap for the budgeted sampler


@query(
    "llm_source_token_budget",
    oracle=f"""
    WITH w AS (
        SELECT source, doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
        FROM documents),
    c AS (
        SELECT source, doc_id, n_tok,
               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS cum
        FROM w)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_total,
           CAST(sum(CASE WHEN cum <= {TOKEN_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN cum <= {TOKEN_BUDGET} THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           round(sum(CASE WHEN cum <= {TOKEN_BUDGET} THEN n_tok ELSE 0 END)
                 * 1.0 / {TOKEN_BUDGET}, 6) AS budget_utilization
    FROM c
    GROUP BY source
    """,
)
def llm_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budgeting: admit documents in a deterministic
    order until each source's token allowance is spent — how a dataset
    mixture enforces "no more than N tokens of source X" without a
    second pass.

    One window cumsum per source (single hash partition by the mixing
    key) and a per-source rollup.  The admit decision is a pure
    function of (source, doc_id) order, so re-runs and backfills admit
    the same documents — the property that makes the budget
    reproducible across pipeline runs.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tok"),
    )
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = w.withColumn("cum", F.sum("n_tok").over(win))
    kept = F.col("cum") <= TOKEN_BUDGET
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_docs_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("tokens_kept"),
        F.round(
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
            / TOKEN_BUDGET,
            6,
        ).alias("budget_utilization"),
    )


CURRICULUM_STAGES = 5


@query(
    "llm_curriculum_order",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               list_filter(string_split(lower(text), ' '),
                           x -> len(x) > 0) AS ws
        FROM documents),
    sc AS (
        SELECT doc_id, source,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(ws, x -> len(x)))
                    * 1000 // greatest(len(ws), 1) AS BIGINT)
                   AS difficulty_milli
        FROM d),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY difficulty_milli, doc_id)
                      AS rk,
               count(*) OVER () AS n
        FROM sc)
    SELECT CAST((rk - 1) * {CURRICULUM_STAGES} // n AS BIGINT) AS stage,
           CAST(count(*) AS BIGINT)          AS n_docs,
           CAST(min(difficulty_milli) AS BIGINT) AS min_difficulty,
           CAST(max(difficulty_milli) AS BIGINT) AS max_difficulty,
           CAST(sum(n_words) AS BIGINT)      AS total_words
    FROM ranked
    GROUP BY 1
    """,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: rank the corpus easy→hard and cut it
    into equal training stages — the ordering step behind
    curriculum-learning schedules.

    Difficulty is mean word length in exact integer milli-units
    (``total_chars·1000 div n_words``), so the global ordering is
    integer-deterministic with a doc_id tie-break (the repo's ranking
    convention for scores).  Documents are an unbounded grain, so the
    global rank is :func:`distrank.global_rank` — the two-pass
    distributed rank (range shuffle + partitioned local row_number +
    broadcast offsets), never a single-partition ``Window.orderBy``
    pass — and stages are equal row-count slices of that rank.
    """
    d = load_table(spark, sf_dir, "documents")
    # `div` (not `/`): Spark `/` is double division and CAST truncates,
    # while the oracle's `//` floors — integer `div` keeps both exact.
    sc = d.select(
        "doc_id",
        F.expr(
            "CAST(size(filter(split(lower(text), ' '), "
            "x -> length(x) > 0)) AS BIGINT)"
        ).alias("n_words"),
        F.expr(
            "aggregate(transform(filter(split(lower(text), ' '), "
            "x -> length(x) > 0), x -> CAST(length(x) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x) * 1000 div "
            "greatest(size(filter(split(lower(text), ' '), "
            "x -> length(x) > 0)), 1)"
        ).alias("difficulty_milli"),
    )
    ranked = global_rank(
        sc,
        [F.asc("difficulty_milli"), F.asc("doc_id")],
        rank_col="rk",
        total_col="n",
    ).select("n_words", "difficulty_milli", "rk", "n")
    stage = F.expr(f"(rk - 1) * {CURRICULUM_STAGES} div n")
    return ranked.groupBy(stage.alias("stage")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("difficulty_milli").alias("min_difficulty"),
        F.max("difficulty_milli").alias("max_difficulty"),
        F.sum("n_words").alias("total_words"),
    )


STRATA_CAP = 30  #: per-label sample cap for the stratified sampler


@query(
    "llm_label_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT label, vec_id,
               row_number() OVER (PARTITION BY label ORDER BY vec_id)
                   AS rk
        FROM embeddings)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN rk <= {STRATA_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(min(CASE WHEN rk <= {STRATA_CAP} THEN vec_id END)
                AS BIGINT) AS first_kept,
           CAST(max(CASE WHEN rk <= {STRATA_CAP} THEN vec_id END)
                AS BIGINT) AS last_kept
    FROM ranked
    GROUP BY label
    """,
)
def llm_label_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: cap every label's contribution at a
    fixed count — the balancing step before training a probe/classifier
    on skewed clusters.

    One window ``row_number`` per label (single hash partition on the
    stratum key) with a deterministic vec_id order, so the selected
    sample is stable across runs; the per-label audit row is what the
    dataset card records.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    ranked = e.select(
        "label", "vec_id", F.row_number().over(w).alias("rk")
    )
    kept = F.col("rk") <= STRATA_CAP
    return ranked.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.min(F.when(kept, F.col("vec_id"))).cast("long").alias("first_kept"),
        F.max(F.when(kept, F.col("vec_id"))).cast("long").alias("last_kept"),
    )


# --------------------------------------------------------------------------
# DSIR-style hashed-ngram importance weights (round 5)
# --------------------------------------------------------------------------

DSIR_DIM = 128
DSIR_TARGET_LANG = "en"


@query(
    "llm_dsir_importance",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS words
        FROM documents),
    hb AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)
                   % {DSIR_DIM} AS bucket
        FROM (SELECT doc_id, lang,
                     unnest([words[i] || ' ' || words[i+1]
                             for i in generate_series(1, len(words) - 1)])
                         AS gram
              FROM w)),
    vec AS (
        SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM hb GROUP BY 1, 2),
    corp AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS c_g,
               CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS t_g
        FROM hb GROUP BY bucket),
    tot AS (
        SELECT CAST(sum(c_g) AS BIGINT) AS c_tot,
               CAST(sum(t_g) AS BIGINT) AS t_tot
        FROM corp),
    lam AS (
        SELECT bucket,
               CAST(round(1e6 * ln(
                    (CAST((t_g + 1) * (tot.c_tot + {DSIR_DIM}) AS DOUBLE))
                  / (CAST((c_g + 1) * (tot.t_tot + {DSIR_DIM}) AS DOUBLE))))
                    AS BIGINT) AS lam_unats
        FROM corp CROSS JOIN tot)
    SELECT v.doc_id, d.lang,
           CAST(sum(v.cnt) AS BIGINT)                 AS n_bigrams,
           CAST(sum(v.cnt * l.lam_unats) AS BIGINT)   AS score_unats
    FROM vec v
    JOIN lam l USING (bucket)
    JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """,
)
def llm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    public): score every document by how much its hashed-bigram
    distribution looks like the TARGET slice (English docs) versus the
    whole corpus — the importance-resampling signal used to pick
    pretraining data that matches a high-quality target domain.

    Bigrams hash into a fixed {DSIR_DIM}-bucket space with the
    engine-portable md5-prefix hash (``ml_feature_hashing``'s trick),
    so no vocabulary is built and the bucket log-likelihood-ratio
    table λ_g = ln(p̂_target(g)/p̂_corpus(g)) (Laplace-smoothed) is a
    {DSIR_DIM}-row broadcast no matter the corpus size.  λ is
    quantized to integer micro-nats BEFORE the per-document
    sum Σ cnt_g·λ_g, so document scores are exact integer dot
    products — order-independent across engines and partitionings.
    One tokenize pass, two associative aggregates, one broadcast join.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    n = F.size(words) - 1
    grams = F.zip_with(
        F.slice(words, 1, n),
        F.slice(words, 2, n),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    hb = (
        d.filter(F.size(words) >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(grams).alias("gram"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
                % DSIR_DIM
            ).alias("bucket"),
        )
        # Persisted: the hashed-bigram stream feeds BOTH the per-doc
        # vectors and the corpus bucket totals (round-7 sweep).
        .transform(cached)
    )
    # lang is functionally dependent on doc_id, so carrying it as a
    # group key is free and avoids re-joining the (at scale,
    # unbroadcastable) documents table for it.
    vec = hb.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    corp = hb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_g"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("t_g"),
    )
    tot = corp.agg(
        F.sum("c_g").alias("c_tot"), F.sum("t_g").alias("t_tot")
    )
    lam = corp.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            1e6
            * F.log(
                ((F.col("t_g") + 1) * (F.col("c_tot") + DSIR_DIM)).cast(
                    "double"
                )
                / ((F.col("c_g") + 1) * (F.col("t_tot") + DSIR_DIM)).cast(
                    "double"
                )
            )
        )
        .cast("long")
        .alias("lam_unats"),
    )
    return (
        vec.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("lam_unats")).alias("score_unats"),
        )
    )


# --------------------------------------------------------------------------
# Held-out cross-entropy of a train-split unigram LM (round 5)
# --------------------------------------------------------------------------


@query(
    "llm_heldout_cross_entropy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
    tr AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE doc_id % 5 < 4 GROUP BY w),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT)   AS t,
               CAST(count(*) AS BIGINT) AS v
        FROM tr),
    ho AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
        FROM tok WHERE doc_id % 5 = 4 GROUP BY doc_id, w),
    lam AS (
        SELECT ho.doc_id, ho.cnt,
               CAST(round(1e6 * ln(CAST(tot.t + tot.v AS DOUBLE)
                                   / (coalesce(tr.c, 0) + 1)))
                    AS BIGINT) AS lam,
               CASE WHEN tr.c IS NULL THEN 1 ELSE 0 END AS oov
        FROM ho LEFT JOIN tr USING (w) CROSS JOIN tot)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT)       AS n_toks,
           CAST(sum(cnt * oov) AS BIGINT) AS n_oov,
           CAST(sum(cnt * lam) AS BIGINT) AS nll_unats
    FROM lam GROUP BY doc_id
    """,
)
def llm_heldout_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model evaluation: train a Laplace-smoothed
    unigram LM on the 80% train split (doc_id mod 5 < 4) and score
    every HELD-OUT document's negative log-likelihood — the
    train/eval-split discipline that ``llm_perplexity_unigram`` (fit
    and scored on the same corpus) deliberately does not have, and the
    quality signal data-curation loops sort by (high held-out NLL =
    out-of-distribution or noisy).

    Token NLLs are quantized to integer micro-nats at the TYPE level
    (one λ per vocabulary word) before the per-document Σ cnt·λ, so
    scores are exact integers; OOV tokens take the λ of count 0
    through the same smoothed formula via the left join.  The
    vocabulary join hashes on the token — it scales with corpus
    vocabulary and is never broadcast; only the 1-row (T, V) scalar
    is.
    """
    d = load_table(spark, sf_dir, "documents")
    # Persisted: the token explode feeds the train and held-out
    # branches; tr feeds its scalar totals and the scoring join
    # (round-7 twice-consumed-frame sweep).
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).transform(cached)
    tr = (
        tok.filter(F.col("doc_id") % 5 < 4)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(cached)
    )
    tot = tr.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")
    )
    ho = (
        tok.filter(F.col("doc_id") % 5 == 4)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lam = (
        ho.join(tr, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "cnt",
            F.round(
                1e6
                * F.log(
                    (F.col("t") + F.col("v")).cast("double")
                    / (F.coalesce(F.col("c"), F.lit(0)) + 1)
                )
            )
            .cast("long")
            .alias("lam"),
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    return lam.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_toks"),
        F.sum(F.col("cnt") * F.col("oov")).alias("n_oov"),
        F.sum(F.col("cnt") * F.col("lam")).alias("nll_unats"),
    )


# --------------------------------------------------------------------------
# Span-corruption planning (round 7)
# --------------------------------------------------------------------------

#: T5-style span corruption: target corrupt rate (percent) and mean
#: span length (tokens).
CORRUPT_PCT = 15
SPAN_LEN = 3

#: Minimum tokens for a document to receive any corruption span.
CORRUPT_MIN_TOK = 8


@query(
    "llm_span_corruption_plan",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                   AS n_tok
        FROM documents),
    pl AS (
        SELECT doc_id, source, n_tok,
               greatest(CAST(1 AS BIGINT),
                        (n_tok * {CORRUPT_PCT} // 100) // {SPAN_LEN})
                   AS n_spans
        FROM w WHERE n_tok >= {CORRUPT_MIN_TOK}),
    ex AS (
        SELECT doc_id, source, n_spans, n_tok,
               unnest(range(1, n_spans + 1)) AS j
        FROM pl),
    sp AS (
        SELECT source, n_spans, n_tok, j,
               1 + CAST('0x' || substr(md5(
                       CAST(doc_id AS VARCHAR) || ':'
                       || CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
                   % (n_tok - {SPAN_LEN}) AS start
        FROM ex)
    SELECT source,
           CAST(count(DISTINCT n_tok * 1000000 + start) AS BIGINT)
               AS n_distinct_slots,
           CAST(count(*) AS BIGINT)          AS n_spans,
           CAST(sum(start) AS BIGINT)        AS span_start_checksum,
           round(CAST(count(*) * {SPAN_LEN} AS DOUBLE)
                 / sum(CASE WHEN j = 1 THEN n_tok ELSE 0 END), 6)
               AS corrupt_rate
    FROM sp GROUP BY source
    """,
)
def llm_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLAN: for every document long enough,
    decide how many {SPAN_LEN}-token spans to mask (≈{CORRUPT_PCT}% of
    tokens) and WHERE — span starts drawn by the engine-portable
    md5-prefix hash of (doc_id, span#), so the masking layout is
    reproducible across engines, runs, and cluster sizes with no RNG
    state.  The planning stage every masked-LM data pipeline runs
    ahead of tokenization; reported per source as span counts plus an
    exact integer start-position checksum (the cross-engine witness
    that BOTH engines drew identical spans).

    Spans explode from a bounded ``sequence(1, n_spans)`` per doc —
    n_spans ≈ tokens/20, so the expansion is linear in corpus tokens
    and embarrassingly parallel; everything is exact integer
    arithmetic (``div``/``%`` lattice, no floats until the final
    shared ratio).
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    pl = (
        d.select("doc_id", "source", n_tok.alias("n_tok"))
        .filter(F.col("n_tok") >= CORRUPT_MIN_TOK)
        .withColumn(
            "n_spans",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"(n_tok * {CORRUPT_PCT} div 100) div {SPAN_LEN}"
                ),
            ),
        )
    )
    sp = pl.select(
        "doc_id",
        "source",
        "n_spans",
        "n_tok",
        F.explode(F.sequence(F.lit(1), F.col("n_spans"))).alias("j"),
    ).withColumn(
        "start",
        1
        + F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("j"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("n_tok") - SPAN_LEN),
    )
    return sp.groupBy("source").agg(
        F.countDistinct(
            F.col("n_tok") * 1000000 + F.col("start")
        ).alias("n_distinct_slots"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("start").alias("span_start_checksum"),
        F.round(
            (F.count(F.lit(1)) * SPAN_LEN).cast("double")
            / F.sum(
                F.when(F.col("j") == 1, F.col("n_tok")).otherwise(
                    F.lit(0).cast("long")
                )
            ),
            6,
        ).alias("corrupt_rate"),
    )


# --------------------------------------------------------------------------
# Quality-filter funnel (round 7)
# --------------------------------------------------------------------------

@query(
    "llm_filter_funnel",
    oracle="""
    WITH f AS (
        SELECT CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS f1,
               CASE WHEN lang IN ('en', 'de', 'fr', 'es') THEN 1
                    ELSE 0 END AS f2,
               CASE WHEN len(string_split(lower(text), ' ')) >= 20
                    THEN 1 ELSE 0 END AS f3,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY
                        md5(text)) THEN 1 ELSE 0 END AS f4
        FROM documents),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS c0,
               CAST(sum(f1) AS BIGINT) AS c1,
               CAST(sum(f1 * f2) AS BIGINT) AS c2,
               CAST(sum(f1 * f2 * f3) AS BIGINT) AS c3,
               CAST(sum(f1 * f2 * f3 * f4) AS BIGINT) AS c4
        FROM f)
    SELECT 1 AS stage, 'length_min_100' AS filter_name,
           c0 AS n_in, c1 AS n_out,
           round(CAST(c1 AS DOUBLE) / c0, 6) AS pass_rate FROM c
    UNION ALL
    SELECT 2, 'lang_allowlist', c1, c2,
           round(CAST(c2 AS DOUBLE) / c1, 6) FROM c
    UNION ALL
    SELECT 3, 'min_20_words', c2, c3,
           round(CAST(c3 AS DOUBLE) / c2, 6) FROM c
    UNION ALL
    SELECT 4, 'exact_dedup_keep', c3, c4,
           round(CAST(c4 AS DOUBLE) / c3, 6) FROM c
    """,
)
def llm_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter FUNNEL: how many documents survive each stage of
    the standard curation cascade (length floor → language allowlist →
    minimum word count → exact-dup keeper) — the drop-off report every
    training-data pipeline publishes next to its dataset card, and the
    first place a mis-tuned filter shows up as a cliff.

    All four flags are computed in ONE pass (the dedup keeper flag via
    a min-over-content-hash window, partitioned by md5 so state per
    key is the duplicate-group size); cumulative survivor counts are
    exact integer sums of flag PRODUCTS (stage k counts docs passing
    stages 1..k), and the 4-row funnel is a constant-width unpivot of
    a single aggregate row.  Pass rates are one shared division per
    stage.
    """
    d = load_table(spark, sf_dir, "documents")
    w_dup = Window.partitionBy(F.md5("text"))
    f = d.select(
        F.when(F.col("n_chars") >= 100, 1).otherwise(0).alias("f1"),
        F.when(
            F.col("lang").isin("en", "de", "fr", "es"), 1
        ).otherwise(0).alias("f2"),
        F.when(
            F.size(F.split(F.lower(F.col("text")), " ")) >= 20, 1
        ).otherwise(0).alias("f3"),
        F.when(
            F.col("doc_id") == F.min("doc_id").over(w_dup), 1
        ).otherwise(0).alias("f4"),
    )
    c = f.agg(
        F.count(F.lit(1)).alias("c0"),
        F.sum("f1").alias("c1"),
        F.sum(F.col("f1") * F.col("f2")).alias("c2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).alias("c3"),
        F.sum(
            F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4")
        ).alias("c4"),
    )
    stages = [
        (1, "length_min_100", "c0", "c1"),
        (2, "lang_allowlist", "c1", "c2"),
        (3, "min_20_words", "c2", "c3"),
        (4, "exact_dedup_keep", "c3", "c4"),
    ]
    out = None
    for no, name, cin, cout in stages:
        row = c.select(
            F.lit(no).alias("stage"),
            F.lit(name).alias("filter_name"),
            F.col(cin).alias("n_in"),
            F.col(cout).alias("n_out"),
            F.round(
                F.col(cout).cast("double") / F.col(cin), 6
            ).alias("pass_rate"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# --------------------------------------------------------------------------
# Lexical-richness statistics over word trigrams (round-8 batch 70)
# --------------------------------------------------------------------------

#: DuckDB word-trigram comprehension shared by the two richness oracles
#: (same spelling as retrieval._ORACLE_GRAMS; non-distinct).
_RICH_GRAMS_CTES = """
    w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
          FROM documents),
    g AS (SELECT doc_id,
                 unnest([array_to_string(ws[i:i+2], ' ')
                         for i in generate_series(1, len(ws) - 2)]) AS t
          FROM w WHERE len(ws) >= 3)
"""


@query(
    "llm_type_token_ratio",
    oracle=f"""
    WITH {_RICH_GRAMS_CTES}
    SELECT doc_id,
           CAST(count(*) AS BIGINT)           AS n_grams,
           CAST(count(DISTINCT t) AS BIGINT)  AS n_types,
           round(count(DISTINCT t) * 1.0 / count(*), 6) AS ttr
    FROM g GROUP BY doc_id
    """,
)
def llm_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document type-token ratio over word TRIGRAMS — the lexical
    diversity score used to down-weight boilerplate/templated pages in
    pretraining mixes (unigram TTR is degenerate on this corpus's
    31-word vocabulary; the trigram space is ~vocab³).

    Computed entirely ARRAY-SIDE: ``size(grams)`` and
    ``size(array_distinct(grams))`` per row — zero explode, zero
    shuffle; the whole query is a projection over the document scan,
    which is the shape that matters at 100 TB (one pass, no
    aggregation state).  TTR is one integer division, round(,6) —
    bit-identical across engines.
    """
    d = load_table(spark, sf_dir, "documents")
    grams = _tri_grams(_words())
    return (
        d.select("doc_id", grams.alias("gs"))
        .filter(F.size("gs") > 0)
        .select(
            "doc_id",
            F.size("gs").cast("long").alias("n_grams"),
            F.size(F.array_distinct("gs")).cast("long").alias("n_types"),
            F.round(
                F.size(F.array_distinct("gs"))
                * F.lit(1.0)
                / F.size("gs"),
                6,
            ).alias("ttr"),
        )
    )


@query(
    "llm_hapax_ratio",
    oracle=f"""
    WITH {_RICH_GRAMS_CTES},
    cnt AS (SELECT t, count(*) AS c FROM g GROUP BY t),
    hap AS (SELECT t FROM cnt WHERE c = 1),
    per_doc AS (
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(hap.t) AS BIGINT) AS n_hapax
        FROM g LEFT JOIN hap ON g.t = hap.t
        GROUP BY g.doc_id)
    SELECT doc_id, n_grams, n_hapax,
           round(n_hapax * 1.0 / n_grams, 6) AS hapax_ratio
    FROM per_doc
    """,
)
def llm_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document share of corpus-hapax trigrams (trigrams occurring
    exactly ONCE in the whole corpus) — high hapax share marks novel /
    long-tail text worth up-sampling, near-zero marks boilerplate.

    Corpus-global term counts are one hash aggregate over the exploded
    gram stream; the hapax set joins back to the same stream (the
    stream is persisted — it feeds both the counting and the join).
    At 100 TB the hapax set is the vocabulary tail: it shuffle-joins
    on the gram hash, never broadcast (it can be corpus-sized).  The
    ratio is one integer division, round(,6).
    """
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select("doc_id", _tri_grams(_words()).alias("gs"))
        .filter(F.size("gs") > 0)
        .select("doc_id", F.explode("gs").alias("t"))
        .transform(cached)
    )
    hap = (
        g.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 1)
        .select("t", F.lit(1).alias("is_hap"))
    )
    per_doc = (
        g.join(hap, "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_hap").alias("n_hapax"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        F.round(F.col("n_hapax") * F.lit(1.0) / F.col("n_grams"), 6).alias(
            "hapax_ratio"
        ),
    )



KN_DISCOUNT = "0.75e0"  # absolute discount (shared literal spelling)
KN_TOPK = 30


@query(
    "llm_kneser_ney_lite",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    bg AS (SELECT unnest([{{'w1': ws[i], 'w2': ws[i + 1]}}
                          for i in generate_series(1, len(ws) - 1)]) AS p
           FROM w WHERE len(ws) >= 2),
    c2 AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY p.w1, p.w2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
                  CAST(count(*) AS BIGINT) AS n1p_fw
           FROM c2 GROUP BY w1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bw
             FROM c2 GROUP BY w2),
    types AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c2)
    SELECT c2.w1, c2.w2, c2.c,
           round(
               (CASE WHEN c2.c - {KN_DISCOUNT} > 0e0
                     THEN c2.c - {KN_DISCOUNT} ELSE 0e0 END) / c1.cw1
               + ({KN_DISCOUNT} * c1.n1p_fw / c1.cw1)
                 * (cont.n1p_bw * 1e0 / types.n_types),
               6) AS p_kn
    FROM c2
    JOIN c1 ON c1.w1 = c2.w1
    JOIN cont ON cont.w2 = c2.w2
    CROSS JOIN types
    ORDER BY c2.c DESC, c2.w1, c2.w2
    LIMIT {KN_TOPK}
    """,
)
def llm_kneser_ney_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (absolute discount
    0.75, continuation-count backoff) for the corpus's top-{KN_TOPK}
    bigrams — the classic n-gram LM smoothing whose perplexity is the
    cheap quality filter / decontamination scorer for pretraining
    corpora (the unigram sibling is ``llm_perplexity_unigram``).

    All counts (bigram, left-context, forward/backward continuation
    type counts) are exact integers from three hash aggregates over
    one exploded bigram stream; p_KN combines them in a FIXED
    expression tree of IEEE ops (max-discount, two divisions, one
    multiply-add) — identical per row in both engines, round(,6).
    Scale: the bigram stream shuffles once on (w1, w2); the
    context/continuation tables join back on their own keys (never
    broadcast — vocabulary scales with the corpus); top-k is
    TakeOrderedAndProject with full tie-break.
    """
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    n = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, 1, n),
        F.slice(ws, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        d.select(F.explode(bigrams).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(cached)  # feeds c1, cont, types AND the output join
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fw"),
    )
    cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_bw")
    )
    types = c2.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    disc = F.lit(0.75)
    p_kn = F.round(
        F.greatest(F.col("c") - disc, F.lit(0.0)) / F.col("cw1")
        + (disc * F.col("n1p_fw") / F.col("cw1"))
        * (F.col("n1p_bw") * F.lit(1.0) / F.col("n_types")),
        6,
    )
    return (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select("w1", "w2", "c", p_kn.alias("p_kn"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(KN_TOPK)
    )


# --------------------------------------------------------------------------
# Vocabulary coverage curve and dedup token savings (round 9, batch 75)
# --------------------------------------------------------------------------

#: Coverage-curve checkpoints — the "how many entries cover X% of the
#: corpus" readout is evaluated at these top-k vocabulary sizes.
#: (Named CURVE_KS: COVERAGE_KS already belongs to
#: llm_tokenizer_coverage above — a same-name redefinition desyncs
#: that query's runtime constant from its import-time-baked oracle.)
CURVE_KS = (1, 2, 4, 8, 16, 32, 64)


@query(
    "llm_ngram_coverage_curve",
    oracle=f"""
    WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
    bg AS (SELECT unnest([ws[i] || ' ' || ws[i + 1]
                          for i in generate_series(1, len(ws) - 1)]) AS b
           FROM w WHERE len(ws) >= 2),
    c AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
    r AS (SELECT c, row_number() OVER (ORDER BY c DESC, b ASC) AS rk FROM c),
    t AS (SELECT sum(c) AS total FROM r),
    ks AS (SELECT unnest([{", ".join(str(k) for k in CURVE_KS)}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(sum(r.c) AS BIGINT) AS covered_occurrences,
           round(CAST(sum(r.c) AS DOUBLE) / min(t.total), 6) AS coverage
    FROM ks JOIN r ON r.rk <= ks.k CROSS JOIN t
    GROUP BY ks.k ORDER BY k
    """,
)
def llm_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus coverage of the top-k word bigrams — the
    vocabulary-sizing readout behind tokenizer budgets ("how many
    entries cover 95% of token occurrences?").  Complements
    ``llm_vocab_zipf_fit`` (tail-decay exponent) and
    ``llm_tokenizer_coverage`` (coverage of a FIXED vocab): this is
    coverage as a FUNCTION of vocab size.

    Scale shape: the bigram explode + count is one linear
    partial+final aggregate; the curve only needs ranks ≤
    max(CURVE_KS), so the bigram-type table (strictly LARGER than the
    unigram vocab — unbounded at web scale) is pre-pruned with
    ``orderBy(...).limit(max K)`` (TakeOrderedAndProject) before the
    rank window, which then touches max(CURVE_KS) rows regardless of
    corpus size.  The coverage denominator still sums the FULL count
    table.
    """
    d = load_table(spark, sf_dir, "documents")
    ws = _words()
    n1 = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("w", 1, n1),
        F.slice("w", 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    c = (
        d.select(ws.alias("w"))
        .filter(F.size("w") >= 2)
        .select(F.explode(pairs).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(cached)  # feeds the top-K prune AND the total
    )
    # Bounded-grain window: ≤ max(CURVE_KS) rows after the limit.
    r = (
        c.orderBy(F.desc("c"), F.asc("b"))
        .limit(max(CURVE_KS))
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("b")))
            .alias("rk"),
        )
    )
    total = c.agg(F.sum("c").alias("total"))
    ks = spark.createDataFrame([(k,) for k in CURVE_KS], "k long")
    return (
        F.broadcast(ks)
        .join(r, F.col("rk") <= F.col("k"))
        .crossJoin(F.broadcast(total))
        .groupBy("k")
        .agg(
            F.sum("c").alias("covered_occurrences"),
            F.round(
                F.sum("c").cast("double") / F.min("total"), 6
            ).alias("coverage"),
        )
        .orderBy("k")
    )


@query(
    "llm_dedup_token_savings",
    oracle="""
    WITH d AS (
        SELECT doc_id, source, md5(text) AS h,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok
        FROM documents),
    k AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY h),
    f AS (SELECT d.source, d.tok,
                 CASE WHEN d.doc_id = k.keep_id THEN 0 ELSE 1 END AS removed
          FROM d JOIN k USING (h))
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(removed) AS BIGINT) AS n_removed,
           CAST(sum(tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN removed = 1 THEN tok ELSE 0 END) AS BIGINT)
               AS tokens_removed,
           round(CAST(sum(CASE WHEN removed = 1 THEN tok ELSE 0 END)
                      AS DOUBLE) / sum(tok), 6) AS savings_pct
    FROM f GROUP BY source ORDER BY source
    """,
)
def llm_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token savings from corpus-wide exact dedup — the
    curation dashboard number that justifies the dedup stage ("N% of
    source X's token budget is byte-identical copies").  Keeps the
    ``llm_dedup_exact`` keep-first-doc_id convention so the two
    queries reconcile row-for-row.

    Scale shape: md5 groupBy (linear, same as ``llm_dedup_exact``) +
    one hash join back on the digest + a per-source partial+final
    aggregate; nothing pairwise anywhere.  The savings ratio is one
    correctly rounded division of exact BIGINTs.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("tok"),
    )
    k = d.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    f = d.join(k, "h").select(
        "source",
        "tok",
        F.when(F.col("doc_id") == F.col("keep_id"), 0).otherwise(1).alias("removed"),
    )
    rem_tok = F.sum(F.when(F.col("removed") == 1, F.col("tok")).otherwise(0))
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("removed").cast("long").alias("n_removed"),
            F.sum("tok").alias("tokens_total"),
            rem_tok.alias("tokens_removed"),
            F.round(rem_tok.cast("double") / F.sum("tok"), 6).alias("savings_pct"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Content-defined chunking for chunk-level dedup (round 9, batch 76)
# --------------------------------------------------------------------------

CDC_WIN = 8  #: rolling-window width (words) fed to the boundary hash
CDC_MODULUS = 64  #: boundary when hash % this == 0 → ~64-word mean chunk


@query(
    "llm_cdc_chunking",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
               FROM documents),
    t AS (SELECT doc_id, source,
                 unnest(ws) AS w,
                 unnest(range(1, len(ws) + 1)) AS pos
          FROM w),
    g AS (SELECT doc_id, source, w, pos,
                 concat_ws(' ',
                     lag(w, 7) OVER dw, lag(w, 6) OVER dw,
                     lag(w, 5) OVER dw, lag(w, 4) OVER dw,
                     lag(w, 3) OVER dw, lag(w, 2) OVER dw,
                     lag(w, 1) OVER dw, w) AS gram
          FROM t WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
    b AS (SELECT doc_id, source, w, pos,
                 CASE WHEN pos >= {CDC_WIN}
                       AND CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                           % {CDC_MODULUS} = 0
                      THEN 1 ELSE 0 END AS boundary
          FROM g),
    c AS (SELECT doc_id, source, w, pos,
                 sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS chunk_id
          FROM b),
    ch AS (SELECT doc_id, source, chunk_id,
                  count(*) AS words,
                  md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_hash
           FROM c GROUP BY doc_id, source, chunk_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks,
           round(CAST(count(*) - count(DISTINCT chunk_hash) AS DOUBLE)
                 / count(*), 6) AS dup_ratio,
           round(CAST(sum(words) AS DOUBLE) / count(*), 6) AS avg_words
    FROM ch GROUP BY source ORDER BY source
    """,
)
def llm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin/LBFS-style): a chunk boundary
    falls wherever the rolling hash of the last {CDC_WIN} words is ≡ 0
    mod {CDC_MODULUS}, so chunk boundaries are a function of CONTENT,
    not position — inserting a sentence shifts at most the chunk it
    lands in, and identical passages chunk identically in every
    document.  That is the property that makes chunk-hash dedup work
    where fixed-width shingles fail (the storage/dedup literature's
    standard trick, here as the corpus-curation readout: per-source
    chunk duplication ratio and mean chunk length).

    Scale shape: one linear posexplode; the rolling gram is {CDC_WIN}
    per-doc ``lag``s inside a doc-partitioned window (bounded by doc
    length, fully parallel across docs); chunk ids are a per-doc
    running sum; chunk hashing is one linear groupBy.  The boundary
    hash reuses the portable md5-prefix→BIGINT idiom
    (``conv(substr(md5,1,8),16,10)`` ≡ DuckDB ``'0x'||…`` cast), so
    the statistic is engine-exact end to end.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "w"),
    ).select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "w")
    dw = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", *[F.lag("w", k).over(dw) for k in range(CDC_WIN - 1, 0, -1)], F.col("w")
    )
    b = t.select(
        "doc_id",
        "source",
        "w",
        "pos",
        F.when(
            (F.col("pos") >= CDC_WIN)
            & (
                F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
                % CDC_MODULUS
                == 0
            ),
            1,
        )
        .otherwise(0)
        .alias("boundary"),
    )
    c = b.select(
        "doc_id",
        "source",
        "w",
        "pos",
        F.sum("boundary")
        .over(dw.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("chunk_id"),
    )
    ch = c.groupBy("doc_id", "source", "chunk_id").agg(
        F.count(F.lit(1)).alias("words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("w")))
                    ),
                    lambda s: s.getField("w"),
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )
    n = F.count(F.lit(1))
    dc = F.countDistinct("chunk_hash")
    return (
        ch.groupBy("source")
        .agg(
            n.alias("n_chunks"),
            dc.alias("distinct_chunks"),
            F.round((n - dc).cast("double") / n, 6).alias("dup_ratio"),
            F.round(F.sum("words").cast("double") / n, 6).alias("avg_words"),
        )
        .orderBy("source")
    )
