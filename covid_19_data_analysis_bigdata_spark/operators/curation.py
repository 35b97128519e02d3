"""Corpus-curation operators round 3: span-level dedup, PII scrubbing,
deterministic train/val/test splitting, perplexity scoring, and MMR
retrieval diversification.

These extend the training-data-pipeline surface (SURVEY.md §2 cat. 10
extensions) with curation steps the existing doc-level dedup /
quality / mix operators do not cover:

- **Span-level exact dedup** (Lee et al., "Deduplicating Training Data
  Makes Language Models Better"): duplicated substrings *within*
  otherwise-unique documents are the dominant memorization vector; the
  unit of dedup must drop below the document.
- **PII scrubbing**: redaction of emails / phone numbers / IP addresses
  with audited counts — a compliance gate every production corpus pass
  runs.
- **Deterministic split assignment**: hash-gated train/val/test labels
  that are stable across engines, runs, and cluster sizes (a random
  split silently leaks eval data on every backfill).
- **Perplexity-filter scoring** (CCNet shape): per-document LM
  cross-entropy against an exactly-reproducible unigram model.
- **MMR diversification**: the diversity-aware re-ranking step between
  ANN retrieval and a RAG context window.

Cross-engine determinism: span keys are md5 hex digests (bit-identical
in Spark and DuckDB); the split gate reuses the portable polynomial
hash verified bit-for-bit in textprep.py; all ratios are rounded 4dp on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.cache import cached
from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.operators.llm import FUZZY_PAIRS_CTES
from covid_19_data_analysis_bigdata_spark.operators.textprep import (
    _POLY_SQL,
    _polyhash,
    _words,
)
from covid_19_data_analysis_bigdata_spark.sources.io import load_table

#: Span width (tokens) for exact substring-level dedup.  Lee et al. use
#: 50 BPE tokens on web text; the synthetic corpus documents are only
#: ~10-100 words, so 15 keeps span counts meaningful at every sf.
SPAN_W = 15

#: Redaction patterns — RE2 ⊆ Java-regex compatible subset (no
#: lookaround, no backreferences) so Spark and DuckDB match identically.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Deterministic pseudo-PII injected onto a doc_id-gated subset (the
#: corpus text is synthetic and PII-free); makes the scrub measurable
#: while keeping the whole fixture reproducible from doc_id alone.
_AUG_SQL = (
    "text || CASE WHEN doc_id % 7 = 0 THEN ' contact doc' || "
    "CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END "
    "|| CASE WHEN doc_id % 11 = 0 THEN ' dial 555-0142 from 10.0.0.7' "
    "ELSE '' END"
)


def _augmented_text() -> F.Column:
    """Spark twin of :data:`_AUG_SQL` (same concatenation, same gates)."""
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact doc"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit(" dial 555-0142 from 10.0.0.7"),
        ).otherwise(F.lit("")),
    )


@query(
    "llm_span_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
               FROM documents),
    sp AS (SELECT doc_id,
                  unnest([md5(array_to_string(words[i:i+{SPAN_W - 1}], ' '))
                          for i in generate_series(1, len(words) - {SPAN_W - 1})]) AS h
           FROM w WHERE len(words) >= {SPAN_W}),
    dup AS (SELECT h
            FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM sp GROUP BY h)
            WHERE nd >= 2)
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN dup.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dup_spans,
           round(CAST(sum(CASE WHEN dup.h IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                 / count(*), 4) AS dup_frac
    FROM sp LEFT JOIN dup ON sp.h = dup.h
    GROUP BY sp.doc_id
    """,
)
def llm_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection below the document level.

    Every sliding window of {SPAN_W} consecutive tokens is keyed by its
    md5 digest; a span present in ≥2 distinct documents is duplicated,
    and each document reports its duplicated-span fraction — the signal
    substring-level dedup (Lee et al. 2022) trims on, which doc-level
    dedup (exact/MinHash/SimHash, all present in this repo) cannot see.

    Scale shape: the explode is a constant ×(len−W+1) fan-out of the
    corpus with 32-byte keys (md5 hex, never the span text), the
    dup-span set comes from one hash aggregation on the span key, and
    the per-doc rollup is a second hash aggregation after an equi-join
    on the same key — all shuffle-partitioned by span hash, no skew
    (digests are uniform), no all-pairs stage at any point.
    """
    # r14 note (guide §1.3, measured): a ``spread`` of the scan was
    # tried and REVERTED (drill medians 1.41 s -> 3.29 s): the md5
    # window pass lives in the cached frame (paid once), and the
    # sample-path dup-aggregate + span join run faster from the
    # few-partition cache than 32-way scheduled.
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _words().alias("words"))
        .filter(F.size("words") >= SPAN_W)
    )
    spans = F.transform(
        F.sequence(F.lit(1), F.size("words") - (SPAN_W - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice("words", i, SPAN_W))),
    )
    # Persisted: the span explode (an md5 per sliding window — the
    # query's dominant cost) feeds BOTH the dup-set aggregate and the
    # per-doc join; without the barrier it executes twice (the
    # round-7 edge-support lesson).  At cluster scale this is a
    # MEMORY_AND_DISK frame of 32-byte keys — still far cheaper than
    # re-hashing the corpus.
    sp = d.select("doc_id", F.explode(spans).alias("h")).transform(cached)
    dup = (
        sp.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    per = sp.join(dup, "h", "left")
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup_spans"),
        F.round(
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("dup_frac"),
    )


@query(
    "llm_pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, source, {_AUG_SQL} AS t FROM documents),
    hits AS (SELECT source,
                    len(regexp_extract_all(t, '{PII_EMAIL}')) AS e,
                    len(regexp_extract_all(t, '{PII_PHONE}')) AS p,
                    len(regexp_extract_all(t, '{PII_IP}'))    AS ip,
                    regexp_replace(regexp_replace(regexp_replace(t,
                        '{PII_EMAIL}', '[EMAIL]', 'g'),
                        '{PII_IP}', '[IP]', 'g'),
                        '{PII_PHONE}', '[PHONE]', 'g') AS red
             FROM aug)
    SELECT source,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(e) AS BIGINT)    AS n_emails,
           CAST(sum(p) AS BIGINT)    AS n_phones,
           CAST(sum(ip) AS BIGINT)   AS n_ips,
           round(CAST(sum(CASE WHEN e + p + ip > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS pii_rate,
           CAST(sum(len(regexp_extract_all(red, '{PII_EMAIL}'))
                    + len(regexp_extract_all(red, '{PII_PHONE}'))
                    + len(regexp_extract_all(red, '{PII_IP}'))) AS BIGINT)
               AS n_residual
    FROM hits
    GROUP BY source
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction audit per source.

    Emails, phone fragments, and IPv4 literals are counted and then
    redacted with class tags; ``n_residual`` re-scans the REDACTED text
    and must be 0 — the self-check that proves the replace patterns
    cover exactly what the detectors match (IP before PHONE: an IPv4
    octet pair would otherwise re-match the phone pattern).  The corpus
    text is synthetic/PII-free, so a deterministic doc_id-gated
    augmentation injects known PII first — the operator's dataflow is
    what a real scrub pass runs; only the fixture is synthetic.

    Scale shape: every regex is row-local inside one codegen stage
    (count + replace in a single projection), then a partial+final hash
    aggregation on ``source`` — zero shuffles beyond the final rollup;
    cost is linear in corpus bytes, the shape a 100 TB compliance scrub
    needs.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "t", _augmented_text()
    )

    def n_matches(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))

    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL, "[EMAIL]"),
            PII_IP,
            "[IP]",
        ),
        PII_PHONE,
        "[PHONE]",
    )
    scored = d.select(
        "source",
        n_matches(F.col("t"), PII_EMAIL).alias("e"),
        n_matches(F.col("t"), PII_PHONE).alias("p"),
        n_matches(F.col("t"), PII_IP).alias("ip"),
        red.alias("red"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("e").alias("n_emails"),
        F.sum("p").alias("n_phones"),
        F.sum("ip").alias("n_ips"),
        F.round(
            F.sum((F.col("e") + F.col("p") + F.col("ip") > 0).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("pii_rate"),
        F.sum(
            n_matches(F.col("red"), PII_EMAIL)
            + n_matches(F.col("red"), PII_PHONE)
            + n_matches(F.col("red"), PII_IP)
        ).alias("n_residual"),
    )


@query(
    "llm_train_val_split",
    oracle=f"""
    WITH h AS (SELECT source,
                      {_POLY_SQL.format(col="CAST(doc_id AS VARCHAR)")} % 100
                          AS hh
               FROM documents),
    s AS (SELECT source,
                 CASE WHEN hh < 90 THEN 'train'
                      WHEN hh < 95 THEN 'val'
                      ELSE 'test' END AS split
          FROM h),
    c AS (SELECT source, split, count(*) AS n_docs FROM s GROUP BY 1, 2),
    t AS (SELECT source, sum(n_docs) AS tot FROM c GROUP BY 1)
    SELECT c.source, c.split,
           CAST(c.n_docs AS BIGINT) AS n_docs,
           round(CAST(c.n_docs AS DOUBLE) / t.tot, 4) AS share
    FROM c JOIN t USING (source)
    """,
)
def llm_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment, audited per source.

    The gate is the portable polynomial hash of the document id modulo
    100 — a pure row-local integer predicate: stable across engines,
    runs, partitionings, and incremental backfills (any subset of the
    corpus makes the identical assignment, so eval can never leak into
    train on a re-run).  Contrast with ``llm_dataset_mix``, which
    *samples* a subset; this op *partitions* the corpus exhaustively.

    Scale shape: one hash aggregation on (source, split) plus a
    broadcast of the tiny per-source totals — no other shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    hh = _polyhash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(hh < 90, F.lit("train"))
        .when(hh < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    c = d.select("source", split.alias("split")).groupBy(
        "source", "split"
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = c.groupBy("source").agg(F.sum("n_docs").alias("tot"))
    return c.join(F.broadcast(tot), "source").select(
        "source",
        "split",
        "n_docs",
        F.round(F.col("n_docs") / F.col("tot").cast("double"), 4).alias(
            "share"
        ),
    )


@query(
    "llm_perplexity_unigram",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    uni AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT sum(c) AS t FROM uni),
    scored AS (
        SELECT tok.doc_id,
               count(*) AS n_tokens,
               sum(-ln(CAST(uni.c AS DOUBLE) / tot.t)) AS nll
        FROM tok JOIN uni USING (tok) CROSS JOIN tot
        GROUP BY tok.doc_id),
    rounded AS (
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               round(nll / n_tokens, 4) AS ce,
               CAST(round(round(nll / n_tokens, 4) * 10000) AS BIGINT)
                   AS ce_int
        FROM scored),
    stats AS (SELECT sum(ce_int) AS s, count(*) AS cnt FROM rounded)
    SELECT doc_id,
           n_tokens,
           ce AS cross_entropy,
           CASE WHEN ce_int * cnt > s THEN true ELSE false END AS above_avg
    FROM rounded CROSS JOIN stats
    """,
)
def llm_perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document — the perplexity-filter
    quality signal (CCNet / ReadWeb pipelines score documents with a
    language model and drop the high-perplexity tail; the unigram LM is
    that dataflow with an exactly-reproducible model).

    The "model" is the corpus's own unigram distribution: a two-level
    dataflow — groupBy(tok) count (constant per-key state via map-side
    partial aggregation) then a de-hinted join back onto the token
    stream.  Neither half concentrates a Zipf-head token's full
    posting in one task: the count aggregate combines map-side, and
    the scoring join gets AQE's runtime strategy choice
    (broadcast-convert when the model is actually small, skew-split
    the hot-token partitions of a sort-merge join at corpus scale) —
    mitigation a count window PARTITIONED BY tok cannot get, since a
    window partition is always one task regardless of volume (~5% of
    a web corpus is the single hottest token).  ``above_avg`` is
    computed in EXACT integer arithmetic:
    each 4dp cross-entropy becomes an integer (ce·10⁴) and the
    comparison is ``ce_int · count > Σ ce_int`` — equivalent to
    "above the mean of the rounded values" with no float accumulation
    anywhere, so the boolean is bit-identical across engines regardless
    of summation order (a float mean differing in the last ulp could
    flip a document sitting on the boundary).
    """
    d = load_table(spark, sf_dir, "documents")
    # Persisted: the token explode feeds the model count, the scalar
    # total, AND the scoring join (round-7 twice-consumed-frame sweep).
    tok = d.select("doc_id", F.explode(_words()).alias("tok")).transform(cached)
    # tot = total token count — one scalar, from the persisted explode.
    tot = tok.agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    # Unigram model: groupBy count (map-side partials keep per-key
    # state constant), joined back WITHOUT a hint — the unigram TYPE
    # count is unbounded at 100 TB (10⁸–10⁹ types of web text), so
    # nothing vocabulary-sized may be hard-coded onto one executor;
    # AQE broadcast-converts when the model is actually small and
    # skew-splits the Zipf-head partitions of a sort-merge join.  A
    # count window PARTITIONED BY tok would instead put the hottest
    # token's entire posting (~5% of the corpus) in ONE task, with no
    # AQE mitigation (round-10 ADVICE finding).
    uc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        tok.join(uc, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(-F.log(F.col("c").cast("double") / F.col("t"))).alias(
                "nll"
            ),
        )
    )
    rounded = scored.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("nll") / F.col("n_tokens"), 4).alias("ce"),
        F.round(F.round(F.col("nll") / F.col("n_tokens"), 4) * 10000, 0)
        .cast("bigint")
        .alias("ce_int"),
    )
    stats = rounded.agg(
        F.sum("ce_int").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    return rounded.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "n_tokens",
        F.col("ce").alias("cross_entropy"),
        # exact integer comparison — see docstring; no float mean anywhere
        (F.col("ce_int") * F.col("cnt") > F.col("s")).alias("above_avg"),
    )


MMR_LAMBDA = 0.5
MMR_POOL = 20
MMR_K = 5


@query(
    "llm_mmr_diversify",
    oracle="""
    WITH emb AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, v AS pv FROM emb WHERE vec_id < 10),
    cand AS (
        SELECT p.probe_id, e.vec_id AS cand_id,
               CAST(round(round(list_cosine_similarity(p.pv, e.v), 6)
                    * 1000000) AS BIGINT) AS simq,
               e.v AS cv
        FROM probes p JOIN emb e ON e.vec_id <> p.probe_id),
    pool AS (
        SELECT probe_id, cand_id, simq, cv
        FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY simq DESC, cand_id) AS rk FROM cand)
        WHERE rk <= 20),
    pairs AS (
        SELECT a.probe_id, a.cand_id AS i, b.cand_id AS j,
               CAST(round(round(list_cosine_similarity(a.cv, b.cv), 6)
                    * 1000000) AS BIGINT) AS ps
        FROM pool a JOIN pool b ON a.probe_id = b.probe_id),
    s1 AS (
        SELECT probe_id, cand_id, simq, simq AS score_int
        FROM (SELECT probe_id, cand_id, simq, row_number() OVER (
                  PARTITION BY probe_id ORDER BY simq DESC, cand_id) AS rn
              FROM pool) WHERE rn = 1),
    c2 AS (
        SELECT p.probe_id, p.cand_id, p.simq,
               p.simq - max(pr.ps) AS score_int
        FROM pool p
        JOIN pairs pr ON pr.probe_id = p.probe_id AND pr.i = p.cand_id
        JOIN s1 s ON s.probe_id = pr.probe_id AND s.cand_id = pr.j
        WHERE NOT EXISTS (SELECT 1 FROM s1 x
                          WHERE x.probe_id = p.probe_id
                            AND x.cand_id = p.cand_id)
        GROUP BY p.probe_id, p.cand_id, p.simq),
    s2 AS (
        SELECT probe_id, cand_id, simq, score_int
        FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY score_int DESC, simq DESC, cand_id) AS rn FROM c2)
        WHERE rn = 1),
    sel2 AS (SELECT probe_id, cand_id FROM s1
             UNION ALL SELECT probe_id, cand_id FROM s2),
    c3 AS (
        SELECT p.probe_id, p.cand_id, p.simq,
               p.simq - max(pr.ps) AS score_int
        FROM pool p
        JOIN pairs pr ON pr.probe_id = p.probe_id AND pr.i = p.cand_id
        JOIN sel2 s ON s.probe_id = pr.probe_id AND s.cand_id = pr.j
        WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                          WHERE x.probe_id = p.probe_id
                            AND x.cand_id = p.cand_id)
        GROUP BY p.probe_id, p.cand_id, p.simq),
    s3 AS (
        SELECT probe_id, cand_id, simq, score_int
        FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY score_int DESC, simq DESC, cand_id) AS rn FROM c3)
        WHERE rn = 1),
    sel3 AS (SELECT probe_id, cand_id FROM sel2
             UNION ALL SELECT probe_id, cand_id FROM s3),
    c4 AS (
        SELECT p.probe_id, p.cand_id, p.simq,
               p.simq - max(pr.ps) AS score_int
        FROM pool p
        JOIN pairs pr ON pr.probe_id = p.probe_id AND pr.i = p.cand_id
        JOIN sel3 s ON s.probe_id = pr.probe_id AND s.cand_id = pr.j
        WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                          WHERE x.probe_id = p.probe_id
                            AND x.cand_id = p.cand_id)
        GROUP BY p.probe_id, p.cand_id, p.simq),
    s4 AS (
        SELECT probe_id, cand_id, simq, score_int
        FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY score_int DESC, simq DESC, cand_id) AS rn FROM c4)
        WHERE rn = 1),
    sel4 AS (SELECT probe_id, cand_id FROM sel3
             UNION ALL SELECT probe_id, cand_id FROM s4),
    c5 AS (
        SELECT p.probe_id, p.cand_id, p.simq,
               p.simq - max(pr.ps) AS score_int
        FROM pool p
        JOIN pairs pr ON pr.probe_id = p.probe_id AND pr.i = p.cand_id
        JOIN sel4 s ON s.probe_id = pr.probe_id AND s.cand_id = pr.j
        WHERE NOT EXISTS (SELECT 1 FROM sel4 x
                          WHERE x.probe_id = p.probe_id
                            AND x.cand_id = p.cand_id)
        GROUP BY p.probe_id, p.cand_id, p.simq),
    s5 AS (
        SELECT probe_id, cand_id, simq, score_int
        FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY score_int DESC, simq DESC, cand_id) AS rn FROM c5)
        WHERE rn = 1),
    final AS (
        SELECT probe_id, 1 AS rank, cand_id, score_int FROM s1
        UNION ALL SELECT probe_id, 2, cand_id, score_int FROM s2
        UNION ALL SELECT probe_id, 3, cand_id, score_int FROM s3
        UNION ALL SELECT probe_id, 4, cand_id, score_int FROM s4
        UNION ALL SELECT probe_id, 5, cand_id, score_int FROM s5)
    SELECT probe_id,
           CAST(rank AS INTEGER) AS rank,
           cand_id AS vec_id,
           CAST(score_int AS DOUBLE) / 2000000.0 AS score
    FROM final
    """,
)
def llm_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: for each of 10 probe
    vectors, take the cosine top-{MMR_POOL} pool and greedily select
    {MMR_K} results maximizing ``λ·sim(q,d) − (1−λ)·max_{{s∈S}}
    sim(d,s)`` — the diversity-aware retrieval step between ANN search
    and a RAG context window (plain top-k returns near-duplicates; MMR
    trades relevance against redundancy).

    Spark shape: the pool comes from the broadcast-probe kNN plan
    (linear corpus scan, no shuffle of the corpus), so the iterative
    part touches only 10 groups × {MMR_POOL} rows — ``applyInPandas``
    runs the greedy loop vectorized per group, the legitimate use of
    the Pandas escape hatch: the corpus-sized stage stays declarative,
    the O(k·pool) greedy tail is bounded and embarrassingly parallel
    per query.  Determinism: all similarities are 6dp-rounded then
    scaled to int64, so the whole recurrence is exact integer
    arithmetic (ties break on pool order = sim desc, vec_id asc) and
    the DuckDB oracle replays the identical selection with one
    unrolled CTE per greedy step — emitted scores are int/2·10⁶
    divisions, bit-identical across engines.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    n = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ne")
    )
    from covid_19_data_analysis_bigdata_spark.operators.llm import _cosine

    sim = F.round(_cosine(F.col("pe"), F.col("ne")), 6)
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("cand_id")
    )
    pool = (
        n.join(F.broadcast(probes), F.col("cand_id") != F.col("probe_id"))
        .select("probe_id", "cand_id", sim.alias("sim"), "ne")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MMR_POOL)
        .drop("rk")
    )

    # The integer recurrence below bakes in λ = 1/2 (score = (simq −
    # red)/2 after scaling); a different λ needs new integer weights in
    # BOTH the greedy and the oracle.
    assert MMR_LAMBDA == 0.5

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["sim", "cand_id"], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["ne"]])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        # EXACT integer recurrence: query- and pair-similarities are
        # 6dp-rounded then scaled to int64, so every comparison in the
        # greedy loop is integer arithmetic — no float accumulation can
        # flip an argmax between engines, and the SQL oracle replays
        # the identical selection (unrolled CTE per step).
        pair_int = np.rint(np.round(V @ V.T, 6) * 1e6).astype(np.int64)
        simq_int = np.rint(pdf["sim"].to_numpy() * 1e6).astype(np.int64)
        ids = pdf["cand_id"].to_numpy()
        chosen: list[int] = []
        scores: list[float] = []
        remaining = list(range(len(pdf)))
        while remaining and len(chosen) < MMR_K:
            if chosen:
                red = pair_int[np.ix_(remaining, chosen)].max(axis=1)
            else:
                red = np.zeros(len(remaining), dtype=np.int64)
            mmr = simq_int[remaining] - red
            # argmax with (sim desc, vec_id) tie-break: remaining is in
            # pool order and np.argmax takes the first max
            best = int(np.argmax(mmr))
            chosen.append(remaining[best])
            # λ·simq − (1−λ)·red with λ=1/2 — exact int / 2e6 division,
            # bit-identical across engines
            scores.append(int(mmr[best]) / 2_000_000.0)
            del remaining[best]
        return pd.DataFrame(
            {
                "probe_id": pdf["probe_id"].iloc[0],
                "rank": np.arange(1, len(chosen) + 1, dtype="int32"),
                "vec_id": ids[chosen],
                "score": scores,
            }
        )

    return pool.groupBy("probe_id").applyInPandas(
        greedy, "probe_id long, rank int, vec_id long, score double"
    )


@query(
    "llm_embedding_qa",
    oracle="""
    WITH stats AS (
        SELECT label,
               len(embedding) AS dim,
               sqrt(coalesce(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * x)), 0.0)) AS nrm
        FROM embeddings)
    SELECT label,
           CAST(count(*) AS BIGINT)                       AS n_vectors,
           CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bad_dim,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
           round(avg(nrm), 4)  AS avg_norm,
           round(min(nrm), 4)  AS min_norm,
           round(max(nrm), 4)  AS max_norm
    FROM stats
    GROUP BY label
    """,
)
def llm_embedding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column data-quality gate: per label, vector counts,
    wrong-dimension counts, zero vectors, and the L2-norm envelope —
    the ingest check every vector pipeline needs BEFORE similarity
    math (a zero vector silently poisons cosine; a dimension mismatch
    crashes the matmul three stages later; a norm outlier usually
    means a double-encoded or truncated embedding).

    Row-local array expressions (size + one aggregate lambda per row)
    feeding a bounded per-label rollup — scan-bound, zero extra
    shuffles, the same single-pass shape as the text quality gates.
    """
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    stats = e.select(
        "label", F.size("embedding").alias("dim"), nrm.alias("nrm")
    )
    return stats.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum((F.col("dim") != 64).cast("int")).alias("n_bad_dim"),
        F.sum((F.col("nrm") == 0).cast("int")).alias("n_zero"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# Dedup canonicalization: keep-best-per-cluster (round 4)
# --------------------------------------------------------------------------


@query(
    "llm_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {FUZZY_PAIRS_CTES},
    edges AS (SELECT a_id AS u, b_id AS v FROM fuzzy_pairs
              UNION SELECT b_id, a_id FROM fuzzy_pairs),
    reach(u, v) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u AS doc_id, min(v) AS component
             FROM reach GROUP BY u)
    SELECT c.doc_id, c.component, d.n_chars,
           (row_number() OVER (PARTITION BY c.component
                               ORDER BY d.n_chars DESC, c.doc_id) = 1)
               AS keep
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    """,
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization — the step that turns cluster labels into an
    actual dedup decision: within every near-duplicate cluster keep
    exactly one representative (longest text, ties to the lowest
    doc_id) and mark the rest for dropping.

    Composes :func:`~...textprep.llm_dedup_clusters` (connected
    components over the LSH-verified pair graph) with the document
    metadata: one broadcast-sized join (clustered docs are a tiny
    fraction of the corpus) plus one row_number window over clusters
    whose size is bounded by the dup groups themselves — nothing here
    scales with corpus size except the upstream candidate generation
    that already does.  The keep flag is rank arithmetic on integers
    (n_chars, doc_id) — exact in any engine.
    """
    from covid_19_data_analysis_bigdata_spark.operators.textprep import (
        llm_dedup_clusters,
    )

    comp = llm_dedup_clusters(spark, sf_dir).select("doc_id", "component")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = comp.join(d, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return j.select(
        "doc_id",
        "component",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# --------------------------------------------------------------------------
# Dataset card: one-row corpus summary (round 4)
# --------------------------------------------------------------------------


@query(
    "llm_dataset_card",
    oracle="""
    WITH base AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
                   AS n_tokens,
               count(DISTINCT md5(text)) AS n_distinct_texts,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               count(DISTINCT lang) AS n_langs
        FROM documents),
    top AS (
        SELECT lang AS top_lang FROM (
            SELECT lang, row_number() OVER (ORDER BY count(*) DESC, lang)
                       AS rn
            FROM documents GROUP BY lang)
        WHERE rn = 1)
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           n_tokens,
           CAST(n_distinct_texts AS BIGINT) AS n_distinct_texts,
           round(1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs, 4)
               AS dup_frac,
           round(CAST(sum_chars AS DOUBLE) / n_docs, 4) AS avg_chars,
           CAST(n_langs AS BIGINT) AS n_langs,
           top.top_lang
    FROM base CROSS JOIN top
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the one-row corpus summary published next to a
    training set — document/token/distinct-text counts, exact-dup
    fraction, mean length, and the language profile.

    One pass over the corpus computes every distributive/algebraic
    stat; the exact-dup fraction rides the same scan as a
    count-distinct over md5 digests (at extreme cardinalities the
    drop-in replacement is `agg_bitmap_distinct`'s mergeable bitmaps
    or HLL, both already in the registry).  The language mode is a
    |langs|-row aggregate broadcast back onto the summary row.  Every
    ratio is one correctly-rounded division of exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    top = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "lang",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("lang")))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("lang").alias("top_lang"))
    )
    return base.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_tokens",
        "n_distinct_texts",
        F.round(
            1.0 - F.col("n_distinct_texts").cast("double") / F.col("n_docs"), 4
        ).alias("dup_frac"),
        F.round(F.col("sum_chars").cast("double") / F.col("n_docs"), 4).alias(
            "avg_chars"
        ),
        "n_langs",
        "top_lang",
    )


# --------------------------------------------------------------------------
# Embedding covariance diagnostics (round 4)
# --------------------------------------------------------------------------

COV_DIMS = 8  #: leading dims diagnosed (8×8 matrix; full 64² same shape)
COV_SCALE = 1_000  #: fixed-point input scale — moments stay exact BIGINT


@query(
    "llm_embedding_covariance",
    oracle=f"""
    WITH x AS (
        SELECT i.i, j.j,
               CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * {COV_SCALE})
                    AS BIGINT) AS xi,
               CAST(round(CAST(embedding[j.j + 1] AS DOUBLE) * {COV_SCALE})
                    AS BIGINT) AS xj
        FROM embeddings
        CROSS JOIN generate_series(0, {COV_DIMS - 1}) i(i)
        CROSS JOIN generate_series(0, {COV_DIMS - 1}) j(j)
        WHERE i.i <= j.j),
    m AS (SELECT i, j,
                 count(*) AS n,
                 CAST(sum(xi) AS BIGINT) AS sx,
                 CAST(sum(xj) AS BIGINT) AS sy,
                 CAST(sum(xi * xj) AS BIGINT) AS sxy
          FROM x GROUP BY i, j)
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
           round((n * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * n * {COV_SCALE} * {COV_SCALE}), 6)
               AS cov
    FROM m
    """,
)
def llm_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance diagnostics: the upper-triangle covariance
    matrix of the leading {COV_DIMS} embedding dimensions, computed
    from exact integer moments — the health check (anisotropy,
    dead/correlated dimensions) run before whitening or indexing an
    embedding corpus.

    cov(i,j) = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ)/n² over components quantized to
    round(x·{COV_SCALE}) BIGINTs: all three moments are
    order-independent integer sums (associative partials — one
    partial+final aggregate at any cluster size), and the final
    expression is a correctly-rounded division — bit-identical across
    engines, the same fixed-point discipline as the PQ trainer.  The
    dim-pair expansion is a constant ×{COV_DIMS}·({COV_DIMS}+1)/2
    row-local fan-out; output is one tiny matrix regardless of corpus
    size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    comp = lambda k: F.round(  # noqa: E731
        F.element_at("embedding", k + 1).cast("double") * COV_SCALE
    ).cast("long")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                comp(i).alias("xi"),
                comp(j).alias("xj"),
            )
            for i in range(COV_DIMS)
            for j in range(COV_DIMS)
            if i <= j
        ]
    )
    x = e.select(F.explode(pairs).alias("p")).select(
        F.col("p.i").alias("i"),
        F.col("p.j").alias("j"),
        F.col("p.xi").alias("xi"),
        F.col("p.xj").alias("xj"),
    )
    m = x.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("xj").alias("sy"),
        F.sum(F.col("xi") * F.col("xj")).alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n").cast("double")
        * F.col("n")
        * COV_SCALE
        * COV_SCALE
    )
    return m.select("i", "j", F.round(cov, 6).alias("cov"))


# --------------------------------------------------------------------------
# Bigram-LM perplexity scoring (round 4)
# --------------------------------------------------------------------------


@query(
    "llm_perplexity_bigram",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
    bg AS (SELECT doc_id,
                  unnest([{'w1': ws[i], 'b': ws[i] || ' ' || ws[i+1]}
                          for i in generate_series(1, len(ws) - 1)]) AS s
           FROM w WHERE len(ws) >= 2),
    st AS (SELECT doc_id, s.w1 AS w1, s.b AS b FROM bg),
    c2 AS (SELECT b, count(*) AS c FROM st GROUP BY b),
    tokens AS (SELECT unnest(string_split(lower(text), ' ')) AS t
               FROM documents),
    c1 AS (SELECT t, count(*) AS c FROM tokens GROUP BY t),
    vocab AS (SELECT count(*) AS v FROM c1),
    scored AS (
        SELECT st.doc_id,
               count(*) AS n_bigrams,
               sum(-ln((c2.c + 1.0) / (c1.c + vocab.v))) AS nll
        FROM st JOIN c2 USING (b) JOIN c1 ON c1.t = st.w1
        CROSS JOIN vocab
        GROUP BY st.doc_id)
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(nll / n_bigrams, 4) AS cross_entropy
    FROM scored
    """,
)
def llm_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document with add-one smoothing —
    the n-gram generalization of ``llm_perplexity_unigram`` (real
    CCNet-style filters score with a 5-gram KenLM; the conditional-
    probability dataflow is identical at any order, this is it at
    n=2): P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V).

    The model tables are corpus aggregates (bigram counts, unigram
    counts, vocabulary size) — all vocabulary-bounded, broadcast back
    over the bigram stream, so scoring costs one explode + two
    broadcast joins + one per-doc aggregation; nothing beyond the
    token scan grows with the corpus.  The bigram stream comes from
    shifted-slice zips over the materialized word array (never
    indexed lambdas over ``sequence`` — the O(len²) inlining trap).
    """
    d = load_table(spark, sf_dir, "documents")
    ws = _words()
    n1 = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("w", 1, n1),
        F.slice("w", 2, n1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat_ws(" ", a, b).alias("b")
        ),
    )
    # Persisted: the bigram explode feeds BOTH the count aggregate and
    # the scoring join; c1 feeds the vocab scalar and the join (the
    # round-7 twice-consumed-frame sweep).
    st = (
        d.select("doc_id", ws.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", F.explode(pairs).alias("s"))
        .select("doc_id", F.col("s.w1").alias("w1"), F.col("s.b").alias("b"))
        .transform(cached)
    )
    c2 = st.groupBy("b").agg(F.count(F.lit(1)).alias("c2"))
    tok = d.select(F.explode(ws).alias("t"))
    c1 = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c1")).transform(cached)
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    nll = -F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        # No broadcast hints on the model joins: bigram/unigram TYPE
        # counts are unbounded at 100 TB; AQE broadcasts at runtime
        # when the model side is small (the vocab scalar stays an
        # explicit 1-row broadcast).
        st.join(c2, "b")
        .join(c1, st.w1 == c1.t)
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(nll) / F.count(F.lit(1)), 4).alias("cross_entropy"),
        )
    )
