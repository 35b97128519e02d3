"""Multimodal-column pipeline stages beyond the decode stub.

The driver mandate treats image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Python stages.
This module adds the three standard stages downstream of decode:

- resize     — recompute target dimensions under a max-edge constraint;
- frame-sample — explode a video payload into a strided subset of
  frame rows (1 → N batch shape);
- feature-extract — reduce a payload to a small numeric feature vector
  (the embedding precursor).

Codecs are deterministic STUBS (no PIL/ffmpeg in this container): each
derives its outputs arithmetically from the payload bytes, so every
stage keeps a strong DuckDB oracle while the Spark-side plumbing —
binary column, Arrow batch shape, schema-typed output, partition
preservation — is exactly what a real codec drops into.

Scale: all three are ``mapInPandas`` over the natural input partitions
(no shuffle, no state); a 100 TB media corpus streams through them
batch by batch with bounded executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid_19_data_analysis_bigdata_spark.core import query
from covid_19_data_analysis_bigdata_spark.sources.io import load_table

MOD = 1_000_000_007
MAX_EDGE = 256
FRAME_STRIDE = 3


@query(
    "multimodal_resize_stub",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(CAST(text AS BLOB)) % 640 + 64      AS w,
               (octet_length(CAST(text AS BLOB)) * 7) % 480 + 64 AS h
        FROM documents)
    SELECT doc_id, w, h,
           CASE WHEN greatest(w, h) <= {MAX_EDGE} THEN w
                ELSE CAST(floor(w * {MAX_EDGE}.0 / greatest(w, h)) AS BIGINT)
           END AS out_w,
           CASE WHEN greatest(w, h) <= {MAX_EDGE} THEN h
                ELSE CAST(floor(h * {MAX_EDGE}.0 / greatest(w, h)) AS BIGINT)
           END AS out_h
    FROM m
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: cap the longer edge at {MAX_EDGE} px preserving
    aspect ratio.  The decode (payload → width/height) is the stub; the
    resize arithmetic, Arrow batching, and schema are production-real.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def resize(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = (n % 640 + 64).astype("int64")
            h = ((n * 7) % 480 + 64).astype("int64")
            # STUB decode above; real resize math below.  Multiply
            # before dividing (w·E/longest, never w·(E/longest)) so the
            # double result is exact whenever the true quotient is —
            # the oracle computes in this order too.
            import numpy as np

            longest = pd.concat([w, h], axis=1).max(axis=1)
            out_w = np.where(
                longest <= MAX_EDGE, w, np.floor(w * float(MAX_EDGE) / longest)
            ).astype("int64")
            out_h = np.where(
                longest <= MAX_EDGE, h, np.floor(h * float(MAX_EDGE) / longest)
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "w": w,
                    "h": h,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return d.mapInPandas(
        resize, "doc_id bigint, w bigint, h bigint, out_w bigint, out_h bigint"
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(CAST(text AS BLOB))          AS n,
               octet_length(CAST(text AS BLOB)) % 10 + 2 AS n_frames
        FROM documents)
    SELECT doc_id,
           CAST(f AS BIGINT)                              AS frame_idx,
           (n * 1000003 + f * 8191) % {MOD}               AS frame_sig
    FROM (SELECT doc_id, n,
                 unnest(range(0, n_frames, {FRAME_STRIDE})) AS f
          FROM m)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: each video payload (stub: 2–11 frames)
    explodes into every {FRAME_STRIDE}rd frame with a per-frame
    signature — the 1 → N batch shape a real ffmpeg frame extractor
    produces, with bounded output rows per input row.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def sample(batches):
        for pdf in batches:
            out_id, out_idx, out_sig = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                # STUB decode: frame count from payload size.
                for f in range(0, n % 10 + 2, FRAME_STRIDE):
                    out_id.append(doc_id)
                    out_idx.append(f)
                    out_sig.append((n * 1000003 + f * 8191) % MOD)
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame_sig": out_sig}
            )

    return d.mapInPandas(
        sample, "doc_id bigint, frame_idx bigint, frame_sig bigint"
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    WITH m AS (
        SELECT doc_id, lower(text) AS t,
               length(text) * 1.0 AS n
        FROM documents)
    SELECT doc_id,
           round(length(regexp_replace(t, '[^aeiou]', '', 'g')) / n, 6)
               AS f_vowel,
           round(length(regexp_replace(t, '[^b-df-hj-np-tv-z]', '', 'g')) / n, 6)
               AS f_consonant,
           round(length(regexp_replace(t, '[^ ]', '', 'g')) / n, 6)
               AS f_space
    FROM m
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: reduce each payload to a small numeric
    signature (byte-class ratios — the stub stand-in for a real
    image/audio embedding).  Vectorized pandas string ops inside the
    Arrow batch; output is the fixed-width feature row an embedding
    model would emit.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def extract(batches):
        for pdf in batches:
            t = pdf["text"].str.lower()
            n = pdf["text"].str.len().astype("float64")
            # No rounding here: pandas rounds half-to-even, while Spark
            # and DuckDB round half away from zero — final rounding
            # happens in the Spark plan so all three engines agree.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "f_vowel": t.str.count("[aeiou]") / n,
                    "f_consonant": t.str.count("[b-df-hj-np-tv-z]") / n,
                    "f_space": t.str.count(" ") / n,
                }
            )

    raw = d.mapInPandas(
        extract,
        "doc_id bigint, f_vowel double, f_consonant double, f_space double",
    )
    return raw.select(
        "doc_id",
        F.round("f_vowel", 6).alias("f_vowel"),
        F.round("f_consonant", 6).alias("f_consonant"),
        F.round("f_space", 6).alias("f_space"),
    )


# --------------------------------------------------------------------------
# Caption–embedding alignment score (round 5)
# --------------------------------------------------------------------------

ALIGN_DIM = 64  #: pseudo-embedding width (first ALIGN_DIM caption bytes)

#: Sequential left-fold dot product in DuckDB — replays Spark's
#: ``F.aggregate(…, 0.0, +)`` fold order so both engines produce
#: bit-identical doubles (same convention as textprep._L2_FOLD_SQL).
_DOT_FOLD_SQL = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
)


def _dot_fold(a, b):
    """Spark twin of :data:`_DOT_FOLD_SQL`."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


@query(
    "multimodal_caption_align",
    oracle=f"""
    WITH pairs AS (
        SELECT e.label, e.embedding,
               list_transform(generate_series(1, {ALIGN_DIM}),
                              i -> ascii(substr(d.text, CAST(i AS INTEGER), 1)))
                   AS pseudo
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        WHERE d.n_chars >= {ALIGN_DIM}),
    scored AS (
        SELECT label,
               round({_DOT_FOLD_SQL.format(a="embedding", b="pseudo")}
                     / sqrt({_DOT_FOLD_SQL.format(a="embedding", b="embedding")}
                            * {_DOT_FOLD_SQL.format(a="pseudo", b="pseudo")}),
                     6) AS align
        FROM pairs),
    fx AS (SELECT label,
                  CAST(round(align * 1000000) AS BIGINT) AS ci,
                  align
           FROM scored)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(CAST(sum(ci) AS BIGINT) AS DOUBLE)
                 / count(*) / 1000000, 6) AS mean_align,
           round(min(align), 6) AS min_align,
           round(max(align), 6) AS max_align
    FROM fx GROUP BY label
    """,
)
def multimodal_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-shaped caption↔embedding alignment: cosine between
    each image embedding and a pseudo text embedding (the caption's
    first {ALIGN_DIM} byte values — the deterministic stand-in for a
    real text encoder), aggregated per label.  This is the
    joint-modality *filtering* stage of a LAION-style pipeline: pairs
    whose caption doesn't match the image score low and get dropped
    before training.

    Scale shape: one equi-join of the caption table to the embedding
    table on id (co-partitioned by key at 100 TB — no broadcast
    needed, no skew: ids are unique), then a purely map-side cosine
    per row and one partial+final aggregate — the whole corpus
    streams through in a single pass.  Determinism: dot products are
    sequential left folds (bit-identical across engines), the cosine
    is rounded once at 6 dp, and the per-label mean is computed in
    fixed-point micro-units (BIGINT sum of round(align·1e6)) so no
    order-dependent double accumulation ever crosses the engine
    boundary.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= ALIGN_DIM
    )
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "label",
        "embedding",
        F.expr(
            f"transform(sequence(1, {ALIGN_DIM}),"
            " i -> ascii(substr(text, i, 1)))"
        ).alias("pseudo"),
    )
    e, p = F.col("embedding"), F.col("pseudo")
    align = F.round(
        _dot_fold(e, p) / F.sqrt(_dot_fold(e, e) * _dot_fold(p, p)), 6
    )
    scored = pairs.select("label", align.alias("align")).withColumn(
        "ci", F.round(F.col("align") * 1000000).cast("long")
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum("ci").cast("double") / F.count(F.lit(1)) / 1000000, 6
        ).alias("mean_align"),
        F.round(F.min("align"), 6).alias("min_align"),
        F.round(F.max("align"), 6).alias("max_align"),
    )


# --------------------------------------------------------------------------
# Corpus byte-value histogram (round 5)
# --------------------------------------------------------------------------


@query(
    "multimodal_byte_histogram",
    oracle="""
    SELECT code, CAST(count(*) AS BIGINT) AS n_bytes
    FROM (SELECT unicode(c) AS code
          FROM (SELECT unnest(string_split_regex(text, '')) AS c
                FROM documents))
    WHERE code >= 0
    GROUP BY code
    """,
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-value histogram of the whole document corpus — the payload
    profiling stage a media/ingest pipeline runs to detect encoding
    drift (a BOM, a codepage, binary junk inside 'text') before any
    decode step.

    This is the Arrow-batch reduction pattern on real plumbing: each
    ``mapInPandas`` batch encodes its text column to bytes, counts all
    256 byte values in ONE vectorized numpy bincount, and emits a
    ≤256-row partial — so the shuffled payload per 10k-document batch
    is bounded by the alphabet, not the corpus (classic map-side
    combine done manually where no built-in aggregate exists).  The
    final groupBy folds the partials associatively.  The corpus is
    ASCII, so the oracle's per-codepoint split is byte-identical to
    the UTF-8 encode on the Spark side (unicode('') = -1 rows are the
    regex-split artifacts, filtered).
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("text")

    def _byte_hist(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            buf = np.frombuffer(
                b"".join(pdf["text"].str.encode("utf-8").tolist()),
                dtype=np.uint8,
            )
            counts = np.bincount(buf, minlength=256)
            nz = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "code": nz.astype("int64"),
                    "n_partial": counts[nz].astype("int64"),
                }
            )

    partials = d.mapInPandas(_byte_hist, "code long, n_partial long")
    return partials.groupBy("code").agg(
        F.sum("n_partial").alias("n_bytes")
    )


# --------------------------------------------------------------------------
# Audio energy profile: framed RMS over the payload (round 5)
# --------------------------------------------------------------------------

AUDIO_FRAME = 256
AUDIO_DOCS = 10
AUDIO_MAX_FRAMES = 40


@query(
    "multimodal_audio_rms",
    oracle=f"""
    WITH frames AS (
        SELECT d.doc_id, t.k AS frame_idx,
               substr(d.text, 1 + t.k * {AUDIO_FRAME}, {AUDIO_FRAME})
                   AS chunk
        FROM documents d, generate_series(0, {AUDIO_MAX_FRAMES - 1}) t(k)
        WHERE d.doc_id < {AUDIO_DOCS}
          AND t.k * {AUDIO_FRAME} < length(d.text)),
    samples AS (
        SELECT doc_id, frame_idx,
               CAST(length(chunk) AS BIGINT) AS n_samples,
               CAST(sum(unicode(c) * unicode(c)) AS BIGINT) AS ssq
        FROM (SELECT doc_id, frame_idx, chunk,
                     unnest(string_split_regex(chunk, '')) AS c
              FROM frames)
        GROUP BY doc_id, frame_idx, chunk)
    SELECT doc_id, frame_idx, n_samples,
           round(sqrt(CAST(ssq AS DOUBLE) / n_samples), 6) AS rms
    FROM samples
    """,
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy profile: the payload is framed into fixed 256-byte
    windows and each frame reduces to its RMS amplitude — the
    silence-detection / loudness-normalization stage of an audio
    pipeline, with the decode stub standing in for PCM samples
    (payload bytes AS samples; a real codec drops into the same
    mapInPandas slot).

    Each Arrow batch frames its payloads and computes all RMS values
    in vectorized numpy (1 → N explode with bounded N — the
    ``multimodal_frame_sample`` batch shape); per-frame output is
    (doc, frame, n_samples, rms).  The sum of squared byte values is
    an exact BIGINT; RMS is one division and one sqrt — correctly
    rounded, identical in both engines.  Probe bound: 10 docs keeps
    the demo small; the dataflow is corpus-linear with no shuffle.
    """
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < AUDIO_DOCS)
        .select("doc_id", "text")
    )

    def _rms(batches):
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_samples": [], "ssq": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                buf = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                n_frames = min(
                    AUDIO_MAX_FRAMES,
                    (len(buf) + AUDIO_FRAME - 1) // AUDIO_FRAME,
                )
                for k in range(n_frames):
                    chunk = buf[k * AUDIO_FRAME : (k + 1) * AUDIO_FRAME]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["n_samples"].append(len(chunk))
                    out["ssq"].append(
                        int((chunk.astype(np.int64) ** 2).sum())
                    )
            yield pd.DataFrame(out)

    frames = d.mapInPandas(
        _rms, "doc_id long, frame_idx long, n_samples long, ssq long"
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        "n_samples",
        F.round(
            F.sqrt(F.col("ssq").cast("double") / F.col("n_samples")), 6
        ).alias("rms"),
    )


# --------------------------------------------------------------------------
# Shot-boundary detection over framed payloads (round 5)
# --------------------------------------------------------------------------

SHOT_THRESHOLD_PCT = 40


@query(
    "multimodal_shot_boundaries",
    oracle=f"""
    WITH frames AS (
        SELECT d.doc_id, t.k AS frame_idx,
               substr(d.text, 1 + t.k * {AUDIO_FRAME}, {AUDIO_FRAME})
                   AS chunk
        FROM documents d, generate_series(0, {AUDIO_MAX_FRAMES - 1}) t(k)
        WHERE d.doc_id < {AUDIO_DOCS}
          AND t.k * {AUDIO_FRAME} < length(d.text)),
    feat AS (
        SELECT doc_id, frame_idx,
               CAST(sum(unicode(c) * unicode(c)) AS BIGINT) AS ssq
        FROM (SELECT doc_id, frame_idx,
                     unnest(string_split_regex(chunk, '')) AS c
              FROM frames)
        GROUP BY doc_id, frame_idx),
    delta AS (
        SELECT doc_id, frame_idx, ssq,
               lag(ssq) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS prev_ssq
        FROM feat)
    SELECT doc_id, frame_idx, ssq, prev_ssq,
           CAST(abs(ssq - prev_ssq) AS BIGINT) AS abs_delta
    FROM delta
    WHERE prev_ssq IS NOT NULL
      AND abs(ssq - prev_ssq) * 100 > {SHOT_THRESHOLD_PCT} * prev_ssq
    """,
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection: a frame whose energy feature jumps more
    than 40% from its predecessor marks a cut — the video-segmentation
    stage downstream of ``multimodal_frame_sample`` (real pixel
    histograms drop into the same feature slot; the stub feature is
    the framed payload's squared-byte sum).

    The per-frame feature reduction is the Arrow-batch stage; boundary
    detection is one lag window partitioned by document (frames per
    doc are bounded, so partitions are bounded).  The threshold
    compares exact integers cross-multiplied (Δ·100 > 40·prev) — no
    division, no float, no epsilon ambiguity between engines.
    """
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < AUDIO_DOCS)
        .select("doc_id", "text")
    )

    def _ssq(batches):
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ssq": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                buf = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                n_frames = min(
                    AUDIO_MAX_FRAMES,
                    (len(buf) + AUDIO_FRAME - 1) // AUDIO_FRAME,
                )
                for k in range(n_frames):
                    chunk = buf[k * AUDIO_FRAME : (k + 1) * AUDIO_FRAME]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["ssq"].append(
                        int((chunk.astype(np.int64) ** 2).sum())
                    )
            yield pd.DataFrame(out)

    feat = d.mapInPandas(_ssq, "doc_id long, frame_idx long, ssq long")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = feat.select(
        "doc_id",
        "frame_idx",
        "ssq",
        F.lag("ssq").over(w).alias("prev_ssq"),
    ).filter(F.col("prev_ssq").isNotNull())
    return delta.filter(
        F.abs(F.col("ssq") - F.col("prev_ssq")) * 100
        > SHOT_THRESHOLD_PCT * F.col("prev_ssq")
    ).select(
        "doc_id",
        "frame_idx",
        "ssq",
        "prev_ssq",
        F.abs(F.col("ssq") - F.col("prev_ssq")).alias("abs_delta"),
    )


# --------------------------------------------------------------------------
# Perceptual-hash near-duplicate scan (round 5)
# --------------------------------------------------------------------------

PHASH_BITS = 64
PHASH_WIN = 16
PHASH_STRIDE = 17


@query(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [CAST(('0x' || substr(md5(substr(text,
                        (k * {PHASH_STRIDE})
                            % greatest(length(text) - {PHASH_WIN - 1}, 1)
                            + 1,
                        {PHASH_WIN})), 1, 2)) AS BIGINT)
                for k in generate_series(0, {PHASH_BITS - 1})] AS pixels
        FROM documents),
    h AS (
        SELECT doc_id, pixels,
               list_aggregate(pixels, 'sum') AS tot
        FROM px),
    a AS (
        SELECT doc_id,
               array_to_string(list_transform(pixels,
                   p -> CASE WHEN {PHASH_BITS} * p > tot
                        THEN '1' ELSE '0' END), '') AS ahash
        FROM h)
    SELECT ahash,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM a GROUP BY ahash
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash near-duplicate scan over media payloads: the
    decode stage samples {PHASH_BITS} strided windows of the payload
    as pseudo-pixels (the deterministic codec stub — a real decoder
    would produce an 8×8 luma grid), each pixel thresholds against the
    payload mean to one bit, and identical 64-bit signatures group —
    the perceptual-dedup shape (pHash/aHash) used to collapse
    re-encoded copies of the same image before training.

    The Arrow-batched ``mapInPandas`` stage is the production shell:
    payload in, fixed-width signature out, no shuffle until the final
    signature group-by (which is the exact-dedup hash aggregate, scale
    free).  Pixel bytes come from md5 (engine-portable) over
    CHARACTER-indexed windows so Python slicing and SQL substr agree
    on multibyte text.
    """
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def ahash(batches):
        for pdf in batches:
            out = []
            for t in pdf["text"]:
                n = len(t)
                base = max(n - (PHASH_WIN - 1), 1)
                pixels = [
                    int(
                        hashlib.md5(
                            t[
                                (k * PHASH_STRIDE) % base:
                                (k * PHASH_STRIDE) % base + PHASH_WIN
                            ].encode("utf-8")
                        ).hexdigest()[:2],
                        16,
                    )
                    for k in range(PHASH_BITS)
                ]
                tot = sum(pixels)
                out.append(
                    "".join(
                        "1" if PHASH_BITS * p > tot else "0" for p in pixels
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash": out}
            )

    sigs = d.mapInPandas(ahash, "doc_id bigint, ahash string")
    return sigs.groupBy("ahash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


# --------------------------------------------------------------------------
# Blur / sharpness scoring stage (round 5)
# --------------------------------------------------------------------------

BLUR_THRESHOLD = 500000


@query(
    "multimodal_blur_score",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [CAST(('0x' || substr(md5(substr(text,
                        (k * {PHASH_STRIDE})
                            % greatest(length(text) - {PHASH_WIN - 1}, 1)
                            + 1,
                        {PHASH_WIN})), 1, 2)) AS BIGINT)
                for k in generate_series(0, {PHASH_BITS - 1})] AS pixels
        FROM documents)
    SELECT doc_id,
           CAST(list_aggregate(
                [(pixels[i+1] - pixels[i]) * (pixels[i+1] - pixels[i])
                 for i in generate_series(1, len(pixels) - 1)],
                'sum') AS BIGINT) AS sharpness,
           CAST(list_aggregate(
                [(pixels[i+1] - pixels[i]) * (pixels[i+1] - pixels[i])
                 for i in generate_series(1, len(pixels) - 1)],
                'sum') < {BLUR_THRESHOLD} AS BOOLEAN) AS is_blurry
    FROM px
    """,
)
def multimodal_blur_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blur detection stage: sum of squared adjacent-pixel differences
    (the 1-D Laplacian-energy proxy) over the same {PHASH_BITS}-sample
    stub decode as ``multimodal_phash_dedup`` — the sharpness gate an
    image-training pipeline applies before spending GPU time on a
    frame (variance-of-Laplacian is the standard OpenCV recipe; the
    codec here is the deterministic stub, the plumbing is real).

    Arrow-batched ``mapInPandas``, zero shuffles — a pure per-row
    filter stage emitting an exact integer energy and a thresholded
    flag, streaming through a 100 TB corpus partition by partition.
    """
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def blur(batches):
        for pdf in batches:
            scores = []
            for t in pdf["text"]:
                n = len(t)
                base = max(n - (PHASH_WIN - 1), 1)
                pixels = [
                    int(
                        hashlib.md5(
                            t[
                                (k * PHASH_STRIDE) % base:
                                (k * PHASH_STRIDE) % base + PHASH_WIN
                            ].encode("utf-8")
                        ).hexdigest()[:2],
                        16,
                    )
                    for k in range(PHASH_BITS)
                ]
                scores.append(
                    sum(
                        (b - a) * (b - a)
                        for a, b in zip(pixels, pixels[1:])
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sharpness": scores}
            )

    sc = d.mapInPandas(blur, "doc_id bigint, sharpness bigint")
    return sc.select(
        "doc_id",
        "sharpness",
        (F.col("sharpness") < BLUR_THRESHOLD).alias("is_blurry"),
    )


# --------------------------------------------------------------------------
# Aspect-ratio bucketing (round 7)
# --------------------------------------------------------------------------

#: Canonical aspect buckets (w, h); ties resolve to the EARLIEST
#: bucket in this list.
ASPECT_BUCKETS = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16)]


@query(
    "multimodal_aspect_bucket",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(CAST(text AS BLOB)) % 640 + 64       AS w,
               (octet_length(CAST(text AS BLOB)) * 7) % 480 + 64 AS h
        FROM documents),
    e AS (
        SELECT doc_id, w, h,
               unnest([{", ".join(str(i) for i in range(len(ASPECT_BUCKETS)))}]) AS bi,
               unnest([{", ".join(str(bw) for bw, _ in ASPECT_BUCKETS)}]) AS bw,
               unnest([{", ".join(str(bh) for _, bh in ASPECT_BUCKETS)}]) AS bh
        FROM m),
    best AS (
        SELECT doc_id, bw, bh,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY abs(w * bh - h * bw), bi) AS rn
        FROM e),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m)
    SELECT best.bw AS bucket_w, best.bh AS bucket_h,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(count(*) AS DOUBLE) / tot.n, 6) AS share
    FROM best CROSS JOIN tot
    WHERE rn = 1
    GROUP BY best.bw, best.bh, tot.n
    """,
)
def multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing: assign every media payload to the
    closest canonical aspect bucket — the batch-packing stage of any
    image-training pipeline (mixed aspect ratios cannot share a dense
    batch; buckets trade a small crop for rectangular tensors).

    Closeness is judged in exact CROSS-MULTIPLIED integers
    (|w·bh − h·bw|, ties to the earliest bucket) — a float
    w/h-vs-bw/bh comparison could flip assignment at a rounding
    boundary; the integer form cannot.  The decode (payload → w, h)
    is the house stub; the assignment itself is an argmin over a
    5-literal bucket list, evaluated JVM-side per row (no Python), so
    the stage is one narrow map plus a bucket-grain aggregate —
    embarrassingly parallel at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.col("text").cast("binary")).alias("n")
    )
    m = d.select(
        "doc_id",
        (F.col("n") % 640 + 64).alias("w"),
        ((F.col("n") * 7) % 480 + 64).alias("h"),
    )
    # JVM-side argmin over the literal bucket list: fold the (diff,
    # index) pairs with least-by-struct semantics.
    best_bi = F.lit(0)
    best_d = F.abs(
        F.col("w") * ASPECT_BUCKETS[0][1]
        - F.col("h") * ASPECT_BUCKETS[0][0]
    )
    for i, (bw, bh) in enumerate(ASPECT_BUCKETS[1:], start=1):
        di = F.abs(F.col("w") * bh - F.col("h") * bw)
        best_bi = F.when(di < best_d, F.lit(i)).otherwise(best_bi)
        best_d = F.when(di < best_d, di).otherwise(best_d)
    assigned = m.select(best_bi.alias("bi"))
    # map bucket index -> (bw, bh) via chained CASE (5 literals)
    bw_c, bh_c = F.lit(None), F.lit(None)
    for i, (bw, bh) in enumerate(ASPECT_BUCKETS):
        bw_c = F.when(F.col("bi") == i, bw).otherwise(bw_c)
        bh_c = F.when(F.col("bi") == i, bh).otherwise(bh_c)
    tot = m.agg(F.count(F.lit(1)).alias("n"))
    return (
        assigned.select(
            bw_c.alias("bucket_w"), bh_c.alias("bucket_h")
        )
        .groupBy("bucket_w", "bucket_h")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket_w",
            "bucket_h",
            "n_items",
            F.round(
                F.col("n_items").cast("double") / F.col("n"), 6
            ).alias("share"),
        )
    )
