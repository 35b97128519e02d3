"""Headline benchmark (driver contract: one JSON line).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, warm timings
(each query runs once to warm scan/code paths, then once measured,
``collect()`` included), and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Compare against BASELINE.md §2: Spark local-mode fixed overhead is
~0.3–1.3 s/query; the algorithmic outlier to watch is llm_sim_topk,
which must run via the vectorized mapInPandas matmul (sub-second),
never the naive SQL-lambda all-pairs form (35.7 s at sf0.1).

Drift note (round 3): the uniform +32% r1→r2 slowdown on unchanged
plans was A/B-tested against ``spark.sql.shuffle.partitions`` (8 vs
32, via $SPARK_GRAFT_SHUFFLE_PARTITIONS): common-query subtotals were
12.4 s vs 13.7 s — the conf explains at most a fraction and 32 is kept
for cluster-shaped parallelism.  Switching the harness to
median-of-3 then landed the same common subtotal at 10.7 s (vs r1's
9.47 single-shot): most of the "drift" was single-shot measurement
noise on a shared box, not plan regression — per-stage plans are
unchanged from r1.  Timings below are medians from this round on.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

HEADLINE = [
    "agg_groupby",          # BASELINE q1 pricing-summary shape
    "join_multiway_star",   # star join + rollup
    "join_sortmerge",       # large-large shuffle join
    "win_moving_avg",       # BASELINE w_moving_avg shape
    "win_row_number_topk",  # BASELINE topk_rank shape
    "topk_limit",           # BASELINE q3-style top-N
    "llm_sim_topk",         # BASELINE sim_knn shape (vectorized path)
    "llm_dedup_fuzzy",      # MinHash-LSH pipeline
    "llm_text_tokens",      # tokenize + count
    "stream_tumbling_counts",  # streaming replay harness
    "llm_ann_ivf",          # IVF-bucketed ANN (similarity scale path)
    "llm_dedup_embedding",  # thresholded blocked-matmul near-dup
    "llm_lang_id",          # marker-scoring language ID
    "join_bucketed",        # co-located join, no input shuffle
    "pipeline_full_report",  # end-to-end 5-table composition flagship
    "llm_dedup_clusters",   # iterative connected components (slow tail)
    "llm_dedup_ngram",      # blocked n-gram Jaccard dedup (slow tail)
    "llm_decontaminate",    # train/eval overlap scrub (slow tail)
    "scan_dpp_star_join",   # dynamic partition pruning on the fact scan
    "report_volume_shipping",  # fact-fact-fact join, nation-pair matrix
    "graph_pagerank",       # fact-aggregated graph + integer iteration
    "llm_pmi_cooccur",      # skip-gram PMI (r2 perf-weak watch item)
    "graph_triangle_count",  # adjacency-intersection triangles (r2 watch item)
    "llm_span_dedup",       # substring-level dedup (round-3 headline)
    "ml_kmeans_lloyd",      # iterative broadcast-centroid k-means (round-4 add)
    "llm_dedup_cross_corpus",  # incremental batch-vs-corpus screen (round-4 add)
    "llm_ann_pq",           # PQ codebook train + ADC + exact rerank (round-4 add)
    "report_market_share",  # heaviest not-yet-benched report query (round-4 add)
    "llm_sparse_cosine",    # inverted-index trigram near-dup (round-4 batch)
    "report_last_touch_attribution",  # single-window attribution (round-4 batch)
    "agg_bitmap_distinct",  # mergeable exact-distinct bitmaps (round-4 batch)
    "llm_ann_ivfpq",        # composed IVFADC flagship (round-4 batch)
    "ml_pca_power",         # fixed-point power-iteration PCA (round-4 batch)
    "llm_knn_join",         # both-sides-large blocked k-NN join (round-5)
    "graph_edge_support_topk",  # per-edge triangle support (round-5)
    "agg_corr_matrix",      # one-pass decimal-exact corr matrix (round-5)
    "etl_merge_into",       # MERGE rewrite + managed-table round-trip (round-5)
    "llm_ann_range_search",  # exact radius search w/ cell pruning (round-5)
    "ml_roc_auc",           # score-group rank AUC over the fact table (round-5)
    "report_skyline_parts",  # two-stage distributed skyline sweep (round-5)
    "ts_bollinger_bands",   # decimal-exact trailing volatility bands (round-5)
    "graph_clustering_local",  # per-node triangle attribution (round-5 late)
    "ts_holt_winters",      # triple-exponential fold smoothing (round-5 late)
    "ml_knn_classify",      # broadcast-probe kNN vote (round-5 late)
    "join_fuzzy_levenshtein",  # blocked edit-distance join (round-5 late)
    "dq_ks_two_sample",     # integer-ECDF sup distance (round-5 late)
]


def _git(repo: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", repo, *args],
        check=True,
        capture_output=True,
        text=True,
        timeout=60,
    ).stdout.strip()


def _previous_round_ref(repo: str) -> tuple[str, str] | None:
    """Resolve the previous round's code as (commit sha, how-found).

    Prefers the highest ``round-N`` tag (the builder tags each round's
    driver ledger commit); falls back to the most recent commit that
    touched a BENCH_r*.json artifact (the driver's round-end commit).
    """
    try:
        tags = [
            t
            for t in _git(repo, "tag", "--list", "round-*").splitlines()
            if re.fullmatch(r"round-\d+", t)
        ]
        if tags:
            tag = max(tags, key=lambda t: int(t.split("-")[1]))
            return _git(repo, "rev-parse", f"{tag}^{{commit}}"), f"tag {tag}"
        sha = _git(repo, "log", "-n", "1", "--format=%H", "--", "BENCH_r*.json")
        if sha:
            return sha, "last BENCH_r*.json commit"
    except Exception:
        pass
    return None


def _previous_committed_total() -> float | None:
    """Total of the highest-numbered COMMITTED BENCH_r*.json, read from
    HEAD's tree — never the working directory (r12 ADVICE: the driver
    writes the current round's artifact into the working tree before
    committing it, so a directory listing would compare this run
    against its own round's earlier measurement instead of across
    rounds; `git show` only sees what a commit recorded)."""
    repo = os.path.dirname(os.path.abspath(__file__))

    def _parse(raw: str) -> float | None:
        try:
            d = json.loads(raw)
            # the driver wraps bench's JSON line under "parsed"
            if "value" not in d and isinstance(d.get("parsed"), dict):
                d = d["parsed"]
            return float(d["value"])
        except Exception:
            return None

    try:
        # ls-tree pathspecs don't glob: list the root tree and filter
        names = _git(repo, "ls-tree", "--name-only", "HEAD").splitlines()
        numbered = sorted(
            (int(m.group(1)), n)
            for n in names
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", n))
        )
        # newest committed artifact first; skip unparseable ones
        for _, fname in reversed(numbered):
            total = _parse(_git(repo, "show", f"HEAD:{fname}"))
            if total is not None:
                return total
    except Exception:
        pass
    return None


# Comparability threshold for the ambient-load canary (round-10
# methodology pin; hoisted to module level in r14 so the A/B reference
# bench obeys the same discipline as the primary path — the r13 A/B
# accepted a reference run with spread 2.279).
CANARY_SPREAD_MAX = 1.8


def _run_child_bench(repo: str, wt: str, sf_dir: str) -> tuple[dict | None, str | None]:
    """Run the worktree's bench.py once; return (payload, error)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_CHILD="1",
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=wt,
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    line = next(
        (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
        None,
    )
    if proc.returncode != 0 or line is None:
        return None, f"child bench failed rc={proc.returncode}"
    return json.loads(line), None


def _matched_conditions_ab(head_total: float, sf_dir: str) -> dict:
    """Same-hour A/B against the previous round's code (r11 verdict
    task 4): when the final canary spread exceeds the comparability
    threshold, the committed total is NOT comparable to last round's
    committed total — the environment itself drifted.  Instead of
    leaving the exonerating evidence to prose archaeology (the r11
    situation: spread 2.7, and the 50.1 s-today-vs-36.0 s-committed
    re-bench of the r10 commit lived only in SCALE.md + a commit
    message), bench the previous round's commit in a worktree
    BACK-TO-BACK with this run and record the matched-conditions ratio
    in the JSON artifact itself.  ratio < 1 means HEAD is faster than
    the previous round under identical ambient conditions, whatever
    the raw totals say."""
    repo = os.path.dirname(os.path.abspath(__file__))
    ref = _previous_round_ref(repo)
    if ref is None:
        return {"error": "no previous-round ref resolvable"}
    sha, source = ref
    wt = os.path.join(repo, ".bench_ab", "wt")
    try:
        if os.path.exists(wt):
            subprocess.run(
                ["git", "-C", repo, "worktree", "remove", "--force", wt],
                capture_output=True,
                timeout=60,
            )
        _git(repo, "worktree", "add", "--force", "--detach", wt, sha)
        # The reference bench obeys the SAME canary discipline as the
        # primary path (r13 verdict task 5): a reference run whose final
        # spread exceeds CANARY_SPREAD_MAX is re-measured once and the
        # lower-spread attempt is the one ratioed against HEAD.  Every
        # reference attempt's spread is recorded so readers can audit
        # whether the exonerating ratio came from a clean or a noisy
        # reference (the r13 A/B accepted spread 2.279 silently).
        prev, err = _run_child_bench(repo, wt, sf_dir)
        ref_attempt_spreads = (
            [prev.get("canary_spread")] if prev is not None else []
        )
        if (
            prev is not None
            and (prev.get("canary_spread") or 0) > CANARY_SPREAD_MAX
        ):
            prev2, err2 = _run_child_bench(repo, wt, sf_dir)
            if prev2 is not None:
                ref_attempt_spreads.append(prev2.get("canary_spread"))
                if (prev2.get("canary_spread") or float("inf")) < prev[
                    "canary_spread"
                ]:
                    prev = prev2
        if prev is None:
            return {"ref": sha, "ref_source": source, "error": err}
        prev_total = float(prev["value"])
        return {
            "ref": sha,
            "ref_source": source,
            "prev_total_sec": prev_total,
            "prev_canary_spread": prev.get("canary_spread"),
            "ref_attempt_spreads": ref_attempt_spreads,
            "matched_conditions_ratio": round(head_total / prev_total, 3),
        }
    except Exception as exc:  # never let the A/B sink the bench itself
        return {"ref": sha, "ref_source": source, "error": repr(exc)}
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            capture_output=True,
            timeout=60,
        )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from covid_19_data_analysis_bigdata_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # Materialize via toPandas(): Arrow-batched transfer measures the
    # engine + columnar transport, not Python row-object deserialization
    # (collect() is ~10× slower on wide results for reasons unrelated to
    # the query plan).  Median of 3 measured runs after one warm run:
    # single-shot timings on a shared box drift ±15% run-to-run, which
    # round 2's drift diagnosis showed is enough to mask real
    # regressions (and to fake them).
    from covid_19_data_analysis_bigdata_spark.cache import clear_cache

    from pyspark.sql import functions as F

    def canary() -> float:
        """Fixed reference job (SF-independent: 5·10⁷-row modular sum
        over 32 partitions).  Measured periodically so a reader of the
        JSON can tell ambient-load noise from real regression — the
        round-7 bench's +30% 'regression' was exactly such noise
        (SCALE.md documents 42–59 s totals with no code change)."""
        t0 = time.time()
        spark.range(0, 50_000_000, 1, 32).select(
            F.sum(F.col("id") % 7)
        ).collect()
        return round(time.time() - t0, 3)

    def measure() -> tuple[dict[str, float], list[float], float]:
        canary()  # warm the canary codepath (JVM/codegen) before recording
        canaries = [canary()]
        times: dict[str, float] = {}
        for qi, name in enumerate(HEADLINE):
            fn = qs[name]
            # Round-5 harness fix (round-8 form): queries cache shared
            # intermediates through the cache.py registry; clearing BOTH
            # the registry and Spark's CacheManager between queries makes
            # each measurement independent and round-over-round comparable
            # (the registry clear keeps its handles coherent with the
            # CacheManager state).  Within a query's samples the cache
            # stays warm, preserving the warm-timing contract.
            clear_cache()
            spark.catalog.clearCache()
            fn(spark, sf_dir).toPandas()  # warm
            samples = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).toPandas()
                samples.append(time.time() - t0)
            # Round-8 harness fix: the heavy tail (≥ 1.5 s) dominates the
            # total and is exactly where bursty ambient load lands — two
            # more samples there makes the median robust to one slow AND
            # one fast outlier (median-of-5), at ~10% extra wall time.
            if sorted(samples)[1] >= 1.5:
                for _ in range(2):
                    t0 = time.time()
                    fn(spark, sf_dir).toPandas()
                    samples.append(time.time() - t0)
            med = sorted(samples)[len(samples) // 2]
            times[name] = round(med, 3)
            if (qi + 1) % 10 == 0:
                canaries.append(canary())
        canaries.append(canary())
        spread = round(max(canaries) / max(min(canaries), 1e-9), 3)
        return times, canaries, spread

    # Round-10 methodology pin (round-9 verdict task 7): two same-code
    # A/B runs differed 36.4 s vs 47.9 s purely on ambient spread, so a
    # run whose canary spread exceeds CANARY_SPREAD_MAX is not
    # comparable round-over-round and is RE-MEASURED once; the attempt
    # with the lower spread is reported.  The threshold and every
    # attempt's spread are recorded in the JSON so readers can audit
    # which rule fired.
    times, canaries, spread = measure()
    attempt_spreads = [spread]
    if spread > CANARY_SPREAD_MAX:
        times2, canaries2, spread2 = measure()
        attempt_spreads.append(spread2)
        if spread2 < spread:
            times, canaries, spread = times2, canaries2, spread2

    total = round(sum(times.values()), 3)

    # Round-12 comparability pin: if even the re-measured run is over
    # the spread threshold, OR the total LOOKS like a >15% regression
    # vs the previous committed BENCH artifact (ambient bursts shorter
    # than the canary sampling interval can inflate totals while the
    # spread stays under threshold — observed this round: a load-13
    # burst read llm_dedup_fuzzy at 9.7 s with spread only 1.53; the
    # same code benched 2.0 s minutes later), the raw total is not
    # cross-round comparable — run the previous round's tagged commit
    # back-to-back in a worktree and record the matched-conditions
    # ratio in the artifact (child runs are guarded against recursing
    # into their own A/B).
    matched = None
    ab_reasons = []
    if not os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        if spread > CANARY_SPREAD_MAX:
            ab_reasons.append(f"canary_spread {spread} > {CANARY_SPREAD_MAX}")
        prev_committed = _previous_committed_total()
        if prev_committed and total > 1.15 * prev_committed:
            ab_reasons.append(
                f"total {total} > 1.15x previous committed {prev_committed}"
            )
        if ab_reasons:
            matched = _matched_conditions_ab(total, sf_dir)
            matched["trigger"] = "; ".join(ab_reasons)

    payload = {
        "metric": "headline_queries_total_warm",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # ambient-load canary: fixed job, measured at start / every 10
        # queries / end.  spread >> 1.0 means the box was bursty and
        # the totals are not comparable across rounds without
        # re-measurement (which the rule above performs automatically
        # once when spread > threshold).
        "canary_sec": canaries,
        "canary_spread": spread,
        "canary_spread_threshold": CANARY_SPREAD_MAX,
        "canary_attempt_spreads": attempt_spreads,
    }
    if matched is not None:
        payload["matched_conditions_ab"] = matched
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
