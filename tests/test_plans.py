"""Physical-plan assertions for strategy-sensitive queries (SURVEY.md §5.4).

These are the 100 TB guardrails: if a refactor silently turns the
broadcast join into a shuffle, or un-prunes a scan, these fail before
any benchmark does.
"""

import __spark_entry__ as E


def _plan(spark, sf_dir, name: str) -> str:
    df = E.queries()[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sortmerge_join_is_sortmerge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_sortmerge")
    assert "SortMergeJoin" in plan


def test_star_join_never_shuffles_fact_for_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_multiway_star")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scan_projection_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_projected")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_comment" not in read


def test_filter_pushed_to_parquet(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_simple")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThan(l_quantity,30" in pushed


def test_partition_pruning_on_sink_readback(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sink_parquet_partitioned")
    assert "PartitionFilters" in plan and "l_returnflag" in plan


def test_dynamic_partition_pruning_on_star_join(spark, sf_dir):
    """The partitioned fact scan must carry a runtime DPP filter — the
    dim side is only known at execution, so static pruning can't fire."""
    plan = _plan(spark, sf_dir, "scan_dpp_star_join")
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "dynamicpruning" in pf


def test_unpivot_melt_keeps_expand_and_partial_agg(spark, sf_dir):
    """r13 verdict task 6 shrank unpivot_melt's CHECKED output to a
    per-(flag, var) summary (~100 s of sweep time was the harness
    hashing 2.4M melted rows) — but the operator under test is the
    melt itself, so the plan must still contain the Expand node
    (Spark's physical UNPIVOT, 4 rows out per row in over the full
    lineitem) feeding a partial+final HashAggregate, not some
    rewritten union-of-scans."""
    plan = _plan(spark, sf_dir, "unpivot_melt")
    assert "Expand" in plan
    assert "HashAggregate" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_limit")
    assert "TakeOrderedAndProject" in plan


def test_dedup_embedding_runs_blocked_not_cartesian(spark, sf_dir):
    # The τ-threshold cosine dedup must run as block-pair Arrow tasks,
    # never an all-pairs join, and must keep the threshold inside the
    # kernel (no JVM-side pair materialization).
    plan = _plan(spark, sf_dir, "llm_dedup_embedding")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_clean_corpus_has_no_row_udf(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_clean_corpus")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_has_no_input_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_bucketed")
    assert plan.count("Bucketed: true") == 2
    # Tree section = lines up to the first blank line.  Everything at or
    # below the SortMergeJoin must be Exchange-free (the join reads the
    # bucket-colocated scans directly); the final group-by above the
    # join keeps its one small Exchange.
    tree = plan.splitlines()
    tree = tree[: tree.index("")] if "" in tree else tree
    join_at = next(i for i, l in enumerate(tree) if "SortMergeJoin" in l)
    assert not any("Exchange" in l for l in tree[join_at:])


def test_pq_trainer_lineage_truncated(spark, sf_dir):
    """r15 (VERDICT r14 item 4): the trained PQ codebook must enter
    consumer plans as a checkpointed leaf (Scan ExistingRDD), not as
    the full unrolled Lloyd trainer — without truncation every ADC
    consumer re-embeds the 3-iteration training tree and cold
    plan-build/analysis dominates (measured 5.9 s plan-build + 15.0 s
    first execution at sf0.1 before the change; the before/after dumps
    are plans/r15/llm_ann_pq_{before,after}.txt, 1050 -> 431 lines)."""
    plan = _plan(spark, sf_dir, "llm_ann_pq")
    assert "Scan ExistingRDD" in plan


def test_ivf_broadcasts_centroids(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_ann_ivf")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ann_beam_broadcasts_hierarchy_never_corpus(spark, sf_dir):
    """The hierarchical beam ANN must broadcast only O(k) frames
    (cell-group table, coarse centroids, probe sets) — the corpus side
    of every join stays partitioned.  A corpus-side SortMergeJoin or a
    non-broadcast nested loop would mean the hierarchy got shuffled
    the wrong way."""
    plan = _plan(spark, sf_dir, "llm_ann_beam")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sim_topk_runs_vectorized_not_sql_lambdas(spark, sf_dir):
    # The bench-critical guard (SURVEY.md §7.3.1): top-k similarity must
    # go through the Arrow-batched block-pair matmul (applyInPandas →
    # FlatMapGroupsInPandas), never per-pair SQL lambdas (200× slower)
    # or a cartesian join, and the global merge must be a top-k, not a
    # full sort.
    plan = _plan(spark, sf_dir, "llm_sim_topk")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_fuzzy_dedup_has_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_dedup_fuzzy")
    assert "CartesianProduct" not in plan


def test_lang_id_is_narrow_no_join_no_explode(spark, sf_dir):
    # Marker scoring is compiled into row expressions: the corpus must
    # never be exploded or joined — the only exchange feeds the final
    # bounded confusion aggregate.
    plan = _plan(spark, sf_dir, "llm_lang_id")
    assert "Join" not in plan
    assert "Generate" not in plan


def test_cross_corpus_dedup_has_no_cartesian(spark, sf_dir):
    # Incoming×corpus candidates must come from the LSH band-bucket
    # equi-join, never an all-pairs product.
    plan = _plan(spark, sf_dir, "llm_dedup_cross_corpus")
    assert "CartesianProduct" not in plan


def test_knn_broadcasts_probes_not_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_knn_per_query")
    assert "BroadcastNestedLoopJoin" in plan


def test_shuffle_hash_join_is_hash_not_merge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_shuffle_hash")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q5_report_broadcasts_all_dimensions(spark, sf_dir):
    """Q5 shape: region/nation/supplier collapse to broadcast builds —
    the fact tables shuffle only for the fact-fact joins."""
    plan = _plan(spark, sf_dir, "report_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_trade_matrix_broadcasts_nation_both_sides(spark, sf_dir):
    """Q7 shape: both nation lookups ride broadcasts; no cartesian."""
    plan = _plan(spark, sf_dir, "report_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_returned_items_pushes_returnflag_to_scan(spark, sf_dir):
    """Q10 shape: the returnflag filter must reach the lineitem scan."""
    plan = _plan(spark, sf_dir, "report_returned_items")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_returnflag,R" in l.replace(" ", "") for l in pushed)
    assert "TakeOrderedAndProject" in plan


def test_large_orders_prefilters_on_two_columns(spark, sf_dir):
    """Q18 shape: the HAVING pre-aggregate reads only the two columns
    it needs, and the final top-100 avoids a global sort."""
    plan = _plan(spark, sf_dir, "report_large_orders")
    assert "TakeOrderedAndProject" in plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any(
        "l_orderkey" in l and "l_quantity" in l and "l_extendedprice" not in l
        for l in reads
    )


def test_pagerank_iterates_over_cached_bounded_graph(spark, sf_dir):
    """The expensive fact aggregation happens once; iterations must hit
    the persisted edge list, never the fact tables again."""
    plan = _plan(spark, sf_dir, "graph_pagerank")
    assert "InMemoryTableScan" in plan


def test_repetition_filter_has_no_shuffle(spark, sf_dir):
    """Per-document max multiplicity is row-local: no Exchange at all."""
    plan = _plan(spark, sf_dir, "llm_repetition_filter")
    assert "Exchange" not in plan


def test_dataset_mix_is_single_pass(spark, sf_dir):
    """The mixture gate is a row-local predicate: exactly the one
    aggregation exchange, no join."""
    plan = _plan(spark, sf_dir, "llm_dataset_mix")
    assert "Join" not in plan


def test_embedding_quantize_has_no_shuffle_or_explode(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_embedding_quantize")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode; pure array lambdas


def test_funnel_join_keys_on_user(spark, sf_dir):
    """The interval join must be keyed (equi on user), not a pure
    range cartesian."""
    plan = _plan(spark, sf_dir, "events_funnel_conversion")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bloom_filter_injected_into_probe_side(spark, sf_dir):
    """The selective build side must inject a runtime bloom filter that
    prunes the probe scan before the join shuffle."""
    plan = _plan(spark, sf_dir, "join_bloom_filtered")
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan


def test_heavy_hitters_candidates_broadcast(spark, sf_dir):
    """MG candidate generation runs in Arrow batches; the verify pass
    must probe via a broadcast of the tiny candidate set, never a
    sort-merge shuffle of the fact scan against it."""
    plan = _plan(spark, sf_dir, "agg_heavy_hitters")
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_agg_delta_scan_pruned(spark, sf_dir):
    """The delta side must push the cutoff predicate into the orders
    scan — re-reading history would defeat incremental maintenance."""
    plan = _plan(spark, sf_dir, "etl_incremental_agg")
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_variant_extraction_stays_jvm_side(spark, sf_dir):
    """VARIANT path access is a native expression — no Python worker
    round-trip may appear in the plan."""
    plan = _plan(spark, sf_dir, "json_variant_funcs")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rolling_distinct_spine_broadcast(spark, sf_dir):
    """The pair fan-out joins a broadcast day spine; the raw events
    must never range-self-join."""
    plan = _plan(spark, sf_dir, "win_rolling_distinct")
    assert "Generate" in plan            # explode(sequence(...))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan


def test_mad_median_broadcast_back(spark, sf_dir):
    """Phase-two MAD must broadcast the tiny per-group medians onto
    the scan, not shuffle the fact table to meet them."""
    plan = _plan(spark, sf_dir, "agg_mad")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_metric_needs_no_sort(spark, sf_dir):
    """Equal-width z-bucketing is projection + aggregation — no global
    sort, no window, may appear in the measurement plan."""
    plan = _plan(spark, sf_dir, "etl_zorder_layout")
    assert "Window" not in plan
    assert "TakeOrdered" not in plan


def test_profile_is_single_scan(spark, sf_dir):
    """All column stats must come from ONE pass over orders — the
    stack() reshape runs on the 1-row aggregate, not the table."""
    plan = _plan(spark, sf_dir, "dq_profile_columns")
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_inverted_index_single_term_exchange(spark, sf_dir):
    """df-count, head-truncation, and the posting fold are all keyed
    on term; the plan must not add a second wide shuffle beyond the
    distinct."""
    plan = _plan(spark, sf_dir, "llm_inverted_index")
    assert "Window" in plan


def _optimized(spark, sf_dir, name: str) -> str:
    df = E.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().optimizedPlan().toString()


# The vocabulary-broadcast class, closed in rounds 10–11: every query
# whose dataflow joins a token/term/gram-grain (unbounded-at-100TB)
# model table back onto a corpus stream.  Contract: NO keyed join may
# carry a broadcast hint — the only hinted joins are 1-row scalar
# crossJoins (corpus totals, vocab sizes, class tables), which print
# as `Join Cross, ...Hint=(strategy=broadcast)`.  The strategy for
# every vocabulary-grain join is AQE's runtime call: broadcast-convert
# when the model side is actually small, sort-merge with skew
# splitting at corpus scale.  A stats-based BroadcastHashJoin in the
# small-SF physical plan is fine (that IS the adaptive behavior); a
# HINT on a keyed join is the bug this pin exists to catch.
VOCAB_GRAIN_JOIN_QUERIES = [
    "llm_tfidf",
    "llm_pmi_cooccur",
    "llm_perplexity_unigram",
    "llm_perplexity_bigram",
    "ml_naive_bayes",
    "llm_dedup_ngram",
    "llm_dedup_containment",
]


def test_no_keyed_broadcast_hint_in_vocab_grain_class(spark, sf_dir):
    for name in VOCAB_GRAIN_JOIN_QUERIES:
        op = _optimized(spark, sf_dir, name)
        bad = [
            line.strip()
            for line in op.splitlines()
            if "strategy=broadcast" in line and "Join Cross" not in line
        ]
        assert not bad, f"{name}: broadcast hint on a keyed join: {bad}"


def test_vocab_grain_docstrings_match_dehinted_plans():
    """Docstring-vs-plan audit (r11 verdict task 3): three rounds in a
    row a query was de-hinted while its docstring kept claiming the
    vocabulary-grain frame "is broadcast" (r10 `_nb_predictions`, r11
    `llm_pmi_cooccur`).  For every query the vocab-grain plan pin
    covers, no docstring sentence may assert that a token/term/gram/
    vocabulary-grain frame IS broadcast — the plan pin above forbids
    exactly that hint.  Mentions of broadcast in negated form ("NO
    broadcast hint", "de-hinted") or about 1-row scalar totals frames
    are the truthful cases and still pass."""
    import re

    qs = E.queries()
    claim = re.compile(
        r"\b(unigram|bigram|vocab\w*|token\w*|term\w*|gram\w*|"
        r"shingle\w*|model)\b[^.]{0,120}?\b(is|are)\s+(an?\s+)?"
        r"(explicit\s+)?broadcast",
        re.IGNORECASE | re.DOTALL,
    )
    offenders = {}
    for name in VOCAB_GRAIN_JOIN_QUERIES:
        doc = qs[name].__doc__ or ""
        m = claim.search(doc)
        if m:
            offenders[name] = " ".join(m.group(0).split())
    assert not offenders, (
        "docstring claims a vocab-grain frame is broadcast while the "
        f"plan pin forbids the hint: {offenders}"
    )


def test_perplexity_unigram_model_is_two_level_aggregate(spark, sf_dir):
    # Round-11 hardening (r10 ADVICE): the unigram model is a
    # groupBy(tok) count (constant per-key state, map-side partials)
    # joined back WITHOUT a hint — never a count window PARTITIONED BY
    # tok, which would put the Zipf-head token's entire posting (~5%
    # of a web corpus) in ONE task with no AQE skew mitigation.
    plan = _plan(spark, sf_dir, "llm_perplexity_unigram")
    low = plan.lower().replace(" ", "")
    assert "window" not in low  # no per-token window anywhere
    assert "hashaggregate" in low  # the two-level model count


def test_tfidf_df_from_tf_no_second_token_pass(spark, sf_dir):
    # df is derived FROM tf (one row per (doc, term) ⇒ groupBy(term)
    # count IS document frequency): no countDistinct ('distinct' only
    # appears, if ever, in scan metadata) and exactly one parquet scan
    # of documents feeds the token pipeline plus one for the corpus
    # count.
    plan = _plan(spark, sf_dir, "llm_tfidf")
    assert "count(distinct" not in plan.lower()
    # top-3-per-doc window is doc-grain (bounded by doc length)
    assert "row_number" in plan.lower()


def test_triangle_count_has_no_cartesian_and_packs_adjacency(spark, sf_dir):
    # Adjacency-intersection form: no cartesian product, and the wedge
    # candidate space must stay inside arrays (array_intersect present),
    # never materialize as a row join of three edge lists.
    plan = _plan(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "array_intersect" in plan


def test_span_dedup_joins_on_digest_only(spark, sf_dir):
    # The dup-span join must carry the 32-byte digest, never span text:
    # no concat_ws survives past the explode into the join keys.
    plan = _plan(spark, sf_dir, "llm_span_dedup")
    assert "CartesianProduct" not in plan
    assert "md5" in plan


def test_pii_scrub_is_single_aggregation(spark, sf_dir):
    # Row-local regex work + one source rollup: exactly one shuffle.
    plan = _plan(spark, sf_dir, "llm_pii_scrub")
    assert plan.count("Exchange") <= 2  # partial/final pair prints one Exchange; AQE reuse may add one
    assert "BatchEvalPython" not in plan


def test_mmr_pool_is_broadcast_nested_loop(spark, sf_dir):
    # The kNN pool stage must broadcast the 10 probes over the corpus
    # scan; the applyInPandas greedy tail is the only Python in the plan.
    plan = _plan(spark, sf_dir, "llm_mmr_diversify")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ---- round-4 additions ----------------------------------------------------


def test_attribution_is_pure_window_no_join(spark, sf_dir):
    # Last-touch must come from the single per-user window pass; a Join
    # node would mean the quadratic purchase x touch self-join crept back.
    plan = _plan(spark, sf_dir, "report_last_touch_attribution")
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_nearest_is_pure_window_no_join(spark, sf_dir):
    # Both directions ride one sort: ignore-nulls carry + mirror.
    plan = _plan(spark, sf_dir, "join_asof_nearest")
    assert "Join" not in plan
    assert "Window" in plan


def test_bitmap_distinct_has_no_expand(spark, sf_dir):
    # count_distinct compiles to an Expand over the distinct column;
    # the bitmap path must not — its partials are constant-size bitmaps.
    plan = _plan(spark, sf_dir, "agg_bitmap_distinct")
    assert "Expand" not in plan
    assert "bitmap_construct_agg" in plan


def test_ohlc_is_single_aggregate_no_window(spark, sf_dir):
    # open/close ride min_by/max_by inside the hash aggregate — a
    # Window node would mean a per-bar sort of the raw tick stream.
    plan = _plan(spark, sf_dir, "ts_ohlc_bars")
    assert "Window" not in plan
    assert "min_by" in plan or "minby" in plan.lower()


def test_bm25_broadcasts_stats_no_cartesian_blowup(spark, sf_dir):
    # df (|Q| rows) and (N, avgdl) broadcast; the only non-equi join is
    # the 1-row stats attach (BroadcastNestedLoopJoin is fine there).
    plan = _plan(spark, sf_dir, "llm_bm25_rank")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_sparse_cosine_candidates_join_on_gram(spark, sf_dir):
    # The pair stage must come from the inverted index (per-gram
    # postings), never a nested-loop over doc pairs.  r14 form: the
    # postings SELF-JOIN was replaced by a gram-keyed collect_list +
    # array-side u<v pair explode (the LSH pair-generation idiom), so
    # the plan must carry (a) the gram-keyed postings aggregate and
    # (b) no doc-pair nested loop — an Inner/conditioned
    # BroadcastNestedLoopJoin or CartesianProduct would mean the
    # inverted-index discipline was lost.  The only permitted
    # nested-loops remain the condition-free 1-row Cross attaches of
    # the data-relative candidate cap.
    import re

    plan = _plan(spark, sf_dir, "llm_sparse_cosine")
    assert "CartesianProduct" not in plan
    assert not re.search(r"BroadcastNestedLoopJoin[^\n]*Inner", plan)
    assert re.search(
        r"Keys \[1\]: \[t#\d+\]", plan
    ) and "collect_list" in plan, "gram-keyed postings aggregate missing"
    # and the old doc-pair self-join really is gone
    assert not re.search(r"Left keys \[1\]: \[ta#\d+\]", plan)


def test_winnowing_selection_is_arrayside_no_python(spark, sf_dir):
    # Fingerprint selection happens in array expressions inside codegen;
    # only the selected minima are exploded.
    plan = _plan(spark, sf_dir, "llm_winnowing")
    assert "BatchEvalPython" not in plan
    assert "array_min" in plan


def test_referential_orphans_broadcasts_dimension_parents(spark, sf_dir):
    # Six of seven FK edges have dimension-sized parents -> broadcast
    # anti joins; only lineitem->orders may shuffle.
    plan = _plan(spark, sf_dir, "dq_referential_orphans")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_calendar_gaps_anti_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_calendar_gaps")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_pca_power_broadcasts_direction_never_gram(spark, sf_dir):
    # w = sum x (x.v): the 64-entry direction broadcasts per iteration;
    # the O(d^2) Gram matrix must never materialize as a join of the
    # corpus with itself.
    plan = _plan(spark, sf_dir, "ml_pca_power")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row vector attach
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_rag_pack_window_runs_over_pool_only(spark, sf_dir):
    # The cumsum window partitions by probe over the bounded pool.
    plan = _plan(spark, sf_dir, "llm_rag_context_pack")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_mann_kendall_pair_scan_is_arrayside(spark, sf_dir):
    # The O(n^2) sign scan must run inside array expressions over the
    # bounded per-type series, never as a self-join of the daily table.
    plan = _plan(spark, sf_dir, "ts_mann_kendall")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_skew_kurtosis_single_aggregate_no_expand(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_skew_kurtosis")
    assert "Expand" not in plan
    assert "Window" not in plan


def test_novelty_joins_on_gram_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_session_stats_no_self_join(spark, sf_dir):
    # gaps-and-islands: windows + aggregates; a Join means the
    # session boundary came from an event x event comparison.
    plan = _plan(spark, sf_dir, "report_session_duration_stats")
    assert "Join" not in plan
    assert "Window" in plan

def test_merge_into_joins_on_key_no_cartesian(spark, sf_dir):
    """The MERGE rewrite must be one key-equijoin of target x change
    batch (broadcast or shuffle -- AQE's call), never a nested-loop:
    a cartesian here is the difference between a merge that scales to
    a 100 TB target and one that cannot run at all."""
    from pyspark.sql import functions as F

    from covid_19_data_analysis_bigdata_spark.operators.etl import (
        _merge_dataflow,
    )
    from covid_19_data_analysis_bigdata_spark.sources.io import load_table

    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal"),
    )
    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") - F.lit(2000.0)).alias("new_bal"),
    )
    df = _merge_dataflow(target, source)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_interval_join_is_equijoin_on_block(spark, sf_dir):
    """The interval joins must plan as hash equijoins on the day-block
    key with the range predicate as a post-filter — never a
    BroadcastNestedLoopJoin over the raw theta condition."""
    for name in ("join_range_interval", "join_interval_overlap"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_knn_join_stays_blocked(spark, sf_dir):
    """llm_knn_join must run through the block-pair applyInPandas
    kernel (FlatMapGroupsInPandas) — the corpus×corpus join must never
    materialize as a row-level join."""
    plan = _plan(spark, sf_dir, "llm_knn_join")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_prefix_dup_scan_partitions_by_bucket(spark, sf_dir):
    """The sorted-neighbor window must hash-partition on the prefix
    bucket, not sort globally in one task (no Window over an empty
    partition spec)."""
    plan = _plan(spark, sf_dir, "llm_prefix_dup_scan")
    assert "hashpartitioning(substring" in plan.replace(" ", "").lower() or (
        "hashpartitioning" in plan
    )


def test_corr_matrix_single_aggregate_pass(spark, sf_dir):
    """agg_corr_matrix computes all 14 moments in ONE aggregation over
    the fact table; the 6 output rows must not re-scan lineitem six
    times (union of projections over one aggregate, so ≤2 scans after
    plan reuse, not 6)."""
    plan = _plan(spark, sf_dir, "agg_corr_matrix")
    n_scans = plan.count("Scan parquet")
    assert n_scans <= 2, f"corr matrix re-scans the fact table: {n_scans}"


def test_naive_bayes_model_broadcasts(spark, sf_dir):
    """ml_naive_bayes broadcasts only the class-grain frames (|C|
    rows); the (V×C) model join carries NO hint — vocabulary grain is
    unbounded at 100 TB, so AQE decides the strategy at runtime."""
    plan = _plan(spark, sf_dir, "ml_naive_bayes")
    assert "BroadcastHashJoin" in plan  # the class-grain prior/ntok join
    assert "CartesianProduct" not in plan


def test_jaccard_wedge_join_no_cartesian(spark, sf_dir):
    """graph_jaccard_neighbors builds candidate pairs through the
    shared-customer wedge equijoin, never supplier × supplier."""
    plan = _plan(spark, sf_dir, "graph_jaccard_neighbors")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_local_prune_before_global_sweep(spark, sf_dir):
    """report_skyline_parts must run the bucket-partitioned local
    sweep (hash-partitioned window) before the global one — the
    final single-partition window may only see local winners."""
    plan = _plan(spark, sf_dir, "report_skyline_parts")
    assert "hashpartitioning(pmod" in plan.replace(" ", "").lower() or (
        "hashpartitioning" in plan
    )
    assert plan.count("Window") >= 2


def test_roc_auc_windows_over_score_groups(spark, sf_dir):
    """ml_roc_auc's rank window runs over distinct-score aggregates,
    so the plan has exactly one full-table aggregate and no sort of
    raw fact rows (the HashAggregate precedes the Window)."""
    plan = _plan(spark, sf_dir, "ml_roc_auc")
    assert "HashAggregate" in plan and "Window" in plan
    first_agg = plan.index("HashAggregate")
    assert first_agg < plan.index("Window"), (
        "window must run over aggregated score groups, not raw rows"
    )


def test_knn_classify_block_matmul_no_corpus_broadcast(spark, sf_dir):
    """Round-6 fix: the k-NN classifier must run as the block-pair
    Arrow matmul (FlatMapGroupsInPandas over (pb, cb) groups) — never
    a broadcast of a corpus fraction feeding a nested-loop cosine
    (the round-5 shape: at 100 TB the n/7 probe broadcast alone dies).
    The only joins allowed are the tiny block-id crossJoins."""
    plan = _plan(spark, sf_dir, "ml_knn_classify")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    # no vector column may ever sit under a BroadcastExchange: the only
    # broadcasts allowed are the 2- and 4-row block-id Range frames
    segs = plan.split(") BroadcastExchange")[1:]
    # guard the guard: if the formatted-explain layout ever stops
    # emitting per-node "(N) BroadcastExchange" detail sections, this
    # loop would assert nothing — fail loudly on format drift instead
    assert len(segs) >= 2, "expected both block-id BroadcastExchange nodes"
    for seg in segs:
        # only this node's detail block (it ends at the blank line
        # before the next node's header)
        detail = seg.splitlines()[1:]
        own = detail[: detail.index("")] if "" in detail else detail
        input_lines = [ln for ln in own if ln.startswith("Input")]
        assert input_lines, "BroadcastExchange detail lost its Input line"
        assert all("embedding" not in ln for ln in input_lines)


def test_precision_at_k_broadcasts_probes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_precision_at_k")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_reservoir_sample_is_take_ordered(spark, sf_dir):
    """Fixed-k hash sample must compile to TakeOrderedAndProject
    (per-partition heaps), never a global Sort of the corpus."""
    plan = _plan(spark, sf_dir, "sample_reservoir_topk")
    assert "TakeOrderedAndProject" in plan


def test_price_volume_mix_broadcasts_part_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "report_price_volume_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rouge_overlap_no_cartesian(spark, sf_dir):
    """Candidate pairing is the (doc_id+20, source) equi-join — if the
    planner ever degrades it to a nested loop the eval is all-pairs."""
    plan = _plan(spark, sf_dir, "llm_rouge_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ks_two_sample_windows_over_value_domain(spark, sf_dir):
    """The ECDF windows must run over the per-value aggregate, not raw
    lineitem rows (HashAggregate before Window in the plan)."""
    plan = _plan(spark, sf_dir, "dq_ks_two_sample")
    assert "HashAggregate" in plan and "Window" in plan
    # the window's sort key is the aggregated value column `v`, never a
    # raw lineitem column — i.e. the corpus was collapsed before the sort
    lines = plan.splitlines()
    sort_args = " ".join(
        lines[i + 2]
        for i, l in enumerate(lines)
        if l.startswith("(") and l.rstrip().endswith(" Sort")
        and i + 2 < len(lines)
    )
    assert "v#" in sort_args and "l_quantity" not in sort_args


def test_cooccurrence_joins_on_user_day(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_cooccurrence")
    assert "CartesianProduct" not in plan


def test_byte_histogram_partials_before_shuffle(spark, sf_dir):
    """mapInPandas emits <=256-row partials per batch; the exchange
    must carry the partials (post-Python), and the Python stage must
    be Arrow-batched, not row-at-a-time."""
    plan = _plan(spark, sf_dir, "multimodal_byte_histogram")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_holt_winters_no_join_single_fold(spark, sf_dir):
    """The HW state advance is an array fold inside a projection over
    one aggregate — a Join or extra Window would mean the recursion
    leaked into a dataflow dependency."""
    plan = _plan(spark, sf_dir, "ts_holt_winters")
    assert "Join" not in plan


def test_fuzzy_levenshtein_blocks_on_brand_and_length_band(spark, sf_dir):
    """Round-6 fix: candidates must come from the (brand, length-band)
    equi-join — a brand-only block has constant cardinality (25 keys)
    and goes O(n²/25) — and the CPU-heavy probe side must be spread by
    an explicit REPARTITION exchange (the part table arrives as one
    small split)."""
    plan = _plan(spark, sf_dir, "join_fuzzy_levenshtein")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "a_band" in plan and "b_band" in plan
    assert "REPARTITION_BY_NUM" in plan


def test_sample_neighbors_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_sample_neighbors")
    assert "CartesianProduct" not in plan


def test_audio_rms_arrow_batched(spark, sf_dir):
    plan = _plan(spark, sf_dir, "multimodal_audio_rms")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_shot_boundaries_arrow_batched(spark, sf_dir):
    plan = _plan(spark, sf_dir, "multimodal_shot_boundaries")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_hard_negatives_broadcasts_probes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_silhouette_broadcasts_centroids(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_silhouette_lite")
    assert "BroadcastHashJoin" in plan


def test_weighted_ma_windows_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_weighted_moving_avg")
    assert "Join" not in plan and "Window" in plan


def test_bounce_rate_no_self_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_bounce_rate")
    assert "Join" not in plan and "Window" in plan


# ---- round-5 batches 40-45 ----


def test_reset_cumsum_single_window_partitioning(spark, sf_dir):
    """Both window passes share the l_suppkey hash partitioning: the
    plan must contain exactly one Exchange (plus AQE reads), never a
    second shuffle between the segment and running-sum windows."""
    plan = _plan(spark, sf_dir, "win_reset_cumsum")
    assert "Join" not in plan and "Window" in plan
    n_exchanges = plan.count("Arguments: hashpartitioning")
    assert n_exchanges == 1, plan


def test_backlog_aging_broadcasts_anchor(spark, sf_dir):
    plan = _plan(spark, sf_dir, "report_backlog_aging")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row scalar anchor
    assert "CartesianProduct" not in plan


def test_markov2_aggregates_before_ranking(spark, sf_dir):
    """The conditional-probability window must run over the grouped
    trigram table (HashAggregate before the second Window)."""
    plan = _plan(spark, sf_dir, "events_markov_second_order")
    assert "HashAggregate" in plan and "Window" in plan


def test_mutual_information_broadcasts_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_mutual_information")
    assert "BroadcastHashJoin" in plan


def test_calibration_bins_single_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_calibration_bins")
    assert "Join" not in plan and "Window" not in plan


def test_pattern_conformance_no_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dq_string_pattern_conformance")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_abc_xyz_windows_over_part_grain(spark, sf_dir):
    """The ABC running-share window sorts the per-part aggregate, not
    raw lineitem (HashAggregate precedes the Sort feeding Window)."""
    plan = _plan(spark, sf_dir, "report_abc_xyz")
    assert "HashAggregate" in plan and "Window" in plan
    assert "CartesianProduct" not in plan


def test_stochastic_oscillator_two_shuffles_max(spark, sf_dir):
    """One (type, day) partial-agg shuffle carrying only day-grain
    partials, one re-partition to the per-series window key — and the
    three window passes (14-day frame, two lags) all reuse the second."""
    plan = _plan(spark, sf_dir, "ts_stochastic_oscillator")
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 2, plan


def test_anomalous_partitions_broadcasts_median(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dq_anomalous_partitions")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row median
    assert "CartesianProduct" not in plan


def test_dsir_broadcasts_lambda_table(spark, sf_dir):
    """The per-doc score join must broadcast the 128-row λ table —
    never shuffle the doc-grain vectors against it."""
    plan = _plan(spark, sf_dir, "llm_dsir_importance")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_theil_windows_over_customer_grain(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_theil_index")
    assert "BroadcastHashJoin" in plan and "Window" in plan


def test_rolling_retention_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_rolling_retention")
    assert "CartesianProduct" not in plan


def test_rsi_two_shuffles_max(spark, sf_dir):
    """Same two-shuffle ceiling as the oscillator: day-grain partial
    agg, then one per-series re-partition shared by delta lag and the
    14-row gains/losses frame."""
    plan = _plan(spark, sf_dir, "ts_rsi")
    assert "Join" not in plan
    assert plan.count("Arguments: hashpartitioning") == 2, plan


def test_hhi_window_over_supplier_grain(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_hhi_concentration")
    assert "Join" not in plan and "Window" in plan


def test_variant_extract_stays_jvm_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_variant_extract")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "ReadSchema" in plan


def test_phash_arrow_batched_then_hash_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "multimodal_phash_dedup")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_seasonality_index_broadcasts_total(spark, sf_dir):
    plan = _plan(spark, sf_dir, "report_seasonality_index")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ---- round-5 batches 46-51 ----


def test_gradient_descent_folds_not_unrolled(spark, sf_dir):
    """The GD recurrence must be a runtime fold over the 1-row moments
    frame: no join, no Python, and no window — just aggregate +
    project (the unrolled-expression variant took 55 s to analyze)."""
    plan = _plan(spark, sf_dir, "ml_gradient_descent")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_heldout_ce_no_cartesian_vocab_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_heldout_cross_entropy")
    assert "CartesianProduct" not in plan


def test_reactivation_single_window_then_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "report_customer_reactivation")
    assert "Join" not in plan and "Window" in plan


def test_pandas_window_udf_is_arrow(spark, sf_dir):
    """The window UDF must run as an Arrow-batched window-in-pandas
    node, never row-at-a-time Python."""
    plan = _plan(spark, sf_dir, "udf_pandas_window")
    assert "ArrowWindowPython" in plan  # Spark 4's window-in-pandas node
    assert "BatchEvalPython" not in plan


def test_scorecard_topk_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "report_supplier_scorecard")
    assert "TakeOrderedAndProject" in plan


def test_two_hop_broadcasts_hubs(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_two_hop_reach")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ewma_crossover_folds_per_series(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_ewma_crossover")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_anova_broadcasts_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_anova_oneway")
    assert "BroadcastHashJoin" in plan


def test_blur_score_arrow_batched(spark, sf_dir):
    plan = _plan(spark, sf_dir, "multimodal_blur_score")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_arg_minmax_single_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_arg_minmax")
    assert "Join" not in plan and "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_control_chart_broadcasts_limits(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_control_chart_xmr")
    assert "BroadcastHashJoin" in plan


def test_cramers_v_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_cramers_v")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_frequency_moments_aggregates_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_frequency_moments")
    assert "Join" not in plan and "Window" not in plan


def test_spatial_grid_equi_join_not_cartesian(spark, sf_dir):
    """The distance predicate must resolve through the (cx, cy) cell
    equi-join — a CartesianProduct or a non-broadcast nested loop
    means the blocking failed."""
    plan = _plan(spark, sf_dir, "join_spatial_grid")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_learning_curve_one_pass_moments(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ml_learning_curve")
    assert "Join" not in plan
    # one file-scan feeds all five fits (formatted plans repeat the
    # node label, so count the per-scan Location line instead)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_template_extraction_jvm_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_template_extraction")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "HashAggregate" in plan


def test_overdispersion_aggregates_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_overdispersion")
    assert "Join" not in plan and "Window" not in plan


def test_partition_checksums_jvm_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dq_partition_checksums")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "HashAggregate" in plan


# --------------------------------------------------------------------------
# Round-7: no single-partition window over an unbounded entity grain
# --------------------------------------------------------------------------

def _unpartitioned_window_sort_keys(plan: str) -> list[str]:
    """First sort-key expression of every UNPARTITIONED window spec.

    In a formatted plan, ``windowspecdefinition(p1, …, o1 ASC …, frame)``
    lists partition columns first (no ASC/DESC suffix); an
    unpartitioned spec starts directly with a sort expression (`…
    ASC|DESC NULLS …`) or with the frame.  The first argument is
    extracted paren-depth-aware so nested calls like round(x, 6) don't
    split it.
    """
    keys = []
    marker = "windowspecdefinition("
    i = plan.find(marker)
    while i != -1:
        j = i + len(marker)
        depth, arg = 0, []
        while j < len(plan):
            c = plan[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            arg.append(c)
            j += 1
        first = "".join(arg).strip()
        if " ASC" in first or " DESC" in first or first.startswith(
            "specifiedwindowframe"
        ):
            keys.append(first)
        i = plan.find(marker, i + 1)
    return keys


#: (query, allowlisted bounded-grain sort-key substrings).  An
#: unpartitioned window whose first sort key matches an allowlisted
#: substring runs over a BOUNDED grain (10 deciles, day spine, …) —
#: fine at any scale.  Anything else over these entity-grain queries
#: is the single-executor-sort class the round-6 audit flagged.
ENTITY_GRAIN_QUERIES = [
    ("report_rfm_segmentation", []),
    ("report_customer_ltv_deciles", []),
    ("report_lorenz_points", ["decile"]),
    ("llm_curriculum_order", []),
    ("events_active_streak_users", []),
    ("graph_clustering_local", []),
    # round-10 de-globalizations (r9 verdict task 1): full-rank via
    # distrank.global_rank / top-N via TakeOrderedAndProject
    ("llm_vocab_zipf_fit", []),
    ("events_user_paths", []),
    # round-10: cumulative-revenue banding via the _cum_below
    # distributed prefix sum (was the r9 borderline global-window note)
    ("report_pareto_abc", []),
    # round-10 batch 80: every window carries the brand partition key /
    # the dominance count is grid-join + TakeOrderedAndProject
    ("report_group_skyline", []),
    ("report_skyline_dominators", []),
]


import pytest


@pytest.mark.parametrize("name,allow", ENTITY_GRAIN_QUERIES)
def test_no_unpartitioned_window_over_entity_grain(spark, sf_dir, name, allow):
    plan = _plan(spark, sf_dir, name)
    bad = [
        k
        for k in _unpartitioned_window_sort_keys(plan)
        if not any(a in k for a in allow)
    ]
    assert not bad, f"{name}: unpartitioned entity-grain window(s): {bad}"


def test_entity_topn_uses_take_ordered(spark, sf_dir):
    """The two top-N entity rankings must compile to
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    for name in ("events_active_streak_users", "graph_clustering_local"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_coverage_curves_pre_pruned_to_topk(spark, sf_dir):
    """Round-10 (r9 verdict task 1): the two vocabulary-coverage
    queries must prune the unbounded type table to max(K) rows via
    TakeOrderedAndProject BEFORE their rank window — the remaining
    unpartitioned window spec is then bounded by the K constant, and
    the ranked-side broadcast is O(K), not O(|vocab|).
    ``events_user_paths`` drops its rank window entirely (pure
    TakeOrderedAndProject top-N over the combinatorial path grain)."""
    for name in (
        "llm_tokenizer_coverage",
        "llm_ngram_coverage_curve",
        "events_user_paths",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name
    # the curves keep exactly ONE (bounded, post-limit) global spec
    for name in ("llm_tokenizer_coverage", "llm_ngram_coverage_curve"):
        keys = _unpartitioned_window_sort_keys(_plan(spark, sf_dir, name))
        assert len(keys) <= 1, (name, keys)


def test_zipf_fit_uses_distrank(spark, sf_dir):
    """llm_vocab_zipf_fit needs EVERY rank (whole log-log line), so it
    must ride distrank.global_rank — range partitioning in the plan,
    zero unpartitioned window specs (pinned by the parametrized
    entity-grain test above)."""
    plan = _plan(spark, sf_dir, "llm_vocab_zipf_fit")
    assert "rangepartitioning" in plan.lower(), plan[:2000]


# --------------------------------------------------------------------------
# Round-7 batches 56-67: physical-plan pins
# --------------------------------------------------------------------------

def test_survival_family_no_cartesian_no_python(spark, sf_dir):
    """The survival suite is pure JVM relational algebra: user-grain
    aggregates + prefix sums + bounded-spine folds; any Python eval or
    cartesian in these plans is a regression."""
    for name in (
        "ml_kaplan_meier",
        "ml_nelson_aalen",
        "ml_logrank_test",
        "ml_rmst",
        "ml_competing_risks",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_permutation_rank_windows_partitioned_by_replicate(spark, sf_dir):
    """The R permutation rank windows must be PARTITIONED BY the
    replicate id — a global rank over the (r x user) grid would funnel
    R*N rows through one task."""
    plan = _plan(spark, sf_dir, "ml_permutation_test")
    keys = _unpartitioned_window_sort_keys(plan)
    assert not keys, f"unpartitioned window(s) in permutation test: {keys}"


def test_peak_concurrency_uses_distributed_prefix_sum(spark, sf_dir):
    """The sweep must ride the range-repartitioned prefix sum (the
    _cum_below topology), never a single-partition global window over
    the boundary instants."""
    plan = _plan(spark, sf_dir, "events_peak_concurrency")
    keys = _unpartitioned_window_sort_keys(plan)
    assert not keys, f"global window(s) in sweep line: {keys}"
    assert "rangepartitioning" in plan.lower()


def test_merge_intervals_windows_partitioned_by_supplier(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_merge_intervals")
    keys = _unpartitioned_window_sort_keys(plan)
    assert not keys, f"unpartitioned window(s): {keys}"


def test_drawdown_and_pref_attachment_take_ordered(spark, sf_dir):
    """Top-N outputs compile to TakeOrderedAndProject heaps."""
    for name in ("ts_drawdown_duration", "graph_pref_attachment"):
        assert "TakeOrderedAndProject" in _plan(spark, sf_dir, name), name


def test_experiment_suite_single_aggregate_shape(spark, sf_dir):
    """Moment-based experimentation queries stay JVM-only and
    cartesian-free (the 1-row threshold/base frames broadcast)."""
    for name in (
        "ml_diff_in_diff",
        "ml_cuped_adjustment",
        "ml_power_mde",
        "ml_wilson_ci",
        "ml_ratio_metric_ci",
        "ml_brier_score",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_tpch_shapes_decorrelate_to_joins(spark, sf_dir):
    """EXISTS / NOT EXISTS / NOT IN in the TPC-H classics must reach
    the physical plan as semi/anti joins — a correlated re-scan per
    row would show up as a nested subquery or cartesian."""
    q21 = _plan(spark, sf_dir, "sql_tpch_q21_waiting_suppliers")
    assert "LeftSemi" in q21 and "LeftAnti" in q21
    assert "CartesianProduct" not in q21
    q4 = _plan(spark, sf_dir, "sql_tpch_q4_order_priority")
    assert "LeftSemi" in q4
    q22 = _plan(spark, sf_dir, "sql_tpch_q22_prospects")
    assert "LeftAnti" in q22


def test_knn_grid_equi_join_not_cartesian(spark, sf_dir):
    """Grid blocking must reach the plan as an equi join on cell ids
    plus a per-point partitioned rank window."""
    plan = _plan(spark, sf_dir, "join_knn_grid")
    assert "CartesianProduct" not in plan
    keys = _unpartitioned_window_sort_keys(plan)
    assert not keys, f"global window(s) in kNN grid: {keys}"


def test_hits_no_python_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_hits_scores")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_edge_support_agg_not_aqe_coalesced(spark, sf_dir):
    """Round-8 pin: the support aggregate must sit on an explicit
    keyed repartition (REPARTITION_BY_NUM), which AQE never coalesces —
    the session's parallelism-second coalescing ran this CPU-bound
    aggregate near-serial (2.3s vs 0.6s measured at sf0.1)."""
    plan = _plan(spark, sf_dir, "graph_edge_support_topk")
    assert "REPARTITION_BY_NUM" in plan
    assert "TakeOrderedAndProject" in plan


def test_sparse_cosine_agg_not_aqe_coalesced(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_sparse_cosine")
    assert "REPARTITION_BY_NUM" in plan


def test_basket_lift_agg_not_aqe_coalesced(spark, sf_dir):
    plan = _plan(spark, sf_dir, "report_basket_affinity_lift")
    assert "REPARTITION_BY_NUM" in plan
    assert "TakeOrderedAndProject" in plan


def test_full_registry_plan_audit_advisory_set_pinned(spark, sf_dir):
    """Round-9 guard (r8 verdict task 8): the full-registry physical-
    plan audit must flag EXACTLY the documented advisory set — the
    report_rfm_segmentation three-pass distributed-ntile plan (its
    budget override is intentionally one below its static explain
    count so the trade stays visible).  Any new row-UDF, cartesian,
    nested output, or exchange-budget breach fails this test.

    Plans are audited from a CLEAN cache: frames persisted by earlier
    tests otherwise replace audited subtrees with InMemoryRelations
    and the exchange counts drift with test order (observed: the
    pinned rfm flag vanished mid-suite).  The cache.py registry
    self-heals after an external clearCache, so later tests are
    unaffected."""
    import importlib.util
    import os

    spark.catalog.clearCache()
    spec = importlib.util.spec_from_file_location(
        "audit_plans",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "audit_plans.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from covid_19_data_analysis_bigdata_spark import core

    core.load_all()
    flagged = mod.audit(spark, sorted(core.QUERIES), sf_dir)
    assert set(flagged) == {"report_rfm_segmentation"}, flagged


def test_unwitnessed_global_window_detector(spark, sf_dir):
    """r12 verdict task 6: the unpartitioned-window audit is mechanical
    — an unpartitioned WindowExec with no Aggregate/Limit below it
    (single-task sort of an UNBOUNDED input) must be flagged, and the
    same window above an aggregate (bounded grain) must not.  The
    registry-wide budget of 0 is enforced by
    test_full_registry_plan_audit_advisory_set_pinned; this pins the
    detector itself on synthetic plans."""
    import importlib.util
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from covid_19_data_analysis_bigdata_spark.sources.io import load_table

    spec = importlib.util.spec_from_file_location(
        "audit_plans",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "audit_plans.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_orderkey")
    # VIOLATION: unpartitioned cumulative window directly over the scan
    bad = li.select("l_orderkey", F.sum("l_quantity").over(w).alias("c"))
    assert mod._unwitnessed_global_windows(plan_of(bad)), (
        "unpartitioned window over a raw scan must be flagged"
    )
    # WITNESSED: same window above a grain-bounding aggregate
    good = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
        .select("l_returnflag", F.sum("q").over(Window.orderBy("l_returnflag")).alias("c"))
    )
    assert mod._unwitnessed_global_windows(plan_of(good)) == []
    # WITNESSED: same window above an explicit limit
    pruned = li.orderBy("l_orderkey").limit(10).select(
        "l_orderkey", F.sum("l_quantity").over(w).alias("c")
    )
    assert mod._unwitnessed_global_windows(plan_of(pruned)) == []
    # PARTITIONED windows are out of scope for this detector
    pw = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    part = li.select("l_orderkey", F.sum("l_quantity").over(pw).alias("c"))
    assert mod._unwitnessed_global_windows(plan_of(part)) == []


def test_reinvoked_queries_never_repersist(spark, sf_dir):
    """Round-9 guard (r8 verdict task 8): re-building a query's DAG
    must hit the cache.py registry for every persist site — zero new
    misses on the second build.  A new miss is exactly the condition
    that produced CacheManager's `Asked to cache already cached data`
    warnings (dozens per sweep before round 8's registry)."""
    from covid_19_data_analysis_bigdata_spark import core
    from covid_19_data_analysis_bigdata_spark.cache import cache_stats

    core.load_all()
    # The most persist-heavy families: iterative training, LSH dedup,
    # label propagation, the shared ANN session models.
    names = [
        "llm_ann_pq",
        "llm_ann_ivfpq",
        "llm_dedup_fuzzy",
        "llm_dedup_clusters",
        "llm_semdedup",
        "llm_sparse_cosine",
        "ml_kmeans_lloyd",
        "graph_edge_support_topk",
    ]
    for name in names:
        core.QUERIES[name](spark, sf_dir)  # first build registers
        before = cache_stats()["misses"]
        core.QUERIES[name](spark, sf_dir)  # re-build must hit
        after = cache_stats()["misses"]
        assert after == before, (
            f"{name}: re-build added {after - before} persist miss(es)"
        )



def test_tpch_q1_fully_pushed_scan_aggregate(spark, sf_dir):
    """Q1 is THE scan benchmark: the date bound must reach the parquet
    scan and the plan must be join-free — one partial+final hash
    aggregate over the scan."""
    plan = _plan(spark, sf_dir, "sql_tpch_q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_tpch_q6_all_predicates_reach_scan(spark, sf_dir):
    """Q6's whole point: every plain-column predicate is pushed; the
    aggregate reduces to one map-side-combined row, join-free."""
    plan = _plan(spark, sf_dir, "sql_tpch_q6_forecast_revenue")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity" in pushed
    assert "Join" not in plan


def test_tpch_q3_q10_topk_without_global_sort(spark, sf_dir):
    """Q3/Q10 end in small top-ks: TakeOrderedAndProject, never a
    global Sort+Limit; Q10's nation lookup rides a broadcast."""
    for name in ("sql_tpch_q3_shipping_priority", "sql_tpch_q10_returned_items"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name
    assert "BroadcastHashJoin" in _plan(spark, sf_dir, "sql_tpch_q10_returned_items")


def test_welch_family_pushes_segment_filter(spark, sf_dir):
    """The two-sample moment scan must push the segment IN-filter into
    the customer scan and broadcast the filtered dimension."""
    plan = _plan(spark, sf_dir, "ml_welch_ttest")
    assert "In(c_mktsegment" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cdc_chunking_is_windowed_not_joined(spark, sf_dir):
    """Content-defined chunking is explode + doc-partitioned windows +
    one groupBy: no join of any kind, no Python row-UDF."""
    plan = _plan(spark, sf_dir, "llm_cdc_chunking")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_isotonic_grid_is_broadcast_bounded(spark, sf_dir):
    """The minimax grid runs on the 11-row bin spine: its non-equi
    joins must be broadcast (bounded-side) forms, never a shuffled
    CartesianProduct over anything corpus-sized."""
    plan = _plan(spark, sf_dir, "ml_isotonic_calibration")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# Round-10 batch 80: skyline-variant plan pins
# --------------------------------------------------------------------------


def test_group_skyline_two_stage_brand_partitioned(spark, sf_dir):
    """report_group_skyline runs the bucket-local prune then the
    per-brand sweep — two Window stages, both partitioned (the
    parametrized entity-grain guard separately pins zero
    unpartitioned specs)."""
    plan = _plan(spark, sf_dir, "report_group_skyline")
    assert plan.count("Window") >= 2
    assert "hashpartitioning" in plan.lower()


def test_skyline_dominators_grid_no_cartesian(spark, sf_dir):
    """report_skyline_dominators must decompose dominance counting
    into the broadcast grid + equi-joined boundary strips: no
    CartesianProduct (the only theta join is the bounded G x G cell
    grid against itself, which compiles to a broadcast nested loop),
    and the final top-k rides TakeOrderedAndProject."""
    plan = _plan(spark, sf_dir, "report_skyline_dominators")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # the point-vs-point strip joins are hash equi-joins on the bin id
    assert "hashpartitioning" in plan.lower() or "SortMergeJoin" in plan
