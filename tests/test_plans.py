"""Plan-quality gates: assert the physical plans scale-critical queries
produce are the ones we designed for (pushdown, pruning, broadcast,
TakeOrdered, bounded shuffles) — failing these means a 100 TB regression
even if correctness still passes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from svs_spark.plans import explain as X
from svs_spark.queries import queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registry():
    return queries()


def test_retrieve_topk_is_take_ordered(spark, registry):
    df = registry["retrieve_topk"](spark, SF_DIR)
    assert X.uses_take_ordered(df), "top-k must be TakeOrderedAndProject, not global sort"


def test_retrieve_topk_prunes_columns(spark, registry):
    df = registry["retrieve_topk"](spark, SF_DIR)
    # label column must not be read — only vec_id + embedding
    assert X.reads_only_columns(df, {"vec_id", "embedding"})


def test_point_lookup_pushes_filter(spark, registry):
    df = registry["doc_point_lookup"](spark, SF_DIR)
    assert X.has_pushed_filter(df, "doc_id"), "IN-filter must reach the parquet scan"


def test_retrieve_docs_broadcasts_winners(spark, registry):
    df = registry["retrieve_docs"](spark, SF_DIR)
    assert X.uses_broadcast_join(df), "k winners must broadcast, not shuffle docs"


def test_tpch_q3_broadcasts_customer(spark, registry):
    df = registry["tpch_q3"](spark, SF_DIR)
    assert X.uses_broadcast_join(df)
    assert X.uses_take_ordered(df)


def test_tpch_q1_single_shuffle(spark, registry):
    df = registry["tpch_q1"](spark, SF_DIR)
    # one scan + partial agg + single exchange on the grouping keys
    assert X.count_shuffles(df) <= 1
    assert X.has_pushed_filter(df, "l_shipdate")


def test_tpch_q1_prunes_columns(spark, registry):
    df = registry["tpch_q1"](spark, SF_DIR)
    assert X.reads_only_columns(
        df,
        {"l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax", "l_shipdate"},
    ), "q1 must not scan the join-key columns it doesn't use"


def test_sessionize_single_shuffle(spark, registry):
    df = registry["sessionize_events"](spark, SF_DIR)
    # both windows + the final groupBy key on user_id: one exchange
    # (AQE may add a coalesce read, but only one real repartitioning)
    assert X.count_shuffles(df) <= 2


def test_filter_pushdown_on_level(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = emb.filter(F.col("label") == 3).select("vec_id")
    assert X.has_pushed_filter(df, "label")
    assert X.reads_only_columns(df, {"vec_id", "label"})


def test_tpch_q10_pushes_predicates_and_broadcasts(spark, registry):
    df = registry["tpch_q10ish"](spark, SF_DIR)
    assert X.has_pushed_filter(df, "l_returnflag")
    assert X.has_pushed_filter(df, "o_orderdate")
    assert X.uses_broadcast_join(df)
    assert X.uses_take_ordered(df)


def test_tpch_q19_derives_pushdown_from_disjunction(spark, registry):
    # Catalyst must extract the per-side conjuncts of the OR branches
    # and push them below the join — both scans get PushedFilters.
    df = registry["tpch_q19ish"](spark, SF_DIR)
    assert X.has_pushed_filter(df, "l_quantity")
    assert X.has_pushed_filter(df, "p_brand")
    assert X.uses_broadcast_join(df)


def test_tpch_q22_anti_join_prunes_orders(spark, registry):
    df = registry["tpch_q22ish"](spark, SF_DIR)
    # the anti-join probe side must read only the join key + date filter
    assert X.reads_only_columns(
        df,
        {"c_custkey", "c_acctbal", "c_mktsegment", "o_custkey", "o_orderdate"},
    )


def test_stratified_sample_no_preagg_shuffle(spark, registry):
    # hash predicate evaluates in the scan stage; the only exchange is
    # the reporting groupBy on lang (+ its tiny sort)
    df = registry["stratified_sample"](spark, SF_DIR)
    assert X.count_shuffles(df) <= 2


def test_doc_packing_partitions_window_by_source(spark, registry):
    # the cumulative-sum window must hash-partition on source, never
    # collapse to a single partition (SinglePartition = 100 TB cliff)
    df = registry["doc_packing"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]


def test_range_join_is_hash_join_not_nested_loop(spark, registry):
    # the banded rewrite must plan a hash equi-join; a nested-loop join
    # here means the rewrite regressed to the O(n*m)-per-key plan
    df = registry["range_join_attribution"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:2000]
    assert "HashJoin" in plan


def test_simhash_candidates_equi_join_not_all_pairs(spark, registry):
    """The SimHash candidate stage must be a pigeonhole-banded equi-join
    on (segment, value) — an all-pairs id_a<id_b theta join is O(N²) and
    plans as BroadcastNestedLoopJoin (the round-1 scale-killer)."""
    df = registry["simhash_pairs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:2000]
    assert "Cartesian" not in plan, plan[:2000]


def test_ivf_probe_single_corpus_scan(spark, registry):
    """IVF serving path: cluster ranking reads index metadata (driver-side
    centroids), so the query plan must touch the corpus exactly once —
    the probe scan with a cluster-IN pushdown filter. Round 1 recomputed
    centroids per query (a second full posexplode scan)."""
    df = registry["ann_ivf_probe"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:3000]
    assert X.has_pushed_filter(df, "label"), "probe filter must push down"


def test_tpch_q7_broadcasts_all_dims(spark, registry):
    """Q7ish: four dimension hops (customer, supplier, nation ×2) must
    all broadcast — only the lineitem⋈orders fact join may shuffle."""
    df = registry["tpch_q7ish"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]


def test_tpch_q4_is_semi_join(spark, registry):
    """Q4ish EXISTS must plan as a semi join (no row multiplication)."""
    df = registry["tpch_q4ish"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]


def test_embedding_lsh_candidates_equi_join_not_all_pairs(spark, registry):
    """Every band of the embedding-LSH near-dup must plan as a bucket
    equi-join (hash or sort-merge); a NestedLoop/Cartesian would mean
    Catalyst failed to extract the band-bucket equality as a join key
    and the operator regressed to all-pairs."""
    df = registry["embedding_near_dup_lsh"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:2000]
    assert "Cartesian" not in plan, plan[:2000]


def test_pii_scrub_is_scan_speed(spark, registry):
    """The PII redaction pass must stay entirely in the scan projection:
    the ONLY exchange allowed is the final rangepartitioning for the
    ordered output — any other shuffle means the regex work left the
    scan stage."""
    df = registry["pii_scrub"](spark, SF_DIR)
    assert X.count_shuffles(df) <= 1, X.plan_string(df)[:2000]


def test_corpus_shuffle_is_take_ordered(spark, registry):
    """The shuffle-order sample must come from TakeOrderedAndProject
    (per-partition heaps), never a global sort of the corpus; the
    position window may only run over the ≤100 survivor rows."""
    df = registry["corpus_shuffle"](spark, SF_DIR)
    assert X.uses_take_ordered(df), X.plan_string(df)[:2000]


def test_shard_dealers_window_is_bucket_partitioned(spark, registry):
    """Both shard dealers must hash-partition their corpus-sized window
    by the order-aligned bucket and broadcast the per-bucket offsets —
    the two-level decomposition that replaces the single-task
    `row_number() OVER (ORDER BY ...)`."""
    for name in ("balanced_shards", "token_budget_shards"):
        df = registry[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(_bucket" in plan, (name, plan[:2000])
        assert "BroadcastHashJoin" in plan, (name, plan[:2000])


def test_minhash_candidates_no_pairwise_distinct_exchange(spark, registry):
    """MinHash-LSH candidate generation must dedup multi-band matches
    with the per-row first-agreeing-band filter, not a distinct over
    the matched pair set — a distinct would show up as an extra
    exchange hash-partitioned on (id_a, id_b) before verification
    (100k-doc probe: 33 s → 2.7 s for the identical pair set)."""
    df = registry["minhash_lsh_dedup"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(id_a" not in plan, plan[:3000]


def test_gapfill_windows_share_user_exchange(spark, registry):
    """Both gap-fill variants: the four carry windows and the
    grid-to-actual join must all ride user-keyed hash partitionings —
    no sort-merge join and no per-window re-exchange of the grid."""
    for name in ("gapfill_locf", "gapfill_interpolate"):
        df = registry[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, (name, plan[:2000])
        assert "NestedLoop" not in plan, (name, plan[:2000])


def test_unigram_quality_vocab_join_is_size_gated(spark, registry):
    """The vocabulary join back onto tf is runtime-size-gated, not
    manually hinted (a forced broadcast is an OOM on 1e9-type web-scale
    vocabularies). Two properties, for both unigram-LM queries:

    1. at sf scale AQE's measured vocab size is under the threshold,
       so the FINAL adaptive plan runs a BroadcastHashJoin on tok;
    2. with the threshold disabled (simulating an over-threshold
       vocab) the same query falls back to a plain shuffle join on tok
       and produces IDENTICAL results.
    """
    for name in ("unigram_logprob_quality", "domain_reweighting"):
        df = registry[name](spark, SF_DIR)
        base = sorted(map(tuple, df.collect()))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, (name, plan[:500])
        assert "BroadcastHashJoin [tok" in plan, (name, plan[:3000])
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df2 = registry[name](spark, SF_DIR)
            got = sorted(map(tuple, df2.collect()))
            plan2 = df2._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin [tok" in plan2, (name, plan2[:3000])
            assert "BroadcastHashJoin [tok" not in plan2, (name, plan2[:3000])
            assert got == base, name
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_kmeans_assign_corpus_never_shuffles_for_scoring(spark, registry):
    """Assignment is a pure map (centroid matrix in the task closure,
    GEMM + local argmax per Arrow batch): the ONLY exchange in the
    plan is the final k-row cluster aggregate — no join of any kind,
    no per-vector window."""
    df = registry["kmeans_assign_profile"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert X.count_shuffles(df) <= 1, X.plan_string(df)[:2000]


def test_event_outliers_broadcasts_group_stats(spark, registry):
    """Per-group medians/MADs are tiny aggregates — they must broadcast
    back onto the event stream, never shuffle it."""
    df = registry["event_outliers_mad"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_decontaminate_bloom_filters_train_before_join(spark, registry):
    """The bloom membership conjunction must appear as a codegen'd
    Filter (xxhash64 + getbit against the broadcast bitmap literal) on
    the train side — pruning happens at the scan, before any exchange
    ships train shingles."""
    df = registry["decontaminate_train_bloom"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "getbit" in plan, plan[:2000]
    assert "xxhash64" in plan, plan[:2000]


def test_kmeans_lloyd_round_no_joins_single_shuffle(spark, registry):
    """The full Lloyd iteration must stay join-free: assignment is a
    map (vector carried through the kernel), recompute exchanges only
    (cluster, dim) keys."""
    df = registry["kmeans_lloyd_round"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert X.count_shuffles(df) <= 1, X.plan_string(df)[:2000]


def test_filtered_retrieve_pushes_filter_and_take_ordered(spark, registry):
    """Filtered vector search must score only scan-surviving rows:
    label predicate in PushedFilters, top-k via TakeOrderedAndProject,
    zero exchanges."""
    df = registry["retrieve_topk_filtered"](spark, SF_DIR)
    assert X.has_pushed_filter(df, "label")
    assert X.uses_take_ordered(df)
    assert X.count_shuffles(df) == 0, X.plan_string(df)[:2000]


def test_filtered_ivf_both_predicates_reach_scan(spark, registry):
    """Filtered IVF: cluster-IN-probes AND the metadata bound must both
    be pushed filters on the single corpus scan."""
    df = registry["ann_ivf_filtered"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:3000]
    assert X.has_pushed_filter(df, "label")
    assert X.has_pushed_filter(df, "vec_id")


def test_candlestick_windows_share_one_exchange(spark, registry):
    """Both ranked windows and the final aggregate key on (bucket,
    event_type): Catalyst must reuse one hash exchange, and nothing
    may collapse to a single partition."""
    df = registry["candlestick_hourly"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan.replace(
        "rangepartitioning", ""
    ), plan[:2000]
    assert X.count_shuffles(df) <= 2, X.plan_string(df)[:2000]


def test_rfm_and_pareto_windows_are_bucket_partitioned(spark, registry):
    """The round-3 OLAP segmentation queries must rank/cumsum through
    the two-level decomposition: every corpus-sized window hash-
    partitions on the equi-width value bucket; no `Window.orderBy` with
    an empty partition spec over the customer/part table (the
    single-task sort the round-3 verdict flagged). ntile itself is gone
    from the plan — the tile code is arithmetic on (rank, n)."""
    for name in ("rfm_segments", "pareto_abc_parts"):
        df = registry[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # single-metric path buckets on _bucket; the fused multi-metric
        # path (rfm_segments since r9) on (_sig, _vbucket) — both are
        # the two-level decomposition, never an empty partition spec
        assert (
            "hashpartitioning(_bucket" in plan
            or "hashpartitioning(_sig" in plan
        ), (name, plan[:2000])
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                assert (
                    "windowspecdefinition(_bucket" in line
                    or "windowspecdefinition(_sig" in line
                ), (name, line)
        assert "ntile" not in plan, (name, plan[:2000])


def test_hilbert_key_is_one_codegen_span(spark, registry):
    """The per-level projections of the Hilbert recurrence must stay
    inside ONE WholeStageCodegen span with a LINEAR plan — if
    CollapseProject ever starts inlining the 3-way CASEs, the plan
    explodes 3^bits and this gate catches it as a span/size blowup."""
    df = registry["hilbert_locality_stats"](spark, SF_DIR)
    plan = X.plan_string(df)
    # bit-level projections must not have been inlined into one
    # mega-expression: the plan text stays small
    assert len(plan) < 200_000, len(plan)
    # no per-row join/UDF anywhere in the curve computation; the only
    # nested-loop allowed is the 1-row broadcast bucket-origin join
    # (the accepted crossJoin(broadcast(1-row-agg)) pattern)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # formatted mode prints each node twice (tree + detail): one
    # BroadcastNestedLoopJoin node == 2 occurrences
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_chunk_boundary_single_equi_join(spark, registry):
    """tail==head must be a hash equi-join on 8-byte keys — never a
    cartesian/nested-loop over docs, and no explode (one row per doc
    on each side)."""
    df = registry["chunk_boundary_overlap"](spark, SF_DIR)
    plan = X.plan_string(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Generate" not in plan, "boundary keys must not explode"


def test_containment_reuses_inverted_index_shape(spark, registry):
    """Same plan contract as ngram_jaccard_pairs: shingle equi-join,
    size join on the 8-byte id keys."""
    df = registry["ngram_containment_pairs"](spark, SF_DIR)
    plan = X.plan_string(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_no_forced_broadcast_of_per_doc_tables(spark, registry):
    """The na/nb doc-size relations have ONE ROW PER DOCUMENT — corpus
    cardinality. A forced F.broadcast() hint there OOMs every executor
    at 100 TB (round-4 verdict, What's wrong #1). Detection: with the
    auto-broadcast threshold disabled, a stats-driven broadcast (fine —
    the optimizer knows the table is small) disappears, while a forced
    hint survives. Assert no BroadcastHashJoin remains.

    release_caches() first: the shared-tier pair-stats table may be
    cached from an earlier test WITH stats-driven broadcasts baked
    into its materialized plan — the detection trick only works on a
    plan rebuilt under the disabled threshold."""
    from svs_spark.queries import release_caches

    release_caches()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in (
            "ngram_jaccard_pairs",
            "dedup_clusters",
            "ngram_containment_pairs",
        ):
            df = registry[name](spark, SF_DIR)
            plan = X.plan_string(df, "simple")
            assert "BroadcastHashJoin" not in plan, (name, plan[:2000])
            assert "BroadcastNestedLoop" not in plan, (name, plan[:2000])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # don't leave the no-broadcast plans cached for later tests
        release_caches()


def test_embedding_norm_outliers_no_window_no_explode(spark, registry):
    """The norm fold happens at scan stage: no posexplode of the
    embedding array, no window — one label exchange plus the broadcast
    moments."""
    df = registry["embedding_norm_outliers"](spark, SF_DIR)
    plan = X.plan_string(df)
    assert "Generate" not in plan, "norm must fold per-row, not explode"
    assert "Window" not in plan
    assert X.uses_broadcast_join(df)


def test_theil_sen_pair_join_is_on_daily_aggregate(spark, registry):
    """The O(n^2) self-join must consume the daily AGGREGATE, not raw
    events: both join children aggregate before the join, and the join
    is an equi-join on event_type."""
    df = registry["theil_sen_trend"](spark, SF_DIR)
    plan = X.plan_string(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # both join sides consume the (event_type, day) rollup: the raw
    # events parquet appears at most twice (one scan per side pre-AQE
    # reuse; each node prints twice in formatted mode => <= 4)
    assert plan.count("Scan parquet") <= 4, plan[:1500]


def test_embedding_covariance_single_exchange(spark, registry):
    """The covariance block is moments: map-side-combined integer sums
    to ONE row. Exactly one exchange (the final single-partition agg);
    anything more means the fixed-point fold stopped being a pure
    aggregate."""
    df = registry["embedding_covariance"](spark, SF_DIR)
    plan = X.plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "Broadcast" not in plan, plan[:2000]


def test_quality_score_auc_window_over_aggregate(spark, registry):
    """The AUC window must consume the (source, score) AGGREGATE (its
    input is bounded by score cardinality), never raw corpus rows: the
    plan's Window sits above a HashAggregate, and there is no explode/
    per-row window anywhere."""
    df = registry["quality_score_auc"](spark, SF_DIR)
    plan = X.plan_string(df, "simple")
    assert "Generate" not in plan, plan[:2000]
    w = plan.find("Window")
    assert w != -1, plan[:2000]
    assert "HashAggregate" in plan[w:], plan[w:w + 2000]


def test_tfidf_pairs_no_forced_doc_table_broadcast(spark, registry):
    """tfidf_cosine_pairs joins per-doc norm tables (corpus
    cardinality) — with the auto-broadcast threshold disabled, the
    only broadcasts allowed to survive are the forced 1-row corpus
    stats (BroadcastNestedLoop cross joins, harmless at any scale);
    any surviving BroadcastHashJoin would be a forced per-doc/per-term
    hint (the round-4 OOM shape). Also: the weight table has a
    3-reference fan-out (norms + both pair sides), so it must come
    from the registry cache tier, and the top-2000 cut must be
    TakeOrdered, not a global sort."""
    from svs_spark.queries import release_caches

    release_caches()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry["tfidf_cosine_pairs"](spark, SF_DIR)
        plan = X.plan_string(df, "simple")
        assert "BroadcastHashJoin" not in plan, plan[:2000]
        assert "InMemoryTableScan" in plan, plan[:2000]
        assert "TakeOrderedAndProject" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        release_caches()


def test_sequence_packing_cumsum_is_bucket_partitioned(spark, registry):
    """The packing audit's global token cumsum must run through the
    two-level decomposition: the corpus-sized running-sum window
    hash-partitions on the equi-width doc_id bucket, and the only
    single-partition exchanges feed the bounded (<=1024-row) offsets
    window and the final 1-row aggregates — never the corpus."""
    df = registry["sequence_packing_stats"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_bucket" in plan, plan[:2000]
    # every corpus window must carry a partition spec (_bucket)
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(_bucket" in line, line


def test_semdedup_assignment_is_map_only(spark, registry):
    """SemDeDup's cluster assignment must be the map-only GEMM
    (MapInPandas), never a crossJoin + per-id window; the pairwise
    stage must be an equi-join on cluster_id, not a cartesian
    product."""
    df = registry["semdedup_pairs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:2000]
    # the pair stage must be the per-cluster local-GEMM kernel
    # (grouped-map pandas), not a DataFrame self-join
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_source_length_ks_windows_are_source_partitioned(spark, registry):
    """Both ECDF windows and the argmax rank in the KS query must
    partition by source over the value-cardinality grid — no corpus
    window may collapse to a single partition (the 1-row corpus-total
    aggregate is the only allowed SinglePartition)."""
    df = registry["source_length_ks"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(source" in line, line
    # rank<=1 should be pushed down as a WindowGroupLimit
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_decontaminate_fuzzy_never_broadcasts_doc_sizes(spark, registry):
    """The per-eval-doc shingle-size table is corpus-cardinality — it
    must join as a plain shuffle join on the id key, never via a
    forced broadcast hint (the round-4 verdict's OOM shape). Detection
    mirrors test_no_forced_broadcast_of_per_doc_tables: with the
    auto-broadcast threshold disabled, a stats-driven broadcast
    disappears; only an unconditional F.broadcast() hint survives.
    release_caches() first/last: the query-scoped cached frames
    (g_df/exp/cands since r7) embed their materialization-time plans —
    the detection trick only works on plans rebuilt under the
    disabled threshold."""
    from svs_spark.queries import release_caches

    release_caches()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = registry["decontaminate_fuzzy"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        release_caches()


def test_quantile_align_windows_are_value_cardinality(spark, registry):
    """The decile-boundary query must do all its window work AFTER the
    (source, score) value aggregate: every window in the plan sits
    above a HashAggregate on the distinct-value grid, so window input
    is value-cardinality, never the corpus. Detection: the plan's
    window rows arrive from an aggregate whose grouping includes the
    score column s."""
    df = registry["score_quantile_align"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate(keys=[source" in plan or (
        "HashAggregate(keys=[s#" in plan
    ), plan[:2000]
    # boundary pick must be a bounded range join, not a cartesian of
    # corpus rows
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", ""
    ), plan[:2000]


def test_adamic_adar_degree_joins_before_pair_agg(spark, registry):
    """The per-wedge 1/ln(deg) weight must attach scan-side (join on
    the shared-neighbor id BEFORE the (x,y) aggregate) so the pair
    aggregate combines map-side with the weight already folded in —
    no second pass over the pair set."""
    df = registry["graph_adamic_adar"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    # fixed-point sum, not a float aggregate over doubles
    assert "sum(term" in plan or "sum(aa" in plan or "cast(round" in plan, (
        plan[:2000]
    )


def test_split_leakage_split_flag_is_scan_stage(spark, registry):
    """The train/test flag must be arithmetic on doc_id (no join with a
    split table) — the only joins in the plan are the CC machinery's
    node-keyed equi-joins."""
    df = registry["split_leakage_clusters"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "2654435761" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_rag_chunk_materialized_is_shuffle_free(spark, registry):
    """Chunk materialization is row-local by construction — the plan
    must contain NO Exchange at all (closed-form count → sequence
    explode → substr, one codegen span over the scan)."""
    df = registry["rag_chunk_materialized"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan, plan[:2000]
    assert "Generate" in plan, plan[:2000]  # the sequence explode


def test_decontaminate_fuzzy_is_screen_then_rowwise_verify(spark, registry):
    """round-7 shape: the registered fuzzy path screens with the
    containment-preserving prefix filter (per-eval-doc rarest-shingle
    window — partition key is the eval doc id, never a single global
    partition) and verifies containment per-ROW via array_intersect —
    the exploded (pair × shingle) join+aggregate must not exist. The
    screen is JVM-side codegen end-to-end: no Python kernel remains
    in the plan (the round-6 MinHash MapInPandas screen is gone)."""
    df = registry["decontaminate_fuzzy"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan, plan[:2000]
    assert "MapInPandas" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # the prefix window partitions by the eval doc id
    assert "windowspecdefinition(id_eval" in plan, plan[:2000]
    # rank<=prefix_n is per-doc bounded, so no unpartitioned window
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(id_eval" in line, line


def test_value_drift_ks_windows_are_group_partitioned(spark, registry):
    """The ECDF and argmax windows must partition by the group key
    over the bucket-cardinality grid (≤ types×32 rows) — never a
    single-partition corpus window; the rank<=1 pushes down as a
    WindowGroupLimit."""
    df = registry["value_drift_ks"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(grp" in line, line
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", ""
    ), plan[:2000]


def test_holt_winters_windows_are_series_partitioned(spark, registry):
    """The daily-series row_number and the per-series recurrence must
    both hash-partition on event_type — the corpus never collapses to
    a single partition. The only Python stage is the one applyInPandas
    recurrence (FlatMapGroupsInPandas), fed by the calendar-bounded
    daily aggregate, and the final stats combine map-side."""
    df = registry["holt_winters_forecast"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(event_type" in line, line
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_rank_fusion_uses_two_level_ranks(spark, registry):
    """All three global ranks in the fusion query must run through the
    two-level decomposition (windows hash-partition on the value
    bucket) and the top-100 must be a TakeOrderedAndProject, never a
    global sort."""
    df = registry["quality_rank_fusion"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # fused multi-metric two-level rank (r9): windows hash-partition on
    # (signal, value bucket); never an empty partition spec
    assert "hashpartitioning(_sig" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(_sig" in line, line


def test_script_mix_profile_is_scan_stage_single_aggregate(spark, registry):
    """The script-mix profile must be pure scan-stage codegen (four
    regexp counts per row, NO Python stage) feeding ONE
    map-side-combining aggregate on the source key — at 100 TB this is
    a single pass with a tiny final exchange."""
    df = registry["script_mix_profile"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan[:2000]
    assert "MapInPandas" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]
    # partial aggregation below the exchange (map-side combine)
    assert "partial_count" in plan or "HashAggregate" in plan, plan[:2000]


def test_nfc_audit_is_arrow_batched_single_aggregate(spark, registry):
    """The NFC audit's Python stage must be the Arrow-batched
    mapInPandas kernel (never a row-at-a-time BatchEvalPython), with
    ONE map-side-combining aggregate on source after it."""
    df = registry["nfc_normalization_audit"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_fuzzy_matches_blocked_equi_join(spark, registry):
    """The record-linkage candidate stage must be an equi-join on the
    block key (hash join; the id inequality and the distance threshold
    ride as post-join filters) — a NestedLoop/Cartesian here means the
    blocking regressed to all-pairs O(N²)."""
    df = registry["customer_fuzzy_matches"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:2000]
    assert "Cartesian" not in plan, plan[:2000]
    assert "HashJoin" in plan, plan[:2000]
    # top-50 must be TakeOrdered, never a global sort of all pairs
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_gopher_flags_single_pass_codegen(spark, registry):
    """Every quality rule must ride the scan stage (JVM codegen — no
    Python anywhere) into ONE map-side-combining aggregate on source."""
    df = registry["gopher_quality_flags"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan[:2000]
    assert "MapInPandas" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_seasonal_mase_windows_on_aggregated_series(spark, registry):
    """The lag windows must run AFTER the (event_type, hour) aggregate —
    i.e. on the time-cardinality series, not the raw events. Plan order:
    HashAggregate(partial) -> Exchange -> HashAggregate -> Exchange ->
    Window. A Window before the first aggregate would shuffle every raw
    event into per-type single partitions (the 100 TB killer)."""
    df = registry["seasonal_naive_mase"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan[:2000]
    # the tree prints root-first, so everything after the Window node is
    # its subtree: the (event_type, hour) aggregate must be IN there
    # (window reads the aggregated series), and the subtree must contain
    # exactly one exchange (the agg's own shuffle) — the raw scan never
    # feeds the window directly
    below_window = plan.split("Window", 1)[1]
    assert "HashAggregate" in below_window, plan[:2000]
    assert plan.count("Exchange") <= 3, plan[:2000]


def test_interval_overlap_is_equi_join(spark, registry):
    """The overlap join must be an equi-join on user_id with the
    interval predicate as a residual — a NestedLoop here is the O(n²)
    interval-join regression."""
    df = registry["interval_overlap_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:2000]
    assert "Cartesian" not in plan, plan[:2000]
    assert "HashJoin" in plan, plan[:2000]


def test_pareto_frontier_broadcasts_price_table(spark, registry):
    """The frontier predicate table (one row per distinct price) must
    come back to the part scan as a BROADCAST join; the window must be
    the only single-partition stage (it runs on price cardinality, not
    part cardinality)."""
    df = registry["pareto_frontier_parts"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "Cartesian" not in plan, plan[:2000]
    assert "NestedLoop" not in plan, plan[:2000]


def test_event_disorder_windows_are_bucket_partitioned(spark, registry):
    """The running max must go through the TWO-LEVEL decomposition:
    the corpus-sized window partitions on (event_type, _bucket) and
    the cross-bucket prefix window runs only over the bounded offsets
    table — no window may partition the corpus by event_type alone
    (that single-tasks a type's full history at scale)."""
    df = registry["event_disorder_audit"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    saw_bucketed = False
    for line in plan.splitlines():
        if "windowspecdefinition(event_type" in line:
            assert "_bucket" in line, line
            saw_bucketed = True
    assert saw_bucketed, plan[:2000]
    assert "BatchEvalPython" not in plan


def test_join_key_skew_audit_two_exchanges_only(spark, registry):
    """One key-agg exchange (the same the audited join would pay) plus
    the single-row global fold — nothing else; no window, no join."""
    df = registry["join_key_skew_audit"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3, plan[:2000]  # key agg + global
    assert "Window" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_hard_negative_mining_is_one_scan_kernel(spark, registry):
    """The mask lives INSIDE the Arrow kernel: exactly one
    FlatMapGroups/MapInPandas stage over one corpus scan, no join
    against a label table, no cartesian, and the global resolve is a
    per-query window over ≤ k·q·partitions rows."""
    df = registry["hard_negative_mining"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan
    assert plan.count("Scan parquet") <= 2, plan[:2000]


def test_distinct_ngram_diversity_no_join(spark, registry):
    """n-grams are intra-row transforms: three Generate stages union
    into one two-phase distinct aggregate — no join anywhere, and the
    distinct runs on the 8-byte hashed gram (xxhash64 in the plan)."""
    df = registry["distinct_ngram_diversity"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Generate") == 3, plan[:2000]
    assert "xxhash64" in plan, plan[:2000]


def test_retrieval_ndcg_label_totals_are_aggregates(spark, registry):
    """The eval join is the bounded brute force (allowlisted); the
    n_rel_total side must come from a label-cardinality aggregate
    joined back broadcast — never a second corpus-sized shuffle —
    and the DCG terms are literals (no log2 in the plan)."""
    df = registry["retrieval_ndcg_eval"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "LOG2" not in plan.upper().replace("LOGICAL", ""), plan[:2000]
    assert "BatchEvalPython" not in plan


def test_contrastive_triplets_one_scan_kernel(spark, registry):
    """Both roles come from ONE Arrow kernel over one corpus scan —
    no per-role second scan, no label join, no cartesian."""
    df = registry["contrastive_triplets"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:2000]
    assert plan.count("Scan parquet") <= 2, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan
