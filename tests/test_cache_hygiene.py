"""Invariant 25 / round-4 verdict What's wrong #3: persists inside
registered queries must not outlive the query. cached() scopes every
such persist to the registry — building the next query (or calling
release_caches()) unpersists the previous query's working set, so a
long-lived session (the driver's 50-query window, the bench loop) never
accumulates dead InMemoryRelations.
"""

from __future__ import annotations

from svs_spark.queries import queries, release_caches
from tests.conftest import SF_DIR

# Cache-using queries WITHOUT localCheckpoint (localCheckpoint RDDs are
# persisted by Spark itself and released asynchronously by the
# ContextCleaner after GC, so they can't be asserted on synchronously).
CACHE_USERS = [
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "graph_motif_stats",
    "winnow_pairs",
    "tpch_q15ish",
    # operator-INTERNAL persists (svs_spark.cache_hooks.persist_tracked):
    # the MinHash/SimHash signature tables and the span-ladder levels
    "minhash_lsh_dedup",
    "simhash_pairs",
    "decontaminate_minhash",
    "longest_dup_span",
]


def _persisted_ids(spark) -> set[int]:
    return set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )


def test_registered_queries_release_their_caches(spark):
    registry = queries()
    before = _persisted_ids(spark)
    for name in CACHE_USERS:
        df = registry[name](spark, SF_DIR)
        df.collect()
        # building the NEXT query releases this one's caches; the last
        # one is released by the explicit call below
    release_caches()
    leaked = _persisted_ids(spark) - before
    assert not leaked, f"leaked cached RDD ids: {sorted(leaked)}"


def test_same_query_rerun_keeps_caches_warm(spark):
    """bench.py warms each query then times repeated runs: rebuilding
    the SAME query must not release its per-query caches (CacheManager
    swaps the warm InMemoryRelation into the identical rebuilt
    subplan), while building a DIFFERENT query must. winnow_pairs is
    the probe because its cached() fingerprint table is per-query
    (not shared-tier)."""
    registry = queries()
    release_caches()
    before = _persisted_ids(spark)
    registry["winnow_pairs"](spark, SF_DIR).collect()
    warm = _persisted_ids(spark) - before
    assert warm, "expected winnow_pairs to persist its fingerprints"
    # same name again: caches survive the rebuild
    registry["winnow_pairs"](spark, SF_DIR).collect()
    assert warm <= _persisted_ids(spark)
    # different name: the previous query's caches are released
    registry["tpch_q1"](spark, SF_DIR).collect()
    assert not (warm & _persisted_ids(spark))
    release_caches()


def test_shared_corpus_index_survives_query_switch(spark):
    """The shared tier (trigram inverted index + pair-intersection
    table) outlives individual queries: five n-gram-family queries
    derive from it, so it is released only by release_caches() or by
    switching corpus (sf_dir)."""
    registry = queries()
    release_caches()
    before = _persisted_ids(spark)
    registry["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    shared = _persisted_ids(spark) - before
    assert shared, "expected the shared trigram index to persist"
    # a DIFFERENT query does not evict the shared tier...
    registry["ngram_containment_pairs"](spark, SF_DIR).collect()
    assert shared <= _persisted_ids(spark)
    # ...and full release clears it
    release_caches()
    assert not (shared & _persisted_ids(spark))


def test_release_is_idempotent_and_correctness_safe(spark):
    registry = queries()
    df = registry["ngram_jaccard_pairs"](spark, SF_DIR)
    n1 = df.count()
    release_caches()
    release_caches()
    # unpersisted lineage recomputes to the same answer
    assert df.count() == n1
