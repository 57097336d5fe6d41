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


def test_release_is_idempotent_and_correctness_safe(spark):
    registry = queries()
    df = registry["ngram_jaccard_pairs"](spark, SF_DIR)
    n1 = df.count()
    release_caches()
    release_caches()
    # unpersisted lineage recomputes to the same answer
    assert df.count() == n1
