"""Streaming near-dup screen vs its batch twin: draining the document
stream through the stream-static MinHash screen must flag exactly the
(new × indexed) pairs the batch incremental operator reports.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators import dedup as D
from svs_spark.queries import load
from svs_spark.streaming.dedup_screen import (
    admit_stream,
    near_dup_pairs_stream,
)
from svs_spark.streaming.decontaminate import stream_docs
from svs_spark.streaming.sessions import run_to_memory


@pytest.fixture(scope="module")
def corpus_index(spark, tmp_path_factory):
    docs = load(spark, SF_DIR, "documents")
    # the "existing corpus" = docs with id % 10 != 3; the stream will
    # replay the FULL documents table, of which the % 10 == 3 slice is
    # genuinely new (disjoint ids mimic a landing zone of new docs; the
    # rest are exact re-deliveries that the screen flags as dups of
    # themselves' absence — they're not in the index, see filter below)
    old = docs.filter(F.col("doc_id") % 10 != 3)
    idx = str(tmp_path_factory.mktemp("mhscreen") / "index")
    D.build_minhash_index(old, idx)
    return docs, old, idx


def test_stream_screen_matches_batch_incremental(spark, corpus_index):
    docs, old, idx = corpus_index
    stream = stream_docs(spark, SF_DIR).filter(F.col("doc_id") % 10 == 3)
    flagged = near_dup_pairs_stream(stream, spark, idx)
    run_to_memory(flagged, "screen_pairs", output_mode="append")
    got = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in spark.table("screen_pairs").collect()
    }

    new = docs.filter(F.col("doc_id") % 10 == 3)
    batch = D.minhash_incremental_pairs(spark, new, idx)
    # restrict to the (new × indexed) half — the screen's contract
    want = {
        (b, a, j) if (b % 10 == 3) else (a, b, j)
        for a, b, j in (
            (r.id_a, r.id_b, r.jaccard) for r in batch.collect()
        )
        if (a % 10 == 3) != (b % 10 == 3)
    }
    assert got == want and len(want) > 0


def test_admission_gate_complements_flags(spark, corpus_index, tmp_path):
    docs, old, idx = corpus_index
    stream = stream_docs(spark, SF_DIR).filter(F.col("doc_id") % 10 == 3)
    sink = str(tmp_path / "admitted")
    q = admit_stream(
        stream, spark, idx, sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    admitted_ids = {
        r.doc_id for r in spark.read.parquet(sink).collect()
    }
    flagged_ids = {
        r.new_id for r in spark.table("screen_pairs").collect()
    }
    all_new = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 10 == 3).collect()
    }
    assert admitted_ids == all_new - flagged_ids
    assert admitted_ids and flagged_ids
