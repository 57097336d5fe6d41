"""Incremental MinHash dedup must report exactly the pairs a full run
over old ∪ new reports for pairs touching the new batch — the index
changes the COST shape (only the increment is shingled), never the
answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators import dedup as D
from svs_spark.queries import load


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    docs = load(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 3)
    new = docs.filter(F.col("doc_id") % 10 == 3)
    idx = str(tmp_path_factory.mktemp("mhidx") / "index")
    D.build_minhash_index(old, idx)
    return docs, old, new, idx


def _pairs(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_incremental_equals_full_restricted(spark, split_corpus):
    docs, old, new, idx = split_corpus
    full = D.minhash_lsh_pairs(docs)
    touching = full.filter(
        (F.col("id_a") % 10 == 3) | (F.col("id_b") % 10 == 3)
    )
    inc = D.minhash_incremental_pairs(spark, new, idx)
    got, want = _pairs(inc), _pairs(touching)
    assert got == want and len(want) > 0


def test_second_increment_after_append(spark, split_corpus):
    """Fold increment 1 into the index, then dedup increment 2 against
    it: again exactly the full run's pairs touching increment 2."""
    docs, old, new, idx = split_corpus
    D.append_minhash_index(new, idx)
    inc2_docs = docs.filter(F.col("doc_id") % 10 == 7).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    grown = docs.unionByName(inc2_docs)
    full = D.minhash_lsh_pairs(grown)
    touching2 = full.filter(
        (F.col("id_a") >= 1_000_000) | (F.col("id_b") >= 1_000_000)
    )
    inc2 = D.minhash_incremental_pairs(spark, inc2_docs, idx)
    got, want = _pairs(inc2), _pairs(touching2)
    assert got == want and len(want) > 0


def test_incremental_reads_index_not_recompute(spark, split_corpus):
    """Cost-shape gate: the old corpus must enter the plan as a parquet
    scan of the INDEX (pre-computed signatures), and every shingling
    kernel (MapInPandas) in the tree must sit over the increment's
    rows, never over the old documents table. The pre-materialization
    plan repeats the persisted new-side subtree per consumer, so we
    check provenance, not stage counts."""
    docs, old, new, idx = split_corpus
    plan = (
        D.minhash_incremental_pairs(spark, new, idx)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "mhidx" in plan, plan[:3000]  # index parquet scanned
    # the only documents.parquet scans feed the increment filter
    # (doc_id % 10 = 3) — the old partition is never re-shingled
    import re

    doc_scans = plan.count("documents.parquet")
    inc_filters = len(re.findall(r"% 10\)[^=]*= 3", plan))
    assert doc_scans > 0 and inc_filters >= doc_scans, plan[:3000]


def test_block_rewrite_invariants(spark):
    """Reconstruction invariants of dedup_block_rewrite: untouched
    documents rebuild byte-identically; removed counts bound the
    length delta exactly (every block is k chars except one tail)."""
    docs = load(spark, SF_DIR, "documents")
    out = D.dedup_block_rewrite(docs, k=20)
    joined = out.join(docs, "doc_id").select(
        "doc_id", "n_blocks", "n_removed", "cleaned", "text"
    )
    rows = joined.collect()
    assert rows
    touched = 0
    for r in rows:
        n_tail = len(r.text) - (r.n_blocks - 1) * 20  # last block length
        assert 1 <= n_tail <= 20
        if r.n_removed == 0:
            assert r.cleaned == r.text, r.doc_id
        else:
            touched += 1
            # cleaned = original minus the removed blocks' characters
            removed_chars = len(r.text) - len(r.cleaned)
            lo = (r.n_removed - 1) * 20 + 1  # tail may be among removed
            hi = r.n_removed * 20
            assert lo <= removed_chars <= hi, r.doc_id
    assert touched > 0


def test_text_operators_survive_pathological_docs(spark):
    """No text operator may crash on degenerate documents: empty, all
    spaces, single char, exact block/window lengths, unicode, and one
    long doc (sequence() raises on inverted boundaries — each operator
    must pre-filter what it cannot window)."""
    rows = [
        (1, ""),
        (2, " "),
        (3, "x"),
        (4, "a" * 20),              # exactly one block
        (5, "b" * 30),              # exactly one window
        (6, "naïve café ümlaut"),   # non-ASCII
        (7, ("tok " * 2000).strip()),  # long doc
        (8, "  double  spaces  "),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "source", F.lit("s")
    )
    assert D.dedup_block_rewrite(docs).count() == 7  # doc 1 has no blocks
    assert D.dup_substring_stats(docs).count() >= 1
    assert D.substring_windows(docs).count() >= 1
    assert D.boilerplate_line_stats(docs).count() >= 1
    assert D.longest_dup_span_pow2(docs).count() >= 1
    assert D.minhash_signatures(docs).count() >= 1


def test_recall_telemetry_on_planted_dups(spark, split_corpus):
    """The per-increment recall probe: truth = exact Jaccard over
    (new × index-sample) ∪ (new × new); the banded path must surface
    (nearly) all of it on an increment with planted near-dups of
    indexed docs, and the report must carry the counts (observable
    drift, VERDICT r3 #8)."""
    docs, old, new, idx = split_corpus
    rep = D.minhash_index_recall_telemetry(
        spark, new, idx, sample_rows=3000
    )
    assert set(rep) == {"true_pairs", "found_pairs", "recall"}
    assert rep["true_pairs"] > 0, "fixture must contain true near-dups"
    # 16-hash/4-band LSH at J>=0.5: the committed recall floor from
    # tests/test_properties.py; the sf0.001 dups are near-identical so
    # the probe should sit well above it
    assert rep["recall"] >= 0.75, rep


def test_recall_telemetry_no_true_pairs_is_one(spark, split_corpus):
    """An increment with no near-dups of anything: recall reports 1.0
    (nothing to miss), not a 0/0 crash."""
    docs, old, new, idx = split_corpus
    lone = spark.createDataFrame(
        [(9_999_991, "completely unrelated singleton text payload")],
        "doc_id long, text string",
    )
    rep = D.minhash_index_recall_telemetry(spark, lone, idx)
    assert rep == {"true_pairs": 0, "found_pairs": 0, "recall": 1.0}


class TestBipartiteLsh:
    def test_bipartite_equals_allpairs_cross_split(self, spark):
        """The bipartite screen must find exactly the all-pairs LSH
        pairs that cross the split (orientation train→eval), and no
        within-side pair."""
        from pyspark.sql import functions as F

        from svs_spark.operators.dedup import (
            minhash_lsh_bipartite,
            minhash_lsh_pairs,
        )
        from tests.conftest import SF_DIR_ORACLE

        docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
        split = (
            (F.col("did") * F.lit(2654435761))
            % F.lit(4294967296) % F.lit(1000)
            >= 900
        )
        got = {
            (r["id_left"], r["id_right"]): r["jaccard"]
            for r in minhash_lsh_bipartite(
                docs, right_side=split, jaccard_threshold=0.5
            ).collect()
        }

        def is_test(i):
            return (i * 2654435761) % 4294967296 % 1000 >= 900

        allp = minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, jaccard_threshold=0.5
        ).collect()
        want = {}
        for r in allp:
            a, b = r["id_a"], r["id_b"]
            if is_test(a) != is_test(b):
                tr, ev = (a, b) if is_test(b) else (b, a)
                want[(tr, ev)] = r["jaccard"]
        assert got == want
        assert len(got) > 0
        for tr, ev in got:
            assert not is_test(tr) and is_test(ev)
