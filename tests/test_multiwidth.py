"""knn_join_multiwidth (the matryoshka one-GEMM fusion, r8 verdict
ask #3) must equal the per-width composition — slice the corpus and
queries to each width, run knn_join_batch — row-for-row: same ids,
same rounded-6 scores, same (score desc, id desc) rank resolution,
including tie-heavy corpora where the boundary-ties-kept discipline is
load-bearing."""

from __future__ import annotations

import numpy as np
import pytest

from svs_spark.operators.similarity import (
    knn_join_batch,
    knn_join_multiwidth,
)

DIM = 32
WIDTHS = (8, 16, 32)


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)


def _rand_unit(rng, n, d=DIM):
    m = rng.standard_normal((n, d))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _qbatch(rng, q, d=DIM):
    qm = _rand_unit(rng, q, d)
    return [(1000 + i, [float(x) for x in v]) for i, v in enumerate(qm)]


def _fused_rows(df, qbatch, k, widths):
    return {
        (r["dims"], r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in knn_join_multiwidth(df, qbatch, k, widths).collect()
    }


def _composed_rows(spark, vecs, qbatch, k, widths):
    from pyspark.sql import functions as F

    out = set()
    df = _df(spark, vecs)
    for w in widths:
        dfw = df.select(
            "vec_id", F.slice("embedding", 1, w).alias("embedding")
        )
        qw = [(qid, v[:w]) for qid, v in qbatch]
        for r in knn_join_batch(dfw, qw, k).collect():
            out.add((w, r["query_id"], r["vec_id"], r["score"], r["rank"]))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_equals_composition_random(spark, seed):
    rng = np.random.default_rng(seed)
    vecs = _rand_unit(rng, 150)
    qbatch = _qbatch(rng, 5)
    got = _fused_rows(_df(spark, vecs), qbatch, 7, WIDTHS)
    want = _composed_rows(spark, vecs, qbatch, 7, WIDTHS)
    assert got == want
    assert len(got) == len(WIDTHS) * len(qbatch) * 7


def test_fused_equals_composition_duplicates(spark):
    """Duplicate vectors force exact score ties at every width — the
    ties-kept local selection plus the id-desc window must agree with
    the composition on which duplicates make the cut."""
    rng = np.random.default_rng(9)
    base = _rand_unit(rng, 20)
    vecs = np.vstack([base, base, base])
    qbatch = _qbatch(rng, 3)
    got = _fused_rows(_df(spark, vecs), qbatch, 5, WIDTHS)
    want = _composed_rows(spark, vecs, qbatch, 5, WIDTHS)
    assert got == want


def test_full_width_matches_knn_join_batch(spark):
    """At the full dimension the fused kernel's accumulated sum IS the
    full dot — its top-k must equal plain knn_join_batch exactly."""
    rng = np.random.default_rng(4)
    vecs = _rand_unit(rng, 100)
    qbatch = _qbatch(rng, 4)
    df = _df(spark, vecs)
    fused = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in knn_join_multiwidth(df, qbatch, 6, [DIM]).collect()
    }
    plain = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in knn_join_batch(df, qbatch, 6).collect()
    }
    assert fused == plain


def test_k_larger_than_corpus(spark):
    rng = np.random.default_rng(6)
    vecs = _rand_unit(rng, 5)
    qbatch = _qbatch(rng, 2)
    got = _fused_rows(_df(spark, vecs), qbatch, 10, (8, 16))
    # every corpus row appears for every (width, query)
    assert len(got) == 2 * 2 * 5


def test_width_validation(spark):
    rng = np.random.default_rng(8)
    df = _df(spark, _rand_unit(rng, 4))
    qbatch = _qbatch(rng, 1)
    with pytest.raises(ValueError):
        knn_join_multiwidth(df, qbatch, 3, [])
    with pytest.raises(ValueError):
        knn_join_multiwidth(df, qbatch, 3, [0, 8])
    with pytest.raises(ValueError):
        knn_join_multiwidth(df, qbatch, 3, [8, DIM + 1])


def test_duplicate_widths_deduped(spark):
    rng = np.random.default_rng(12)
    vecs = _rand_unit(rng, 30)
    qbatch = _qbatch(rng, 2)
    a = _fused_rows(_df(spark, vecs), qbatch, 4, (8, 8, 16))
    b = _fused_rows(_df(spark, vecs), qbatch, 4, (8, 16))
    assert a == b
