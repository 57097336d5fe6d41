"""knn_join_batch (one-scan bulk retrieval) must produce exactly the
per-query knn_join / retrieve_topk results."""

from __future__ import annotations

from pyspark.sql import functions as F

from svs_spark.operators.ann import knn_join
from svs_spark.operators.similarity import knn_join_batch, retrieve_topk
from tests.conftest import SF_DIR


def test_matches_per_query_knn_join(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = emb.filter(F.col("vec_id") >= 10)
    ref = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["score"], 6))
        for r in knn_join(queries, cands, 5).collect()
    }
    qlist = [(r["query_id"], r["embedding"]) for r in queries.collect()]
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["score"], 6))
        for r in knn_join_batch(cands, qlist, 5).collect()
    }
    assert ref == got and len(got) == 50


def test_single_query_matches_retrieve(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    expected = [
        (r["vec_id"], round(r["score"], 6))
        for r in retrieve_topk(emb, q, 10).collect()
    ]
    got = [
        (r["vec_id"], round(r["score"], 6))
        for r in knn_join_batch(emb, [(0, q)], 10)
        .orderBy("rank")
        .collect()
    ]
    assert got == expected


def test_tie_at_k_boundary_keeps_id_desc_winner(spark):
    """Many identical scores straddling the k boundary within one batch:
    the batch-local pruner must not drop the id-desc tie winners that
    the global window would have ranked in (ADVICE r1). Duplicate unit
    vectors make every score equal, so top-k must be the k HIGHEST ids."""
    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    rows = [(i, base) for i in range(200)]  # all tied
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        r["vec_id"]
        for r in knn_join_batch(emb, [(0, base)], 7).orderBy("rank").collect()
    ]
    assert got == list(range(199, 192, -1))


def test_near_tie_rounding_boundary(spark):
    """Scores that differ only past the 6th decimal are ties after
    rounding; selection must follow rounded-score-then-id-desc order."""
    import numpy as np

    dim = 4
    rng = np.random.default_rng(5)
    rows = []
    for i in range(50):
        v = np.array([1.0, 1e-9 * rng.random(), 0.0, 0.0])
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]
    expected = [
        (r["vec_id"], round(r["score"], 6))
        for r in retrieve_topk(emb, q, 10).collect()
    ]
    got = [
        (r["vec_id"], round(r["score"], 6))
        for r in knn_join_batch(emb, [(0, q)], 10).orderBy("rank").collect()
    ]
    assert got == expected
