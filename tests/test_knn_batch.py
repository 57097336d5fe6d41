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
