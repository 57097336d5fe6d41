"""Streaming contrastive/hard-negative export (streaming/contrastive.py)
vs the batch kernel: an availableNow drain over the embeddings corpus
must produce EXACTLY contrastive_pair_join's rows — scores, ids, roles
and ranks — including under multi-trigger splits where the per-batch
top-k + driver merge decomposition is load-bearing."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators.similarity import contrastive_pair_join
from svs_spark.streaming.contrastive import (
    contrastive_export_stream,
    merge_topk,
)

K = 3
N_ANCHORS = 6


def _anchors(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = (
        emb.filter(F.col("vec_id") < N_ANCHORS)
        .select("vec_id", "label", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [
        (int(r["vec_id"]), int(r["label"]), list(r["embedding"])) for r in rows
    ]


def _batch_want(spark, qvecs):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return {
        (r.query_id, r.role, r.vec_id, r.score, r.rank)
        for r in contrastive_pair_join(emb, qvecs, K).collect()
    }


def test_single_drain_matches_batch(spark):
    qvecs = _anchors(spark)
    src = f"{SF_DIR}/embeddings.parquet"
    schema = spark.read.parquet(src).schema
    from svs_spark.streaming import stage_single_file_dir

    staged = stage_single_file_dir(src, "embeddings.parquet")
    stream = spark.readStream.schema(schema).parquet(staged)
    q = contrastive_export_stream(stream, qvecs, K, "triplets_single")
    q.awaitTermination()
    got = {
        (r.query_id, r.role, r.vec_id, r.score, r.rank)
        for r in spark.table("triplets_single").collect()
    }
    want = _batch_want(spark, qvecs)
    assert got == want and len(got) == N_ANCHORS * 2 * K


def test_two_trigger_split_matches_batch(spark, tmp_path):
    """Corpus split across two triggers such that each anchor's true
    winners straddle the split — the running merge must still equal
    the one-shot batch window row-for-row."""
    qvecs = _anchors(spark)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").toPandas()
    half = len(emb) // 2
    src = tmp_path / "embstream"
    src.mkdir()
    emb.iloc[:half].to_parquet(src / "part-a.parquet")
    emb.iloc[half:].to_parquet(src / "part-b.parquet")
    now = time.time()
    os.utime(src / "part-a.parquet", (now - 10, now - 10))
    os.utime(src / "part-b.parquet", (now, now))

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = contrastive_export_stream(stream, qvecs, K, "triplets_two")
    q.awaitTermination()
    got = {
        (r.query_id, r.role, r.vec_id, r.score, r.rank)
        for r in spark.table("triplets_two").collect()
    }
    assert got == _batch_want(spark, qvecs)


def _replay(sf_dir: str, qvecs, k: int):
    """Independent pandas/NumPy replay of the batch triplet semantics
    (the lateness-style second oracle, r8 verdict ask #7): float64
    dots rounded to 6dp, pos = same label minus self id, neg =
    different label, (score desc, vec_id desc) order, rank 1..k. No
    Spark, no kernel code — only the documented contract."""
    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    labs = emb["label"].to_numpy().astype("int64")
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    out = set()
    for qid, qlab, vec in qvecs:
        scores = np.round(mat @ np.asarray(vec, dtype=np.float64), 6)
        for role in ("pos", "neg"):
            if role == "pos":
                elig = (labs == qlab) & (ids != qid)
            else:
                elig = labs != qlab
            idx = np.nonzero(elig)[0]
            order = sorted(
                idx, key=lambda i: (-scores[i], -ids[i])
            )[:k]
            for rank, i in enumerate(order, start=1):
                out.add((qid, role, int(ids[i]), float(scores[i]), rank))
    return out


def test_drain_matches_pandas_replay(spark):
    """Stream drain vs the independent replay oracle — gates the
    streaming op without any shared kernel code (streaming ops can't
    be driver-gated; this is the replay-equality substitute)."""
    qvecs = _anchors(spark)
    src = f"{SF_DIR}/embeddings.parquet"
    schema = spark.read.parquet(src).schema
    from svs_spark.streaming import stage_single_file_dir

    staged = stage_single_file_dir(src, "embeddings.parquet")
    stream = spark.readStream.schema(schema).parquet(staged)
    q = contrastive_export_stream(stream, qvecs, K, "triplets_replay")
    q.awaitTermination()
    got = {
        (r.query_id, r.role, r.vec_id, r.score, r.rank)
        for r in spark.table("triplets_replay").collect()
    }
    assert got == _replay(SF_DIR, qvecs, K)


def test_merge_topk_replay_idempotent():
    """foreachBatch is at-least-once: re-merging an already-seen
    micro-batch's rows must leave the top-k unchanged, and a replayed
    duplicate must never seat the same vec_id twice (r8 ADVICE)."""
    best: dict = {}
    batch = [(1, "neg", 10, 0.5), (1, "neg", 11, 0.7), (1, "neg", 12, 0.6)]
    merge_topk(best, batch, k=2)
    want = [(0.7, 11), (0.6, 12)]
    assert best[(1, "neg")] == want
    merge_topk(best, batch, k=2)  # replay the identical batch
    assert best[(1, "neg")] == want
    # replayed duplicate of the current leader + one genuine new row:
    # the new distinct candidate must not be displaced by a dup seat
    merge_topk(best, [(1, "neg", 11, 0.7), (1, "neg", 13, 0.65)], k=2)
    assert best[(1, "neg")] == [(0.7, 11), (0.65, 13)]
    # same vec re-observed at a higher score keeps one seat, max score
    merge_topk(best, [(1, "neg", 13, 0.9)], k=2)
    assert best[(1, "neg")] == [(0.9, 13), (0.7, 11)]


def test_merge_topk_tie_order_and_truncation():
    """Driver-merge unit semantics: (score desc, id desc) order, exact
    k truncation, later batches can displace earlier winners."""
    best: dict = {}
    merge_topk(best, [(1, "neg", 10, 0.5), (1, "neg", 11, 0.5),
                      (1, "neg", 12, 0.4)], k=2)
    assert best[(1, "neg")] == [(0.5, 11), (0.5, 10)]
    merge_topk(best, [(1, "neg", 13, 0.6)], k=2)
    assert best[(1, "neg")] == [(0.6, 13), (0.5, 11)]
