"""Streaming contrastive-triplet / hard-negative EXPORT — the online
twin of the batch ``contrastive_triplets`` / ``hard_negative_mining``
queries (operators/similarity.contrastive_pair_join), completing the
fine-tune data path's online form alongside the decontamination and
quality gates (streaming/decontaminate.py).

Use case: the corpus of candidate positives/negatives STREAMS in (new
embeddings land continuously from an encoder job); the labeled anchor
batch is STATIC (the fine-tune's current anchors). Each micro-batch is
mined with the exact batch kernel — one GEMM per Arrow batch, label
masks applied INSIDE the kernel before local selection, per-(anchor,
role) local top-k — and a driver-side running top-k merges batches.

Why this decomposition is exact: the batch operator is already
"bounded local candidates, then a global (query, role) window". A
micro-batch drain produces the same local candidate sets (boundary
ties included — the kernel keeps every row tied with the k-th), and
top-k-of-top-ks is top-k, so the running merge equals the one-shot
global window row-for-row. The stream≡batch equality test
(tests/test_streaming_contrastive.py) pins that.

Scale shape: per trigger the exchange carries ≤ 2·k·q rows (the
kernel's contract); the carried "state" is the running top-k itself —
≤ 2·k·q (score, id) pairs on the DRIVER, constant in corpus size, no
state store and no watermark needed (scores only ever improve; late
rows can raise, never invalidate, an exported candidate). Role
projection: ``role='neg'`` rows are exactly the hard-negative export
(same mask as hard_negative_join); ``role='pos'`` the hardest
positives.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from svs_spark.operators.similarity import contrastive_pair_join

_SINK_SCHEMA = (
    "query_id long, role string, vec_id long, score double, rank int"
)


def merge_topk(
    best: dict,
    rows: "Sequence[tuple[int, str, int, float]]",
    k: int,
) -> None:
    """Fold new candidate rows (query_id, role, vec_id, score) into
    the running per-(query, role) top-k. ``best`` maps
    (query_id, role) -> list of (score, vec_id), kept sorted by
    (score desc, vec_id desc) and truncated to k — the exact order the
    batch window ranks by, so top-k-of-top-ks stays exact.

    Idempotent under replay: candidates dedupe on vec_id (max score
    wins) before truncation, so an at-least-once re-delivery of a
    micro-batch (foreachBatch's contract after a restart) re-merges to
    the identical top-k instead of seating the same vec_id twice and
    displacing a legitimate distinct candidate."""
    touched = set()
    for qid, role, vid, score in rows:
        key = (qid, role)
        best.setdefault(key, []).append((score, vid))
        touched.add(key)
    for key in touched:
        by_vid: dict = {}
        for score, vid in best[key]:
            if vid not in by_vid or score > by_vid[vid]:
                by_vid[vid] = score
        best[key] = sorted(
            ((score, vid) for vid, score in by_vid.items()),
            key=lambda t: (-t[0], -t[1]),
        )[:k]


def contrastive_export_stream(
    stream: DataFrame,
    query_vecs: "list[tuple[int, int, Sequence[float]]]",
    k: int,
    sink_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
):
    """foreachBatch driver: mine each micro-batch of labeled corpus
    vectors against the static anchor batch with the batch kernel,
    merge into the running top-k, and publish the current export as
    ``sink_table`` (a temp view in this helper; production swaps the
    writer for kafka/delta/parquet). Returns the started query
    (caller awaits). After an availableNow drain over a static corpus
    the view equals ``contrastive_pair_join`` over that corpus."""
    spark = stream.sparkSession
    best: dict = {}

    def sink(batch: DataFrame, _bid: int) -> None:
        rows = [
            (r["query_id"], r["role"], int(r[id_col]), float(r["score"]))
            for r in contrastive_pair_join(
                batch, query_vecs, k, id_col=id_col, vec_col=vec_col,
                label_col=label_col,
            ).collect()
        ]
        merge_topk(best, rows, k)
        out = [
            (qid, role, int(vid), float(score), rank + 1)
            for (qid, role), lst in best.items()
            for rank, (score, vid) in enumerate(lst)
        ]
        spark.createDataFrame(out or [], _SINK_SCHEMA).createOrReplaceTempView(
            sink_table
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
