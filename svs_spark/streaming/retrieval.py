"""Streaming retrieval: a continuous query stream served against a
static (persisted) corpus.

The online twin of ``operators.similarity.knn_join_batch``: query
vectors arrive as a stream (request log drops, an embedding-service
output topic), and every micro-batch is answered with ONE corpus scan
via the same blocked-GEMM batch kernel the bulk path uses — so
throughput per query *improves* as batches fill (the scan amortizes),
which is exactly the regime Spark serves well. True low-latency
point-query serving stays out of scope (BASELINE.json); this is the
"near-line" shape: answer batches of queries every trigger interval.

Why foreachBatch: ``knn_join_batch`` ships the micro-batch's query
matrix inside the task closure (q × d floats — bounded by the trigger,
not the corpus), which needs a batch view of the stream. The result
sink appends (query_id, vec_id, score, rank) rows; checkpointing makes
delivery at-least-once and replays are idempotent overwrites per
query_id.

At 100 TB: per-trigger cost = one corpus scan (partition-pruned if the
corpus is an IVF/LSH layout) regardless of how many queries arrived;
state is zero (stateless transform), so there is no watermark to tune.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from svs_spark.operators.similarity import knn_join_batch


def stream_queries(spark, src: str, dim_schema: str = "array<float>") -> DataFrame:
    """Read a query-vector stream from a parquet directory
    (query_id long, embedding array<float>)."""
    schema = f"query_id long, embedding {dim_schema}"
    return spark.readStream.schema(schema).parquet(src)


def serve_query_stream(
    query_stream: DataFrame,
    corpus: DataFrame,
    k: int,
    sink_path: str,
    checkpoint_dir: Optional[str] = None,
    available_now: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Answer each micro-batch of queries with one corpus scan.

    Returns the StreamingQuery (caller awaits/stops). Results land in
    ``sink_path`` as parquet (query_id, vec_id, score, rank) — exactly
    the ``knn_join_batch`` output, so streaming and bulk answers are
    comparable row-for-row (tested in tests/test_streaming.py).
    """

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        qrows = batch_df.collect()  # bounded by the trigger interval
        if not qrows:
            return
        qbatch = [(int(r["query_id"]), list(r["embedding"])) for r in qrows]
        res = knn_join_batch(corpus, qbatch, k, id_col=id_col, vec_col=vec_col)
        res.write.mode("append").parquet(sink_path)

    writer = (
        query_stream.writeStream.foreachBatch(answer).outputMode("append")
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
