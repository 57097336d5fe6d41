"""Streaming corpus ingest into a KnowledgeBase.

The continuous twin of ``KnowledgeBase.add_documents_df``: a document
stream (e.g. landing-zone JSONL/parquet drops) is quality-filtered,
exact-deduplicated within the watermark, and committed into the KB via
``foreachBatch`` — each micro-batch reuses the batch append path, so it
inherits the bucketed layout (only the buckets the new ids hash into
are rewritten) and the id-collision guard.

Why foreachBatch and not a plain parquet sink: KB appends are
read-modify-write against existing buckets (collision check + bucketed
union), which needs a batch view of each micro-batch — exactly the
foreachBatch contract.  Each micro-batch commits atomically per bucket;
the stream checkpoints after commit, so a crash replays the last batch
whose ids then hit the collision guard (at-least-once delivery,
idempotent by rejecting duplicate ids with ``drop_existing=True``).

At 100 TB this is the live-ingest shape: watermarked dedup state stays
bounded, per-batch work scales with the batch (not the corpus), and the
bucket rewrite cost is |touched buckets|/n of the docs table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from svs_spark.functions import text as T
from svs_spark.kb import KnowledgeBase


def prepare_doc_stream(
    stream: DataFrame,
    text_col: str = "text",
    min_chars: int = 10,
    min_quality: float = 0.0,
) -> DataFrame:
    """Stateless quality gate + deterministic ids for a document stream.

    Pure Column expressions (stream-safe, no state): length and
    composite-quality filters, xxhash64 id. Exact in-stream dedup is
    appended by the caller via dropDuplicates (bounded by watermark)."""
    c = F.col(text_col)
    out = (
        stream.filter(c.isNotNull() & (F.length(c) >= min_chars))
        .withColumn("_q", T.quality_score(text_col))
        .filter(F.col("_q") >= min_quality)
        .drop("_q")
        .withColumn("doc_id", F.xxhash64(c))
    )
    return out


def ingest_stream_into_kb(
    stream: DataFrame,
    kb: KnowledgeBase,
    text_col: str = "text",
    checkpoint_dir: Optional[str] = None,
    no_embedding: bool = True,
    available_now: bool = True,
):
    """Commit a prepared document stream into ``kb`` micro-batch by
    micro-batch.  Returns the StreamingQuery (caller awaits/stops).

    Duplicate ids across batches (replay, re-drops) are dropped rather
    than raised, making the sink idempotent under at-least-once
    delivery."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.dropDuplicates(["doc_id"])
        # idempotency: drop ids the KB already has (replayed batch)
        existing = kb.docs.select(F.col("id").alias("doc_id"))
        fresh = fresh.join(existing, "doc_id", "left_anti")
        if fresh.isEmpty():
            return
        kb.add_documents_df(
            fresh, text_col=text_col, id_col="doc_id",
            no_embedding=no_embedding,
        )

    writer = stream.writeStream.foreachBatch(commit).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_documents(spark, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (single-file staging, same
    mechanism as sessions.stream_events)."""
    from svs_spark.streaming import stage_single_file_dir

    src = stage_single_file_dir(f"{sf_dir}/documents.parquet", "documents.parquet")
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def quality_flag_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming quality-gate MONITOR: per-source running counts of
    Gopher-rule violations over a document stream — the continuous twin
    of the registered ``gopher_quality_flags`` batch query (same Column
    expressions via ``operators.lexical.gopher_rule_flags``, so
    stream ≡ batch exactly; tests/test_streaming.py gates the equality).

    Every rule is a stateless scan-stage expression; the only streaming
    state is the per-(source) aggregation — |sources| rows, bounded
    regardless of stream length. Run it beside ``prepare_doc_stream`` on
    the ingest path and alert when a source's pass rate moves between
    batches (the live version of re-running the batch audit)."""
    from svs_spark.operators import lexical as LX

    flagged = docs.filter(F.length(text_col) > 0).select(
        "source", *LX.gopher_rule_flags(text_col)
    )
    return flagged.groupBy("source").agg(*LX.gopher_flag_aggs())
