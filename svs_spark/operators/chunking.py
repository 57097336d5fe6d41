"""Materializing document chunker — the distributed half of the
reference's chunk-into-children ingest pattern (svs builds document
trees by adding child chunks under a parent via ``bulk_add_docs``'
``parent_id``, reference kb.py:1486-1524 and the README's
hierarchy examples; ``rag_chunk_stats`` computes the PLAN for this,
this module materializes it).

Pure codegen: chunk count is closed-form arithmetic on the string
length, chunk rows come from one ``explode(sequence(...))`` and each
chunk text is a ``substr`` — no Python worker, no shuffle (the explode
is scan-stage; output partitioning inherits the input). At 100 TB this
is the shape you want: chunking is embarrassingly row-local, and the
fan-out factor (≈ n_chars/stride) is bounded by document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def n_chunks_expr(n_chars: Column, size: int, stride: int) -> Column:
    """Closed-form chunk count for overlapping windows: 1 for texts
    that fit one window, else ``1 + ceil((n - size)/stride)`` — the
    same formula ``rag_chunk_stats`` aggregates (query_defs.py)."""
    return F.when(n_chars <= size, F.lit(1).cast("long")).otherwise(
        1 + F.floor((n_chars - size + (stride - 1)) / stride).cast("long")
    )


def chunk_text_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 500,
    stride: int = 400,
) -> DataFrame:
    """Emit one row per overlapping character window of every input
    document: (parent_id, chunk_idx, chunk_text). Window ``i`` covers
    characters ``[i*stride, i*stride + size)``; consecutive windows
    overlap by ``size - stride`` characters; the final window is
    short rather than padded. ``stride`` must be in (0, size].

    Reconstruction invariant (tested): chunk 0 plus every later
    chunk's last ``len - (size - stride)`` characters concatenate
    back to the exact original text."""
    if not (0 < stride <= size):
        raise ValueError("stride must be in (0, size]")
    n = F.length(F.col(text_col))
    idx = F.explode(
        F.sequence(F.lit(0), (n_chunks_expr(n, size, stride) - 1).cast("int"))
    ).alias("chunk_idx")
    return (
        df.filter(F.col(text_col).isNotNull() & (n > 0))
        .select(F.col(id_col).alias("parent_id"), F.col(text_col).alias("_t"), idx)
        .select(
            "parent_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("_t")
            .substr(
                F.col("chunk_idx") * F.lit(stride) + F.lit(1), F.lit(size)
            )
            .alias("chunk_text"),
        )
    )
