"""Windowed MinHash signatures as a built-in streaming MIN aggregate —
the min-merge member of the merge-family trilogy (cm_window: sum,
hll_window: max).

A MinHash signature component is a MIN over permuted shingle hashes,
and min is associative/commutative/idempotent: a GROUP's component is
the min over its docs' per-doc components, and a WINDOW's over its
batches'. So the per-(window, group) corpus signature is exactly a
watermarked built-in ``min`` aggregate over per-doc signature cells —
state is ``num_hashes`` longs per (window, group), forever.

What it buys at 100 TB: per-ingestion-window per-source corpus
signatures kept as tiny tables; the agreement fraction between any two
(window, group) signatures estimates the trigram-set Jaccard between
those corpus slices WITHOUT ever joining their contents — the
continuous "is today's crawl of source X just yesterday's" /
cross-source contamination monitor. The per-doc signature stage is the
same Arrow-vectorized polynomial-decomposition kernel as the batch
dedup family (operators/dedup.py), so stream cells are bit-identical
to a batch computation over the same rows (tested).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from svs_spark.operators.dedup import _signature_batch_kernel


def minhash_signature_stream(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Per-(event-time window, group) MinHash signature cells over a
    document stream: returns the streaming DataFrame of (window_start,
    window_end, <group_col>, hash_idx, sig_min) — append mode; each
    window's ``num_hashes`` cells per group emit once when the
    watermark passes the window end. Docs shorter than
    ``shingle_size`` tokens contribute nothing (same rule as batch).
    """
    base = docs.mapInPandas(
        _signature_batch_kernel(
            id_col,
            text_col,
            num_hashes,
            shingle_size,
            passthrough=(group_col, ts_col),
        ),
        schema=(
            f"did long, hs array<long>, sig array<long>, "
            f"{group_col} string, {ts_col} timestamp"
        ),
    )
    cells = base.select(
        group_col, ts_col, F.posexplode("sig").alias("hash_idx", "sig_val")
    ).withWatermark(ts_col, watermark)
    return (
        cells.groupBy(F.window(ts_col, window_duration), group_col, "hash_idx")
        .agg(F.min("sig_val").alias("sig_min"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "hash_idx",
            "sig_min",
        )
    )


def signature_agreement(cells_a, cells_b) -> float:
    """Estimated Jaccard between two drained signatures: the fraction
    of agreeing components. Each argument is a pandas frame or iterable
    of (hash_idx, sig_min) for ONE (window, group); signatures from
    several windows of the same group merge by another min per
    hash_idx before comparing (pass the concatenation)."""

    def to_map(cells) -> dict[int, int]:
        if isinstance(cells, pd.DataFrame):
            it = cells[["hash_idx", "sig_min"]].itertuples(index=False)
        else:
            it = iter(cells)
        out: dict[int, int] = {}
        for idx, v in it:
            i, v = int(idx), int(v)
            if i not in out or v < out[i]:
                out[i] = v
        return out

    a, b = to_map(cells_a), to_map(cells_b)
    keys = set(a) | set(b)
    if not keys:
        return 1.0
    return sum(1 for k in keys if a.get(k) == b.get(k)) / len(keys)
