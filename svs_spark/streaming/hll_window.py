"""Windowed HyperLogLog distinct counts as a PURE built-in streaming
aggregate — the max-merge sibling of ``cm_window``'s sum-merge.

An HLL sketch is ``2^p`` registers, each holding the MAX leading-zero
rank seen among items hashing into it. Max is associative/commutative/
idempotent, so the per-window sketch is exactly a watermarked built-in
``max`` aggregate over per-row (window, register, rho) contributions —
no custom state kernel, state bounded by ``2^p`` cells per window, and
closed windows ship as tiny register tables that stay queryable (and
mergeable across windows by another max) without re-reading the
stream. This is how you answer "distinct users per hour, forever, at
firehose scale" in O(2^p) per hour.

Hashing is xxhash64 JVM-side (codegen'd — the explode stage has no
Python at all); the rank is the position of the first set bit of the
hash's low 64-p bits, computed with pure integer Columns.

Estimation uses the standard HLL formula with the small-range
(linear counting) correction; relative error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def _rho_expr(hash_col: Column, p: int) -> Column:
    """Rank of the first set bit (1-based) of the hash bits AFTER the
    p register-index bits, i.e. rho(w) for w = h >> p over 64-p bits.
    Implemented as (64-p) - bit_length(w) + 1 for w > 0 (number of
    leading zeros in 64-p bits, 1-based), else 64-p+1; bit_length
    comes from ``length(bin(w))`` — a codegen'd JVM string op, no
    Python anywhere."""
    w = F.shiftrightunsigned(hash_col, p)
    # bit_length(w) via length(bin(w)) — bin() of 0 is "0" (length 1),
    # handled by the w=0 branch
    bitlen = F.length(F.bin(w))
    width = F.lit(64 - p)
    return F.when(w == 0, width + 1).otherwise(width - bitlen + 1)


def hll_cells(
    df: DataFrame,
    item_col: str,
    p: int = 12,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row HLL contribution: (register, rho) + passthrough columns.
    Stateless — works on batch and streaming frames alike."""
    extra = list(extra_cols or [])
    h = F.xxhash64(F.col(item_col).cast("string"))
    reg = F.pmod(h, F.lit(1 << p)).alias("register")
    return df.select(*extra, reg, _rho_expr(h, p).alias("rho"))


def hll_sketch_stream(
    events: DataFrame,
    item_col: str,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 12,
) -> DataFrame:
    """Per-window HLL registers over an event-time stream: returns the
    streaming DataFrame of (window_start, window_end, register,
    max_rho) — run with ``outputMode("append")``; each window's
    registers emit once when the watermark passes its end."""
    cells = hll_cells(
        events.withWatermark(ts_col, watermark), item_col, p=p,
        extra_cols=[ts_col],
    )
    return (
        cells.groupBy(F.window(ts_col, window_duration), "register")
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "register",
            "max_rho",
        )
    )


def hll_estimate_cells(cells, p: int = 12) -> float:
    """Cardinality estimate from a drained register table (one window,
    or several merged by max — pass the raw concatenation; the max is
    taken here). ``cells`` is a pandas frame or iterable of
    (register, max_rho)."""
    m = 1 << p
    regs = [0] * m
    if isinstance(cells, pd.DataFrame):
        it = cells[["register", "max_rho"]].itertuples(index=False)
    else:
        it = iter(cells)
    for register, rho in it:
        r = int(register)
        if int(rho) > regs[r]:
            regs[r] = int(rho)
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)  # linear counting
    return raw
