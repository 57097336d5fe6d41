"""Z-order (Morton curve) data layout — multi-dimensional clustering
for data skipping.

The 100 TB problem this solves: a table range-partitioned (or just
sorted) on ONE column only prunes scans filtered on that column. Range
queries that constrain TWO dimensions at once — ``user_id BETWEEN …
AND ts BETWEEN …`` — touch every file under a 1-D layout because each
file spans the full range of the second dimension. Interleaving the
bits of both keys (the Morton / Z-order curve, the technique behind
Delta Lake's ``OPTIMIZE ZORDER BY`` and Databricks liquid clustering)
makes every file a small hyper-rectangle in key space, so parquet
file/row-group min-max stats prune on *all* interleaved dimensions.

Everything here is pure integer bit arithmetic on Columns — codegen'd
JVM-side, no UDFs — and is mirrored operation-for-operation by the
DuckDB oracle of the ``zorder_locality_stats`` driver query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Bit-interleaved Morton key over ``cols`` (lowest ``bits`` of
    each, masked — callers normalize each dimension to a non-negative
    bounded int first; at web scale, rank-bucket each dimension to
    2^bits quantiles so skew cannot starve the curve).

    Bit layout: output bit ``i*ndims + d`` is input bit ``i`` of
    dimension ``d`` — dimensions take turns, coarsest bits last, which
    is what makes a contiguous z-range a bounded box in every
    dimension.
    """
    ndims = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(
                F.shiftleft(bit, i * ndims + d).cast("long")
            )
    return out


def zorder_sql(col_exprs: list[str], bits: int = 16) -> str:
    """The DuckDB mirror of :func:`zorder_key` — identical bit algebra
    generated as SQL, so driver oracles can verify the curve."""
    ndims = len(col_exprs)
    terms = []
    for i in range(bits):
        for d, e in enumerate(col_exprs):
            # every term fully parenthesized: DuckDB gives << and | the
            # SAME precedence (left-assoc), so a bare `a << 5 | b << 6`
            # parses as `((a << 5) | b) << 6` and overflows
            terms.append(f"(((({e}) >> {i}) & 1) << {i * ndims + d})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[Column],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    z-curve of ``dims``: range-partition by z-key (each file owns a
    contiguous curve segment = a bounded box in every dimension), sort
    within partitions (tight row-group stats), drop the helper column.

    This is the OPTIMIZE ZORDER write path: one range exchange
    (sampled boundaries), one local sort — no global sort task.
    """
    zk = zorder_key(dims, bits=bits)
    (
        df.withColumn("_zkey", zk)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(df: DataFrame) -> int:
    """Number of distinct files containing at least one row of ``df`` —
    the locality metric: with perfect min-max pruning the scan cost of
    a predicate is proportional to this count."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
