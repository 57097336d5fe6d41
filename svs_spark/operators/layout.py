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
    if all(isinstance(c, str) for c in cols):
        # one F.expr instead of bits*ndims*4 py4j Column calls (~130
        # round-trips at bits=16 — profiled r9); the bit algebra, plan
        # and results are identical to the Column-builder fallback.
        refs = [f"CAST(`{c}` AS BIGINT)" for c in cols]
        terms = " | ".join(
            f"CAST(shiftleft(shiftright({refs[d]}, {i}) & 1,"
            f" {i * ndims + d}) AS BIGINT)"
            for i in range(bits)
            for d in range(ndims)
        )
        return F.expr(f"CAST(0 AS BIGINT) | {terms}")
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


def with_hilbert_key(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    bits: int = 10,
    out: str = "hkey",
) -> DataFrame:
    """Hilbert-curve index of (``x``, ``y``) — the space-filling curve
    with strictly better locality than Morton: consecutive curve
    positions are ALWAYS adjacent cells (Morton jumps across the grid
    at quadrant boundaries), so a contiguous key range covers a tighter
    region and range-partitioned files prune harder on box predicates.

    Branchless form of the classic top-down algorithm: per bit level,
    the quadrant Gray code ``3*rx + ry - 2*rx*ry`` (== (3*rx) XOR ry
    for bits, with no XOR so the DuckDB mirror needs no dialect-
    specific operator) appends two key bits, then the frame reflects/
    transposes. Each level is its own projection (one ``select`` per
    step) — pure integer CASE/shift algebra, codegen'd JVM-side, and
    the plan stays LINEAR in ``bits`` (a single nested Column would
    let CollapseProject inline the 3-way CASE exponentially).

    Inputs must be non-negative and < 2**bits (mask/rank-normalize
    first, as with :func:`zorder_key`).
    """
    n = 1 << bits
    others = [c for c in df.columns if c not in (x, y)]
    oq = [f"`{c}`" for c in others]
    cur = df.select(
        *others,
        F.col(x).cast("long").alias("_hx"),
        F.col(y).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    # each level's pair of projections is issued as selectExpr strings:
    # the per-Column builder form cost ~500 py4j round-trips at bits=10
    # (over 1 s of pure Python before Spark saw the plan — profiled r9);
    # the expressions, the two-projection-per-level plan shape, and the
    # results are identical.
    for i in range(bits - 1, -1, -1):
        cur = cur.selectExpr(
            *oq,
            "_hx",
            "_hy",
            "_hd",
            f"(shiftright(_hx, {i}) & 1) AS _rx",
            f"(shiftright(_hy, {i}) & 1) AS _ry",
        )
        cur = cur.selectExpr(
            *oq,
            f"(_hd + shiftleft(3 * _rx + _ry - 2 * _rx * _ry, {2 * i}))"
            " AS _hd",
            f"CASE WHEN _ry = 1 THEN _hx WHEN _rx = 0 THEN _hy"
            f" ELSE {n - 1} - _hy END AS _hx",
            f"CASE WHEN _ry = 1 THEN _hy WHEN _rx = 0 THEN _hx"
            f" ELSE {n - 1} - _hx END AS _hy",
        )
    return cur.select(*others, F.col("_hd").alias(out))


def hilbert_ctes(
    bits: int,
    passthrough: list[str],
    source: str = "norm",
) -> tuple[str, str]:
    """DuckDB mirror of :func:`with_hilbert_key` — a chain of
    MATERIALIZED CTEs (one reflect/transpose step per level; inlined
    CTEs would re-expand the 3-way CASE exponentially, the
    chained-CTE-depth failure mode), reading ``source`` with columns
    ``x``, ``y`` plus ``passthrough``. Returns (ctes_sql, final_name);
    the final CTE exposes ``passthrough`` + ``d`` (the Hilbert key).
    """
    n = 1 << bits
    pt = ", ".join(passthrough)
    parts = [
        f"hil AS MATERIALIZED (SELECT {pt}, x, y,"
        f" CAST(0 AS BIGINT) AS d FROM {source})"
    ]
    prev = "hil"
    for k, i in enumerate(range(bits - 1, -1, -1)):
        rx, ry = f"((x >> {i}) & 1)", f"((y >> {i}) & 1)"
        quad = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
        parts.append(
            f"hil{k} AS MATERIALIZED (SELECT {pt},"
            f" d + (({quad}) << {2 * i}) AS d,"
            f" CASE WHEN {ry} = 1 THEN x WHEN {rx} = 0 THEN y"
            f" ELSE {n - 1} - y END AS x,"
            f" CASE WHEN {ry} = 1 THEN y WHEN {rx} = 0 THEN x"
            f" ELSE {n - 1} - x END AS y"
            f" FROM {prev})"
        )
        prev = f"hil{k}"
    return ",\n".join(parts), prev


def write_keyed_layout(
    df: DataFrame, path: str, key: Column | str, n_files: int = 32
) -> None:
    """Range-partition + locally sort by an arbitrary clustering key
    (z-order, Hilbert, …) and write ``n_files`` parquet files — the
    generic OPTIMIZE-style write: one sampled range exchange, no
    global sort task, helper column dropped."""
    if isinstance(key, str):
        key = F.col(key)
    (
        df.withColumn("_ckey", key)
        .repartitionByRange(n_files, "_ckey")
        .sortWithinPartitions("_ckey")
        .drop("_ckey")
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
