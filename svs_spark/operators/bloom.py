"""Bloom-filter runtime pruning for semi-joins — the shuffle killer.

A semi-join (decontamination, dedup-survivor lookup, FK existence)
normally shuffles BOTH sides on the key. When the build side's key set
is far smaller than the probe side (test-set shingles vs a 100 TB train
corpus), the scale play is the classic runtime bloom filter: fold the
build keys into an m-bit bitmap with one map-side aggregate, broadcast
the bitmap (kilobytes–megabytes), and drop probe rows whose keys cannot
be in the build set BEFORE the exchange. The exact join that follows
only sees the survivors (selectivity ε + FPR), so the probe-side
shuffle shrinks by orders of magnitude while the final answer stays
EXACT — a bloom filter has no false negatives, and the verify join
removes the false positives.

This is the same mechanism Spark's AQE injects for equi-joins
(InjectRuntimeFilter), exposed as an explicit operator so it can sit in
front of joins the optimizer can't see through (mapInPandas stages,
iterative loops, pre-aggregated probes) and so its parameters (bits,
hash count) are tunable per workload.

All hashing is Kirsch-Mitzenmacher double hashing over xxhash64:
g_i(x) = h1(x) + i·h2(x) (mod m) — k independent-enough probes from two
JVM-codegen'd hash evaluations, no Python in the row path. The bitmap
build is one groupBy(word) bit_or aggregate (map-side combine collapses
each partition to ≤ m/64 rows before the exchange); the membership test
is a pure Column conjunction against the bitmap riding as a one-row
broadcast relation, fully inside whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bloom_bitmap",
    "might_contain",
    "bloom_prune",
    "bloom_semi_join",
    "optimal_num_hashes",
]

# second-hash tweak: any constant distinct from the bare-key hash works;
# golden-ratio constant keeps it recognizable
_H2_SALT = 0x9E3779B9


def optimal_num_hashes(num_bits: int, n_keys: int) -> int:
    """k* = (m/n)·ln 2, clamped to [1, 16]."""
    if n_keys <= 0:
        return 1
    return max(1, min(16, round(num_bits / n_keys * math.log(2))))


def _positions(key: Column, num_bits: int, num_hashes: int) -> "list[Column]":
    # reduce mod m BEFORE combining: the raw g_i = h1 + i*h2 overflows
    # 64-bit under ANSI mode (DEVNOTES invariant 12); (h1 + i*h2) mod m
    # == ((h1 mod m) + i*(h2 mod m)) mod m, and the reduced operands
    # keep the sum below 2^25 at any sane m
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(_H2_SALT)), F.lit(num_bits))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(num_hashes)
    ]


def _positions_sql(key_sql: str, num_bits: int, num_hashes: int) -> "list[str]":
    """SQL-string twin of ``_positions`` — byte-identical expression
    trees, one py4j round-trip instead of ~6 per probe position
    (round-9 profiling: the Column builders spent ~0.3 s per bloom
    query in driver-side chatter before Spark saw the plan)."""
    h1 = f"pmod(xxhash64({key_sql}), {num_bits})"
    h2 = f"pmod(xxhash64({key_sql}, {_H2_SALT}), {num_bits})"
    return [
        f"pmod({h1} + {i} * {h2}, {num_bits})" for i in range(num_hashes)
    ]


def _membership_cond_sql(
    key_sql: str, arr_sql: str, num_bits: int, num_hashes: int
) -> str:
    probes = [
        f"(getbit(element_at({arr_sql}, "
        f"CAST(CAST({pos} / 64 AS BIGINT) + 1 AS INT)), "
        f"CAST({pos} % 64 AS INT)) = 1)"
        for pos in _positions_sql(key_sql, num_bits, num_hashes)
    ]
    return "(true AND " + " AND ".join(probes) + ")"


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 7,
) -> "list[int]":
    """Fold the distinct keys into an m-bit bloom bitmap.

    One JVM-side aggregate: explode the k probe positions per key, group
    by 64-bit word index, bit_or the masks. The collect is bounded by
    ``num_bits / 64`` longs (128 KiB at the default m = 2^20) — this is
    the broadcast payload, never data-sized.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    pos_list = ", ".join(_positions_sql("k", num_bits, num_hashes))
    words = (
        keys.select(F.col(key_col).alias("k"))
        .selectExpr(f"explode(array({pos_list})) AS pos")
        .selectExpr(
            "CAST(pos / 64 AS BIGINT) AS word",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS mask",
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def _membership_cond(
    key: Column, arr: Column, num_bits: int, num_hashes: int
) -> Column:
    cond = F.lit(True)
    for pos in _positions(key, num_bits, num_hashes):
        word = (pos / 64).cast("long")
        bit = (pos % 64).cast("int")
        probe = (
            F.getbit(F.element_at(arr, (word + 1).cast("int")), bit) == 1
        )
        cond = cond & probe
    return cond


def might_contain(
    key: Column,
    bitmap: "list[int]",
    num_hashes: int = 7,
) -> Column:
    """Membership-test Column: true iff every probe bit is set.

    The bitmap rides as an array literal inside the expression. NOTE
    for large bitmaps: pyspark's ``F.lit(list)`` builds a CreateArray
    with one child per element, which is materially slower per row
    than the one-row broadcast relation ``bloom_prune`` uses (measured
    4× at m = 2^19) — prefer ``bloom_prune`` in query plans and keep
    this form for small filters and tests.
    """
    return _membership_cond(key, F.lit(bitmap), len(bitmap) * 64, num_hashes)


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bitmap: "list[int]",
    num_hashes: int = 7,
) -> DataFrame:
    """Filter ``df`` to rows whose key might be in the bloom set.

    The bitmap ships as a ONE-ROW broadcast relation crossed into the
    plan (on a cluster: one copy per executor, exactly like a broadcast
    variable), so the membership conjunction reads an attribute-bound
    array instead of re-materializing an element-per-child literal —
    the per-row cost is the k hash probes only. Returns ``df``'s
    columns unchanged; no false negatives.
    """
    spark = df.sparkSession
    bm_df = spark.createDataFrame([(bitmap,)], "__bloom_bm array<long>")
    cond = _membership_cond_sql(
        f"`{key_col}`", "__bloom_bm", len(bitmap) * 64, num_hashes
    )
    return df.crossJoin(F.broadcast(bm_df)).filter(cond).drop("__bloom_bm")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: "int | None" = None,
    build_count: "int | None" = None,
) -> DataFrame:
    """EXACT left-semi join with a bloom pre-filter on the probe side.

    Result rows are identical to ``probe.join(build, key, "left_semi")``
    (no false negatives by construction; the verify join removes false
    positives) — only the plan differs: the probe side is filtered
    map-side before its exchange, so the shuffle carries
    ``selectivity + FPR`` of the probe instead of all of it.
    """
    if num_hashes is None:
        n = build_count if build_count is not None else build.count()
        num_hashes = optimal_num_hashes(num_bits, n)
    bitmap = bloom_bitmap(build, key_col, num_bits, num_hashes)
    pruned = bloom_prune(probe, key_col, bitmap, num_hashes)
    return pruned.join(
        build.select(key_col).distinct(), key_col, "left_semi"
    )
