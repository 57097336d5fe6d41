"""Persisted MinHash signature rollup — per-(day, group) corpus
signatures; the min-merge member of the lake-rollup family
(cm_rollup: sum, hll_rollup: max).

Each (day, group) stores ``num_hashes`` longs — the componentwise min
of its docs' signatures. Any day-range/group slice merges by another
min, and the agreement fraction between two merged signatures
estimates the trigram-set Jaccard between those corpus slices without
touching their text: "is this week's crawl of source X just last
month's", per source pair, from kilobytes of signatures. Cells are
computed by the same vectorized signature kernel as the batch dedup
family and the streaming ``minhash_window``, so all three planes
produce identical tables for identical rows and merge freely.
"""

from __future__ import annotations

from svs_spark.operators._rollup_common import (
    overwrite_day_partitions,
    rollup_day_range as _shared_day_range,
)

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from svs_spark.operators.dedup import _signature_batch_kernel
from svs_spark.streaming.minhash_window import signature_agreement


def _day_sigs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    day: Column,
    num_hashes: int,
    shingle_size: int,
) -> DataFrame:
    # the passthrough group column keeps its SOURCE type (an int source
    # id must not be declared string — the Arrow writer would mismatch
    # the declared schema at runtime)
    group_type = df.schema[group_col].dataType.simpleString()
    base = df.withColumn("_day", day).mapInPandas(
        _signature_batch_kernel(
            id_col,
            text_col,
            num_hashes,
            shingle_size,
            passthrough=(group_col, "_day"),
        ),
        schema=(
            f"did long, hs array<long>, sig array<long>, "
            f"{group_col} {group_type}, _day long"
        ),
    )
    return (
        base.select(
            F.col("_day").alias("day"),
            group_col,
            F.posexplode("sig").alias("hash_idx", "sig_val"),
        )
        .groupBy("day", group_col, "hash_idx")
        .agg(F.min("sig_val").alias("sig_min"))
    )


def build_minhash_rollup(
    df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    group_col: str,
    day: Column,
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> None:
    (
        _day_sigs(df, text_col, id_col, group_col, day, num_hashes, shingle_size)
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def append_minhash_rollup(
    df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    group_col: str,
    day: Column,
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> list[int]:
    """Min-merge a new batch into ONLY its touched day partitions."""
    spark = df.sparkSession
    new = _day_sigs(df, text_col, id_col, group_col, day, num_hashes, shingle_size)
    days = [r["day"] for r in new.select("day").distinct().collect()]
    if not days:
        return []
    existing = spark.read.parquet(path).filter(F.col("day").isin(days))
    merged = (
        new.unionByName(existing)
        .groupBy("day", group_col, "hash_idx")
        .agg(F.min("sig_min").alias("sig_min"))
    )
    # writer-scoped dynamic overwrite; single-writer contract —
    # see operators/_rollup_common.py
    overwrite_day_partitions(merged, path)
    return sorted(int(d) for d in days)


def slice_signature(
    spark: SparkSession,
    path: str,
    group: str,
    group_col: str,
    day_lo: int,
    day_hi: int,
) -> list[tuple[int, int]]:
    """The merged (hash_idx, sig_min) signature of one group over the
    inclusive day range — partition-pruned, ``num_hashes`` rows out."""
    rows = (
        spark.read.parquet(path)
        .filter(
            (F.col("day") >= day_lo)
            & (F.col("day") <= day_hi)
            & (F.col(group_col) == group)
        )
        .groupBy("hash_idx")
        .agg(F.min("sig_min").alias("sig_min"))
        .collect()
    )
    return [(r["hash_idx"], r["sig_min"]) for r in rows]


def slice_jaccard(
    spark: SparkSession,
    path: str,
    group_col: str,
    a: tuple[str, int, int],
    b: tuple[str, int, int],
) -> float:
    """Estimated Jaccard between two (group, day_lo, day_hi) corpus
    slices, from signatures alone."""
    sa = slice_signature(spark, path, a[0], group_col, a[1], a[2])
    sb = slice_signature(spark, path, b[0], group_col, b[1], b[2])
    return signature_agreement(sa, sb)


def rollup_day_range(spark: SparkSession, path: str) -> tuple[int, int]:
    """Min/max day present — partition metadata only, any
    filesystem (delegates to operators/_rollup_common.py)."""
    return _shared_day_range(spark, path)
