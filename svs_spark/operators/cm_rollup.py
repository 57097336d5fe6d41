"""Persisted count-min rollup — per-day sketch cell tables answering
"how often did item X occur over [lo, hi]" without re-reading events.

The sum-merge sibling of :mod:`hll_rollup` (distincts) — CM is linear,
so a range's sketch is the (row, col)-keyed SUM of the range's daily
cells, and incremental maintenance is the same sum (dynamic partition
overwrite of touched days only). A day's table is at most
depth × width cells regardless of event volume; point queries collect
one merged table (bounded) and evaluate the min-over-rows estimate
driver-side with the same portable position family as the batch
``count_min`` and the streaming ``cm_window`` — all three produce
mergeable, cell-identical sketches.
"""

from __future__ import annotations

from svs_spark.operators._rollup_common import (
    overwrite_day_partitions,
    rollup_day_range as _shared_day_range,
)

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from svs_spark.streaming.cm_window import cm_cells, cm_estimate_cells


def _day_cells(
    df: DataFrame, item_col: str, day: Column, width: int, depth: int
) -> DataFrame:
    cells = cm_cells(
        df.withColumn("_day", day),
        item_col,
        width=width,
        depth=depth,
        extra_cols=["_day"],
    )
    return (
        cells.groupBy(F.col("_day").alias("day"), "row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def build_cm_rollup(
    df: DataFrame,
    path: str,
    item_col: str,
    day: Column,
    width: int = 1024,
    depth: int = 4,
) -> None:
    (
        _day_cells(df, item_col, day, width, depth)
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def append_cm_rollup(
    df: DataFrame,
    path: str,
    item_col: str,
    day: Column,
    width: int = 1024,
    depth: int = 4,
) -> list[int]:
    """Sum-merge a new batch into ONLY its touched day partitions."""
    spark = df.sparkSession
    new = _day_cells(df, item_col, day, width, depth)
    days = [r["day"] for r in new.select("day").distinct().collect()]
    if not days:
        return []
    existing = spark.read.parquet(path).filter(F.col("day").isin(days))
    merged = (
        new.unionByName(existing)
        .groupBy("day", "row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # writer-scoped dynamic overwrite; single-writer contract —
    # see operators/_rollup_common.py
    overwrite_day_partitions(merged, path)
    return sorted(int(d) for d in days)


def count_over_days(
    spark: SparkSession,
    path: str,
    items: list[str],
    day_lo: int,
    day_hi: int,
    width: int = 1024,
    depth: int = 4,
) -> dict[str, int]:
    """Point-frequency estimates for ``items`` over the inclusive day
    range: one partition-pruned cell read (bounded by days ×
    depth × width), then driver-side estimates — true ≤ est with the
    standard CM overcount bound."""
    cells = (
        spark.read.parquet(path)
        .filter((F.col("day") >= day_lo) & (F.col("day") <= day_hi))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    table = [(r["row"], r["col"], r["cnt"]) for r in cells]
    return {
        item: cm_estimate_cells(table, item, width, depth) for item in items
    }


def rollup_day_range(spark: SparkSession, path: str) -> tuple[int, int]:
    """Min/max day present — partition metadata only, any
    filesystem (delegates to operators/_rollup_common.py)."""
    return _shared_day_range(spark, path)
