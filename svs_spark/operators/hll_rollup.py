"""Persisted HLL register rollup — rolling DISTINCT counts over any
day range WITHOUT re-touching the events.

The `dau_wau_mau` query's exact form scatters every (user, day) into
its trailing horizon (bounded, but a 30× row blowup); its documented
100 TB swap is this module: materialize ONE tiny register table per
day (≤ 2^p rows of (register, max_rho), ~4096 at p=12 — kilobytes,
regardless of how many billions of events the day held), then answer
"distinct users over [lo, hi]" for ANY range by max-merging the
range's registers — a partition-pruned scan of a few KB per day,
never the raw events. Registers use the same xxhash64 cell family as
``streaming/hll_window.py``, so a batch rollup and a streaming window
drain produce IDENTICAL tables and merge freely.

Incremental maintenance is the max-merge again: appending a new batch
computes its per-day cells and rewrites ONLY the touched day
partitions (max of old and new registers); untouched days stay
byte-identical on disk — the lakehouse sketch-rollup pattern
(ClickHouse AggregatingMergeTree / Druid HLL columns), expressed as
plain partitioned parquet.
"""

from __future__ import annotations

from svs_spark.operators._rollup_common import (
    overwrite_day_partitions,
    rollup_day_range as _shared_day_range,
)

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from svs_spark.streaming.hll_window import hll_cells, hll_estimate_cells

DAY_US = 86_400_000_000


def _day_cells(
    df: DataFrame, item_col: str, day: Column, p: int
) -> DataFrame:
    cells = hll_cells(
        df.withColumn("_day", day), item_col, p=p, extra_cols=["_day"]
    )
    return (
        cells.groupBy(F.col("_day").alias("day"), "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def build_hll_rollup(
    df: DataFrame,
    path: str,
    item_col: str,
    day: Column,
    p: int = 12,
) -> None:
    """One pass over ``df`` → day-partitioned register parquet at
    ``path``. ``day`` is an integer day-bucket Column (e.g.
    ``F.expr("ts div 1000 div 86400000000")``)."""
    (
        _day_cells(df, item_col, day, p)
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def append_hll_rollup(
    df: DataFrame,
    path: str,
    item_col: str,
    day: Column,
    p: int = 12,
) -> list[int]:
    """Fold a new batch into the rollup: compute its day cells, max-
    merge with the existing registers of ONLY the touched days, and
    dynamically overwrite those day partitions (untouched days are not
    read or written). Returns the touched day list."""
    spark = df.sparkSession
    new = _day_cells(df, item_col, day, p)
    days = [r["day"] for r in new.select("day").distinct().collect()]
    if not days:
        return []
    existing = spark.read.parquet(path).filter(F.col("day").isin(days))
    merged = (
        new.unionByName(existing)
        .groupBy("day", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    # writer-scoped dynamic overwrite; single-writer contract —
    # see operators/_rollup_common.py
    overwrite_day_partitions(merged, path)
    return sorted(int(d) for d in days)


def distinct_over_days(
    spark: SparkSession,
    path: str,
    day_lo: int,
    day_hi: int,
    p: int = 12,
) -> float:
    """Estimated distinct items over day range [day_lo, day_hi]
    (inclusive): partition-pruned register read + max-merge +
    driver-side estimate. The collect is bounded by 2^p rows."""
    cells = (
        spark.read.parquet(path)
        .filter((F.col("day") >= day_lo) & (F.col("day") <= day_hi))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    )
    return hll_estimate_cells(
        [(r["register"], r["max_rho"]) for r in cells], p=p
    )


def rollup_day_range(spark: SparkSession, path: str) -> tuple[int, int]:
    """Min/max day present — partition metadata only, any
    filesystem (delegates to operators/_rollup_common.py)."""
    return _shared_day_range(spark, path)
