"""Hypertable-style continuous aggregate: maintain a pre-aggregated
rollup of an append-only event stream and answer range queries by
merging the rollup (history) with an on-the-fly aggregation of the raw
tail (recent rows not yet rolled up).

This is the TimescaleDB "continuous aggregate" / materialized-rollup
pattern the reference has no equivalent of (svs stores no time-series at
all); at 100 TB of events it is the difference between scanning years of
raw rows per dashboard query and scanning ONE pre-aggregated row per
(bucket, key) plus a small recent tail.

Scale design:
- the rollup table is itself produced by a single groupBy (one shuffle),
  partitioned on write by bucket date so history queries prune;
- refresh is incremental: only buckets newer than the stored high-water
  mark are recomputed, and the merge is an idempotent overwrite of those
  buckets (append-only input ⇒ closed buckets never change);
- the query-time merge is a UNION of two pre-aggregated frames followed
  by a re-aggregation over far fewer rows than raw (SUM/COUNT/MIN/MAX
  are decomposable; AVG = SUM/COUNT at read time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Decomposable aggregate state kept per (bucket, key): everything needed
# to answer count/sum/avg/min/max at read time. (A function, not a
# module constant — Column construction needs an active session.)
def _state_aggs() -> list[Column]:
    return [
        F.count("*").alias("n"),
        F.sum("value").alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    ]


def bucket_col(ts_nanos: Column | str, bucket_s: int = 3600) -> Column:
    """Floor a nanosecond-long timestamp to a bucket start (epoch secs)."""
    c = F.col(ts_nanos) if isinstance(ts_nanos, str) else ts_nanos
    secs = (c / F.lit(1_000_000_000)).cast("long")
    return (secs - secs % F.lit(bucket_s)).alias("bucket_start")


def build_rollup(
    events: DataFrame, bucket_s: int = 3600, key: str = "event_type"
) -> DataFrame:
    """Full rollup build: one shuffle on (bucket, key)."""
    return events.groupBy(
        bucket_col("ts", bucket_s), F.col(key)
    ).agg(*_state_aggs())


def refresh_rollup(
    rollup: DataFrame,
    events: DataFrame,
    bucket_s: int = 3600,
    key: str = "event_type",
) -> DataFrame:
    """Incremental refresh: recompute only buckets at/after the stored
    high-water mark (the newest bucket is typically still open when it
    was last rolled up) and splice them over the stale versions.

    Only the raw tail ``ts >= high_water`` is scanned — on a
    date-partitioned events table that predicate prunes partitions, so
    refresh cost tracks the tail size, not history size."""
    hw_row = rollup.agg(F.max("bucket_start")).first()
    high_water = hw_row[0] if hw_row and hw_row[0] is not None else None
    if high_water is None:
        return build_rollup(events, bucket_s, key)
    tail = events.filter(
        (F.col("ts") / F.lit(1_000_000_000)).cast("long") >= F.lit(high_water)
    )
    fresh = tail.groupBy(bucket_col("ts", bucket_s), F.col(key)).agg(
        *_state_aggs()
    )
    kept = rollup.filter(F.col("bucket_start") < F.lit(high_water))
    return kept.unionByName(fresh)


def rollup_query(
    rollup: DataFrame,
    events: DataFrame,
    cutoff_epoch_s: int,
    bucket_s: int = 3600,
    key: str = "event_type",
) -> DataFrame:
    """Answer a per-(bucket, key) aggregate over ALL data by merging the
    rollup below ``cutoff_epoch_s`` with an on-the-fly aggregation of
    raw rows at/after it (the not-yet-rolled-up tail). Returns
    (bucket_start, key, n, sum_v, min_v, max_v, avg_v)."""
    history = rollup.filter(F.col("bucket_start") < F.lit(cutoff_epoch_s))
    tail_raw = events.filter(
        (F.col("ts") / F.lit(1_000_000_000)).cast("long")
        >= F.lit(cutoff_epoch_s)
    )
    tail = tail_raw.groupBy(bucket_col("ts", bucket_s), F.col(key)).agg(
        *_state_aggs()
    )
    merged = (
        history.unionByName(tail)
        .groupBy("bucket_start", key)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    return merged.withColumn("avg_v", F.col("sum_v") / F.col("n"))
