"""Structured Streaming operators over the `events` table shape.

The reference is batch-only (SURVEY.md §2.8: no streaming), so these are
beyond-reference extension operators, designed as the streaming twins of
the batch queries in query_defs:

- ``windowed_event_counts``: tumbling-window counts with a watermark for
  late data (maps to `sessionize_events`'s grouping stage)
- ``sessionize_stream``: native session windows (gap-based) — the
  streaming twin of the batch lag+cumsum sessionization
- ``running_user_totals``: applyInPandasWithState custom stateful
  operator (per-user running aggregates with timeout-based eviction)

All take a streaming DataFrame of (user_id LONG, event_type STRING,
value DOUBLE, ts TIMESTAMP) and return streaming DataFrames; callers
pick the sink. Tests drive them with trigger(availableNow=True) over the
parquet testdata directory and compare against the batch equivalents.

Scale notes: state store size is bounded by the watermark horizon; the
shuffle keys on user_id (same partitioning as the batch op), and session
state per key is O(1). At 100 TB/day the same plan runs with more
shuffle partitions — nothing here is local-mode-specific.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with a proper event-time
    timestamp column derived from the nanos long (single-file staging:
    see ``svs_spark.streaming.stage_single_file_dir``)."""
    from svs_spark.streaming import stage_single_file_dir

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = stage_single_file_dir(f"{sf_dir}/events.parquet", "events.parquet")
    # The file's physical ts type has varied across testdata generations
    # (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS)); take the schema from a
    # driver-side metadata read so readStream declares what is actually
    # on disk, then normalize to the engine's nanos-long form.
    from svs_spark.queries import normalize_events_ts

    file_schema = spark.read.parquet(src).schema
    raw = normalize_events_ts(spark.readStream.schema(file_schema).parquet(src))
    return raw.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (native session_window op) —
    streaming twin of query_defs.q_sessionize_events."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "total_value",
        )
    )


_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def running_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) via
    applyInPandasWithState — the svs_spark pattern for operators Spark's
    built-ins can't express (arbitrary per-key state machines)."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain a stream into an in-memory table with availableNow (test
    helper; production sinks are kafka/delta/parquet writeStream)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop duplicate keys within the watermark
    horizon (state bounded by the watermark — the streaming twin of the
    batch hash-groupBy dedup). For content dedup, pass a hash column
    (e.g. sha2 of the payload) as the key."""
    return events.withWatermark(
        "event_time", watermark
    ).dropDuplicatesWithinWatermark(keys)


def purchase_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's clicks in the preceding attribution window.

    Both sides carry watermarks so the join state is bounded: a click
    can be dropped once it is older than (watermark + window) — the
    standard funnel/attribution shape at scale.
    """
    c = (
        clicks.withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        )
    )
    p = (
        purchases.withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("purchase_time"),
            F.col("value"),
        )
    )
    return p.join(
        c,
        F.expr(
            f"""
            p_user = c_user AND
            click_time <= purchase_time AND
            click_time >= purchase_time - INTERVAL {attribution_window}
            """
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "click_id", "purchase_time", "click_time", "value",
    )
