"""Hypertable rollup (operators/rollup.py): the merged
rollup+tail answer must equal direct aggregation of all raw rows, and
incremental refresh must equal a full rebuild — on real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from svs_spark.operators.rollup import (
    build_rollup,
    bucket_col,
    refresh_rollup,
    rollup_query,
)
from svs_spark.queries import load
from tests.conftest import SF_DIR


def _direct(events, bucket_s=3600):
    return (
        events.groupBy(bucket_col("ts", bucket_s), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .withColumn("avg_v", F.col("sum_v") / F.col("n"))
    )


def _canon(df):
    return sorted(
        (
            r["bucket_start"],
            r["event_type"],
            r["n"],
            round(r["sum_v"], 6),
            round(r["min_v"], 6),
            round(r["max_v"], 6),
            round(r["avg_v"], 6),
        )
        for r in df.collect()
    )


def test_merged_query_equals_direct(spark):
    ev = load(spark, SF_DIR, "events")
    lo, hi = ev.agg(
        F.min((F.col("ts") / 1e9).cast("long")),
        F.max((F.col("ts") / 1e9).cast("long")),
    ).first()
    cutoff = int(lo + (hi - lo) * 0.8)  # last ~20% is the raw tail
    # rollup only covers data before the cutoff (history)
    hist = ev.filter((F.col("ts") / 1e9).cast("long") < cutoff)
    rollup = build_rollup(hist)
    got = rollup_query(rollup, ev, cutoff)
    assert _canon(got) == _canon(_direct(ev))


def test_cutoff_inside_bucket_still_exact(spark):
    """The cutoff need not align to a bucket boundary: history covers
    rolled-up buckets strictly below it, the tail re-aggregates raw
    rows at/after it, and the final re-aggregation merges the split
    bucket's two partial states."""
    ev = load(spark, SF_DIR, "events")
    lo, hi = ev.agg(
        F.min((F.col("ts") / 1e9).cast("long")),
        F.max((F.col("ts") / 1e9).cast("long")),
    ).first()
    cutoff = int(lo + (hi - lo) * 0.5) + 1801  # mid-bucket
    hist = ev.filter((F.col("ts") / 1e9).cast("long") < cutoff)
    # rollup built from history only; its newest bucket is partial
    rollup = build_rollup(hist).filter(
        F.col("bucket_start") < (cutoff - cutoff % 3600)
    )
    covered = ev.filter(
        (F.col("ts") / 1e9).cast("long") < (cutoff - cutoff % 3600)
    )
    tail_cut = cutoff - cutoff % 3600
    got = rollup_query(rollup, ev, tail_cut)
    assert _canon(got) == _canon(_direct(ev))
    assert covered.count() > 0


def test_incremental_refresh_equals_rebuild(spark):
    ev = load(spark, SF_DIR, "events")
    lo, hi = ev.agg(
        F.min((F.col("ts") / 1e9).cast("long")),
        F.max((F.col("ts") / 1e9).cast("long")),
    ).first()
    cutoff = int(lo + (hi - lo) * 0.7)
    old = ev.filter((F.col("ts") / 1e9).cast("long") < cutoff)
    stale = build_rollup(old)  # built before the tail arrived
    refreshed = refresh_rollup(stale, ev)
    full = build_rollup(ev)

    def canon(df):
        return sorted(
            (r["bucket_start"], r["event_type"], r["n"], round(r["sum_v"], 6))
            for r in df.collect()
        )

    assert canon(refreshed) == canon(full)
