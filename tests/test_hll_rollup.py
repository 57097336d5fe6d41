"""Persisted HLL rollup: range estimates vs exact distincts, streaming
equivalence (batch rollup tables == drained window cells), and
incremental append touching only new-day partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators import hll_rollup as HR
from svs_spark.queries import load

P = 12


def DAY():
    # built lazily: module-level Columns crash without an active
    # session (DEVNOTES invariant 13)
    return F.expr("ts div 1000 div 86400000000")


@pytest.fixture(scope="module")
def rollup(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hll") / "rollup")
    ev = load(spark, SF_DIR, "events")
    HR.build_hll_rollup(ev, path, "user_id", DAY(), p=P)
    return path


def exact_distinct(spark, lo, hi):
    ev = load(spark, SF_DIR, "events").withColumn("d", DAY())
    return (
        ev.filter((F.col("d") >= lo) & (F.col("d") <= hi))
        .select("user_id")
        .distinct()
        .count()
    )


def test_range_estimates_track_exact(spark, rollup):
    lo, hi = HR.rollup_day_range(spark, rollup)
    assert hi > lo
    ranges = [
        (lo, hi),            # everything (MAU-style)
        (lo, lo + 6),        # first week (WAU-style)
        (hi - 6, hi),        # last week
        (lo, lo),            # single day (DAU-style)
    ]
    for a, b in ranges:
        exact = exact_distinct(spark, a, b)
        est = HR.distinct_over_days(spark, rollup, a, b, p=P)
        assert abs(est - exact) / max(exact, 1) < 0.05, (a, b, est, exact)


def test_register_tables_are_tiny(spark, rollup):
    per_day = (
        spark.read.parquet(rollup).groupBy("day").count().collect()
    )
    assert len(per_day) >= 25
    assert all(r["count"] <= (1 << P) for r in per_day)


def test_day_range_read_prunes_partitions(spark, rollup):
    lo, _ = HR.rollup_day_range(spark, rollup)
    df = spark.read.parquet(rollup).filter(
        (F.col("day") >= lo) & (F.col("day") <= lo + 2)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan


def test_append_touches_only_new_days(spark, rollup):
    """Synthetic extra batch 1000 days in the future: append rewrites
    ONLY the new day partition; every pre-existing file stays
    untouched on disk, and the new day immediately answers range
    queries."""
    lo, hi = HR.rollup_day_range(spark, rollup)

    def inventory():
        out = {}
        for d in os.listdir(rollup):
            if not d.startswith("day="):
                continue
            sub = os.path.join(rollup, d)
            out[d] = {
                (f, os.stat(os.path.join(sub, f)).st_mtime_ns)
                for f in os.listdir(sub)
                if not f.startswith(".")
            }
        return out

    before = inventory()
    far_day = hi + 1000
    batch = spark.range(500).select(
        (F.col("id") + 1_000_000).alias("user_id"),
        F.lit(far_day * HR.DAY_US * 1000).alias("ts"),
    )
    touched = HR.append_hll_rollup(batch, rollup, "user_id", DAY(), p=P)
    assert touched == [far_day]
    after = inventory()
    for d, files in before.items():
        assert after[d] == files, f"pre-existing partition {d} changed"
    est = HR.distinct_over_days(spark, rollup, far_day, far_day, p=P)
    assert abs(est - 500) / 500 < 0.05, est


def test_append_merges_overlapping_day_by_max(spark, rollup):
    """Appending MORE events into an existing day can only raise
    registers: the merged estimate covers old ∪ new."""
    lo, _ = HR.rollup_day_range(spark, rollup)
    exact_before = exact_distinct(spark, lo, lo)
    batch = spark.range(300).select(
        (F.col("id") + 5_000_000).alias("user_id"),
        F.lit(lo * HR.DAY_US * 1000 + 12 * 3_600_000_000_000).alias("ts"),
    )
    HR.append_hll_rollup(batch, rollup, "user_id", DAY(), p=P)
    est = HR.distinct_over_days(spark, rollup, lo, lo, p=P)
    expected = exact_before + 300  # disjoint user ranges
    assert abs(est - expected) / expected < 0.06, (est, expected)


def test_batch_rollup_equals_streaming_window_drain(spark, tmp_path):
    """The lake rollup and the streaming window produce the SAME
    register tables (same cell family): compare one day's registers
    against an hll_cells batch aggregation restricted to that day.
    (Own fresh build — the module fixture is mutated by the append
    tests above.)"""
    from svs_spark.streaming.hll_window import hll_cells

    path = str(tmp_path / "fresh")
    ev = load(spark, SF_DIR, "events")
    HR.build_hll_rollup(ev, path, "user_id", DAY(), p=P)
    lo, _ = HR.rollup_day_range(spark, path)
    day_rows = ev.withColumn("d", DAY()).filter(F.col("d") == lo)
    expected = {
        (r["register"], r["max_rho"])
        for r in hll_cells(day_rows, "user_id", p=P)
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
        .collect()
    }
    got = {
        (r["register"], r["max_rho"])
        for r in spark.read.parquet(path)
        .filter(F.col("day") == lo)
        .select("register", "max_rho")
        .collect()
    }
    assert got == expected
