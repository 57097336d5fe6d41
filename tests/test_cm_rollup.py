"""Persisted CM rollup: range point-frequency estimates vs exact
counts, linearity across days, and append touching only new-day
partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators import cm_rollup as CR
from svs_spark.queries import load

W, D = 2048, 4


def DAY():
    return F.expr("ts div 1000 div 86400000000")


@pytest.fixture(scope="module")
def rollup(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cm") / "rollup")
    ev = load(spark, SF_DIR, "events")
    CR.build_cm_rollup(ev, path, "user_id", DAY(), width=W, depth=D)
    return path


def exact_counts(spark, items, lo, hi):
    ev = load(spark, SF_DIR, "events").withColumn("d", DAY())
    rows = (
        ev.filter((F.col("d") >= lo) & (F.col("d") <= hi))
        .groupBy("user_id")
        .count()
        .collect()
    )
    full = {str(r["user_id"]): r["count"] for r in rows}
    return {i: full.get(i, 0) for i in items}


def test_range_estimates_bound_and_track_exact(spark, rollup):
    lo, hi = CR.rollup_day_range(spark, rollup)
    items = [str(i) for i in range(0, 40)] + ["no-such-user"]
    for a, b in ((lo, hi), (lo, lo + 6), (lo, lo)):
        exact = exact_counts(spark, items, a, b)
        est = CR.count_over_days(spark, rollup, items, a, b, width=W, depth=D)
        for item in items:
            assert est[item] >= exact[item], (item, a, b)
            # width 2048 >> active users/day: overcount stays tiny
            assert est[item] <= exact[item] + 5, (item, est[item], exact[item])


def test_cells_bounded_per_day(spark, rollup):
    per_day = spark.read.parquet(rollup).groupBy("day").count().collect()
    assert len(per_day) >= 25
    assert all(r["count"] <= W * D for r in per_day)


def test_append_only_touches_new_day(spark, rollup):
    lo, hi = CR.rollup_day_range(spark, rollup)

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
    far = hi + 500
    batch = spark.range(100).select(
        F.lit(424242).alias("user_id"),
        F.lit(far * 86_400_000_000_000).alias("ts"),
    )
    touched = CR.append_cm_rollup(
        batch, rollup, "user_id", DAY(), width=W, depth=D
    )
    assert touched == [far]
    after = inventory()
    for d, files in before.items():
        assert after[d] == files, d
    est = CR.count_over_days(
        spark, rollup, ["424242"], far, far, width=W, depth=D
    )
    assert est["424242"] == 100  # exact: isolated day, ~no collisions
