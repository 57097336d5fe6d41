"""Approximate-sketch scale paths vs their exact twins.

At 100 TB, exact count-distinct and exact percentiles force full
shuffles of every distinct value; the production path is sketches —
HyperLogLog++ (approx_count_distinct) and Greenwald-Khanna
(approx_percentile) — which aggregate with map-side partial merge and
constant memory. These tests pin the accuracy contract that makes the
swap safe, on the same testdata the exact oracle queries run on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from svs_spark.queries import load
from tests.conftest import SF_DIR


def test_hll_distinct_within_rsd(spark):
    ev = load(spark, SF_DIR, "events")
    exact, approx = (
        ev.agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .first()
    )
    assert abs(approx - exact) / exact <= 0.06  # 3× the configured rsd

def test_hll_merges_across_groups(spark):
    """Per-group HLL counts must stay within tolerance too (the merge
    path across partitions/groups is what runs on a real cluster)."""
    ev = load(spark, SF_DIR, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) <= 0.06

def test_approx_percentile_vs_exact(spark):
    ev = load(spark, SF_DIR, "events")
    [row] = (
        ev.agg(
            F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("exact"),
            F.expr(
                "approx_percentile(value, array(0.5, 0.95, 0.99), 10000)"
            ).alias("approx"),
        )
        .collect()
    )
    lo, hi = (
        ev.agg(F.min("value"), F.max("value")).first()
    )
    spread = hi - lo
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) <= 0.01 * spread, (e, a)
