"""Windowed drift monitor: drained streaming histograms must equal the
batch aggregation of the same cells; the KS evaluator must match a
pure-Python recompute; a planted distribution shift must dominate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.queries import load, normalize_events_ts
from svs_spark.streaming.drift import (
    ks_vs_reference,
    value_histogram_cells,
    value_histogram_stream,
)
from svs_spark.streaming.sessions import run_to_memory, stream_events

LO, HI, NB = 0.0, 1000.0, 32


@pytest.fixture(scope="module")
def drained(spark):
    stream = value_histogram_stream(
        stream_events(spark, SF_DIR),
        window_duration="6 hours",
        watermark="1 hour",
        lo=LO,
        hi=HI,
        n_buckets=NB,
    )
    run_to_memory(stream, "drift_hist_sink", output_mode="append")
    return spark.table("drift_hist_sink")


@pytest.fixture(scope="module")
def batch_events(spark):
    return normalize_events_ts(load(spark, SF_DIR, "events")).withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def test_stream_equals_batch_histogram(spark, drained, batch_events):
    batch = (
        value_histogram_cells(
            batch_events, "value", LO, HI, NB,
            extra_cols=["event_time", "event_type"],
        )
        .groupBy(
            F.window("event_time", "6 hours").alias("w"),
            F.col("event_type").alias("grp"),
            "bucket",
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "grp", "bucket", "n")
    )
    got = {
        (r["window_start"], r["grp"], r["bucket"]): r["n"]
        for r in drained.collect()
    }
    # append mode only emits CLOSED windows — the stream's final window
    # never crosses the watermark, so compare on the drained window set
    # (same convention as test_hll_window)
    closed = {k[0] for k in got}
    want = {
        (r["window_start"], r["grp"], r["bucket"]): r["n"]
        for r in batch.collect()
        if r["window_start"] in closed
    }
    assert got == want
    assert len(want) > 50
    assert len(closed) >= 2


def test_ks_matches_python_recompute(spark, drained):
    ref = (
        drained.groupBy("bucket")
        .agg(F.sum("n").alias("n"))
        .select("bucket", "n")
    )
    out = {
        (r["window_start"], r["grp"]): r
        for r in ks_vs_reference(drained, ref).collect()
    }
    rows = drained.collect()
    refc = {}
    for r in rows:
        refc[r["bucket"]] = refc.get(r["bucket"], 0) + r["n"]
    groups = {}
    for r in rows:
        groups.setdefault((r["window_start"], r["grp"]), {})[r["bucket"]] = (
            r["n"]
        )
    rtot = sum(refc.values())
    for key, cnts in groups.items():
        n = sum(cnts.values())
        cum = rcum = best = 0
        best_b = None
        for b in sorted(refc):
            cum += cnts.get(b, 0)
            rcum += refc[b]
            d = abs(cum * rtot - rcum * n)
            if d > best:
                best, best_b = d, b
        got = out[key]
        assert got["n_obs"] == n
        assert got["at_bucket"] == (best_b if best_b is not None else 0)
        assert got["ks_stat"] == pytest.approx(
            best / (n * rtot), abs=1e-6
        )


def test_planted_shift_dominates(spark):
    """A window whose values concentrate in the top bucket must score
    near-max KS against a uniform reference; an identical-to-reference
    window must score ~0."""
    ref = spark.createDataFrame(
        [(b, 10) for b in range(NB)], "bucket long, n long"
    )
    hist = spark.createDataFrame(
        [("shifted", NB - 1, 320)]
        + [("same", b, 10) for b in range(NB)],
        "grp string, bucket long, n long",
    )
    out = {
        r["grp"]: r for r in ks_vs_reference(hist, ref, keys=["grp"])
        .collect()
    }
    assert out["same"]["ks_stat"] == 0.0
    assert out["shifted"]["ks_stat"] > 0.9


def test_drift_into_buckets_reference_never_saw(spark):
    """Window mass landing in buckets with ZERO reference count must
    still be counted — an inner hist×ref join would drop those cells,
    undercutting N and the KS stat exactly when drift is largest.

    Hand-checked truth: hist {0:90, 14:10} vs uniform ref over 0..9
    (10 each): N=100, ref_total=100; at bucket 0 the ECDFs are 0.9 vs
    0.1 → KS 0.8. The dropped-cell bug reports 0.9 over n_obs 90."""
    ref = spark.createDataFrame(
        [(b, 10) for b in range(10)], "bucket long, n long"
    )
    hist = spark.createDataFrame(
        [("partial", 0, 90), ("partial", 14, 10)]
        # fully disjoint window: all mass beyond the reference domain
        # (crashed with DIVIDE_BY_ZERO before the left-join fix)
        + [("disjoint", 14, 50), ("disjoint", 15, 50)],
        "grp string, bucket long, n long",
    )
    out = {
        r["grp"]: r
        for r in ks_vs_reference(hist, ref, keys=["grp"]).collect()
    }
    assert out["partial"]["n_obs"] == 100
    assert out["partial"]["ks_stat"] == pytest.approx(0.8, abs=1e-6)
    assert out["partial"]["at_bucket"] == 0
    # disjoint: hist ECDF is 0 throughout the ref domain while ref
    # climbs to 1 (sup 1.0 at the last ref bucket), then ref stays at 1
    # while hist catches up — max gap 1.0
    assert out["disjoint"]["n_obs"] == 100
    assert out["disjoint"]["ks_stat"] == pytest.approx(1.0, abs=1e-6)
