"""Windowed streaming HLL: drained register tables must equal the
batch aggregation of the same cells (max is deterministic), and the
estimates must track exact distinct counts within the sketch's error
bound — per window and across merged windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.queries import load
from svs_spark.streaming.hll_window import (
    hll_cells,
    hll_estimate_cells,
    hll_sketch_stream,
)
from svs_spark.streaming.sessions import run_to_memory, stream_events

P = 12


@pytest.fixture(scope="module")
def drained(spark):
    stream = hll_sketch_stream(
        stream_events(spark, SF_DIR),
        item_col="user_id",
        ts_col="event_time",
        window_duration="6 hours",
        watermark="1 hour",
        p=P,
    )
    run_to_memory(stream, "hll_cells_sink", output_mode="append")
    return spark.table("hll_cells_sink").toPandas()


@pytest.fixture(scope="module")
def batch_events(spark):
    return load(spark, SF_DIR, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def test_state_bounded_and_windows_emit(drained):
    assert len(drained) > 0
    per_win = drained.groupby("window_start").size()
    assert len(per_win) >= 2
    assert (per_win <= (1 << P)).all()


def test_stream_registers_equal_batch(spark, drained, batch_events):
    w0 = sorted(drained["window_start"].unique())[0]
    cells = drained[drained["window_start"] == w0]
    w1 = cells["window_end"].iloc[0]
    rows = batch_events.filter(
        (F.col("event_time") >= F.lit(w0)) & (F.col("event_time") < F.lit(w1))
    )
    batch = (
        hll_cells(rows, "user_id", p=P)
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
        .collect()
    )
    got = dict(zip(cells["register"], cells["max_rho"]))
    expected = {r["register"]: r["max_rho"] for r in batch}
    assert got == expected


def test_window_estimates_track_exact(spark, drained, batch_events):
    wins = sorted(drained["window_start"].unique())
    checked = 0
    for w0 in wins:
        cells = drained[drained["window_start"] == w0]
        w1 = cells["window_end"].iloc[0]
        exact = (
            batch_events.filter(
                (F.col("event_time") >= F.lit(w0))
                & (F.col("event_time") < F.lit(w1))
            )
            .select("user_id")
            .distinct()
            .count()
        )
        est = hll_estimate_cells(cells, p=P)
        assert abs(est - exact) / max(exact, 1) < 0.05, (w0, est, exact)
        checked += 1
    assert checked >= 2


def test_merged_windows_estimate_union(spark, drained, batch_events):
    """Registers merge across windows by max — the estimate of the
    concatenated cell tables must track the distinct count of the
    union period."""
    wins = sorted(drained["window_start"].unique())[:3]
    both = drained[drained["window_start"].isin(wins)]
    w_end = both["window_end"].max()
    exact = (
        batch_events.filter(
            (F.col("event_time") >= F.lit(wins[0]))
            & (F.col("event_time") < F.lit(w_end))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    est = hll_estimate_cells(both, p=P)
    assert abs(est - exact) / max(exact, 1) < 0.05, (est, exact)
