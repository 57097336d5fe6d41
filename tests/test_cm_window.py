"""Windowed streaming count-min: a drained window's cell table must
answer point queries IDENTICALLY to a batch count_min built over that
window's rows — linearity means the streaming windowed count(*) is the
exact same matrix, not an approximation of it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators.sketch import count_min
from svs_spark.queries import load
from svs_spark.streaming.cm_window import (
    cm_cells,
    cm_estimate_cells,
    cm_sketch_stream,
)
from svs_spark.streaming.sessions import run_to_memory, stream_events

WIDTH, DEPTH = 256, 4


@pytest.fixture(scope="module")
def drained(spark):
    stream = cm_sketch_stream(
        stream_events(spark, SF_DIR),
        item_col="user_id",
        ts_col="event_time",
        window_duration="6 hours",
        watermark="1 hour",
        width=WIDTH,
        depth=DEPTH,
    )
    run_to_memory(stream, "cm_cells_sink", output_mode="append")
    return spark.table("cm_cells_sink").toPandas()


def test_windows_emit_and_cells_bounded(drained):
    assert len(drained) > 0
    n_windows = drained[["window_start"]].drop_duplicates().shape[0]
    assert n_windows >= 2
    # per-window state bound: at most depth*width cells regardless of
    # item cardinality — the 100 TB property
    per_win = drained.groupby("window_start").size()
    assert (per_win <= DEPTH * WIDTH).all()


def test_stream_window_equals_batch_sketch(spark, drained):
    ev = load(spark, SF_DIR, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    wins = sorted(drained["window_start"].unique())[:2]
    for w0 in wins:
        cells = drained[drained["window_start"] == w0]
        w1 = cells["window_end"].iloc[0]
        rows = ev.filter(
            (F.col("event_time") >= F.lit(w0))
            & (F.col("event_time") < F.lit(w1))
        )
        batch = count_min(rows, "user_id", width=WIDTH, depth=DEPTH)
        items = [
            str(r["user_id"])
            for r in rows.select("user_id").distinct().limit(40).collect()
        ]
        assert items, "window must be non-empty"
        true_counts = {
            str(r["user_id"]): r["c"]
            for r in rows.groupBy("user_id").agg(F.count("*").alias("c")).collect()
        }
        for item in items + ["no-such-user", "-1"]:
            got = cm_estimate_cells(cells, item, WIDTH, DEPTH)
            assert got == batch.estimate(item), item
            # one-sided overcount bound vs ground truth
            assert got >= true_counts.get(item, 0), item


def test_union_of_windows_is_sum_of_cells(spark, drained):
    """Linearity across windows: estimates over the union of two
    windows = estimates from the summed cell tables."""
    import pandas as pd

    wins = sorted(drained["window_start"].unique())[:2]
    both = drained[drained["window_start"].isin(wins)]
    ev = load(spark, SF_DIR, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    w_end = both[both["window_start"] == wins[1]]["window_end"].iloc[0]
    rows = ev.filter(
        (F.col("event_time") >= F.lit(wins[0]))
        & (F.col("event_time") < F.lit(w_end))
    )
    batch = count_min(rows, "user_id", width=WIDTH, depth=DEPTH)
    items = [
        str(r["user_id"])
        for r in rows.select("user_id").distinct().limit(20).collect()
    ]
    for item in items:
        assert cm_estimate_cells(both, item, WIDTH, DEPTH) == batch.estimate(item)


def test_cm_cells_batch_matches_positions(spark):
    """The stateless explode stage: each input row contributes exactly
    ``depth`` cells, one per sketch row, at the kernel's positions."""
    from svs_spark.operators.sketch import _cm_positions

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "item string")
    cells = cm_cells(df, "item", width=WIDTH, depth=DEPTH).collect()
    assert len(cells) == 3 * DEPTH
    got_a = sorted(
        (r["row"], r["col"]) for r in cells
    )
    expected = sorted(
        [(i, p) for i, p in enumerate(_cm_positions("a", WIDTH, DEPTH))] * 2
        + [(i, p) for i, p in enumerate(_cm_positions("b", WIDTH, DEPTH))]
    )
    assert got_a == expected
