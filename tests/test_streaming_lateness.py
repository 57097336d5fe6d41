"""Streaming lateness monitor (streaming/lateness.py) vs a pandas
replay of the batch disorder semantics: single availableNow drain
matches the per-type totals exactly, and a two-trigger split carries
the high-water mark across triggers (prefix consistency)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.streaming.lateness import lateness_stream
from svs_spark.streaming.sessions import run_to_memory, stream_events


def _events_pd(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    return ev.assign(us=ts // 1000).sort_values("event_id")


def _replay(ev: pd.DataFrame, hwm_in: dict | None = None):
    """Pandas replay: per-type (n, n_late, max_late, sum_late, hwm)."""
    out = {}
    hwm_in = hwm_in or {}
    for et, g in ev.groupby("event_type"):
        us = g.us.to_numpy(dtype=np.int64)
        run = np.maximum.accumulate(us)
        if et in hwm_in:
            run = np.maximum(run, hwm_in[et])
        late = run - us
        out[et] = (
            len(us), int((late > 0).sum()), int(late.max()),
            int(late.sum()), int(run[-1]),
        )
    return out


def _stream_input(spark, sf_dir: str):
    return stream_events(spark, sf_dir).select(
        "event_type", "event_id", F.expr("ts div 1000").alias("us")
    )


def test_single_drain_matches_replay(spark):
    run_to_memory(
        lateness_stream(_stream_input(spark, SF_DIR)),
        "late_single",
        output_mode="update",
    )
    got = {
        r.event_type: (r.n_events, r.n_late, r.max_late_us,
                       r.sum_late_us, r.hwm_us)
        for r in spark.table("late_single").collect()
    }
    want = _replay(_events_pd(SF_DIR))
    assert got == want and len(got) > 0


def test_two_trigger_hwm_carries(spark, tmp_path):
    """Split events into two files with an ARTIFICIAL late second half
    (its timestamps shifted BACK below the first half's high-water
    mark) so the carried state is load-bearing: trigger 2's lateness
    is only correct if trigger 1's hwm survived."""
    ev = _events_pd(SF_DIR)[["event_type", "event_id", "us"]]
    half = len(ev) // 2
    a = ev.iloc[:half].copy()
    b = ev.iloc[half:].copy()
    b["us"] = b["us"] - (b["us"].max() - b["us"].min() + 10_000_000)
    src = tmp_path / "late2"
    src.mkdir()
    a.to_parquet(src / "part-a.parquet")
    b.to_parquet(src / "part-b.parquet")
    # FileStreamSource orders files by modification time; back-to-back
    # writes can share an mtime, which would reverse trigger order and
    # invalidate the rep_a-then-rep_b replay below. Force the order.
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(src / "part-a.parquet", (now - 10, now - 10))
    _os.utime(src / "part-b.parquet", (now, now))

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(lateness_stream(stream), "late_two", output_mode="update")
    rows = spark.table("late_two").collect()
    # update mode emits one row per (type, trigger); replay each chunk
    # with the prior chunk's high-water marks
    rep_a = _replay(a)
    rep_b = _replay(b, hwm_in={et: v[4] for et, v in rep_a.items()})
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (r.n_events, r.n_late, r.max_late_us, r.sum_late_us, r.hwm_us)
        )
    for et, triggers in by_type.items():
        # one row per trigger; collect order is not guaranteed, the
        # two expected tuples are distinct, so compare as a set
        assert len(triggers) == 2, (et, triggers)
        assert set(triggers) == {rep_a[et], rep_b[et]}, et
        # the shifted second half must actually be late — state was
        # load-bearing, not vacuously zero (per-type time gaps can
        # leave a stray row at/above the carried mark, so ≥90%)
        assert rep_b[et][1] >= 0.9 * rep_b[et][0], et
        # the carried hwm never regresses across triggers
        assert rep_b[et][4] >= rep_a[et][4]
