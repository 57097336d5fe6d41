"""Streaming z-score outlier screen vs its batch twin, plus the
cumulative two-trigger behavior recomputed in pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from svs_spark.queries import load
from svs_spark.streaming.anomaly import (
    batch_zscore_outliers,
    zscore_outlier_stream,
)
from svs_spark.streaming.sessions import run_to_memory, stream_events


def test_single_drain_matches_batch_twin(spark):
    stream = zscore_outlier_stream(stream_events(spark, SF_DIR), k=2.5)
    run_to_memory(stream, "anom_single", output_mode="append")
    got = {
        (r.event_type, r.event_id)
        for r in spark.table("anom_single").collect()
    }
    want_df = batch_zscore_outliers(load(spark, SF_DIR, "events"), k=2.5)
    want = {(r.event_type, r.event_id) for r in want_df.collect()}
    assert got == want
    assert len(want) > 0, "fixture must contain outliers at k=2.5"


def test_two_trigger_screen_is_cumulative(spark, tmp_path):
    """Split the events into two files, drain with maxFilesPerTrigger=1:
    batch 1 is judged against its own moments, batch 2 against the
    exact merged moments of both — recomputed here with NumPy."""
    ev = (
        load(spark, SF_DIR, "events")
        .select("event_type", "event_id", "user_id", "value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    half = len(ev) // 2
    chunks = [ev.iloc[:half], ev.iloc[half:]]
    src = tmp_path / "ev2"
    src.mkdir()
    # lexicographic file order = replay order
    chunks[0].to_parquet(src / "part-a.parquet")
    chunks[1].to_parquet(src / "part-b.parquet")

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    flagged = zscore_outlier_stream(stream, k=2.5)
    run_to_memory(flagged, "anom_two", output_mode="append")
    got = {
        (r.event_type, r.event_id)
        for r in spark.table("anom_two").collect()
    }

    want: set[tuple[str, int]] = set()
    for et in ev["event_type"].unique():
        n, mean, m2 = 0, 0.0, 0.0
        for chunk in chunks:
            v = chunk.loc[chunk["event_type"] == et, "value"].to_numpy(
                dtype=np.float64
            )
            ids = chunk.loc[
                chunk["event_type"] == et, "event_id"
            ].to_numpy()
            nb = len(v)
            if nb:
                mb = float(v.mean())
                m2b = float(((v - mb) ** 2).sum())
                delta = mb - mean
                nt = n + nb
                mean += delta * nb / nt
                m2 += m2b + delta * delta * n * nb / nt
                n = nt
            std = (m2 / n) ** 0.5 if n > 1 else 0.0
            if nb and std > 0.0:
                mask = np.abs((v - mean) / std) > 2.5
                want.update((et, int(i)) for i in ids[mask])
    assert got == want
    # the cumulative screen must differ from the single-pass one for at
    # least one row (otherwise this test exercises nothing)
    single = batch_zscore_outliers(load(spark, SF_DIR, "events"), k=2.5)
    single_set = {(r.event_type, r.event_id) for r in single.collect()}
    assert want != single_set
