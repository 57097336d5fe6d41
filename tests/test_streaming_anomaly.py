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


# ---------------------------------------------------------------------------
# P² robust variant
# ---------------------------------------------------------------------------

from svs_spark.streaming.anomaly import (  # noqa: E402
    _p2_init,
    _p2_update,
    _p2_value,
    robust_outlier_stream,
)


def _p2_run(xs):
    return _p2_value(_p2_update(_p2_init(), xs))


def test_p2_median_accuracy_across_distributions():
    rng = np.random.default_rng(7)
    cases = {
        "uniform": rng.uniform(0, 100, 5000),
        "normal": rng.normal(50, 10, 5000),
        "lognormal_heavy": rng.lognormal(3, 1.0, 5000),
        "sorted": np.arange(5000, dtype=np.float64),
        "reversed": np.arange(5000, dtype=np.float64)[::-1],
    }
    for name, xs in cases.items():
        est = _p2_run(xs)
        true = float(np.median(xs))
        spread = float(
            np.percentile(xs, 75) - np.percentile(xs, 25)
        ) or 1.0
        assert abs(est - true) <= 0.05 * spread, (name, est, true)


def test_p2_small_n_is_exact():
    assert _p2_run([5.0]) == 5.0
    assert _p2_run([5.0, 1.0]) == 3.0
    assert _p2_run([9.0, 1.0, 5.0]) == 5.0
    assert _p2_run([4.0, 1.0, 3.0, 2.0]) == 2.5


def test_robust_stream_flags_planted_spikes(spark, tmp_path):
    rng = np.random.default_rng(11)
    n = 4000
    vals = rng.lognormal(1.0, 0.5, n)  # heavy-ish tail, median ~e
    spike_ids = list(range(100, 4000, 400))  # 10 spikes
    for i in spike_ids:
        vals[i] = 5000.0 + i
    pdf = pd.DataFrame(
        {
            "event_type": "m",
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "value": vals,
        }
    )
    src = tmp_path / "spikes"
    src.mkdir()
    pdf.to_parquet(src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    run_to_memory(
        robust_outlier_stream(stream, k=8.0), "robust_flags",
        output_mode="append",
    )
    flagged = {r.event_id for r in spark.table("robust_flags").collect()}
    assert set(spike_ids) <= flagged, "every planted spike must flag"
    # false-positive rate bounded: a MAD screen legitimately flags
    # the genuine tail of a lognormal (~1.5% beyond 6 MADs at sigma
    # 0.5), so assert at k=8 where the distribution tail is ~0.5%
    assert len(flagged - set(spike_ids)) <= int(0.01 * n)


# ---------------------------------------------------------------------------
# Online CUSUM changepoint detector
# ---------------------------------------------------------------------------

from svs_spark.streaming.anomaly import cusum_changepoint_stream  # noqa: E402


def test_cusum_stream_detects_level_shift(spark, tmp_path):
    """A series that jumps from N(10,1) to N(16,1) at row 600 must
    raise an 'up' alarm shortly after the shift and stay quiet before
    it; a stationary control series must stay quiet throughout."""
    rng = np.random.default_rng(5)
    n = 1200
    shifted = np.concatenate(
        [rng.normal(10, 1, 600), rng.normal(16, 1, n - 600)]
    )
    flat = rng.normal(10, 1, n)
    pdf = pd.concat(
        [
            pd.DataFrame(
                {
                    "event_type": "shifted",
                    "event_id": np.arange(n, dtype=np.int64),
                    "value": shifted,
                }
            ),
            pd.DataFrame(
                {
                    "event_type": "flat",
                    "event_id": np.arange(n, dtype=np.int64),
                    "value": flat,
                }
            ),
        ],
        ignore_index=True,
    )
    src = tmp_path / "shift"
    src.mkdir()
    pdf.to_parquet(src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    run_to_memory(
        cusum_changepoint_stream(stream, k=1.0, h=6.0),
        "cusum_alarms", output_mode="append",
    )
    alarms = spark.table("cusum_alarms").collect()
    up = [r for r in alarms if r.event_type == "shifted" and r.direction == "up"]
    assert up, "the level shift must raise at least one up alarm"
    first = min(r.event_id for r in up)
    assert 600 <= first <= 620, f"detection delay too long: {first}"
    # nothing before the shift on the shifted series
    assert not [r for r in alarms if r.event_type == "shifted" and r.event_id < 600]
    # the stationary control stays quiet
    assert not [r for r in alarms if r.event_type == "flat"]


# ---------------------------------------------------------------------------
# Streaming KLL quantiles
# ---------------------------------------------------------------------------

from svs_spark.streaming.anomaly import kll_quantile_stream  # noqa: E402


def test_kll_stream_rank_error_on_prefix(spark):
    """Drain the events stream fully: the final per-key estimates must
    land within 2.5% rank error of the exact per-key quantiles."""
    from svs_spark.streaming.sessions import run_to_memory, stream_events

    run_to_memory(
        kll_quantile_stream(stream_events(spark, SF_DIR), probs=[0.5, 0.95]),
        "kll_stream", output_mode="update",
    )
    # update mode re-emits per batch; keep the last row per key
    rows = spark.table("kll_stream").collect()
    assert rows
    last = {}
    for r in rows:
        if r["event_type"] not in last or r["n_seen"] > last[r["event_type"]]["n_seen"]:
            last[r["event_type"]] = r
    exact = {}
    for r in load(spark, SF_DIR, "events").select("event_type", "value").collect():
        exact.setdefault(r["event_type"], []).append(r["value"])
    assert set(last) == set(exact)
    for et, r in last.items():
        vals = np.sort(np.array(exact[et]))
        assert r["n_seen"] == len(vals)
        for i, p in enumerate((0.5, 0.95)):
            rank = np.searchsorted(vals, r[f"q{i}"], side="right") / len(vals)
            assert abs(rank - p) <= 0.025, (et, p, r[f"q{i}"])
