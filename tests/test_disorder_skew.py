"""Second-oracle (pure pandas/NumPy) re-derivations of the disorder and
skew audits, plus a planted out-of-order trace pinning the lateness
semantics the watermark choice depends on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from svs_spark.queries import queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registry():
    return queries()


def _events(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    return ev.assign(us=ts // 1000)


def test_event_disorder_matches_python(spark, registry):
    out = (
        registry["event_disorder_audit"](spark, SF_DIR)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = _events(SF_DIR).sort_values("event_id")
    rows = []
    for et, g in ev.groupby("event_type"):
        us = g.us.to_numpy()
        late = np.maximum.accumulate(us) - us
        rows.append(
            (
                et,
                len(late),
                int((late > 0).sum()),
                round(float(np.quantile(late / 1e6, 0.5)), 6),
                round(float(np.quantile(late / 1e6, 0.95)), 6),
                round(float(late.max() / 1e6), 6),
            )
        )
    exp = pd.DataFrame(
        rows,
        columns=[
            "event_type", "n_events", "n_late",
            "p50_late_s", "p95_late_s", "max_late_s",
        ],
    ).sort_values("event_type").reset_index(drop=True)
    assert out.event_type.tolist() == exp.event_type.tolist()
    for col in ("n_events", "n_late"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    for col in ("p50_late_s", "p95_late_s", "max_late_s"):
        # numpy's 'linear' quantile = percentile()/quantile_cont
        assert np.allclose(
            out[col].to_numpy(), exp[col].to_numpy(), atol=1e-6
        ), col


def test_event_disorder_planted_trace(spark):
    """Hand-computed lateness on a deliberately out-of-order trace:
    arrival order 0..5, event times (s) 10, 50, 20, 60, 30, 60 →
    lateness 0, 0, 30, 0, 30, 0. Exercises the cross-bucket prefix max
    (bucket width forces the late rows into later buckets than their
    high-water-mark row)."""
    from svs_spark.query_defs import q_event_disorder_audit
    import os
    import tempfile

    times_s = [10, 50, 20, 60, 30, 60]
    with tempfile.TemporaryDirectory() as td:
        rows = [
            (i, pd.Timestamp(t * 1_000_000_000), 1, "x", 0.0, "{}")
            for i, t in enumerate(times_s)
        ]
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf.to_parquet(os.path.join(td, "events.parquet"))
        out = q_event_disorder_audit(spark, td).collect()[0]
        assert out.n_events == 6
        assert out.n_late == 2
        assert abs(out.max_late_s - 30.0) < 1e-9
        # quantile_cont over [0,0,0,0,30,30]: p50 = 0
        assert abs(out.p50_late_s - 0.0) < 1e-9


def test_join_key_skew_matches_python(spark, registry):
    out = registry["join_key_skew_audit"](spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n = ev.groupby("user_id").size().to_numpy()
    assert out.n_keys == len(n)
    assert out.n_rows == int(n.sum())
    assert out.max_rows_per_key == int(n.max())
    assert abs(out.p50_rows_per_key - round(float(np.quantile(n, 0.5)), 6)) < 1e-6
    assert abs(out.p99_rows_per_key - round(float(np.quantile(n, 0.99)), 6)) < 1e-6
    assert abs(
        out.skew_factor - round(float(n.max()) * len(n) / n.sum(), 6)
    ) < 1e-9
    assert out.skew_factor >= 1.0
