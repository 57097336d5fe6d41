"""theil_sen_trend: second oracle in pure Python/NumPy (independent of
the DuckDB SQL mirror), plus the robustness property that justifies
the estimator — a planted outlier day barely moves the Theil-Sen
slope while it drags the least-squares slope."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from svs_spark.queries import queries


@pytest.fixture(scope="module")
def registry():
    return queries()


def python_daily(ev: pd.DataFrame) -> pd.DataFrame:
    # normalize ts to epoch-ns regardless of physical parquet precision
    ns = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    d = (ns // 1000) // 86_400_000_000
    m = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype("int64")
    return (
        pd.DataFrame({"event_type": ev["event_type"], "d": d, "m": m})
        .groupby(["event_type", "d"], as_index=False)["m"]
        .sum()
    )


def theil_sen(days: np.ndarray, sm: np.ndarray) -> tuple[float, int]:
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            slopes.append((sm[j] - sm[i]) / (days[j] - days[i]) / 1000)
    return float(np.median(slopes)), len(slopes)


def test_matches_python_reference(spark, registry):
    out = registry["theil_sen_trend"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    daily = python_daily(ev)
    assert len(out) > 0
    for _, row in out.iterrows():
        grp = daily[daily["event_type"] == row["event_type"]].sort_values("d")
        slope, n_pairs = theil_sen(
            grp["d"].to_numpy(), grp["m"].to_numpy(dtype="float64")
        )
        assert row["n_days"] == len(grp)
        assert row["n_pairs"] == n_pairs
        assert abs(row["slope_per_day"] - round(slope, 6)) < 1e-6, (
            row["event_type"], row["slope_per_day"], slope,
        )


def test_robust_to_planted_outlier():
    """Pure-kernel property: corrupting ONE day by 100× moves the
    Theil-Sen slope by <10% of the least-squares displacement."""
    rng = np.random.default_rng(7)
    days = np.arange(40, dtype="float64")
    sm = 1000 * (50 + 3 * days + rng.normal(0, 2, 40))
    clean_ts, _ = theil_sen(days, sm)
    spiked = sm.copy()
    spiked[-1] *= 100  # endpoint spike = max leverage on least squares
    spiked_ts, _ = theil_sen(days, spiked)

    def lsq(y):
        return float(np.polyfit(days, y / 1000, 1)[0])

    lsq_shift = abs(lsq(spiked) - lsq(sm))
    ts_shift = abs(spiked_ts - clean_ts)
    assert lsq_shift > 10, lsq_shift  # the spike wrecks least squares
    assert ts_shift < 0.1 * lsq_shift, (ts_shift, lsq_shift)
    assert abs(spiked_ts - 3) < 1.0  # still near the true slope


def test_regression_matches_numpy(spark, registry):
    """price_size_regression vs np.polyfit per brand — a second oracle
    independent of the SQL mirror."""
    out = registry["price_size_regression"](spark, SF_DIR).toPandas()
    parts = pd.read_parquet(f"{SF_DIR}/part.parquet")
    assert len(out) > 0
    for _, row in out.iterrows():
        g = parts[parts["p_brand"] == row["p_brand"]]
        x = g["p_size"].to_numpy(dtype="float64")
        y = (np.floor(g["p_retailprice"].to_numpy() * 100 + 0.5)) / 100
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-3
        assert abs(row["r2"] - r * r) < 1e-4
        assert row["n"] == len(g)
