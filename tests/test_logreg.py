"""Distributed Newton logistic regression vs an independent NumPy twin."""

import numpy as np
import pytest

from svs_spark.operators import logreg as LR

DIM = 5


def numpy_newton(x, y, iters=8, l2=1e-3):
    """Same objective, same algorithm, computed in one process."""
    xb = np.hstack([x, np.ones((x.shape[0], 1))])
    w = np.zeros(DIM + 1)
    reg = l2 * np.ones(DIM + 1)
    reg[DIM] = 0.0
    for _ in range(iters):
        z = xb @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = xb.T @ (p - y) + reg * w
        h = (xb * (p * (1 - p))[:, None]).T @ xb + np.diag(reg)
        w = w - np.linalg.solve(h, g)
    return w


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((600, DIM))
    true_w = np.array([2.0, -1.5, 0.8, 0.0, 3.0])
    z = x @ true_w - 0.5
    y = (rng.random(600) < 1.0 / (1.0 + np.exp(-z))).astype(np.float64)
    return x.astype(np.float32), y


@pytest.fixture(scope="module")
def df(spark, data):
    x, y = data
    rows = [(v.tolist(), float(t)) for v, t in zip(x, y)]
    return spark.createDataFrame(rows, "features array<float>, label double")


class TestFit:
    def test_matches_numpy_twin(self, df, data):
        x, y = data
        model = LR.fit(df, dim=DIM, iters=8)
        want = numpy_newton(x.astype(np.float64), y, iters=8)
        assert np.allclose(model["weights"], want[:DIM], atol=1e-6)
        assert model["intercept"] == pytest.approx(want[DIM], abs=1e-6)
        assert model["n"] == 600

    def test_converged(self, df):
        model = LR.fit(df, dim=DIM, iters=8)
        assert model["grad_norm"] < 1e-6  # Newton is quadratic; 8 is plenty

    def test_recovers_signal_direction(self, df):
        model = LR.fit(df, dim=DIM, iters=8)
        w = np.asarray(model["weights"])
        true_w = np.array([2.0, -1.5, 0.8, 0.0, 3.0])
        cos = w @ true_w / (np.linalg.norm(w) * np.linalg.norm(true_w))
        assert cos > 0.97

    def test_partitioning_invariance(self, df):
        m1 = LR.fit(df.repartition(1), dim=DIM, iters=5)
        m9 = LR.fit(df.repartition(9), dim=DIM, iters=5)
        assert np.allclose(m1["weights"], m9["weights"], atol=1e-9)
        assert m1["intercept"] == pytest.approx(m9["intercept"], abs=1e-9)

    def test_dim_inference(self, df):
        m = LR.fit(df, iters=3)
        assert len(m["weights"]) == DIM


class TestPredict:
    def test_scores_match_sigmoid(self, spark, df, data):
        x, y = data
        model = LR.fit(df, dim=DIM, iters=8)
        out = LR.predict(df, model).select("score").collect()
        got = np.array([r["score"] for r in out])
        w = np.asarray(model["weights"])
        want = 1.0 / (
            1.0 + np.exp(-(x.astype(np.float64) @ w + model["intercept"]))
        )
        assert np.allclose(np.sort(got), np.sort(want), atol=1e-9)

    def test_separates_classes(self, spark, df, data):
        _, y = data
        model = LR.fit(df, dim=DIM, iters=8)
        rows = LR.predict(df, model).select("score", "label").collect()
        pos = [r["score"] for r in rows if r["label"] == 1.0]
        neg = [r["score"] for r in rows if r["label"] == 0.0]
        assert np.mean(pos) > 0.7 and np.mean(neg) < 0.3
