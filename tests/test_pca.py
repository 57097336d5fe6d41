"""Distributed PCA (operators/pca.py) vs direct NumPy on the same data."""

import numpy as np
import pytest

from svs_spark.operators import pca as P

DIM = 12


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    # anisotropic gaussian: known dominant axes
    basis = rng.standard_normal((DIM, DIM))
    scales = np.array([10.0, 5.0, 2.0] + [0.5] * (DIM - 3))
    x = rng.standard_normal((400, DIM)) * scales @ basis.T
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def df(spark, data):
    rows = [(i, v.tolist()) for i, v in enumerate(data)]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


class TestMoments:
    def test_covariance_matches_numpy(self, df, data):
        c = P.covariance(df, "embedding", DIM)
        want = np.cov(data.astype(np.float64), rowvar=False, ddof=1)
        assert np.allclose(c, want, atol=1e-9)

    def test_partitioning_invariance(self, spark, df, data):
        c1 = P.covariance(df.repartition(1), "embedding", DIM)
        c9 = P.covariance(df.repartition(9), "embedding", DIM)
        # float64 partial sums: identical to ~1e-10 relative, not bit-equal
        assert np.allclose(c1, c9, rtol=1e-9, atol=1e-9)


class TestPca:
    def test_explained_variance_and_components(self, df, data):
        ratio, comps = P.pca(df, "embedding", DIM, 3)
        x = data.astype(np.float64)
        want_cov = np.cov(x, rowvar=False, ddof=1)
        vals, vecs = np.linalg.eigh(want_cov)
        order = np.argsort(vals)[::-1][:3]
        want_ratio = vals[order] / vals.sum()
        assert np.allclose(ratio, want_ratio, atol=1e-9)
        # components match up to the fixed sign convention
        for k, idx in enumerate(order):
            v = vecs[:, idx]
            j = int(np.abs(v).argmax())
            if v[j] < 0:
                v = -v
            assert np.allclose(comps[k], v, atol=1e-7)

    def test_ratio_ordered_and_dominant(self, df):
        ratio, _ = P.pca(df, "embedding", DIM, 5)
        assert all(a >= b for a, b in zip(ratio, ratio[1:]))
        assert ratio[0] > 0.3  # the planted 10x axis dominates

    def test_project_matches_numpy(self, df, data):
        _, comps = P.pca(df, "embedding", DIM, 2)
        out = (
            P.project(df, "embedding", comps)
            .orderBy("id")
            .select("pc")
            .collect()
        )
        got = np.array([r["pc"] for r in out])
        want = data.astype(np.float64) @ comps.T
        assert np.allclose(got, want, atol=1e-4)  # float32 inputs

    def test_covariance_needs_two_rows(self, spark):
        df1 = spark.createDataFrame(
            [(0, [1.0, 2.0])], "id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            P.covariance(df1, "embedding", 2)
