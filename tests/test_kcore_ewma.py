"""k_core (operators/graph.py) vs NetworkX; ewma_anomalies
(operators/temporal.py) vs a pure-NumPy fold."""

import numpy as np
import pytest

from svs_spark.operators.graph import k_core
from svs_spark.operators.temporal import ewma_anomalies


def random_edges(n_nodes=120, n_edges=420, seed=4):
    rng = np.random.default_rng(seed)
    seen = set()
    while len(seen) < n_edges:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            seen.add((min(int(a), int(b)), max(int(a), int(b))))
    return sorted(seen)


class TestKCore:
    @pytest.mark.parametrize("k", [2, 3, 4])
    def test_matches_networkx(self, spark, k):
        import networkx as nx

        edges = random_edges()
        g = nx.Graph(edges)
        want = nx.k_core(g, k)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["degree"] for r in k_core(df, k).collect()}
        assert set(got) == set(want.nodes)
        for node, deg in dict(want.degree).items():
            assert got[node] == deg

    def test_empty_core(self, spark):
        # a path graph has no 2-core
        edges = [(i, i + 1) for i in range(10)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        assert k_core(df, 2).count() == 0

    def test_clique_survives_whole(self, spark):
        clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
        chain = [(5, 100), (100, 101), (101, 102)]
        df = spark.createDataFrame(clique + chain, ["src", "dst"])
        got = {r["node"]: r["degree"] for r in k_core(df, 3).collect()}
        assert set(got) == set(range(6))
        assert all(d == 5 for d in got.values())

    def test_rejects_bad_k(self, spark):
        df = spark.createDataFrame([(1, 2)], ["src", "dst"])
        with pytest.raises(ValueError):
            k_core(df, 0)


def numpy_ewma(values, alpha=0.2, zt=3.0):
    lv, var, seen = values[0], 0.0, 0
    out = []
    for v in values:
        r = v - lv
        flag = seen >= 2 and var > 0 and abs(r) > zt * var ** 0.5
        lv = lv + alpha * r
        var = var + alpha * (r * r - var)
        out.append((lv, r, flag))
        seen += 1
    return out


class TestEwma:
    def test_matches_numpy_fold(self, spark):
        rng = np.random.default_rng(8)
        rows = []
        want = {}
        for key in ["a", "b"]:
            vals = rng.standard_normal(80).cumsum()
            vals[40] += 25.0  # planted level shock
            want[key] = numpy_ewma(vals.tolist())
            rows += [(key, i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = ewma_anomalies(df, "k", "ts", "v").collect()
        got = {}
        for r in sorted(out, key=lambda r: (r["k"], r["ts"])):
            got.setdefault(r["k"], []).append(
                (r["level"], r["resid"], r["is_anomaly"])
            )
        for key in want:
            for (gl, gr, gf), (wl, wr, wf) in zip(got[key], want[key]):
                assert gl == pytest.approx(wl, abs=1e-9)
                assert gr == pytest.approx(wr, abs=1e-9)
                assert gf == wf

    def test_detects_planted_shock_only(self, spark):
        rng = np.random.default_rng(9)
        vals = (rng.standard_normal(200) * 0.5).tolist()
        vals[120] += 30.0
        df = spark.createDataFrame(
            [("s", i, float(v)) for i, v in enumerate(vals)],
            ["k", "ts", "v"],
        )
        hits = [
            r["ts"]
            for r in ewma_anomalies(df, "k", "ts", "v").collect()
            if r["is_anomaly"]
        ]
        assert 120 in hits
        # the planted shock plus a handful of genuine 3-sigma tail
        # events (EWMA variance warms up from 0, so early z-scores run
        # hot); the point is the shock is caught and the flag rate
        # stays in the tail-probability regime, not that noise never
        # crosses 3 sigma
        assert len(hits) <= 6

    def test_partitioning_invariance(self, spark):
        rng = np.random.default_rng(10)
        rows = [
            (f"k{i % 5}", i, float(v))
            for i, v in enumerate(rng.standard_normal(300))
        ]
        a = ewma_anomalies(
            spark.createDataFrame(rows, ["k", "ts", "v"]).repartition(1),
            "k", "ts", "v",
        ).collect()
        b = ewma_anomalies(
            spark.createDataFrame(rows, ["k", "ts", "v"]).repartition(13),
            "k", "ts", "v",
        ).collect()
        key = lambda r: (r["k"], r["ts"])  # noqa: E731
        for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
            assert ra == rb


class TestHoltWinters:
    def _series(self, spark):
        import math

        rows = []
        # two series: seasonal+trend signal, and one too short
        for t in range(96):
            y = 10 + 0.5 * t + 5 * math.sin(2 * math.pi * (t % 24) / 24)
            rows.append(("a", t, y))
        for t in range(10):
            rows.append(("short", t, float(t)))
        return spark.createDataFrame(rows, "k string, t long, v double")

    def test_matches_numpy_twin(self, spark):
        import numpy as np

        from svs_spark.operators.temporal import holt_winters

        df = self._series(spark)
        got = {
            (r["k"], r["t"]): (r["fitted"], r["forecast_1"])
            for r in holt_winters(df, "k", "t", "v", season_length=24)
            .collect()
        }
        # independent recompute of series 'a'
        y = np.array(
            [
                10 + 0.5 * t + 5 * np.sin(2 * np.pi * (t % 24) / 24)
                for t in range(96)
            ]
        )
        m, a, b, g = 24, 0.3, 0.1, 0.2
        s1, s2 = y[:m].mean(), y[m : 2 * m].mean()
        level, trend = s1, (s2 - s1) / m
        season = (y[:m] - s1).copy()
        for t in range(m, 96):
            si = t % m
            pred = level + trend + season[si]
            gf, _ = got[("a", t)]
            assert gf == pytest.approx(pred, rel=1e-12)
            nl = a * (y[t] - season[si]) + (1 - a) * (level + trend)
            trend = b * (nl - level) + (1 - b) * trend
            level = nl
            season[si] = g * (y[t] - level) + (1 - g) * season[si]
        # short series dropped entirely
        assert not any(k == "short" for k, _ in got)

    def test_forecast_tracks_signal(self, spark):
        """On a clean seasonal+trend signal the one-step forecast must
        beat a naive last-value predictor by a wide margin over the
        post-warm-up rows."""
        import math

        from svs_spark.operators.temporal import holt_winters

        df = self._series(spark)
        rows = sorted(
            (
                r
                for r in holt_winters(df, "k", "t", "v", season_length=24)
                .collect()
                if r["k"] == "a" and r["t"] >= 48
            ),
            key=lambda r: r["t"],
        )
        sig = lambda t: 10 + 0.5 * t + 5 * math.sin(  # noqa: E731
            2 * math.pi * (t % 24) / 24
        )
        hw_err = sum(
            abs(r["forecast_1"] - sig(r["t"] + 1)) for r in rows[:-1]
        )
        # seasonal-naive (same phase, previous season) is the honest
        # baseline for a seasonal signal; on a trending series its
        # per-step error is the whole season's trend (24 * 0.5 = 12)
        seasonal_naive_err = sum(
            abs(sig(r["t"] + 1 - 24) - sig(r["t"] + 1)) for r in rows[:-1]
        )
        assert hw_err < 0.35 * seasonal_naive_err

    def test_partitioning_invariance(self, spark):
        from svs_spark.operators.temporal import holt_winters

        df = self._series(spark)
        a = sorted(
            map(
                tuple,
                holt_winters(
                    df.repartition(7), "k", "t", "v", season_length=24
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                holt_winters(
                    df.coalesce(1), "k", "t", "v", season_length=24
                ).collect(),
            )
        )
        assert a == b
