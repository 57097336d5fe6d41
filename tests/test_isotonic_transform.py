"""isotonic_calibrate (operators/evaluation.py) — the PAV transform
(r8 verdict ask #4): per-row calibrated probabilities, monotone in the
score, identity on already-monotone signals, pooled runs sharing one
weighted mean, and bin-for-bin equal to the registered
isotonic_calibration query's closed-form minimax fit."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR
from svs_spark.operators.evaluation import isotonic_calibrate


def _df(spark, scores, labels):
    rows = [(i, int(s), int(y)) for i, (s, y) in enumerate(zip(scores, labels))]
    return spark.createDataFrame(rows, "rid long, score long, y long")


def test_monotone_in_score(spark):
    rng = np.random.default_rng(3)
    scores = rng.integers(0, 1000, 400)
    labels = rng.integers(0, 2, 400)
    out = (
        isotonic_calibrate(_df(spark, scores, labels), "score", "y")
        .select("score", "calibrated")
        .collect()
    )
    by_score = sorted((r["score"], r["calibrated"]) for r in out)
    cals = [c for _, c in by_score]
    assert all(a <= b + 1e-12 for a, b in zip(cals, cals[1:]))


def test_identity_on_monotone_bin_rates(spark):
    """Bins whose positive rate already rises with score: PAV pools
    nothing, so each row's calibrated value IS its bin's raw rate."""
    scores, labels = [], []
    for b in range(10):
        for i in range(20):
            scores.append(b * 100 + i)  # max 9xx -> bin b
            labels.append(1 if i < 2 * b else 0)  # rate = b/10, rising
    out = isotonic_calibrate(
        _df(spark, scores, labels), "score", "y"
    ).collect()
    for r in out:
        assert r["calibrated"] == pytest.approx(r["bin"] / 10.0, abs=1e-12)


def test_planted_violation_pools(spark):
    """One high bin with a LOWER rate than its predecessor must pool:
    both bins' rows share the weighted mean, and global monotonicity
    holds."""
    scores, labels = [], []
    rates = [0.1, 0.2, 0.8, 0.3, 0.9]  # bins 2-3 violate
    for b, rate in enumerate(rates):
        for i in range(20):
            scores.append(b * 100 + i)
            labels.append(1 if i < rate * 20 else 0)
    out = isotonic_calibrate(
        _df(spark, scores, labels), "score", "y"
    ).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin"], set()).add(r["calibrated"])
    assert all(len(v) == 1 for v in by_bin.values())
    cal = {b: v.pop() for b, v in by_bin.items()}
    # independent NumPy twin: replicate the binning, run stack PAV
    from tests.test_isotonic import pav_fit

    s = np.asarray(scores, dtype=np.int64)
    y = np.asarray(labels, dtype=np.int64)
    b = np.minimum(9, s * 10 // (s.max() + 1))
    order = np.unique(b)
    n = np.asarray([(b == bb).sum() for bb in order])
    p = np.asarray([y[b == bb].sum() for bb in order])
    want = dict(zip(order.tolist(), pav_fit(n, p).tolist()))
    assert {k: pytest.approx(v) for k, v in want.items()} == cal
    # the planted 0.8-then-0.3 violation must actually pool something
    assert len(set(want.values())) < len(order)
    vals = [cal[bb] for bb in sorted(cal)]
    assert all(a <= c + 1e-12 for a, c in zip(vals, vals[1:]))


def test_matches_registered_fit_query(spark):
    """Per-bin transform values equal the registered query's
    closed-form minimax calibrated column on the real corpus."""
    from pyspark.sql import functions as F

    from svs_spark.queries import queries

    fit = {
        r["bin"]: r["calibrated"]
        for r in queries()["isotonic_calibration"](spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "zh", 1).otherwise(0).alias("y"),
    )
    got = {
        r["bin"]: round(r["calibrated"], 6)
        for r in isotonic_calibrate(docs, "score", "y")
        .select("bin", "calibrated")
        .distinct()
        .collect()
    }
    assert got == fit


def test_fractional_scores_monotone(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, float(rng.uniform(0, 1)), int(rng.integers(0, 2)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "rid long, score double, y long")
    out = isotonic_calibrate(df, "score", "y", n_bins=8).collect()
    by_score = sorted((r["score"], r["calibrated"]) for r in out)
    cals = [c for _, c in by_score]
    assert all(a <= b + 1e-12 for a, b in zip(cals, cals[1:]))
    assert {r["bin"] for r in out} <= set(range(8))


def test_null_label_raises(spark):
    df = spark.createDataFrame(
        [(0, 5, 1), (1, 7, None)], "rid long, score long, y long"
    )
    with pytest.raises(ValueError, match="nulls"):
        isotonic_calibrate(df, "score", "y")


def test_bad_args_raise(spark):
    df = spark.createDataFrame([(0, 5, 1)], "rid long, score long, y long")
    with pytest.raises(ValueError):
        isotonic_calibrate(df, "score", "y", n_bins=0)
    with pytest.raises(ValueError):
        isotonic_calibrate(df, "nope", "y")


def test_binned_persist_is_registry_tracked(spark):
    """The r9 optimization caches the binned frame (it feeds both the
    fit's bin aggregate and the returned apply join); the persist must
    join the registry's per-query release list so a long-lived session
    can't accumulate dead InMemoryRelations."""
    from svs_spark import cache_hooks

    tracked: list = []
    old = cache_hooks._TRACKER
    cache_hooks.set_tracker(tracked.append)
    try:
        out = isotonic_calibrate(
            _df(spark, [1, 5, 9, 3, 7] * 20, [0, 1, 1, 0, 1] * 20),
            "score",
            "y",
        )
        rows = out.collect()
        assert len(rows) == 100
        # exactly one tracked persist (the binned frame), and it is
        # actually materialized as cached
        assert len(tracked) == 1
        assert tracked[0].storageLevel.useMemory
        tracked[0].unpersist()
    finally:
        cache_hooks.set_tracker(old)
