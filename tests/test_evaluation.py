"""binary_auc (operators/evaluation.py) vs a NumPy rank-based reference.

The distributed formulation counts won/tied pairs via a cumulative
scan over distinct score values; the reference computes the classic
Mann-Whitney U from average ranks. They must agree exactly (both are
tie-exact), including on planted perfect / inverted / random signals.
"""

import numpy as np
import pytest

from svs_spark.operators.evaluation import binary_auc


def auc_reference(scores, labels):
    """Tie-exact ROC-AUC via average ranks (Mann-Whitney)."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=bool)
    order = np.argsort(scores, kind="mergesort")
    s_sorted = scores[order]
    ranks = np.empty(len(scores), dtype=np.float64)
    i = 0
    while i < len(s_sorted):
        j = i
        while j < len(s_sorted) and s_sorted[j] == s_sorted[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average rank, 1-based
        i = j
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    r_pos = ranks[labels].sum()
    return (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def run_auc(spark, rows, group=False):
    cols = ["g", "s", "y"] if group else ["s", "y"]
    df = spark.createDataFrame(rows, cols)
    out = binary_auc(df, "s", "y", ["g"] if group else None)
    return {tuple(r[:-3]) or ("all",): (r["n_pos"], r["n_neg"], r["auc"])
            for r in out.collect()}


class TestBinaryAuc:
    def test_perfect_separation(self, spark):
        rows = [(i, i >= 5) for i in range(10)]
        got = run_auc(spark, rows)
        assert got[("all",)] == (5, 5, 1.0)

    def test_inverted_signal(self, spark):
        rows = [(i, i < 5) for i in range(10)]
        got = run_auc(spark, rows)
        assert got[("all",)] == (5, 5, 0.0)

    def test_all_tied_is_half(self, spark):
        rows = [(7, i % 2 == 0) for i in range(10)]
        got = run_auc(spark, rows)
        assert got[("all",)] == (5, 5, 0.5)

    def test_matches_numpy_reference_with_ties(self, spark):
        rng = np.random.default_rng(42)
        scores = rng.integers(0, 20, size=500).tolist()  # heavy ties
        labels = (rng.random(500) < 0.3).tolist()
        got = run_auc(spark, [(int(s), bool(y)) for s, y in zip(scores, labels)])
        want = auc_reference(scores, labels)
        n_pos, n_neg, auc = got[("all",)]
        assert n_pos == sum(labels)
        assert auc == pytest.approx(round(want, 6), abs=1e-9)

    def test_grouped_and_degenerate_groups_dropped(self, spark):
        rows = (
            [("a", i, i >= 8) for i in range(10)]
            + [("b", i, i < 2) for i in range(10)]
            + [("only_pos", 1, True), ("only_pos", 2, True)]
            + [("only_neg", 1, False)]
        )
        got = run_auc(spark, rows, group=True)
        assert set(got) == {("a",), ("b",)}
        assert got[("a",)] == (2, 8, 1.0)
        assert got[("b",)] == (2, 8, 0.0)

    def test_partitioning_invariance(self, spark):
        rng = np.random.default_rng(7)
        rows = [
            (int(s), bool(y))
            for s, y in zip(rng.integers(0, 15, 300), rng.random(300) < 0.4)
        ]
        df1 = spark.createDataFrame(rows, ["s", "y"]).repartition(1)
        df17 = spark.createDataFrame(rows, ["s", "y"]).repartition(17)
        a1 = binary_auc(df1, "s", "y").collect()[0]
        a17 = binary_auc(df17, "s", "y").collect()[0]
        assert (a1["n_pos"], a1["n_neg"], a1["auc"]) == (
            a17["n_pos"], a17["n_neg"], a17["auc"],
        )
