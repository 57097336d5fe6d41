"""Property-based gates (hypothesis) for the pure sketch kernels —
no SparkSession: these pin the mathematical contracts the distributed
wrappers rely on, over adversarial inputs a fixed-seed test won't find.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from svs_spark.operators.sketch import (
    KLL,
    _cm_positions,
    _mg_reduce,
    _splitmix64,
)

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e12, max_value=1e12,
)


def _rank_err(sorted_vals: np.ndarray, est: float, p: float) -> float:
    """Rank error where a duplicated value's rank is the INTERVAL
    [lo, hi): zero if p falls inside the estimate's rank interval."""
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left") / n
    hi = np.searchsorted(sorted_vals, est, side="right") / n
    if lo <= p <= hi:
        return 0.0
    return min(abs(p - lo), abs(p - hi))


@settings(max_examples=40, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=5000))
def test_kll_rank_error_bound(xs):
    sk = KLL(128)
    sk.update_many(xs)
    assert sk.n == len(xs)
    svals = np.sort(np.asarray(xs))
    for p in (0.1, 0.5, 0.9):
        [est] = sk.quantiles([p])
        # eps ~ 1.65/k * sqrt(log2(n/k)) < 0.04 for n <= 5000, k = 128;
        # grant slack for the discrete small-n regime
        assert _rank_err(svals, est, p) <= 0.08, (p, est)
    # space: retained items stay O(k log(n/k))
    assert sum(len(l) for l in sk.levels) <= 128 * 6


@settings(max_examples=25, deadline=None)
@given(
    st.lists(finite_floats, min_size=1, max_size=2000),
    st.lists(finite_floats, min_size=1, max_size=2000),
)
def test_kll_merge_preserves_contract(xs, ys):
    a, b = KLL(128), KLL(128)
    a.update_many(xs)
    b.update_many(ys)
    merged = a.merge(b)
    assert merged.n == len(xs) + len(ys)
    svals = np.sort(np.asarray(xs + ys))
    for p in (0.25, 0.75):
        [est] = merged.quantiles([p])
        assert _rank_err(svals, est, p) <= 0.1, (p, est)


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.integers(min_value=1, max_value=10_000),
        min_size=1, max_size=400,
    ),
    st.integers(min_value=1, max_value=64),
)
def test_mg_reduce_invariants(counts, capacity):
    red = _mg_reduce(dict(counts), capacity)
    assert len(red) <= capacity
    for k, v in red.items():
        assert 0 < v <= counts[k]
    # the decrement is uniform: every surviving counter dropped by the
    # same amount, so relative order among survivors is preserved
    if len(counts) > capacity:
        drops = {k: counts[k] - v for k, v in red.items()}
        assert len(set(drops.values())) <= 1


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=32), st.integers(min_value=1, max_value=16))
def test_cm_positions_deterministic_in_range(item, depth):
    width = 1024
    p1 = _cm_positions(item, width, depth)
    p2 = _cm_positions(item, width, depth)
    assert p1 == p2
    assert len(p1) == depth
    assert all(0 <= p < width for p in p1)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_splitmix_is_total_and_bounded(x):
    y = _splitmix64(x)
    assert 0 <= y < (1 << 64)
    assert _splitmix64(x) == y
