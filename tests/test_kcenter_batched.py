"""kcenter_greedy: the batched (top-m candidate) form must reproduce
the sequential Gonzalez greedy EXACTLY — same center sequence, same
radii — in fewer corpus passes. The guard argument (no uncollected row
can beat a candidate whose updated pair is still within the collected
bound) is what these tests pin, including tie-heavy and
duplicate-vector corpora where the id tiebreak is load-bearing."""

from __future__ import annotations

import numpy as np
import pytest

from svs_spark.operators.clustering import kcenter_greedy


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)


def _rand_unit(rng, n, d):
    m = rng.standard_normal((n, d))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("m", [6, 16, 1000])
def test_batched_equals_sequential_random(spark, seed, m):
    rng = np.random.default_rng(seed)
    vecs = _rand_unit(rng, 120, 8)
    df = _df(spark, vecs)
    ids_seq, radii_seq, passes_seq = kcenter_greedy(df, k=6)
    ids_bat, radii_bat, passes_bat = kcenter_greedy(
        df, k=6, batch_candidates=m
    )
    assert ids_bat == ids_seq
    assert radii_bat == radii_seq
    assert passes_seq == 5
    # batching saves passes; how many is data-dependent (a pass's
    # top-m can be spatially clustered, and selecting one candidate
    # invalidates its neighbors) — but it must never cost MORE
    if m >= 16:
        assert passes_bat < passes_seq
    if m >= 1000:
        assert passes_bat == 1


def test_batched_equals_sequential_duplicates(spark):
    """Duplicate vectors force score ties — the id-asc tiebreak must
    survive local selection."""
    rng = np.random.default_rng(7)
    base = _rand_unit(rng, 20, 6)
    vecs = np.vstack([base, base, base])  # every vector thrice
    df = _df(spark, vecs)
    ids_seq, radii_seq, _ = kcenter_greedy(df, k=5)
    ids_bat, radii_bat, _ = kcenter_greedy(df, k=5, batch_candidates=7)
    assert ids_bat == ids_seq
    assert radii_bat == radii_seq


def test_batched_tiny_candidate_window(spark):
    """m smaller than what one pass can safely select: the guard must
    trip and trigger rescans, never emit a wrong center."""
    rng = np.random.default_rng(3)
    vecs = _rand_unit(rng, 80, 5)
    df = _df(spark, vecs)
    ids_seq, radii_seq, _ = kcenter_greedy(df, k=8)
    ids_bat, radii_bat, passes = kcenter_greedy(df, k=8, batch_candidates=2)
    assert ids_bat == ids_seq
    assert radii_bat == radii_seq
    assert passes >= 2


def test_corpus_fits_in_window_single_pass(spark):
    """Whole corpus inside m: selection completes in ONE pass."""
    rng = np.random.default_rng(11)
    vecs = _rand_unit(rng, 30, 4)
    df = _df(spark, vecs)
    ids_seq, radii_seq, _ = kcenter_greedy(df, k=6)
    ids_bat, radii_bat, passes = kcenter_greedy(
        df, k=6, batch_candidates=500
    )
    assert ids_bat == ids_seq
    assert radii_bat == radii_seq
    assert passes == 1


def test_radii_nonincreasing_and_seed_is_lowest_id(spark):
    rng = np.random.default_rng(5)
    vecs = _rand_unit(rng, 60, 6)
    df = _df(spark, vecs)
    ids, radii, _ = kcenter_greedy(df, k=5, batch_candidates=32)
    assert ids[0] == 0  # lowest id seeds
    assert len(ids) == 5 and len(set(ids)) == 5
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))


def test_k_validation(spark):
    df = _df(spark, np.eye(3))
    with pytest.raises(ValueError):
        kcenter_greedy(df, k=0)


@pytest.mark.parametrize("m", [0, 4])
def test_k_exceeding_corpus_stops_at_exhaustion(spark, m):
    """k > |corpus| must stop when every row is a center — unique ids,
    len == corpus size — not silently emit duplicate center ids
    (round-7 ADVICE: both forms previously re-picked chosen rows)."""
    rng = np.random.default_rng(13)
    vecs = _rand_unit(rng, 7, 5)
    df = _df(spark, vecs)
    ids, radii, _ = kcenter_greedy(df, k=20, batch_candidates=m)
    assert sorted(ids) == list(range(7))  # every row once, none twice
    assert len(radii) == 6  # one radius per non-seed selection


def test_anti_join_exclusion_matches_inset(spark, monkeypatch):
    """Past _ANTI_JOIN_CUTOFF centers the exclusion filter switches
    from an InSet literal to a broadcast left-anti join (r8 ADVICE:
    the literal list made per-pass plan-compile cost quadratic in k).
    Force the cutoff low and check both paths select identically."""
    from svs_spark.operators import clustering as C

    rng = np.random.default_rng(23)
    vecs = _rand_unit(rng, 60, 6)
    df = _df(spark, vecs)
    ids_inset, radii_inset, _ = kcenter_greedy(df, k=8, batch_candidates=4)
    monkeypatch.setattr(C, "_ANTI_JOIN_CUTOFF", 2)
    ids_anti, radii_anti, _ = kcenter_greedy(df, k=8, batch_candidates=4)
    assert ids_anti == ids_inset
    assert radii_anti == radii_inset
    # sequential form crosses the cutoff too
    ids_seq, radii_seq, _ = kcenter_greedy(df, k=6)
    monkeypatch.setattr(C, "_ANTI_JOIN_CUTOFF", 128)
    ids_seq2, radii_seq2, _ = kcenter_greedy(df, k=6)
    assert ids_seq == ids_seq2
    assert radii_seq == radii_seq2


def test_exhaustion_keeps_duplicate_vector_rows(spark):
    """Exhaustion is by ID, not by score: distinct rows holding
    identical vectors still all get selected (radius 0), so corpora
    with exact duplicates keep full-k behavior."""
    rng = np.random.default_rng(17)
    base = _rand_unit(rng, 3, 4)
    vecs = np.vstack([base, base])  # 6 rows, 3 distinct vectors
    df = _df(spark, vecs)
    ids, radii, _ = kcenter_greedy(df, k=10, batch_candidates=4)
    assert sorted(ids) == list(range(6))
    assert radii[-1] == 0.0  # the tail picks are exact duplicates
