"""Approximate-sketch scale paths vs their exact twins.

At 100 TB, exact count-distinct and exact percentiles force full
shuffles of every distinct value; the production path is sketches —
HyperLogLog++ (approx_count_distinct) and Greenwald-Khanna
(approx_percentile) — which aggregate with map-side partial merge and
constant memory. These tests pin the accuracy contract that makes the
swap safe, on the same testdata the exact oracle queries run on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from svs_spark.queries import load
from tests.conftest import SF_DIR


def test_hll_distinct_within_rsd(spark):
    ev = load(spark, SF_DIR, "events")
    exact, approx = (
        ev.agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .first()
    )
    assert abs(approx - exact) / exact <= 0.06  # 3× the configured rsd

def test_hll_merges_across_groups(spark):
    """Per-group HLL counts must stay within tolerance too (the merge
    path across partitions/groups is what runs on a real cluster)."""
    ev = load(spark, SF_DIR, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) <= 0.06

def test_approx_percentile_vs_exact(spark):
    ev = load(spark, SF_DIR, "events")
    [row] = (
        ev.agg(
            F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("exact"),
            F.expr(
                "approx_percentile(value, array(0.5, 0.95, 0.99), 10000)"
            ).alias("approx"),
        )
        .collect()
    )
    lo, hi = (
        ev.agg(F.min("value"), F.max("value")).first()
    )
    spread = hi - lo
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) <= 0.01 * spread, (e, a)


def test_minhash_lsh_recall_on_planted_near_dups(spark):
    """LSH recall gate: plant near-duplicate doc pairs with known exact
    shingle Jaccard and require minhash_lsh_pairs to recover most of
    them.  This is the check the cross-engine oracle CANNOT do (the
    oracle mirrors the same signature arithmetic, so a biased hash
    family stays parity-green while recall silently collapses — the
    round-1 failure mode of the correlated affine coefficients)."""
    import random

    from svs_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(500)]
    docs, planted = [], []
    did = 0
    for base in range(40):
        toks = [rng.choice(vocab) for _ in range(30)]
        docs.append((did, " ".join(toks)))
        # near-dup: mutate one token near the end (high Jaccard ~0.8+)
        mut = list(toks)
        mut[-2] = rng.choice(vocab)
        docs.append((did + 1, " ".join(mut)))
        planted.append((did, did + 1))
        did += 2
    for _ in range(60):  # unrelated background docs
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(30))))
        did += 1

    def shingle_set(text, k=3):
        t = text.split(" ")
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    def jac(a, b):
        sa, sb = shingle_set(a), shingle_set(b)
        return len(sa & sb) / len(sa | sb)

    text_by_id = dict(docs)
    truth = [
        (a, b) for a, b in planted if jac(text_by_id[a], text_by_id[b]) >= 0.5
    ]
    assert len(truth) >= 30  # the planting really does make near-dups

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, num_hashes=16, bands=4, jaccard_threshold=0.5
        ).collect()
    }
    recall = sum((a, b) in got for a, b in truth) / len(truth)
    # banding s-curve at J≈0.8 with 16 hashes / 4 bands gives per-pair
    # candidate probability ≈0.9; over ≥30 planted pairs recall ≥ 0.75
    # holds with wide margin for an unbiased family (the correlated
    # round-1 family scored ~0 here)
    assert recall >= 0.75, recall
    # precision is exact by construction: every returned pair passed the
    # exact-Jaccard verification stage
    for a, b in got:
        assert jac(text_by_id[a], text_by_id[b]) >= 0.5, (a, b)


# ---------------------------------------------------------------------------
# KLL mergeable quantile sketch (operators/sketch.py)
# ---------------------------------------------------------------------------


def _rank_error(sorted_vals, estimate, p):
    """|empirical rank of estimate - p| in [0, 1]."""
    import numpy as np

    arr = np.asarray(sorted_vals)
    rank = np.searchsorted(arr, estimate, side="right") / len(arr)
    return abs(rank - p)


def test_kll_global_rank_error(spark):
    """Global quantiles over events.value: every estimate must land
    within 2% rank error of the exact empirical quantile (k=200 gives
    eps ~ 1.3-1.7%; gate at 2% for slack)."""
    import numpy as np

    from svs_spark.operators.sketch import kll_quantiles

    ev = load(spark, SF_DIR, "events")
    probs = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    [row] = kll_quantiles(ev, "value", probs, k=200).collect()
    vals = np.sort(
        np.array([r["value"] for r in ev.select("value").collect()])
    )
    assert row["n"] == len(vals)
    for i, p in enumerate(probs):
        err = _rank_error(vals, row[f"q{i}"], p)
        assert err <= 0.02, (p, row[f"q{i}"], err)


def test_kll_grouped_matches_per_key(spark):
    """Per-key sketches (the map-side-partial merge path — what runs on
    a real cluster) must hit the same rank-error contract per group."""
    import numpy as np

    from svs_spark.operators.sketch import kll_quantiles_by

    ev = load(spark, SF_DIR, "events")
    probs = [0.5, 0.9]
    rows = kll_quantiles_by(ev, "event_type", "value", probs, k=200).collect()
    assert rows
    exact = {}
    for r in ev.select("event_type", "value").collect():
        exact.setdefault(r["event_type"], []).append(r["value"])
    assert set(r["event_type"] for r in rows) == set(exact)
    for r in rows:
        vals = np.sort(np.array(exact[r["event_type"]]))
        assert r["n"] == len(vals)
        for i, p in enumerate(probs):
            assert _rank_error(vals, r[f"q{i}"], p) <= 0.025, (
                r["event_type"], p,
            )


def test_kll_merge_equals_single_sketch_contract(spark):
    """Mergeability: a sketch merged from 16 shard-sketches must obey
    the same rank-error bound as one built serially (merge must not
    degrade the guarantee) — pure-Python check on the kernel class."""
    import numpy as np

    from svs_spark.operators.sketch import KLL

    rng = np.random.default_rng(7)
    data = rng.lognormal(0.0, 1.0, 200_000)
    whole = KLL(200)
    whole.update_many(data)
    shards = [KLL(200) for _ in range(16)]
    for i, sh in enumerate(shards):
        sh.update_many(data[i::16])
    merged = shards[0]
    for sh in shards[1:]:
        merged = merged.merge(sh)
    assert merged.n == len(data)
    svals = np.sort(data)
    for p in (0.01, 0.1, 0.5, 0.9, 0.99):
        for sk in (whole, merged):
            [est] = sk.quantiles([p])
            assert _rank_error(svals, est, p) <= 0.02, (p, est)
    # space bound: total retained items stay O(k log(n/k))
    retained = sum(len(l) for l in merged.levels)
    assert retained <= 200 * 6


def test_value_percentiles_approx_rank_contract(spark):
    """The approx twin of the registered value_percentiles query: each
    approx_percentile output must sit within rank error 1/accuracy of
    the requested quantile in its group (the GK guarantee), verified
    against the raw data — not just 'close in value', which says
    nothing on heavy-tailed p99."""
    from svs_spark.query_defs import value_percentiles_df

    ev = load(spark, SF_DIR, "events")
    accuracy = 1000
    approx = {
        r.event_type: r
        for r in value_percentiles_df(
            ev, approx=True, accuracy=accuracy
        ).collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert approx.keys() == vals.keys()
    for et, row in approx.items():
        xs = sorted(vals[et])
        n = len(xs)
        for p, got in ((0.5, row.p50), (0.9, row.p90), (0.99, row.p99)):
            # rank interval occupied by the returned value (6dp-rounded
            # output → compare with matching tolerance)
            lo = sum(1 for x in xs if round(x, 6) < round(got, 6)) / n
            hi = sum(1 for x in xs if round(x, 6) <= round(got, 6)) / n
            eps = 1.0 / accuracy + 1.0 / n
            assert lo - eps <= p <= hi + eps, (et, p, got, lo, hi)


def test_event_outliers_mad_approx_twin(spark):
    """The approx=True swap of event_outliers_mad keeps the same
    operator shape and lands within the GK rank contract: med/mad are
    rank-accurate, and the 3-MAD outlier count moves by at most the
    mass a 1/accuracy rank shift of the threshold can move."""
    from svs_spark.query_defs import event_outliers_mad_df

    ev = load(spark, SF_DIR, "events").select("event_type", "value")
    exact = {r.event_type: r for r in event_outliers_mad_df(ev).collect()}
    approx = {
        r.event_type: r
        for r in event_outliers_mad_df(
            ev, approx=True, accuracy=1000
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for et in exact:
        e, a = exact[et], approx[et]
        assert a.n_events == e.n_events
        # med/mad within a small relative band of the exact form
        assert abs(a.med - e.med) <= max(1e-6, 0.02 * abs(e.med)), (et, e, a)
        assert abs(a.mad - e.mad) <= max(1e-6, 0.05 * abs(e.mad)), (et, e, a)
        # outlier tail: |Δcount| bounded by a 5% threshold wobble's mass
        assert abs(a.n_outliers - e.n_outliers) <= max(
            5, 0.2 * max(e.n_outliers, 1)
        ), (et, e, a)


class TestJoinSizeEstimate:
    """AGMS/CM join-cardinality pre-flight: one-sided overcount, tight
    when width >> key cardinality, and the self-join form predicts
    LSH-bucket candidate volume."""

    def test_fk_join_upper_and_tight(self, spark):
        from svs_spark.operators.sketch import estimate_join_size
        from svs_spark.queries import load
        from tests.conftest import SF_DIR

        o = load(spark, SF_DIR, "orders").select("o_custkey")
        c = load(spark, SF_DIR, "customer").select("c_custkey")
        exact = o.join(
            c, o["o_custkey"] == c["c_custkey"]
        ).count()
        est = estimate_join_size(o, "o_custkey", c, "c_custkey")
        assert est >= exact
        # width 8192 >> |customers| at sf0.001: collisions are rare
        assert est <= exact * 1.05 + 10, (est, exact)

    def test_self_join_predicts_squared_frequency_mass(self, spark):
        from pyspark.sql import functions as F

        from svs_spark.operators.sketch import count_min, join_size_estimate

        # skewed keys: value k appears ~1000/k times (harmonic) — the
        # hot-bucket shape banded dedup joins worry about
        df = spark.range(1, 4000).select(
            (F.lit(4000) / F.col("id")).cast("long").alias("k")
        )
        exact = (
            df.groupBy("k").count().agg(F.sum(F.expr("count * count")))
        ).first()[0]
        cm = count_min(df, "k", width=4096, depth=4)
        est = join_size_estimate(cm, cm)
        assert est >= exact
        assert est <= exact * 1.1, (est, exact)

    def test_mismatched_shapes_rejected(self, spark):
        from svs_spark.operators.sketch import CountMin, join_size_estimate
        import numpy as np

        a = CountMin(64, 4, np.zeros((4, 64), dtype=np.int64), 0)
        b = CountMin(128, 4, np.zeros((4, 128), dtype=np.int64), 0)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            join_size_estimate(a, b)
