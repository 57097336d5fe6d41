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
