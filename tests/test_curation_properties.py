"""Randomized brute-force twins for the curation-pack operators: the
planted tests in test_curation_ops.py pin hand-traceable cases; these
compare the registered queries against independent O(n²)/sequential
Python implementations on seeded random inputs (values chosen exactly
representable in float32/double so no rounding ambiguity enters the
comparison)."""

import datetime as dt
import random

import pytest


@pytest.fixture(scope="module")
def spark():
    from svs_spark.session import get_session

    s = get_session("svs_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="module")
def registry():
    from svs_spark.queries import queries

    return queries()


def test_pareto_frontier_matches_bruteforce(spark, registry, tmp_path):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(1, 200) * 0.25, rng.randrange(1, 50))
        for i in range(1, 301)
    ]
    part = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    part.write.parquet(f"{tmp_path}/part.parquet")

    def dominated(p, q):
        # q dominates p: at most as expensive, at least as large, strict in one
        return (
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
        )

    want = sorted(
        (k, pr, s)
        for (k, pr, s) in rows
        if not any(dominated((k, pr, s), q) for q in rows if q[0] != k)
    )
    got = sorted(
        (r.p_partkey, r.price, r.size)
        for r in registry["pareto_frontier_parts"](spark, str(tmp_path)).collect()
    )
    assert got == want and len(got) > 0


def test_interval_overlap_matches_bruteforce(spark, registry, tmp_path):
    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(400):
        eid += 1
        rows.append(
            (
                eid,
                base + dt.timedelta(minutes=rng.randrange(0, 3000)),
                rng.randrange(1, 15),
                rng.choice(["click", "purchase", "view"]),
                1.0,
                "{}",
            )
        )
    frame = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    frame.write.parquet(f"{tmp_path}/events.parquet")

    # independent python twin
    def sessions(user, typ):
        evs = sorted(
            (int(r[1].timestamp() * 1_000_000), r[0])
            for r in rows
            if r[2] == user and r[3] == typ
        )
        out = []
        for us, _eid in evs:
            if out and us - out[-1][1] <= 1800 * 1_000_000:
                out[-1][1] = us
            else:
                out.append([us, us])
        return out

    want = {}
    for user in range(1, 15):
        a, b = sessions(user, "click"), sessions(user, "purchase")
        pairs = [
            (x, y) for x in a for y in b if x[0] <= y[1] and y[0] <= x[1]
        ]
        if pairs:
            total = sum(min(x[1], y[1]) - max(x[0], y[0]) for x, y in pairs)
            want[user] = (len(pairs), total // 1_000_000)
    got = {
        r.user_id: (r.n_overlaps, r.overlap_s)
        for r in registry["interval_overlap_join"](spark, str(tmp_path)).collect()
    }
    assert got == want and len(got) > 0


def test_kcenter_matches_sequential_greedy(spark, registry, tmp_path):
    # float32-exact coordinates (multiples of 1/64) so every dot product
    # is exact and the rounded-6 contract can't flip on summation order
    rng = random.Random(13)
    dim = 8
    rows = [
        (i, [rng.randrange(-64, 65) / 64.0 for _ in range(dim)], 0)
        for i in range(1, 41)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(f"{tmp_path}/embeddings.parquet")

    vecs = {i: v for i, v, _ in rows}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    picks = [(1, 1, None)]
    md = {i: round(1.0 - dot(v, vecs[1]), 6) for i, v in vecs.items()}
    for r in (2, 3, 4):
        top = max(md.items(), key=lambda kv: (kv[1], -kv[0]))
        picks.append((r, top[0], top[1]))
        cv = vecs[top[0]]
        for i, v in vecs.items():
            md[i] = min(md[i], round(1.0 - dot(v, cv), 6))
    got = [
        (r.pick_round, r.vec_id, r.radius)
        for r in registry["kcenter_coreset"](spark, str(tmp_path)).collect()
    ]
    assert got == picks
