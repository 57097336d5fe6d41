"""Kernel edge-case enumeration, mirroring the reference's exhaustive
tests for get_top_k / get_top_pairs / serialization
(reference tests/test_util.py:142-471, tests/test_embeddings.py:13-23).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from svs_spark.functions import vector as V
from svs_spark.functions.embeddings import (
    cached_embedding_func,
    embedding_from_bytes,
    embedding_to_bytes,
    make_embeddings_func,
    make_mock_embeddings_func,
)
from svs_spark.operators.similarity import (
    block_pairwise_topk,
    pairwise_topk,
    retrieve_topk,
)


@pytest.fixture(scope="module")
def small_emb(spark):
    # scores against q=[1,0]: id1→0.6, id2→0.8, id3→0.6 (tie with id1)
    rows = [(1, [0.6, 0.8]), (2, [0.8, 0.6]), (3, [0.6, 0.8])]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


Q = [1.0, 0.0]


class TestTopK:
    # reference get_top_k (util.py:190-203): k<=0 → [], k>n clamps,
    # ties broken by larger index first
    def test_k_zero(self, small_emb):
        assert retrieve_topk(small_emb, Q, 0).count() == 0

    def test_k_negative(self, small_emb):
        assert retrieve_topk(small_emb, Q, -3).count() == 0

    def test_k_exceeds_n(self, small_emb):
        assert retrieve_topk(small_emb, Q, 100).count() == 3

    def test_tie_break_higher_id_first(self, small_emb):
        got = [r["vec_id"] for r in retrieve_topk(small_emb, Q, 3).collect()]
        assert got == [2, 3, 1]  # tie (1 vs 3) → higher id first

    def test_empty_input(self, spark):
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert retrieve_topk(empty, Q, 5).count() == 0


class TestPairwise:
    # reference get_top_pairs (util.py:206-233): strict upper triangle,
    # each unordered pair once, sorted desc
    def test_upper_triangle_once(self, small_emb):
        rows = pairwise_topk(small_emb, 10).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(pairs) == 3  # C(3,2)
        assert all(a < b for a, b in pairs)

    def test_block_matches_exact(self, small_emb):
        exact = pairwise_topk(small_emb, 10).collect()
        blocked = block_pairwise_topk(small_emb, 10, block_size=2).collect()
        assert [
            (r["id_a"], r["id_b"], round(r["score"], 6)) for r in exact
        ] == [(r["id_a"], r["id_b"], round(r["score"], 6)) for r in blocked]

    def test_single_row_no_pairs(self, spark):
        one = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        assert pairwise_topk(one, 5).count() == 0
        assert block_pairwise_topk(one, 5).count() == 0


class TestVectorFunctions:
    def test_dot_cosine_norm(self, spark):
        df = spark.createDataFrame(
            [([3.0, 4.0], [1.0, 0.0])], "a array<double>, b array<double>"
        )
        row = df.select(
            V.dot("a", "b").alias("d"),
            V.l2_norm("a").alias("n"),
            V.cosine("a", "b").alias("c"),
            V.check_unit_norm("a").alias("u"),
        ).first()
        assert row["d"] == 3.0
        assert row["n"] == 5.0
        assert abs(row["c"] - 0.6) < 1e-12
        assert row["u"] is False

    def test_normalize(self, spark):
        df = spark.createDataFrame(
            [([3.0, 4.0],), ([0.0, 0.0],)], "a array<double>"
        )
        rows = df.select(
            V.normalize("a").alias("n"),
            V.check_unit_norm(V.normalize("a")).alias("u"),
        ).collect()
        assert rows[0]["n"] == [0.6, 0.8] and rows[0]["u"] is True
        assert rows[1]["n"] is None  # zero vector → NULL

    def test_magnitude_guard_tolerance(self, spark):
        # reference kb.py:55-58: 1 ± 0.001
        df = spark.createDataFrame(
            [([1.0005, 0.0],), ([1.002, 0.0],), ([0.999, 0.0],)],
            "a array<double>",
        )
        got = [r[0] for r in df.select(V.check_unit_norm("a")).collect()]
        assert got == [True, False, True]


class TestEmbeddingSerde:
    # reference embeddings/util.py:15-23, tests/test_embeddings.py:13-23
    def test_roundtrip(self):
        vec = [1.0, -0.5, 0.25]
        raw = embedding_to_bytes(vec)
        assert len(raw) == 12  # little-endian float32
        assert embedding_from_bytes(raw) == vec

    def test_empty(self):
        assert embedding_from_bytes(embedding_to_bytes([])) == []

    def test_factory_dispatch(self):
        f = make_embeddings_func({"provider": "mock"})
        assert f(["x", "y"]) == [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
        with pytest.raises(ValueError):
            make_embeddings_func({"provider": "nope"})

    def test_lru_cache_dedup(self):
        calls = []

        def counting(texts):
            calls.append(list(texts))
            return [[1.0, 0.0, 0.0] for _ in texts]

        cached = cached_embedding_func(counting)
        cached(["a", "b", "a"])
        cached(["a", "c"])
        flat = [t for batch in calls for t in batch]
        assert flat == ["a", "b", "c"]  # each unique text embedded once

    def test_mock_func(self):
        f = make_mock_embeddings_func()
        vecs = f(["anything", "at all"])
        assert vecs == [[1.0, 0.0, 0.0]] * 2
        assert all(
            abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9 for v in vecs
        )


class TestQuantization:
    def test_int8_recall_vs_exact(self, spark):
        """int8 quantization must preserve the top-k set almost exactly
        (unit-norm vectors, 64 dims: worst-case per-component error
        1/254 ⇒ score error ~0.04 max, far under typical score gaps)."""
        from tests.conftest import SF_DIR
        from svs_spark.functions import vector as V
        from svs_spark.query_defs import QVEC, QVEC_INT8

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        exact = {
            r["vec_id"]
            for r in emb.select(
                "vec_id", V.dot_literal("embedding", QVEC).alias("s")
            )
            .orderBy(F.desc("s"), F.desc("vec_id"))
            .limit(50)
            .collect()
        }
        qlit = F.array(*[F.lit(v) for v in QVEC_INT8])
        quant = {
            r["vec_id"]
            for r in emb.select(
                "vec_id",
                V.dot_int8(V.quantize_int8("embedding"), qlit).alias("s"),
            )
            .orderBy(F.desc("s"), F.desc("vec_id"))
            .limit(50)
            .collect()
        }
        assert len(exact & quant) >= 45  # ≥90% recall@50

    def test_quantize_bounds_and_roundtrip_error(self, spark):
        from svs_spark.functions import vector as V

        df = spark.createDataFrame(
            [([0.6, -0.8, 0.0, 1.5, -2.0],)], "embedding: array<double>"
        )
        [row] = df.select(V.quantize_int8("embedding").alias("q")).collect()
        assert row["q"] == [76, -102, 0, 127, -127]


def test_simhash_kernel_matches_column_spec(spark):
    """The Arrow kernel must produce byte-identical signatures to the
    simhash() Column spec (which is the oracle-parity form)."""
    from pyspark.sql import functions as F

    from svs_spark.operators.dedup import (
        _simhash_batch_kernel, simhash, token_hashes,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "pack my box with five dozen"),
         (3, "a a b  c"), (4, "z")],
        "doc_id long, text string",
    )
    # 64 bits exercises the sign-bit weight (-2^63, dedup.bit_weight)
    saw_negative = False
    for bits in (32, 48, 64):
        spec = {
            r["doc_id"]: r["sh"]
            for r in docs.select(
                "doc_id", simhash(token_hashes("text"), bits=bits).alias("sh")
            ).collect()
        }
        got = {
            r["did"]: r["sh"]
            for r in docs.mapInPandas(
                _simhash_batch_kernel("doc_id", "text", bits),
                schema="did long, sh long",
            ).collect()
        }
        assert got == spec, bits
        if bits == 64:
            saw_negative = any(v < 0 for v in got.values())
    # at least one 4-doc signature should set bit 63 (sanity that the
    # sign-bit path actually ran; affine voters make this deterministic)
    assert saw_negative


class TestSelfKnn:
    """self_knn: per-row NN assignment vs a NumPy brute-force oracle."""

    def test_matches_bruteforce_k3(self, spark):
        import numpy as np

        from svs_spark.operators.similarity import self_knn
        from svs_spark.queries import load
        from tests.conftest import SF_DIR

        emb = load(spark, SF_DIR, "embeddings")
        rows = emb.select("vec_id", "embedding").collect()
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        mat = np.array([r.embedding for r in rows], dtype=np.float64)
        gram = np.round(mat @ mat.T, 6)
        np.fill_diagonal(gram, -np.inf)

        got = {
            (r.vec_id, r.rank): (r.nn_id, r.score)
            for r in self_knn(emb, k=3, block_size=16).collect()
        }
        # small block size forces a multi-block sweep (id range ⇒ >3 blocks)
        for i, vid in enumerate(ids):
            # brute-force top-3 under the same (score desc, id desc) order
            order = sorted(
                ((gram[i, j], ids[j]) for j in range(len(ids)) if j != i),
                key=lambda t: (-t[0], -t[1]),
            )[:3]
            for rank, (score, nn) in enumerate(order, start=1):
                assert got[(int(vid), rank)] == (int(nn), pytest.approx(score))

    def test_equal_block_no_double_emit(self, spark):
        from svs_spark.operators.similarity import self_knn

        rows = [(i, [float(i == j) for j in range(4)]) for i in range(6)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        # one block holds everything: each id must still get exactly k rows
        out = self_knn(df, k=2, block_size=64).collect()
        per_id = {}
        for r in out:
            per_id.setdefault(r.vec_id, []).append(r.rank)
        assert all(sorted(v) == [1, 2] for v in per_id.values())
        assert len(per_id) == 6


class TestCentroidAssign:
    def test_matches_bruteforce_and_ties_to_lowest_cid(self, spark):
        import numpy as np

        from svs_spark.operators.similarity import centroid_assign

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(40, 8))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        cents = [(int(c), vecs[c].tolist()) for c in (5, 2, 9)]
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["cluster_id"], r["score"])
            for r in centroid_assign(df, cents).collect()
        }
        assert len(got) == 40
        cmat = np.asarray([v for _, v in sorted(cents)])
        cids = np.asarray([c for c, _ in sorted(cents)])
        scores = np.round(vecs @ cmat.T, 6)
        for i in range(40):
            best = int(np.argmax(scores[i]))
            cid, sc = got[i]
            assert cid == int(cids[best])
            assert sc == pytest.approx(scores[i, best])
        # exact tie: vec 2 and vec 9 ARE centroids 2 and 9; a vector
        # equidistant from both must pick the LOWER cluster id
        mid = (vecs[2] + vecs[9]) / 2.0
        mid /= np.linalg.norm(mid)
        tie_df = spark.createDataFrame(
            [(100, mid.tolist())], "vec_id long, embedding array<double>"
        )
        [tr] = centroid_assign(tie_df, cents).collect()
        assert tr["cluster_id"] == 2

    def test_keep_vec_rides_through(self, spark):
        import numpy as np

        from svs_spark.operators.similarity import centroid_assign

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(10, 4))
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        cents = [(0, vecs[0].tolist()), (1, vecs[1].tolist())]
        out = centroid_assign(df, cents, keep_vec=True).collect()
        assert len(out) == 10
        by_id = {r["vec_id"]: r for r in out}
        for i in range(10):
            assert by_id[i]["embedding"] == pytest.approx(vecs[i].tolist())


def test_mmr_rerank_diversifies_and_matches_greedy(spark):
    """MMR must equal the NumPy greedy recompute exactly, and its
    average pairwise similarity must not exceed plain top-k's (the
    point of the diversity pass)."""
    import numpy as np

    from svs_spark.operators.similarity import mmr_rerank

    rng = np.random.default_rng(13)
    # three tight clusters: plain top-k picks one cluster, MMR spreads
    centers = rng.normal(size=(3, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.vstack([
        c + rng.normal(scale=0.05, size=(20, 16)) for c in centers
    ])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = (centers[0] + 0.6 * centers[1] + 0.5 * centers[2])
    q /= np.linalg.norm(q)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    lam, k, pool = 0.5, 6, 30
    got = mmr_rerank(df, q.tolist(), k=k, pool=pool, lam=lam).collect()
    assert [r["rank"] for r in got] == list(range(1, k + 1))

    # NumPy greedy recompute over the same pool
    rel_all = np.round(vecs @ q, 6)
    order = np.lexsort((-np.arange(len(vecs)), -rel_all))[:pool]
    ids, mat, rel = order, vecs[order], rel_all[order]
    sims = np.round(mat @ mat.T, 6)
    sel, rem = [], np.ones(pool, dtype=bool)
    for _ in range(k):
        maxsim = sims[:, sel].max(axis=1) if sel else np.zeros(pool)
        mmr = np.round(lam * rel - (1 - lam) * maxsim, 6)
        cand = np.lexsort((-ids, -mmr))
        pick = next(i for i in cand if rem[i])
        rem[pick] = False
        sel.append(pick)
    assert [r["vec_id"] for r in got] == [int(ids[i]) for i in sel]

    # diversity: avg pairwise sim of the MMR set <= plain top-k's
    def avg_pairwise(id_list):
        m = vecs[id_list]
        g = m @ m.T
        iu = np.triu_indices(len(id_list), 1)
        return g[iu].mean()

    plain = [int(i) for i in np.lexsort((-np.arange(len(vecs)), -rel_all))[:k]]
    assert avg_pairwise([r["vec_id"] for r in got]) <= avg_pairwise(plain) + 1e-9


def test_longest_dup_span_prune_is_exact(spark):
    """The production configuration (prune_unflagged + double_hash)
    must equal brute-force STRING ground truth: the prune's exactness
    argument is string-level, and double hashing makes hash equality
    string equality in practice (the single-modulus form measurably
    collides at corpus scale — 11/240 sf0.001 docs — which is why the
    prune is not wired into the mirrored single-modulus oracle)."""
    from svs_spark.operators.dedup import longest_dup_span_pow2
    from svs_spark.queries import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}

    def truth(min_len, max_len):
        # brute force: for each level, which docs share an exact
        # length-L substring with another doc
        best = {d: 0 for d, t in texts.items() if len(t) >= min_len}
        L = min_len
        while L <= max_len:
            seen: dict = {}
            for d, t in texts.items():
                for i in range(len(t) - L + 1):
                    seen.setdefault(t[i : i + L], set()).add(d)
            for ds in seen.values():
                if len(ds) > 1:
                    for d in ds:
                        best[d] = L
            L *= 2
        return best

    want = truth(16, 128)
    for prune in (False, True):
        got = {
            r.doc_id: r.max_dup_len
            for r in longest_dup_span_pow2(
                docs, 16, 128, prune_unflagged=prune, double_hash=True
            ).collect()
        }
        assert got == want, (prune, {
            k: (got.get(k), want.get(k))
            for k in set(got) | set(want)
            if got.get(k) != want.get(k)
        })


def test_longest_dup_span_prune_on_unique_corpus(spark):
    """Mostly-unique corpus + one planted long shared span: the prune
    drops the unique docs from the upper ladder and the planted pair
    still reports its full level."""
    from svs_spark.operators.dedup import longest_dup_span_pow2

    shared = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    rows = [(i, f"unique-{i}-" + "".join(
        chr(97 + (i * 31 + j * 13) % 26) for j in range(120)
    )) for i in range(60)]
    rows.append((1000, "prefixA " + shared + " tailA"))
    rows.append((1001, "prefixB " + shared + " tailB"))
    uniq = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        (r.doc_id, r.max_dup_len)
        for r in longest_dup_span_pow2(
            uniq, 16, 128, double_hash=True
        ).collect()
    }
    b = {
        (r.doc_id, r.max_dup_len)
        for r in longest_dup_span_pow2(
            uniq, 16, 128, prune_unflagged=True, double_hash=True
        ).collect()
    }
    assert a == b
    assert (1000, 128) in a and (1001, 128) in a
