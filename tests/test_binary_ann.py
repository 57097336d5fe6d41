"""1-bit sign quantization (functions/vector.py): packed popcount
Hamming == unpacked sign agreement, NumPy bit-level round trip, and
screen+rerank recall on a clustered corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from svs_spark.functions import vector as V

DIM = 96  # deliberately not a multiple of 64: exercises the short word


def make_clustered(n, dim, n_centers=32, noise=0.35, seed=5):
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centers, dim)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    g = rng.standard_normal((n, dim)).astype(np.float32)
    g *= noise / np.linalg.norm(g, axis=1, keepdims=True)
    x = c[np.arange(n) % n_centers] + g
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


@pytest.fixture(scope="module")
def corpus(spark):
    x = make_clustered(4000, DIM)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    return df, x


class TestPacking:
    def test_packed_bits_match_numpy(self, spark, corpus):
        df, x = corpus
        rows = (
            df.select("vec_id", V.sign_bits_packed("embedding", DIM).alias("p"))
            .orderBy("vec_id")
            .limit(50)
            .collect()
        )
        for r in rows:
            bits = (x[r["vec_id"]] >= 0).astype(np.uint64)
            want = []
            for g in range(0, DIM, 64):
                w = 0
                for b in bits[g:g + 64]:
                    w = (w << 1) | int(b)
                # numpy int64 wrap to Java long semantics
                want.append(int(np.int64(np.uint64(w))))
            assert list(r["p"]) == want

    def test_packed_hamming_equals_unpacked_agreement(self, spark, corpus):
        df, x = corpus
        q = x[7]
        qsigns = [1 if v >= 0 else -1 for v in q.tolist()]
        qbits = (q >= 0).astype(np.uint64)
        qwords = []
        for g in range(0, DIM, 64):
            w = 0
            for b in qbits[g:g + 64]:
                w = (w << 1) | int(b)
            qwords.append(int(np.int64(np.uint64(w))))
        qlit = F.array(*[F.lit(w).cast("long") for w in qwords])
        both = df.select(
            V.sign_agreement("embedding", qsigns).alias("agree"),
            V.hamming_packed(
                V.sign_bits_packed("embedding", DIM), qlit
            ).alias("h"),
        ).collect()
        for r in both:
            # agree = dim - 2 * hamming, exactly, for every row
            assert r["agree"] == DIM - 2 * r["h"]


class TestRecall:
    def test_screen_rerank_recall(self, spark, corpus):
        df, x = corpus
        # query from the corpus distribution (same centers, fresh
        # noise) — the realistic serving case; a query near no cluster
        # degrades every quantized screen and tests nothing
        rng = np.random.default_rng(99)
        centers = x[3]  # a corpus point's neighborhood
        noise = rng.standard_normal(DIM).astype(np.float32)
        noise *= 0.25 / np.linalg.norm(noise)
        q = centers + noise
        q /= np.linalg.norm(q)
        exact = np.argsort(-(x.astype(np.float64) @ q))[:10]
        qsigns = [1 if v >= 0 else -1 for v in q.tolist()]
        cand = (
            df.select(
                "vec_id",
                "embedding",
                V.sign_agreement("embedding", qsigns).alias("agree"),
            )
            .orderBy(F.desc("agree"), F.desc("vec_id"))
            .limit(200)
        )
        got = [
            r["vec_id"]
            for r in cand.select(
                "vec_id",
                V.dot_literal("embedding", [float(v) for v in q]).alias("s"),
            )
            .orderBy(F.desc("s"), F.desc("vec_id"))
            .limit(10)
            .collect()
        ]
        recall = len(set(got) & set(exact.tolist())) / 10.0
        assert recall >= 0.9, (recall, got, exact.tolist())
