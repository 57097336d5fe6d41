"""Second-oracle tests for the round-7 session-3 queries: each result
is re-derived in pure Python/NumPy from the raw parquet (independent of
both the Spark plan and the DuckDB SQL mirror), plus planted-truth
kernels for the hard-negative mask semantics."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd
import pytest

from svs_spark.queries import queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registry():
    return queries()


def _emb(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _brute_rank(qv: np.ndarray, cids: np.ndarray, cmat: np.ndarray, k: int):
    """Ranked ids by (rounded score desc, id desc), top-k, mirroring the
    knn ordering contract."""
    scores = np.round(cmat @ qv, 6)
    order = sorted(range(len(cids)), key=lambda i: (-scores[i], -cids[i]))
    return [(int(cids[i]), float(scores[i])) for i in order[:k]]


def test_retrieval_ndcg_matches_python(spark, registry):
    out = (
        registry["retrieval_ndcg_eval"](spark, SF_DIR)
        .toPandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    emb = _emb(SF_DIR)
    q = emb[emb.vec_id < 10]
    c = emb[emb.vec_id >= 10]
    cids = c.vec_id.to_numpy()
    cmat = np.vstack(c.embedding.to_numpy()).astype(np.float64)
    clab = c.label.to_numpy()
    labcnt = collections.Counter(clab.tolist())
    dcg_nano = [int(math.floor(1e9 / math.log2(r + 1) + 0.5)) for r in range(1, 11)]
    idcg_cum = np.cumsum(dcg_nano)
    rows = []
    for _, qr in q.iterrows():
        qv = np.asarray(qr.embedding, dtype=np.float64)
        top = _brute_rank(qv, cids, cmat, 10)
        lab_of = dict(zip(cids.tolist(), clab.tolist()))
        rel = [1 if lab_of[cid] == qr.label else 0 for cid, _ in top]
        n_rel_total = labcnt.get(qr.label, 0)
        dcg = sum(r * dcg_nano[i] for i, r in enumerate(rel))
        if n_rel_total == 0:
            ndcg = 0.0
        else:
            ndcg = round(dcg / idcg_cum[min(10, n_rel_total) - 1], 6)
        first = next((i + 1 for i, r in enumerate(rel) if r), None)
        rr = 0.0 if first is None else round(1.0 / first, 6)
        rows.append((int(qr.vec_id), sum(rel), n_rel_total, ndcg, rr))
    exp = pd.DataFrame(
        rows, columns=["query_id", "n_rel_top10", "n_rel_total", "ndcg10", "rr"]
    ).sort_values("query_id").reset_index(drop=True)
    assert len(out) == len(exp) == 10
    for col in ("n_rel_top10", "n_rel_total"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    for col in ("ndcg10", "rr"):
        assert np.allclose(out[col].to_numpy(), exp[col].to_numpy(), atol=1e-9), col
    # metric sanity: nDCG and RR live in [0, 1]
    assert ((out.ndcg10 >= 0) & (out.ndcg10 <= 1)).all()
    assert ((out.rr >= 0) & (out.rr <= 1)).all()


def test_hard_negative_mining_matches_python(spark, registry):
    out = (
        registry["hard_negative_mining"](spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    emb = _emb(SF_DIR)
    q = emb[emb.vec_id < 8]
    ids = emb.vec_id.to_numpy()
    mat = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    lab = emb.label.to_numpy()
    rows = []
    for _, qr in q.iterrows():
        qv = np.asarray(qr.embedding, dtype=np.float64)
        mask = lab != qr.label
        top = _brute_rank(qv, ids[mask], mat[mask], 5)
        for rank, (cid, score) in enumerate(top, start=1):
            rows.append((int(qr.vec_id), cid, score, rank))
    exp = pd.DataFrame(rows, columns=["query_id", "vec_id", "score", "rank"])
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out.vec_id.to_numpy() == exp.vec_id.to_numpy()).all()
    assert np.allclose(out.score.to_numpy(), exp.score.to_numpy(), atol=1e-9)
    # no mined negative shares its query's label, and the query row
    # itself never appears
    lab_of = dict(zip(emb.vec_id.tolist(), emb.label.tolist()))
    qlab_of = dict(zip(q.vec_id.tolist(), q.label.tolist()))
    for _, r in out.iterrows():
        assert lab_of[r.vec_id] != qlab_of[r.query_id]
        assert r.vec_id != r.query_id


def test_hard_negative_join_starvation_planted(spark):
    """A query whose NEAREST rows are all same-label must still get k
    negatives: the mask runs before the local top-k, so same-label rows
    can't crowd the per-batch candidate set (the 'retrieve-then-filter'
    failure mode this kernel exists to avoid). Corpus is forced into
    several partitions so per-batch pruning is real."""
    from svs_spark.operators.similarity import hard_negative_join

    dim = 4
    qv = [1.0, 0.0, 0.0, 0.0]
    rows = []
    # 40 same-label rows nearly identical to the query (would fill any
    # plain top-k), 5 different-label rows clearly farther
    for i in range(40):
        rows.append((i, 0, [1.0 - 1e-6 * (i + 1), 0.0, 0.0, 0.0]))
    for j in range(5):
        rows.append((100 + j, 1, [0.5 - 0.01 * j, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).repartition(8)
    out = (
        hard_negative_join(df, [(7, 0, qv)], k=5)
        .toPandas()
        .sort_values("rank")
    )
    assert out.vec_id.tolist() == [100, 101, 102, 103, 104]
    assert (out.score.to_numpy() == np.round(
        [0.5, 0.49, 0.48, 0.47, 0.46], 6)).all()


def test_hard_negative_join_fewer_than_k(spark):
    """Fewer different-label rows than k: return what exists, never a
    masked (same-label) row and never a -inf score."""
    from svs_spark.operators.similarity import hard_negative_join

    rows = [(i, 0, [float(i), 1.0]) for i in range(6)]
    rows.append((10, 1, [0.0, 2.0]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = hard_negative_join(df, [(0, 0, [0.0, 1.0])], k=5).toPandas()
    assert out.vec_id.tolist() == [10]
    assert np.isfinite(out.score).all()


def test_label_validation_surfaces_clearly(spark):
    """Round-7 ADVICE: a null label used to die deep in the executor
    with an opaque 'cannot convert NaN to integer'. Now the label
    column is cast long plan-side and nulls raise a clear ValueError
    naming the column; string labels that parse as integers still work
    (the cast accepts them)."""
    from pyspark.errors import PythonException
    from svs_spark.operators.similarity import (
        contrastive_pair_join,
        hard_negative_join,
    )

    rows = [(0, 0, [1.0, 0.0]), (1, None, [0.0, 1.0]), (2, 1, [0.5, 0.5])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    for fn in (hard_negative_join, contrastive_pair_join):
        with pytest.raises(PythonException, match="non-null integer labels"):
            fn(df, [(0, 0, [1.0, 0.0])], k=2).collect()

    # integer-valued string labels cast cleanly and behave identically
    srows = [(0, "0", [1.0, 0.0]), (1, "1", [0.9, 0.1]), (2, "1", [0.0, 1.0])]
    sdf = spark.createDataFrame(
        srows, "vec_id long, label string, embedding array<double>"
    )
    out = hard_negative_join(sdf, [(0, 0, [1.0, 0.0])], k=1).toPandas()
    assert out.vec_id.tolist() == [1]


def test_distinct_ngram_diversity_matches_python(spark, registry):
    out = registry["distinct_ngram_diversity"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    exp_rows = {}
    for n in (1, 2, 3):
        per_src_total: dict = collections.Counter()
        per_src_grams: dict = collections.defaultdict(set)
        for _, d in docs.iterrows():
            toks = d.text.lower().split(" ")
            if len(toks) < n:
                continue
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            per_src_total[d.source] += len(grams)
            per_src_grams[d.source].update(grams)
        for src in per_src_total:
            tot = per_src_total[src]
            dst = len(per_src_grams[src])
            exp_rows[(src, n)] = (tot, dst, round(dst / tot, 6))
    assert len(out) == len(exp_rows)
    for _, r in out.iterrows():
        tot, dst, div = exp_rows[(r.source, r.n)]
        assert r.total_ngrams == tot, (r.source, r.n)
        assert r.distinct_ngrams == dst, (r.source, r.n)
        assert abs(r.diversity - div) < 1e-9
    # unigram diversity can never be below bigram-gram-count effects:
    # every diversity is a ratio in (0, 1]
    assert ((out.diversity > 0) & (out.diversity <= 1)).all()


def test_benford_first_digit_matches_python(spark, registry):
    out = (
        registry["benford_first_digit"](spark, SF_DIR)
        .toPandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    px = li.l_extendedprice.to_numpy()
    px = px[px > 0]
    cents = np.floor(px * 100 + 0.5).astype(np.int64)
    digits = np.array([int(str(c)[0]) for c in cents])
    total = len(digits)
    cnt = collections.Counter(digits.tolist())
    exp_share = {
        d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)
    }
    assert set(out.digit) == set(cnt)
    for _, r in out.iterrows():
        n = cnt[r.digit]
        assert r.n == n
        assert abs(r.obs_share - round(n / total, 6)) < 1e-9
        assert abs(r.exp_share - exp_share[r.digit]) < 1e-9
        assert abs(r.deviation - round(n / total - exp_share[r.digit], 6)) < 1e-9
    # shares sum to ~1
    assert abs(out.obs_share.sum() - 1.0) < 1e-4


def test_contrastive_triplets_matches_python(spark, registry):
    out = (
        registry["contrastive_triplets"](spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "role"])
        .reset_index(drop=True)
    )
    emb = _emb(SF_DIR)
    q = emb[emb.vec_id < 8]
    ids = emb.vec_id.to_numpy()
    mat = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    lab = emb.label.to_numpy()
    rows = []
    for _, qr in q.iterrows():
        qv = np.asarray(qr.embedding, dtype=np.float64)
        pos_mask = (lab == qr.label) & (ids != qr.vec_id)
        neg_mask = lab != qr.label
        for role, mask in (("pos", pos_mask), ("neg", neg_mask)):
            top = _brute_rank(qv, ids[mask], mat[mask], 1)
            cid, score = top[0]
            rows.append((int(qr.vec_id), role, cid, score, 1))
    exp = pd.DataFrame(
        rows, columns=["query_id", "role", "vec_id", "score", "rank"]
    ).sort_values(["query_id", "role"]).reset_index(drop=True)
    assert len(out) == len(exp) == 16
    assert (out.vec_id.to_numpy() == exp.vec_id.to_numpy()).all()
    assert np.allclose(out.score.to_numpy(), exp.score.to_numpy(), atol=1e-9)
    # contract: positive shares the anchor's label and is never the
    # anchor itself; negative never shares it; margin pos > neg holds
    # on this clustered corpus
    lab_of = dict(zip(emb.vec_id.tolist(), emb.label.tolist()))
    qlab_of = dict(zip(q.vec_id.tolist(), q.label.tolist()))
    piv = out.pivot(index="query_id", columns="role", values="score")
    for _, r in out.iterrows():
        if r.role == "pos":
            assert lab_of[r.vec_id] == qlab_of[r.query_id]
            assert r.vec_id != r.query_id
        else:
            assert lab_of[r.vec_id] != qlab_of[r.query_id]
    # every anchor has exactly one row per role, and the margin
    # (pos − neg) is well-defined for all of them. NOTE: on this
    # synthetic corpus the hardest negative outranks the positive for
    # every anchor (margins all negative — consistent with the ~0.09
    # nDCG the eval query measures); that is the condition triplet
    # mining exists to correct, so no sign assumption is made here.
    assert piv.notna().all().all() and len(piv) == 8


def test_contrastive_pair_join_self_exclusion_planted(spark):
    """An anchor duplicated in the corpus: the positive must be the
    DUPLICATE row (score 1.0), never the anchor's own row id."""
    from svs_spark.operators.similarity import contrastive_pair_join

    rows = [
        (0, 7, [1.0, 0.0]),   # anchor
        (1, 7, [1.0, 0.0]),   # exact duplicate — the only valid positive
        (2, 7, [0.9, 0.1]),
        (3, 8, [0.8, 0.2]),   # hardest negative
        (4, 8, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).repartition(3)
    out = contrastive_pair_join(df, [(0, 7, [1.0, 0.0])], k=1).toPandas()
    by_role = {r.role: r for _, r in out.iterrows()}
    assert by_role["pos"].vec_id == 1
    assert abs(by_role["pos"].score - 1.0) < 1e-9
    assert by_role["neg"].vec_id == 3


def test_diversity_approx_twin_within_tolerance(spark, registry):
    """The 100 TB swap the query docstring names: HLL
    approx_count_distinct (rsd 2%) over the SAME hashed gram frames
    must land within 5% of the exact distinct for every (source, n)
    cell — the accuracy contract that licenses the swap at scale,
    where the exact distinct's shuffle carries the full gram keyspace
    and the sketch carries constant-size registers."""
    from pyspark.sql import functions as F

    exact = {
        (r.source, r.n): r.distinct_ngrams
        for r in registry["distinct_ngram_diversity"](spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", F.split(F.lower(F.col("text")), " ").alias("t")
    )

    def gram_frame(n: int):
        b = docs.filter(F.size("t") >= n)
        if n == 1:
            g = F.explode("t").alias("gram")
        else:
            parts = ", ".join(f"element_at(t, i + {j})" for j in range(n))
            g = F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n - 1}),"
                    f" i -> concat_ws(' ', {parts}))"
                )
            ).alias("gram")
        return b.select("source", F.lit(n).alias("n"), g).select(
            "source", "n", F.xxhash64("gram").alias("gh")
        )

    grams = gram_frame(1).unionByName(gram_frame(2)).unionByName(gram_frame(3))
    approx = {
        (r.source, r.n): r.d
        for r in grams.groupBy("source", "n")
        .agg(F.approx_count_distinct("gh", rsd=0.02).alias("d"))
        .collect()
    }
    assert set(approx) == set(exact)
    for key, ex in exact.items():
        assert abs(approx[key] - ex) <= 0.05 * ex, (key, approx[key], ex)


def test_matryoshka_recall_matches_numpy(spark, registry):
    """Prefix-dot recall vs a NumPy twin: same rounded-6 scores, same
    id-desc tie rule, exact hit counts; recall must not be vacuously 0
    or 1 across all widths on this corpus."""
    out = {
        int(r.dims): (r.n_hits, r.recall_at_10)
        for r in registry["matryoshka_recall_eval"](spark, SF_DIR).collect()
    }
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    mat = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    qm, qids = mat[ids < 10], ids[ids < 10]
    cm, cids = mat[ids >= 10], ids[ids >= 10]

    def top10(qv, cv):
        s = np.round(cv @ qv.T, 6)  # (n_c, n_q)
        res = {}
        for j, qid in enumerate(qids):
            order = np.lexsort((-cids, -s[:, j]))
            res[qid] = set(cids[order[:10]])
        return res

    full = top10(qm, cm)
    for d in (8, 16, 32):
        tr = top10(qm[:, :d], cm[:, :d])
        hits = sum(len(tr[q] & full[q]) for q in qids)
        assert out[d] == (hits, round(hits / 100.0, 6)), d
    vals = [out[d][0] for d in (8, 16, 32)]
    assert 0 < min(vals) and max(vals) < 100
