"""Multi-round Lloyd driver: convergence on planted clusters, shift
monotonicity at the fixed point, empty-cluster fallback, determinism,
and the spherical (normalize) variant."""

from __future__ import annotations

import math

import pytest

from svs_spark.operators.clustering import kmeans_lloyd


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def planted(spark):
    """Three tight clusters around orthogonal-ish unit anchors in d=4,
    deterministic jitter; seeded so each cluster contributes one of the
    3 lowest ids (ids 0,1,2 are the anchors themselves)."""
    anchors = [
        _unit([1.0, 0.05, 0.0, 0.0]),
        _unit([0.0, 1.0, 0.05, 0.0]),
        _unit([0.0, 0.0, 1.0, 0.05]),
    ]
    # interleave ids across clusters so ids 0,1,2 (the default seeds)
    # land in three distinct clusters
    rows = []
    for j in range(40):
        for c, a in enumerate(anchors):
            vid = j * 3 + c
            jit = [
                a[d] + 0.02 * (((vid * 37 + d * 11) % 7) - 3) / 7.0
                for d in range(4)
            ]
            rows.append((vid, _unit(jit)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_converges_on_planted_clusters(planted):
    cents, info = kmeans_lloyd(planted, k=3, max_iter=10, tol=1e-9)
    assert info["converged"], info
    # must take at least one real improvement round then reach the
    # fixed point: shifts strictly 0 at the end, >0 at the start
    assert info["n_iter"] >= 2
    assert info["shifts"][-1] < 1e-9
    assert info["shifts"][0] > 1e-4
    # every planted cluster recovered with its 40 members
    assert sorted(info["cluster_sizes"].values()) == [40, 40, 40]
    # each centroid is near its anchor (same argmax direction)
    import numpy as np

    a = np.array([[1, 0.05, 0, 0], [0, 1, 0.05, 0], [0, 0, 1, 0.05]])
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    got = np.array([v for _, v in cents])
    sims = got @ a.T
    assert (sims.argmax(axis=1) == [0, 1, 2]).all()
    assert (sims.max(axis=1) > 0.99).all()


def test_three_iteration_run_is_deterministic(planted):
    r1 = kmeans_lloyd(planted, k=3, max_iter=3, tol=0.0)
    r2 = kmeans_lloyd(planted.repartition(7), k=3, max_iter=3, tol=0.0)
    assert r1[1]["n_iter"] == r2[1]["n_iter"] == 3
    for (c1, v1), (c2, v2) in zip(r1[0], r2[0]):
        assert c1 == c2
        assert v1 == pytest.approx(v2, abs=1e-12)


def test_empty_cluster_keeps_previous_centroid(planted):
    # seed two centroids inside the SAME planted cluster plus one far
    # outlier id; with k=4 one seed will likely end up empty — the
    # fallback must keep it instead of crashing or dropping the id
    cents, info = kmeans_lloyd(
        planted, k=4, seed_ids=[0, 3, 1, 2], max_iter=5, tol=1e-9
    )
    assert len(cents) == 4
    assert sum(info["cluster_sizes"].values()) == 120


def test_spherical_normalize(planted):
    cents, info = kmeans_lloyd(
        planted, k=3, max_iter=10, tol=1e-9, normalize=True
    )
    assert info["converged"]
    for _, v in cents:
        assert math.sqrt(sum(x * x for x in v)) == pytest.approx(1.0, abs=1e-9)


def test_missing_seed_raises(planted):
    with pytest.raises(ValueError, match="seed_ids"):
        kmeans_lloyd(planted, k=2, seed_ids=[0, 10**9])


class TestWithinClusterPairs:
    def _assigned(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        rows = []
        for i in range(120):
            v = rng.normal(size=16)
            v /= np.linalg.norm(v)
            rows.append((i, [float(x) for x in v], int(i % 5)))
        # plant two near-identical pairs inside cluster 2
        base = np.array(rows[2][1])
        for j, eps in ((200, 1e-4), (201, 2e-4)):
            v = base + eps
            v /= np.linalg.norm(v)
            rows.append((j, [float(x) for x in v], 2))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cluster_id long"
        )

    def test_matches_join_formulation(self, spark):
        from pyspark.sql import functions as F

        from svs_spark.functions import vector as V
        from svs_spark.operators.clustering import within_cluster_pairs

        asg = self._assigned(spark)
        got = {
            (r["cluster_id"], r["id_a"], r["id_b"]): r["score"]
            for r in within_cluster_pairs(asg, threshold=0.9).collect()
        }
        a = asg.select(
            F.col("cluster_id").alias("cid"),
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("ea"),
        )
        b = asg.select(
            F.col("cluster_id").alias("cid"),
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("eb"),
        )
        want = {
            (r["cid"], r["id_a"], r["id_b"]): r["score"]
            for r in a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("score", F.round(V.dot("ea", "eb"), 6))
            .filter(F.col("score") >= 0.9)
            .collect()
        }
        assert got == want
        assert len(got) >= 3  # planted near-dups found
        assert (2, 2, 200) in got and (2, 2, 201) in got

    def test_cluster_cap_skips_and_reports(self, spark):
        from svs_spark.operators.clustering import within_cluster_pairs

        asg = self._assigned(spark)
        report: dict = {}
        got = within_cluster_pairs(
            asg, threshold=0.9, cluster_cap=25, skip_report=report
        ).collect()
        # cluster 2 has 26 members (24 + 2 planted) -> skipped entirely
        assert report["skipped_clusters"] == 1
        assert report["skipped_rows"] == 26
        assert all(r["cluster_id"] != 2 for r in got)

    def test_auto_split_recurses_mega_cluster(self, spark):
        """round-6 verdict ask #4: with auto_split the over-cap cluster
        is sub-k-means'd and re-compared instead of skipped — the
        planted near-dup pairs inside it survive, nothing is skipped,
        and found pairs still report the ORIGINAL cluster id."""
        from svs_spark.operators.clustering import within_cluster_pairs

        asg = self._assigned(spark)
        report: dict = {}
        got = {
            (r["cluster_id"], r["id_a"], r["id_b"])
            for r in within_cluster_pairs(
                asg, threshold=0.9, cluster_cap=25, skip_report=report,
                auto_split=True,
            ).collect()
        }
        assert report.get("skipped_clusters", 0) == 0
        assert report.get("skipped_rows", 0) == 0
        assert report["split_clusters"] == 1
        assert report["split_rows"] == 26
        # the planted near-identical trio (2, 200, 201) lands in one
        # sub-cluster (same argmax centroid), so all three pairs
        # survive the split, labeled with top-level cluster 2
        assert {(2, 2, 200), (2, 2, 201), (2, 200, 201)} <= got
        # split output is a subset of the uncapped exact kernel (the
        # recursion can only lose cross-SUB-cluster pairs, never
        # invent any)
        full = {
            (r["cluster_id"], r["id_a"], r["id_b"])
            for r in within_cluster_pairs(asg, threshold=0.9).collect()
        }
        assert got <= full

    def test_auto_split_inseparable_mass_falls_back_to_skip(self, spark):
        """Identical vectors cannot be split by k-means (all tie to the
        lowest centroid id) — the no-progress guard must skip-and-
        report instead of recursing to depth exhaustion."""
        from svs_spark.operators.clustering import within_cluster_pairs

        v = [1.0] + [0.0] * 15
        rows = [(i, v, 9) for i in range(30)]
        asg = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cluster_id long"
        )
        report: dict = {}
        got = within_cluster_pairs(
            asg, threshold=0.9, cluster_cap=25, skip_report=report,
            auto_split=True,
        ).collect()
        assert got == []
        assert report["skipped_clusters"] == 1
        assert report["skipped_rows"] == 30
        assert report.get("split_clusters", 0) == 0

    def test_partitioning_invariance(self, spark):
        from svs_spark.operators.clustering import within_cluster_pairs

        asg = self._assigned(spark)
        a = sorted(
            map(tuple, within_cluster_pairs(asg.repartition(13), 0.9)
                .collect())
        )
        b = sorted(
            map(tuple, within_cluster_pairs(asg.coalesce(1), 0.9).collect())
        )
        assert a == b


class TestSemdedupRecallProbe:
    def _frame(self, spark, split_pair_clusters):
        import numpy as np

        rng = np.random.default_rng(11)
        rows = []
        for i in range(60):
            v = rng.normal(size=16)
            v /= np.linalg.norm(v)
            rows.append((i, [float(x) for x in v], int(i % 4)))
        # two planted near-dup pairs: (100,101) same cluster,
        # (200,201) same or split depending on the scenario
        for base_seed, ids, clusters in (
            (1, (100, 101), (1, 1)),
            (2, (200, 201), (2, 3) if split_pair_clusters else (2, 2)),
        ):
            base = rng.normal(size=16)
            base /= np.linalg.norm(base)
            for j, (i, cl) in enumerate(zip(ids, clusters)):
                v = base + j * 1e-4
                v /= np.linalg.norm(v)
                rows.append((i, [float(x) for x in v], cl))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cluster_id long"
        )

    def test_full_recall_when_clusters_hold_pairs(self, spark):
        from svs_spark.operators.clustering import semdedup_recall_probe

        asg = self._frame(spark, split_pair_clusters=False)
        out = semdedup_recall_probe(asg, threshold=0.9, sample_rows=64)
        assert out["true_pairs"] >= 2
        assert out["recall"] == 1.0

    def test_split_pair_lowers_recall(self, spark):
        from svs_spark.operators.clustering import semdedup_recall_probe

        asg = self._frame(spark, split_pair_clusters=True)
        out = semdedup_recall_probe(asg, threshold=0.9, sample_rows=64)
        # pair (200,201) straddles clusters -> missed by the partition
        assert out["true_pairs"] >= 2
        assert out["found_pairs"] < out["true_pairs"]
        assert out["recall"] < 1.0

    def test_empty_truth_reports_one(self, spark):
        import numpy as np

        from svs_spark.operators.clustering import semdedup_recall_probe

        rng = np.random.default_rng(3)
        rows = []
        for i in range(20):
            v = rng.normal(size=16)
            v /= np.linalg.norm(v)
            rows.append((i, [float(x) for x in v], int(i % 2)))
        asg = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cluster_id long"
        )
        out = semdedup_recall_probe(asg, threshold=0.99, sample_rows=20)
        assert out["true_pairs"] == 0
        assert out["recall"] == 1.0


def test_screen_margin_scales_with_dimension():
    """The float32 GEMM screen margin must track the ~dim·2^-24
    worst-case dot error: floored at the historical 1e-3 for the
    benchmarked dims, growing linearly once the bound approaches it."""
    from svs_spark.operators.clustering import _screen_margin

    assert _screen_margin(64) == 1e-3
    assert _screen_margin(1536) == 1e-3  # bound ~1e-4, floor wins
    big = _screen_margin(20_000)
    assert big == 8.0 * 20_000 * 2.0 ** -24  # ~0.0095 > floor
    assert _screen_margin(40_000) == 2 * big  # linear in dim
