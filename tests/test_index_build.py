"""Batch vector-index build/search tests: layout, partition pruning,
recall vs the exact baseline, incremental multiprobe recall gain."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from svs_spark.operators import index_build as IX
from svs_spark.operators.similarity import retrieve_topk
from svs_spark.plans import explain as X
from svs_spark.queries import fixed_query_vec
from tests.conftest import SF_DIR

QVEC = fixed_query_vec(64)


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "lsh_index")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    IX.build_lsh_index(emb, path, nbits=4, dim=64)
    return path


def test_layout_partitioned_by_bucket(index_path):
    parts = [d for d in os.listdir(index_path) if d.startswith("bucket=")]
    assert len(parts) > 1, "index must be partitioned by bucket"
    assert IX.read_index_meta(index_path)["nbits"] == 4


def test_search_prunes_partitions(spark, index_path):
    res = IX.search_lsh_index(spark, index_path, QVEC, k=5)
    plan = X.plan_string(res)
    assert "PartitionFilters" in plan and "bucket" in plan
    assert res.count() <= 5


def test_search_results_are_exact_within_bucket(spark, index_path):
    emb = spark.read.parquet(index_path)
    from svs_spark.operators.ann import query_bucket

    qb = query_bucket(QVEC, 4)
    bucket_exact = retrieve_topk(
        emb.filter(F.col("bucket") == qb), QVEC, 5
    ).collect()
    got = IX.search_lsh_index(spark, index_path, QVEC, k=5).collect()
    assert [(r["vec_id"], round(r["score"], 5)) for r in got] == [
        (r["vec_id"], round(r["score"], 5)) for r in bucket_exact
    ]


def test_multiprobe_improves_recall(spark, index_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {r["vec_id"] for r in retrieve_topk(emb, QVEC, 10).collect()}

    def recall(mp):
        got = {
            r["vec_id"]
            for r in IX.search_lsh_index(
                spark, index_path, QVEC, k=10, multiprobe=mp
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r4 = recall(0), recall(4)
    assert r4 >= r0, "multiprobe must not lose recall"
    assert r4 > 0, "probing 5 buckets should hit some exact neighbors"


class TestTwoLevelIndex:
    @pytest.fixture(scope="class")
    def two_level_path(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("idx2") / "two_level")
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        IX.build_two_level_index(emb, path, nbits=4, dim=64)
        return path

    def test_layout_and_metadata(self, two_level_path):
        buckets = [
            d for d in os.listdir(two_level_path) if d.startswith("bucket=")
        ]
        assert buckets
        inner = os.listdir(os.path.join(two_level_path, buckets[0]))
        assert any(d.startswith("label=") for d in inner)
        meta = IX.read_index_meta(two_level_path)
        assert len(meta["centroids"]) == 10  # labels 0-9
        assert all(len(v) == 64 for v in meta["centroids"].values())

    def test_search_prunes_both_levels(self, spark, two_level_path):
        res = IX.search_two_level_index(spark, two_level_path, QVEC, k=5)
        plan = X.plan_string(res)
        assert "PartitionFilters" in plan
        assert "bucket" in plan and "label" in plan
        assert 0 < res.count() <= 5

    def test_recall_vs_exact(self, spark, two_level_path):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        exact = {r["vec_id"] for r in retrieve_topk(emb, QVEC, 10).collect()}
        got = {
            r["vec_id"]
            for r in IX.search_two_level_index(
                spark, two_level_path, QVEC, k=10, probes=6, multiprobe=4
            ).collect()
        }
        assert len(got & exact) >= 3  # wide probe recovers real neighbors
