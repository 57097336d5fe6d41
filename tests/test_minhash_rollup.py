"""Persisted MinHash rollup: slice signatures equal direct kernel
computation over the slice's rows, self-Jaccard is 1, duplicated
slices are detected, and append touches only new-day partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators import minhash_rollup as MR
from svs_spark.operators.dedup import _signature_batch_kernel
from svs_spark.queries import load

NH, K = 16, 3


def day_col():
    # synthetic arrival day: one doc per "minute", 60 docs/day-bucket
    return (F.col("doc_id") / 60).cast("long")


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )


@pytest.fixture(scope="module")
def rollup(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh") / "rollup")
    MR.build_minhash_rollup(
        docs, path, "text", "doc_id", "source", day_col(),
        num_hashes=NH, shingle_size=K,
    )
    return path


def test_slice_signature_equals_direct_kernel(spark, docs, rollup):
    lo, hi = MR.rollup_day_range(spark, rollup)
    src = docs.select("source").distinct().orderBy("source").first()[0]
    got = dict(MR.slice_signature(spark, rollup, src, "source", lo, hi))
    rows = docs.withColumn("_d", day_col()).filter(
        (F.col("_d") >= lo) & (F.col("_d") <= hi)
        & (F.col("source") == src)
    )
    base = rows.mapInPandas(
        _signature_batch_kernel("doc_id", "text", NH, K),
        schema="did long, hs array<long>, sig array<long>",
    )
    expected = {
        r["hash_idx"]: r["m"]
        for r in base.select(
            F.posexplode("sig").alias("hash_idx", "v")
        )
        .groupBy("hash_idx")
        .agg(F.min("v").alias("m"))
        .collect()
    }
    assert got == expected and len(got) == NH


def test_self_jaccard_is_one_and_disjoint_low(spark, rollup):
    lo, hi = MR.rollup_day_range(spark, rollup)
    srcs = sorted(
        r["source"]
        for r in spark.read.parquet(rollup).select("source").distinct().collect()
    )
    a = (srcs[0], lo, hi)
    assert MR.slice_jaccard(spark, rollup, "source", a, a) == 1.0
    if len(srcs) > 1:
        j = MR.slice_jaccard(spark, rollup, "source", a, (srcs[1], lo, hi))
        assert 0.0 <= j < 1.0


def test_duplicated_slice_detected(spark, docs, rollup, tmp_path):
    """A 'new source' that is literally a copy of src0's docs must show
    slice-Jaccard 1.0 against src0 — the re-crawl detector working
    from signatures alone."""
    src0 = docs.select("source").distinct().orderBy("source").first()[0]
    copy = docs.filter(F.col("source") == src0).withColumn(
        "source", F.lit("copycat")
    )
    path = str(tmp_path / "mh2")
    MR.build_minhash_rollup(
        docs.unionByName(copy), path, "text", "doc_id", "source",
        day_col(), num_hashes=NH, shingle_size=K,
    )
    lo, hi = MR.rollup_day_range(spark, path)
    j = MR.slice_jaccard(
        spark, path, "source", (src0, lo, hi), ("copycat", lo, hi)
    )
    assert j == 1.0


def test_append_touches_only_new_day(spark, docs, rollup):
    lo, hi = MR.rollup_day_range(spark, rollup)

    def inventory():
        out = {}
        for d in os.listdir(rollup):
            if not d.startswith("day="):
                continue
            sub = os.path.join(rollup, d)
            out[d] = {
                (f, os.stat(os.path.join(sub, f)).st_mtime_ns)
                for f in os.listdir(sub)
                if not f.startswith(".")
            }
        return out

    before = inventory()
    far = hi + 100
    batch = spark.createDataFrame(
        [(far * 60 + i, "fresh crawl words batch alpha beta", "srcX")
         for i in range(5)],
        "doc_id long, text string, source string",
    )
    touched = MR.append_minhash_rollup(
        batch, rollup, "text", "doc_id", "source", day_col(),
        num_hashes=NH, shingle_size=K,
    )
    assert touched == [far]
    after = inventory()
    for d, files in before.items():
        assert after[d] == files, d
    sig = MR.slice_signature(spark, rollup, "srcX", "source", far, far)
    assert len(sig) == NH


def test_non_string_group_column(spark, docs, tmp_path):
    """ADVICE round 4: the passthrough group column must keep its
    source type — an integer group id used to be hardcoded as string
    in the mapInPandas output schema and mismatched at runtime."""
    int_docs = docs.withColumn(
        "src_id", F.xxhash64("source") % 100
    ).select("doc_id", "text", "src_id")
    path = str(tmp_path / "mh_int")
    MR.build_minhash_rollup(
        int_docs, path, "text", "doc_id", "src_id", day_col(),
        num_hashes=NH, shingle_size=K,
    )
    out = spark.read.parquet(path)
    assert dict(out.dtypes)["src_id"] == "bigint"
    lo, hi = MR.rollup_day_range(spark, path)
    grp = int_docs.select("src_id").first()[0]
    sig = MR.slice_signature(spark, path, grp, "src_id", lo, hi)
    assert len(sig) == NH
