"""Multimodal plumbing tests: schema/batch shape of the binary-column
pipeline, frame sampling row explosion, and the decode stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from svs_spark.operators import multimodal as MM
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.col("text").cast("binary").alias("content"),
    )


def test_media_metadata(spark, assets):
    df = MM.with_media_metadata(assets, kind="image")
    row = df.orderBy("asset_id").first()
    assert row["media"]["kind"] == "image"
    assert row["media"]["n_bytes"] == len(row["content"])
    assert row["media"]["sha"] == hashlib.sha256(row["content"]).hexdigest()


def test_extract_features_shape(spark, assets):
    feats = MM.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == assets.count()
    for r in rows:
        assert len(r["features"]) == 8
        assert r["n_bytes"] > 0
        assert r["features"][0] == float(r["n_bytes"])


def test_frame_sample_explosion(spark, assets):
    frames = MM.frame_sample(assets, every_n_bytes=64)
    per_asset = {
        r["asset_id"]: r["n"]
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    }
    sizes = {r["asset_id"]: len(r["content"]) for r in assets.collect()}
    for aid, n in per_asset.items():
        assert n == -(-sizes[aid] // 64)  # ceil division
    # frames reassemble to the original bytes
    one = sorted(
        frames.filter(F.col("asset_id") == min(sizes)).collect(),
        key=lambda r: r["frame_idx"],
    )
    original = [r["content"] for r in assets.collect() if r["asset_id"] == min(sizes)][0]
    assert b"".join(r["frame"] for r in one) == original


def test_decode_stub_contract():
    with pytest.raises((NotImplementedError, Exception)):
        MM.decode_image(b"not-an-image")


def test_fake_features_deterministic():
    a = MM.fake_decode_features(b"hello world")
    b = MM.fake_decode_features(b"hello world")
    assert a == b and len(a) == 8
    assert MM.fake_decode_features(b"") == [0.0] * 8
