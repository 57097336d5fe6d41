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


def test_resize_stub_matches_numpy_twin(spark, assets):
    """Resize output must equal an independent NumPy nearest-neighbor
    recompute byte-for-byte, and the checksum must equal the sum of
    the resized bytes (the self-consistency the oracle hashes)."""
    import numpy as np

    out = {r["asset_id"]: r for r in MM.resize_stub(assets, 8, 8).collect()}
    for r in assets.collect():
        content, aid = r["content"], r["asset_id"]
        n = len(content)
        w = int(np.ceil(np.sqrt(n)))
        h = (n + w - 1) // w
        expect = bytes(
            content[(rr * h // 8) * w + (cc * w // 8)]
            if (rr * h // 8) * w + (cc * w // 8) < n
            else 0
            for rr in range(8)
            for cc in range(8)
        )
        got = out[aid]
        assert bytes(got["resized"]) == expect
        assert got["byte_checksum"] == sum(expect)
        assert (got["out_w"], got["out_h"]) == (8, 8)
        assert len(got["resized"]) == 64


def test_audio_windows_match_numpy_twin(spark, assets):
    """Window features must equal a direct NumPy stride recompute:
    fully-contained windows only, energy/zero-crossing/peak exact."""
    import numpy as np

    rows = MM.audio_window_features(assets, win=128, hop=64).collect()
    got = {(r["asset_id"], r["win_idx"]): r for r in rows}
    n_expected = 0
    for r in assets.collect():
        s = np.frombuffer(r["content"], dtype=np.uint8).astype(int) - 128
        n = len(s)
        for wi, st in enumerate(range(0, n - 128 + 1, 64)):
            seg = s[st : st + 128]
            g = got[(r["asset_id"], wi)]
            assert g["energy"] == int(np.dot(seg, seg))
            assert g["zero_crossings"] == int(np.sum(seg[:-1] * seg[1:] < 0))
            assert g["peak"] == int(np.max(np.abs(seg)))
            n_expected += 1
    assert len(rows) == n_expected


def test_audio_short_assets_emit_no_windows(spark):
    """Assets shorter than one window must vanish (librosa
    center=False), not emit a partial window."""
    df = spark.createDataFrame(
        [(1, b"x" * 10), (2, b"y" * 300)], "asset_id long, content binary"
    )
    rows = MM.audio_window_features(df, win=256, hop=128).collect()
    assert {r["asset_id"] for r in rows} == {2}


def test_resize_partitioning_invariance(spark, assets):
    """The kernel is per-row — repartitioning must not change any
    output byte."""
    a = {
        r["asset_id"]: bytes(r["resized"])
        for r in MM.resize_stub(assets.repartition(7), 16, 16).collect()
    }
    b = {
        r["asset_id"]: bytes(r["resized"])
        for r in MM.resize_stub(assets.coalesce(1), 16, 16).collect()
    }
    assert a == b
