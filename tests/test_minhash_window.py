"""Windowed streaming MinHash: drained (window, source) signature
cells must be bit-identical to a batch kernel + min aggregation over
the same rows, and the agreement helper must behave like a Jaccard
estimate (1.0 on identical slices, bounded on disjoint ones)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.operators.dedup import _signature_batch_kernel
from svs_spark.queries import load
from svs_spark.streaming.minhash_window import (
    minhash_signature_stream,
    signature_agreement,
)
from svs_spark.streaming.sessions import run_to_memory

NH, K = 16, 3
T0 = 1_600_000_000_000_000  # epoch micros


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Documents with a synthetic arrival time: one doc per minute."""
    src = str(tmp_path_factory.mktemp("docstream") / "data")
    (
        load(spark, SF_DIR, "documents")
        .withColumn(
            "event_time",
            F.timestamp_micros(
                (F.lit(T0) + F.col("doc_id") * 60_000_000).cast("long")
            ),
        )
        .select("doc_id", "text", "source", "event_time")
        .write.mode("overwrite")
        .parquet(src)
    )
    return src


@pytest.fixture(scope="module")
def drained(spark, staged):
    schema = spark.read.parquet(staged).schema
    stream = minhash_signature_stream(
        spark.readStream.schema(schema).parquet(staged),
        text_col="text",
        id_col="doc_id",
        group_col="source",
        ts_col="event_time",
        window_duration="60 minutes",
        watermark="1 minute",
        num_hashes=NH,
        shingle_size=K,
    )
    run_to_memory(stream, "mh_cells_sink", output_mode="append")
    return spark.table("mh_cells_sink").toPandas()


def test_windows_emit_with_bounded_cells(drained):
    assert len(drained) > 0
    per = drained.groupby(["window_start", "source"]).size()
    assert (per <= NH).all()
    assert drained["window_start"].nunique() >= 2


def test_stream_cells_equal_batch_kernel(spark, staged, drained):
    w0 = sorted(drained["window_start"].unique())[0]
    cells = drained[drained["window_start"] == w0]
    w1 = cells["window_end"].iloc[0]
    rows = spark.read.parquet(staged).filter(
        (F.col("event_time") >= F.lit(w0)) & (F.col("event_time") < F.lit(w1))
    )
    base = rows.select("doc_id", "text", "source").mapInPandas(
        _signature_batch_kernel(
            "doc_id", "text", NH, K, passthrough=("source",)
        ),
        schema="did long, hs array<long>, sig array<long>, source string",
    )
    batch = (
        base.select("source", F.posexplode("sig").alias("hash_idx", "v"))
        .groupBy("source", "hash_idx")
        .agg(F.min("v").alias("sig_min"))
        .collect()
    )
    got = {
        (r.source, r.hash_idx): r.sig_min
        for r in cells.itertuples(index=False)
    }
    expected = {(r["source"], r["hash_idx"]): r["sig_min"] for r in batch}
    assert got == expected and len(expected) > 0


def test_agreement_semantics(drained):
    w0 = sorted(drained["window_start"].unique())[0]
    cells = drained[drained["window_start"] == w0]
    srcs = sorted(cells["source"].unique())[:2]
    a = cells[cells["source"] == srcs[0]][["hash_idx", "sig_min"]]
    assert signature_agreement(a, a) == 1.0
    if len(srcs) > 1:
        b = cells[cells["source"] == srcs[1]][["hash_idx", "sig_min"]]
        agree = signature_agreement(a, b)
        assert 0.0 <= agree <= 1.0


def test_cross_window_merge_is_min(drained):
    """Signatures of two windows of one group merge by min — merged
    agreement with a single window is >= the cross-window agreement
    (adding docs can only lower components toward the union's)."""
    wins = sorted(drained["window_start"].unique())[:2]
    src = sorted(drained["source"].unique())[0]
    g = drained[drained["source"] == src]
    a = g[g["window_start"] == wins[0]][["hash_idx", "sig_min"]]
    both = g[g["window_start"].isin(wins)][["hash_idx", "sig_min"]]
    merged = signature_agreement(both, both)
    assert merged == 1.0
    # merged signature components are the min of the two windows'
    import pandas as pd

    m = both.groupby("hash_idx")["sig_min"].min()
    for idx, v in m.items():
        assert v <= a.set_index("hash_idx")["sig_min"].get(idx, v)
