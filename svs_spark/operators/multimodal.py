"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* kernels are
stubbed two ways (as mandated): ``decode_image`` raises a clearly-marked
NotImplementedError unless Pillow is importable, while
``fake_decode_features`` is a deterministic stand-in (byte histogram +
moments) that keeps the Spark-side plumbing — schema, batch shape, UDF
signature, partitioning — fully real and testable.

Schema convention for a multimodal asset column:

    content   BINARY          -- raw bytes, opaque to Spark
    media     STRUCT<kind STRING, mime STRING, width INT, height INT,
                     n_bytes LONG, sha STRING>

At 100 TB: binary payloads dominate scan size, so (a) keep them in their
own parquet column (column pruning skips them unless needed), (b) size
`spark.sql.files.maxPartitionBytes` for row-group granularity, (c) run
feature extraction as mapInPandas so each task streams Arrow batches
instead of materializing whole partitions.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)


def with_media_metadata(
    df: DataFrame, content_col: str = "content", kind: str = "image"
) -> DataFrame:
    """Attach the typed metadata struct computed from the binary column."""
    c = F.col(content_col)
    return df.withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(f"application/x-{kind}").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(c).cast("long").alias("n_bytes"),
            F.sha2(c, 256).alias("sha"),
        ),
    )


def decode_image(content: bytes):  # pragma: no cover - needs Pillow
    """Real decode kernel — STUB: the image libraries are not available
    in this environment. Wire Pillow here when present."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in "
            "this environment; use fake_decode_features for the plumbing"
        ) from e


def fake_decode_features(content: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake feature extractor: first moments of the byte
    histogram — a stand-in with the same signature/shape a real
    embedding/feature model would produce."""
    if not content:
        return [0.0] * n_features
    counts = [0] * 256
    for b in content:
        counts[b] += 1
    n = len(content)
    feats = [
        float(n),
        sum(i * c for i, c in enumerate(counts)) / n,  # mean byte
        float(max(i for i, c in enumerate(counts) if c)),
        float(min(i for i, c in enumerate(counts) if c)),
        float(sum(1 for c in counts if c)),  # distinct bytes
        float(counts[32]),  # spaces, proxy for text-ish content
        float(int(hashlib.sha256(content).hexdigest()[:8], 16) % 1000),
        float(n % 256),
    ]
    return feats[:n_features]


FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sha", StringType()),
    StructField("features", ArrayType(DoubleType())),
])


def extract_features(
    assets: DataFrame, id_col: str = "asset_id", content_col: str = "content"
) -> DataFrame:
    """mapInPandas feature extraction over binary assets — the real
    distributed plumbing around the (stubbed) decode kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf[content_col]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].to_numpy(),
                    "n_bytes": contents.map(len).to_numpy(),
                    "sha": contents.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ).to_numpy(),
                    "features": contents.map(fake_decode_features),
                }
            )

    return assets.select(id_col, content_col).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample(
    assets: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "asset_id",
    content_col: str = "content",
) -> DataFrame:
    """Video-frame-sampling plumbing: emit one row per sampled "frame"
    (fixed-stride byte slices standing in for decoded frames). Output is
    (asset_id, frame_idx, frame BINARY) — the row-explosion shape a real
    ffmpeg-based sampler produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                for i, off in enumerate(range(0, len(content), every_n_bytes)):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(content[off : off + every_n_bytes])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return assets.select(id_col, content_col).mapInPandas(
        run,
        schema="asset_id long, frame_idx int, frame binary",
    )
