"""Batch vector-index build — the north-star Spark role (BASELINE.json:
"Spark can build/update vector indexes in batch but not handle
low-latency ANN queries. Approach: DataFrame ops for batch vector index
build").

The index IS the table layout: vectors written to parquet partitioned by
their LSH bucket (and optionally sub-bucketed by IVF cluster), so a
search becomes a partition-pruned scan of 1/2^nbits of the data, and the
index "update" is an idempotent partition overwrite — both pure
DataFrame ops that scale to 100 TB. Serving-side (low-latency per-query
lookup) is explicitly out of scope for Spark; a serving system reads the
same parquet layout.

Layout:
    <root>/bucket=<b>/part-*.parquet     (vec_id, embedding, ...)
    <root>/_index_meta/                  (nbits, dim, num_vectors)
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from svs_spark.operators.ann import hyperplane_bucket, query_bucket
from svs_spark.functions.vector import dot_literal


def build_lsh_index(
    embeddings: DataFrame,
    out_path: str,
    nbits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the LSH-partitioned index.

    ``repartition("bucket")`` before the write gives one task per bucket
    (no small-file explosion); `partitionBy` creates the prunable layout.
    Incremental update = overwrite the affected bucket partitions
    (dynamic partition overwrite) — no full rebuild.
    """
    bucketed = embeddings.withColumn(
        "bucket", hyperplane_bucket(vec_col, nbits, dim)
    )
    (
        bucketed.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_path)
    )
    meta = {
        "nbits": nbits,
        "dim": dim,
        "num_vectors": embeddings.count(),
    }
    meta_dir = os.path.join(out_path, "_index_meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def read_index_meta(out_path: str) -> dict:
    with open(os.path.join(out_path, "_index_meta", "meta.json")) as f:
        return json.load(f)


def search_lsh_index(
    spark: SparkSession,
    index_path: str,
    qvec: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
) -> DataFrame:
    """Search the materialized index: the bucket filter prunes partitions
    (verify with .explain: PartitionFilters on `bucket`), the scan reads
    only the query's bucket(s), and the rerank is an exact top-k.

    ``multiprobe`` additionally probes the buckets at Hamming distance 1
    from the query bucket (flipping one hyperplane bit) — the standard
    recall knob when vectors sit near a hyperplane.
    """
    meta = read_index_meta(index_path)
    nbits = meta["nbits"]
    qb = query_bucket(qvec, nbits)
    buckets = [qb]
    if multiprobe > 0:
        buckets += [qb ^ (1 << bit) for bit in range(min(multiprobe, nbits))]
    df = spark.read.parquet(index_path)
    hits = df.filter(F.col("bucket").isin(buckets))
    return (
        hits.select(
            id_col,
            F.round(dot_literal(vec_col, qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc(id_col))
        .limit(k)
    )


def build_two_level_index(
    embeddings: DataFrame,
    out_path: str,
    nbits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> None:
    """Two-level index layout: LSH bucket × coarse cluster.

    Partitioning by (bucket, cluster) lets a search prune on BOTH axes:
    the query's sign-bit bucket first, then the top-probed clusters
    within it — at 100 TB each probe touches 1/(2^nbits · n_clusters)
    of the data. Cluster centroids are precomputed into the index
    metadata so search ranks clusters without scanning anything.
    """
    bucketed = embeddings.withColumn(
        "bucket", hyperplane_bucket(vec_col, nbits, dim)
    )
    (
        bucketed.repartition(F.col("bucket"), F.col(cluster_col))
        .write.mode("overwrite")
        .partitionBy("bucket", cluster_col)
        .parquet(out_path)
    )
    # distributed centroid build (index metadata) — shared with the
    # ivf_topk serving path (operators/ann.py:ivf_centroids)
    from svs_spark.operators.ann import ivf_centroids

    cent = ivf_centroids(embeddings, vec_col, cluster_col)
    meta = {
        "nbits": nbits,
        "dim": dim,
        "cluster_col": cluster_col,
        "num_vectors": embeddings.count(),
        "centroids": {str(cl): v for cl, v in cent.items()},
    }
    meta_dir = os.path.join(out_path, "_index_meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def search_two_level_index(
    spark: SparkSession,
    index_path: str,
    qvec: Sequence[float],
    k: int,
    probes: int = 2,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the two-level index: rank clusters by centroid·query from
    the metadata (no scan), then read only (bucket ∈ probe set) ×
    (cluster ∈ top-probes) partitions and rerank exactly."""
    meta = read_index_meta(index_path)
    nbits, cluster_col = meta["nbits"], meta["cluster_col"]
    qb = query_bucket(qvec, nbits)
    buckets = [qb] + [qb ^ (1 << b) for b in range(min(multiprobe, nbits))]
    from svs_spark.operators.ann import rank_clusters

    probe_clusters = rank_clusters(
        {int(cl): v for cl, v in meta["centroids"].items()}, qvec, probes
    )
    df = spark.read.parquet(index_path)
    hits = df.filter(
        F.col("bucket").isin(buckets) & F.col(cluster_col).isin(probe_clusters)
    )
    return (
        hits.select(
            id_col,
            F.round(dot_literal(vec_col, qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc(id_col))
        .limit(k)
    )
