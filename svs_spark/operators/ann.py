"""Approximate-nearest-neighbor operators over embedding columns.

Spark builds/refreshes the index structures in batch (bucket
assignments, centroids) — the reference has no index at all (pure brute
force, ``src/svs/kb.py:1623``), so these are the mandated scale path:

- brute-force k-NN join: the exact baseline (per-query TakeOrdered)
- hyperplane LSH: deterministic rational hyperplanes → sign-bit bucket;
  search only the query's bucket
- IVF: coarse quantization by a cluster/label column; probe the top-p
  nearest centroids, rerank exactly within them

Hyperplanes use pure rational literals (no libm), so the same doubles
appear in Spark, Python, and the DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from svs_spark.functions.vector import dot, dot_literal


def hyperplane(bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: exact rational values."""
    return [
        ((bit * 8191 + i * 127) % 997) / 997.0 - 0.5 for i in range(dim)
    ]


def hyperplane_bucket(
    vec_col: str, nbits: int, dim: int
) -> F.Column:
    """Sign-bit bucket id from nbits hyperplane dot products."""
    bucket = F.lit(0).cast("long")
    for bit in range(nbits):
        h = hyperplane(bit, dim)
        bucket = bucket + F.when(
            dot_literal(vec_col, h) > 0, F.lit(2**bit).cast("long")
        ).otherwise(0)
    return bucket


def query_bucket(qvec: Sequence[float], nbits: int) -> int:
    """Driver-side bucket of the query vector — same arithmetic as
    hyperplane_bucket (sequential left-to-right double fold)."""
    dim = len(qvec)
    bucket = 0
    for bit in range(nbits):
        h = hyperplane(bit, dim)
        acc = 0.0
        for x, y in zip(qvec, h):
            acc += float(x) * y
        if acc > 0:
            bucket += 2**bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search: filter to the query's LSH bucket, exact rerank inside.

    The bucket expression is a pure column function, so at scale you
    materialize it once (partition the table by bucket) and the filter
    becomes partition pruning — the scan touches 1/2^nbits of the data.
    """
    dim = len(qvec)
    qb = query_bucket(qvec, nbits)
    bucketed = embeddings.withColumn(
        "bucket", hyperplane_bucket(vec_col, nbits, dim)
    ).filter(F.col("bucket") == qb)
    return (
        bucketed.select(
            id_col,
            F.round(dot_literal(vec_col, qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc(id_col))
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force k-NN join: per-query top-k via ranked window.

    Baseline for ANN recall measurement. The window partitions by query,
    so work distributes across queries; for few queries × huge corpus,
    prefer broadcasting the queries and a per-partition heap (the
    retrieve_topk shape) per query.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("qvec")
    )
    c = candidates.select(
        F.col(cand_id), F.col(vec_col).alias("cvec")
    )
    scored = q.crossJoin(c).select(
        query_id,
        cand_id,
        F.round(dot("qvec", "cvec"), 6).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.desc(cand_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: rank coarse clusters by centroid·query, search only
    the top-`probes` clusters, exact rerank inside.

    Centroids are computed distributed (posexplode → groupBy(cluster,
    pos) avg) — at 100 TB this is the batch "index build" Spark is good
    at; the per-query probe is then a partition-pruned scan when the
    table is laid out by cluster.
    """
    dim = len(qvec)
    exploded = embeddings.select(
        F.col(cluster_col).alias("cl"), F.posexplode(vec_col).alias("pos", "x")
    )
    cent = exploded.groupBy("cl", "pos").agg(F.avg("x").alias("c"))
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    cscore = (
        cent.withColumn("term", F.col("c") * F.element_at(qlit, F.col("pos") + 1))
        .groupBy("cl")
        .agg(F.sum("term").alias("cscore"))
    )
    top_clusters = cscore.orderBy(F.desc("cscore"), F.desc("cl")).limit(probes)
    cands = embeddings.join(
        F.broadcast(top_clusters),
        embeddings[cluster_col] == top_clusters["cl"],
    )
    return (
        cands.select(
            id_col,
            F.col(cluster_col),
            F.round(dot_literal(vec_col, qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc(id_col))
        .limit(k)
    )
