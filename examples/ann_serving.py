"""Build-once / query-fast ANN serving over an embedding corpus.

Demonstrates the IVF serving index (operators/index_build.py):

1. TRAIN   — spherical kmeans++ on a bounded sample (driver numpy)
2. BUILD   — one distributed scan assigns clusters + quantizes, writes
             parquet partitioned by label with packed float32 AND int8
             vector columns; centroids land in index metadata
3. QUERY   — rank centroids driver-side (no scan), read ONLY the probed
             label partitions and ONLY the chosen precision column,
             score with one NumPy GEMM per Arrow batch, global top-k

At 1M docs × dim 1536 this serves a warm top-100 in ~0.5 s at
recall@100 = 1.00 vs 5-8 s for an exact full scan (MILLION_BENCH_r02).

Usage:
    python examples/ann_serving.py [sf_dir]   (default /root/testdata/sf0.01)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svs_spark import get_session
from svs_spark.operators import index_build as IX


def main(sf_dir: str) -> None:
    spark = get_session("ann_serving")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    print(f"corpus: {n} vectors")

    idx_path = os.path.join(tempfile.gettempdir(), "ann_serving_idx")
    cent = IX.train_centroids_sample(
        emb, n_clusters=max(8, n // 250), sample_rows=min(20_000, n)
    )
    IX.build_ivf_index(emb, idx_path, cent)
    meta = IX.read_index_meta(idx_path)
    print(f"index: {meta['n_clusters']} clusters, dim {meta['dim']}")

    # keep ONE reader handle across queries (file listing paid once)
    idx = spark.read.parquet(idx_path)
    qvec = [float(x) for x in emb.first()["embedding"]]

    for precision in ("float32", "int8"):
        rows = IX.search_ivf_index(
            idx, meta, qvec, k=5, probes=4, precision=precision
        ).collect()
        print(f"top-5 ({precision}):",
              [(r["vec_id"], round(r["score"], 4)) for r in rows])

    # the in-process serving twin: same parquet layout, no Spark job —
    # the low-latency path (BASELINE.json's stated division of labor);
    # answers are identical to the Spark path by test
    reader = IX.IvfLocalReader(idx_path)
    print("top-5 (local reader):",
          [(v, round(s, 4)) for v, s in reader.search(qvec, 5, probes=4)])

    # IVF-PQ: m-byte codes next to the float column; the ADC screen
    # reads 1/64th the bytes of a float probe, the rerank restores the
    # exact top-k (operators/index_build.py: search_pq_index)
    import numpy as np

    rows = sorted(
        emb.select("vec_id", "embedding").limit(20_000).collect(),
        key=lambda r: r.vec_id,
    )
    books = IX.train_pq_codebooks_residual(
        np.array([r.embedding for r in rows], dtype=np.float32),
        cent, m=8, ksub=64,
    )
    pq_path = os.path.join(tempfile.gettempdir(), "ann_serving_pq")
    IX.build_pq_index(emb, pq_path, cent, books)
    pq_meta = IX.read_index_meta(pq_path)
    pq_idx = spark.read.parquet(pq_path)
    rows = IX.search_pq_index(pq_idx, pq_meta, qvec, k=5, probes=4).collect()
    print("top-5 (ivf-pq + rerank):",
          [(r["vec_id"], round(r["score"], 4)) for r in rows])

    # -- the serving trio on top of dense retrieval ----------------------
    # filtered: metadata predicate pushed into the same scan as the
    # cluster probe (plan keeps one corpus touch)
    from pyspark.sql import functions as F

    from svs_spark.operators.ann import ivf_centroids, ivf_topk
    from svs_spark.operators.similarity import mmr_rerank

    cents = ivf_centroids(emb)
    bound = int(n // 2)
    rows = ivf_topk(
        emb, qvec, k=5, probes=4, centroids=cents,
        meta_filter=F.col("vec_id") >= bound,
    ).collect()
    print(f"top-5 (ivf, vec_id >= {bound}):",
          [(r["vec_id"], round(r["score"], 4)) for r in rows])

    # diverse: MMR rerank of the dense top-30 down to 5
    rows = mmr_rerank(emb, qvec, k=5, pool=30, lam=0.7).collect()
    print("top-5 (mmr diverse):",
          [(r["vec_id"], round(r["mmr"], 4)) for r in rows])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
