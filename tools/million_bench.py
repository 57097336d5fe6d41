"""One-million-document retrieval benchmark — the reference's headline
configuration (1M docs, dim-1536 float32 unit vectors, warm top-100;
BASELINE.md: 0.24 s warm, ~98 s cold matrix build).

Generates deterministic synthetic unit vectors distributed (no driver
materialization), persists them (the "warm matrix" equivalent), and
times top-100 retrieval via both scoring paths:

- `sql`:   codegen'd zip_with/aggregate fold (exact, oracle-grade)
- `batch`: Arrow-batched NumPy matvec (the BLAS kernel the reference
           uses, sharded across executor threads)

Usage: python tools/million_bench.py [n_docs] [dim]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 1536

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from svs_spark.session import get_session
    from svs_spark.operators.similarity import (
        retrieve_topk, with_scores_batch,
    )
    from svs_spark.queries import fixed_query_vec

    spark = get_session(
        "million_bench",
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic unit vectors, generated executor-side
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            mat = rng.standard_normal((len(ids), dim), dtype=np.float32)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(mat)})

    emb = (
        spark.range(n, numPartitions=64)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )
    t0 = time.perf_counter()
    emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
    emb.count()
    build_s = time.perf_counter() - t0

    # bulk load: write the corpus as a parquet table (reference: 8 s
    # into SQLite at 1M docs, README.md:129 — no embedding RPCs)
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"mb_load_{n}_{dim}")
    t0 = time.perf_counter()
    emb.write.mode("overwrite").parquet(out)
    load_s = time.perf_counter() - t0

    qvec = fixed_query_vec(dim)

    # warm both paths once (JIT, Arrow setup)
    retrieve_topk(emb, qvec, 100).count()
    t0 = time.perf_counter()
    retrieve_topk(emb, qvec, 100).collect()
    sql_s = time.perf_counter() - t0

    batch = with_scores_batch(emb, qvec).orderBy(
        F.desc("score"), F.desc("vec_id")
    ).limit(100)
    batch.count()
    t0 = time.perf_counter()
    rows = (
        with_scores_batch(emb, qvec)
        .orderBy(F.desc("score"), F.desc("vec_id"))
        .limit(100)
        .collect()
    )
    batch_s = time.perf_counter() - t0
    assert len(rows) == 100

    # bulk retrieval throughput: 64 queries, one corpus scan (the
    # 100 TB-relevant number — serving-style point queries are a
    # non-goal, BASELINE.json)
    from svs_spark.operators.similarity import knn_join_batch

    qbatch = [
        (i, fixed_query_vec(dim, seed=100 + i)) for i in range(64)
    ]
    knn_join_batch(emb, qbatch[:2], 100).count()  # warm
    t0 = time.perf_counter()
    n_out = knn_join_batch(emb, qbatch, 100).count()
    bulk_s = time.perf_counter() - t0
    assert n_out == 64 * 100

    print(
        json.dumps(
            {
                "metric": "warm_top100_retrieve",
                "n_docs": n,
                "dim": dim,
                "index_build_sec": round(build_s, 3),
                "bulk_load_parquet_sec": round(load_s, 3),
                "reference_bulk_load_sec": 8.0,
                "sql_path_sec": round(sql_s, 3),
                "batch_path_sec": round(batch_s, 3),
                "bulk_64q_sec": round(bulk_s, 3),
                "bulk_queries_per_sec": round(64 / bulk_s, 2),
                "reference_warm_sec": 0.24,
                "reference_cold_sec": 98.7,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
