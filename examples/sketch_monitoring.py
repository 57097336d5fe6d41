"""Sketch-based corpus monitoring tour — the constant-memory toolbox.

Demonstrates the round-3 sketch/pruning operators end-to-end on the
testdata, each next to its exact twin so the trade is visible:

1. QUANTILES   — KLL sketch (global + per-event-type) vs exact
                 percentile; rank error printed per probe
                 (operators/sketch.kll_quantiles[_by])
2. HEAVY HITS  — Misra-Gries frequent tokens over the documents table
                 vs exact groupBy counts; undercount bound printed
                 (operators/sketch.frequent_items)
3. BLOOM PRUNE — train-side decontamination with a bloom bitmap built
                 over test-split shingles: prune ratio and exactness
                 vs the plain inverted-index join
                 (operators/bloom, query_defs.decontaminate_*)
4. STREAMING   — the KLL and MG twins replayed over the same parquet
                 with availableNow triggers; final stream state
                 compared to the batch answers
                 (streaming/anomaly.kll_quantile_stream,
                  streaming/heavy_hitters.heavy_hitters_stream)

Usage:
    python examples/sketch_monitoring.py [sf_dir]  (default /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from svs_spark import get_session
from svs_spark.operators.bloom import bloom_bitmap, bloom_prune
from svs_spark.operators.sketch import frequent_items, kll_quantiles_by
from svs_spark.queries import load, queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("sketch_monitoring_example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. KLL quantiles vs exact -------------------------------------------
    ev = load(spark, sf_dir, "events")
    probs = [0.5, 0.95, 0.99]
    print("== KLL quantiles per event_type (vs exact) ==")
    sketch = {
        r["event_type"]: [r["q0"], r["q1"], r["q2"]]
        for r in kll_quantiles_by(ev, "event_type", "value", probs).collect()
    }
    exact_rows = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, array({','.join(map(str, probs))}))").alias("qs")
    ).collect()
    for r in exact_rows:
        et = r["event_type"]
        vals = np.sort(
            np.array([x["value"] for x in ev.filter(F.col("event_type") == et)
                      .select("value").collect()])
        )
        errs = [
            abs(np.searchsorted(vals, q, side="right") / len(vals) - p)
            for q, p in zip(sketch[et], probs)
        ]
        print(f"  {et:10s} sketch={['%.2f' % q for q in sketch[et]]} "
              f"exact={['%.2f' % q for q in r['qs']]} "
              f"rank_err={['%.3f' % e for e in errs]}")

    # 2. Misra-Gries frequent tokens vs exact -----------------------------
    print("== Misra-Gries frequent tokens (capacity 32) ==")
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("item"))
    mg = frequent_items(toks, "item", capacity=32).orderBy(
        F.desc("est_count")
    ).collect()
    true = {
        r["item"]: r["c"]
        for r in toks.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    for r in mg[:8]:
        print(f"  {r['item']:12s} est={r['est_count']:7d} "
              f"true={true[r['item']]:7d} "
              f"undercount={true[r['item']] - r['est_count']}")
    n = sum(true.values())
    print(f"  (bound: undercount <= n/capacity = {n // 32})")

    # 3. Bloom-pruned decontamination vs the inverted-index join ----------
    print("== bloom-pruned decontamination ==")
    reg = queries()
    plain = {
        (r["doc_id"], r["n_shared_5grams"])
        for r in reg["decontaminate_ngrams"](spark, sf_dir).collect()
    }
    bloomed = reg["decontaminate_train_bloom"](spark, sf_dir)
    got = {(r["doc_id"], r["n_shared_5grams"]) for r in bloomed.collect()}
    print(f"  test-direction flags: {len(plain)}; "
          f"train-direction flags (bloom path): {len(got)}")
    # show the prune ratio the bitmap achieves on the train side
    from svs_spark.streaming.decontaminate import ngram_hashes

    tcol = F.split(F.lower(F.col("text")), " ")
    is_test = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % F.lit(1000)
        >= 900
    )
    ex = (
        docs.filter(F.size(tcol) >= 5)
        .select("doc_id", is_test.alias("is_test"),
                F.explode(ngram_hashes("text", 5)).alias("h"))
        .persist()
    )
    test_idx = ex.filter(F.col("is_test")).select("h").distinct()
    bitmap = bloom_bitmap(test_idx, "h", num_bits=1 << 19, num_hashes=4)
    train = ex.filter(~F.col("is_test"))
    kept = bloom_prune(train, "h", bitmap, 4).count()
    total = train.count()
    print(f"  train shingles: {total} -> {kept} after bloom "
          f"({100.0 * kept / max(total, 1):.2f}% survive the bitmap)")

    # 4. Streaming twins --------------------------------------------------
    print("== streaming twins (availableNow replay) ==")
    from svs_spark.streaming.anomaly import kll_quantile_stream
    from svs_spark.streaming.heavy_hitters import heavy_hitters_stream
    from svs_spark.streaming.sessions import run_to_memory, stream_events

    run_to_memory(
        kll_quantile_stream(stream_events(spark, sf_dir), probs=[0.5]),
        "ex_kll_stream", output_mode="update",
    )
    rows = spark.table("ex_kll_stream").collect()
    last = {}
    for r in rows:
        if r["event_type"] not in last or r["n_seen"] > last[r["event_type"]][1]:
            last[r["event_type"]] = (r["q0"], r["n_seen"])
    for et, (q, n_seen) in sorted(last.items()):
        print(f"  stream p50[{et}] = {q:.2f} over {n_seen} rows")

    # readStream needs a DIRECTORY source; the testdata table is a bare
    # file, so stage it
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="svs_docs_stream_")
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(stage, "part-0.parquet"),
    )
    tok_schema = spark.read.parquet(stage).schema
    doc_stream = spark.readStream.schema(tok_schema).parquet(stage)
    tok_stream = doc_stream.select(
        F.lit("all").alias("grp"),
        F.explode(F.split(F.lower("text"), " ")).alias("item"),
    )
    run_to_memory(
        heavy_hitters_stream(tok_stream, "grp", "item", capacity=32),
        "ex_mg_stream", output_mode="update",
    )
    mg_stream = spark.table("ex_mg_stream").orderBy(F.desc("est_count")).collect()
    print(f"  stream top token: {mg_stream[0]['item']} "
          f"(est {mg_stream[0]['est_count']}, batch est "
          f"{mg[0]['est_count']}, true {true[mg_stream[0]['item']]})")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
