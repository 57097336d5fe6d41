"""Retrieval-evaluation tour — the offline loop an embedding/retrieval
team runs before swapping a model or an index, built entirely from
registered queries and operators:

  1. score the ranking    retrieval_ndcg_eval (nDCG@10 + reciprocal
                          rank vs labeled relevance)
  2. mine what to fix     hard_negative_mining (top different-label
                          neighbors — contrastive training fodder)
  3. audit the corpus     distinct_ngram_diversity (self-repetition),
                          benford_first_digit (numeric-feed integrity)
  4. plan the pipeline    event_disorder_audit (what watermark delay
                          the event stream actually needs),
                          join_key_skew_audit (does the join key need
                          salting), batched k-center (diverse coreset
                          in ~2 corpus passes)

Usage: python examples/retrieval_eval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from svs_spark.queries import queries
    from svs_spark.session import get_session

    spark = get_session("retrieval_eval")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()

    print(f"# Retrieval-evaluation report — {SF}\n")

    print("## 1. Ranking quality vs labeled relevance (nDCG@10 / RR)")
    rows = sorted(
        reg["retrieval_ndcg_eval"](spark, SF).collect(),
        key=lambda r: -r["ndcg10"],
    )
    for r in rows:
        print(
            f"  q{r['query_id']}: ndcg@10={r['ndcg10']:.4f} rr={r['rr']:.4f}"
            f" ({r['n_rel_top10']}/{min(10, r['n_rel_total'])} relevant found)"
        )
    mean_ndcg = sum(r["ndcg10"] for r in rows) / len(rows)
    print(f"  mean nDCG@10 = {mean_ndcg:.4f}")

    print("\n## 2. Hard negatives (different-label nearest neighbors)")
    for r in reg["hard_negative_mining"](spark, SF).collect()[:8]:
        print(
            f"  q{r['query_id']} rank {r['rank']}: vec {r['vec_id']}"
            f" score {r['score']:.4f}"
        )
    print("  ... (k=5 per query; the contrastive-training batch)")

    print("\n## 2b. Triplet export (hardest positive + negative per anchor)")
    trip = reg["contrastive_triplets"](spark, SF).toPandas()
    piv = trip.pivot(index="query_id", columns="role", values="score")
    for qid, r in piv.iterrows():
        print(
            f"  q{qid}: pos {r['pos']:.4f} vs neg {r['neg']:.4f}"
            f" (margin {r['pos'] - r['neg']:+.4f})"
        )
    print("  (negative margins = exactly the pairs a fine-tune should fix)")

    print("\n## 3. Corpus self-repetition (distinct-n diversity)")
    div = reg["distinct_ngram_diversity"](spark, SF).collect()
    worst = sorted((r for r in div if r["n"] == 3), key=lambda r: r["diversity"])
    for r in worst[:3]:
        print(
            f"  {r['source']}: distinct-3 = {r['diversity']:.4f}"
            f" ({r['distinct_ngrams']}/{r['total_ngrams']})"
        )
    print("  (lowest distinct-3 sources re-serve the most phrasing)")

    print("\n## 4. Numeric-feed integrity (Benford first digit)")
    for r in sorted(
        reg["benford_first_digit"](spark, SF).collect(),
        key=lambda r: r["digit"],
    ):
        bar = "#" * int(r["obs_share"] * 100)
        print(
            f"  {r['digit']}: obs {r['obs_share']:.4f} vs exp"
            f" {r['exp_share']:.4f}  {bar}"
        )

    print("\n## 5. Streaming watermark measurement (event-time disorder)")
    for r in sorted(
        reg["event_disorder_audit"](spark, SF).collect(),
        key=lambda r: r["event_type"],
    ):
        print(
            f"  {r['event_type']}: {r['n_late']}/{r['n_events']} late,"
            f" p95 lateness {r['p95_late_s']:.1f}s, max {r['max_late_s']:.1f}s"
        )
    print("  (p95/max bound the withWatermark delay the stream needs)")

    print("\n## 6. Join-key skew pre-flight")
    r = reg["join_key_skew_audit"](spark, SF).collect()[0]
    print(
        f"  user_id: {r['n_keys']} keys, hottest {r['max_rows_per_key']}"
        f" rows, p99 {r['p99_rows_per_key']:.1f}, skew factor"
        f" {r['skew_factor']:.2f}x"
    )
    print("  (factor ~1 = hash partitioning balances; 100+ = salt it)")

    print("\n## 6b. Score calibration (isotonic / PAV fit)")
    cal = sorted(
        reg["isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    for r in cal:
        pooled = " (pooled)" if r["calibrated"] != r["raw_rate"] else ""
        print(
            f"  bin {r['bin']}: raw {r['raw_rate']:.4f} ->"
            f" calibrated {r['calibrated']:.4f}{pooled}  n={r['n_docs']}"
        )
    print("  (monotone fit: trust the magnitudes after this, not before)")

    print("\n## 6c. Truncated-dimension recall (Matryoshka eval)")
    for r in sorted(
        reg["matryoshka_recall_eval"](spark, SF).collect(),
        key=lambda r: r["dims"],
    ):
        print(
            f"  d={r['dims']:>3}: recall@10 = {r['recall_at_10']:.2f}"
            f" ({r['n_hits']}/100)"
        )
    print("  (ship the smallest d whose recall your product tolerates)")

    print("\n## 7. Diverse coreset via BATCHED greedy k-center")
    from pyspark.sql import functions as F

    from svs_spark.operators.clustering import kcenter_greedy

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    ids, radii, passes = kcenter_greedy(emb, k=6, batch_candidates=256)
    print(f"  centers {ids} in {passes} corpus pass(es)")
    print(f"  coverage radii {[round(r, 3) for r in radii]}")

    spark.stop()


if __name__ == "__main__":
    main()
