"""Train the model-adjacent artifacts a data pipeline owns: a BPE
tokenizer, a logistic quality classifier, and a temperature-balanced
corpus mix — end-to-end on the documents table.

1. TOKENIZER  — operators/bpe.py: one corpus word count, then
                vocab-cardinality merge iterations (the corpus is
                never re-read). Encode a sample doc with the learned
                merges.
2. CLASSIFIER — operators/logreg.py: engineer 4 scan-stage quality
                features, label docs by a cheap heuristic (CJK routing
                — stands in for the hand-labeled set a real pipeline
                has), Newton-fit distributed, score every doc with a
                pure-Column sigmoid (no Python at inference).
3. EVALUATE   — operators/evaluation.py: tie-exact ROC-AUC of the
                classifier score against the labels, per source.
4. MIX        — the temperature_resample quota math (alpha = 0.3):
                per-language budgets p^alpha-proportional, filled by
                deterministic Efraimidis-Spirakis priority keys.

Usage:
    python examples/tokenizer_and_classifier.py [sf_dir]
    (default /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from svs_spark import get_session
from svs_spark.operators import bpe as B
from svs_spark.operators import logreg as LR
from svs_spark.operators.evaluation import binary_auc


def main(sf_dir: str) -> None:
    spark = get_session("tokenizer_and_classifier", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. tokenizer ------------------------------------------------------
    words = B.words_from_corpus(docs, "text").localCheckpoint(eager=True)
    merges, _ = B.bpe_train(words, n_merges=16, min_count=2)
    print(f"learned {len(merges)} merges; first 8: {merges[:8]}")
    sample = docs.select("text").first()["text"].split(" ")[:6]
    for w in sample[:3]:
        print(f"  {w!r} -> {B.bpe_encode(w.lower(), merges)}")

    # 2. classifier -----------------------------------------------------
    toks = F.split(F.lower(F.col("text")), " ")
    feats = docs.select(
        "doc_id",
        "source",
        F.array(
            (F.col("n_chars") / 1000.0).cast("double"),
            (F.size(toks) / 100.0).cast("double"),
            (F.size(F.array_distinct(toks)) / 100.0).cast("double"),
            (F.col("n_chars") / F.greatest(F.size(toks), F.lit(1)) / 10.0)
            .cast("double"),
        ).alias("features"),
        (F.col("lang") == "zh").cast("double").alias("label"),
    )
    model = LR.fit(feats, dim=4, iters=6)
    print(
        f"fit on {model['n']} docs: loss={model['loss']:.1f} "
        f"grad_norm={model['grad_norm']:.2e} "
        f"weights={[round(w, 3) for w in model['weights']]}"
    )

    # 3. evaluate -------------------------------------------------------
    scored = LR.predict(feats, model).select(
        "source",
        F.round(F.col("score") * 1000).cast("long").alias("s"),  # fixed-point
        (F.col("label") > 0.5).alias("y"),
    )
    auc = binary_auc(scored, "s", "y", ["source"])
    rows = auc.orderBy("source").collect()
    overall = binary_auc(scored, "s", "y").collect()[0]
    print(
        f"classifier AUC overall: {overall['auc']:.4f} "
        f"({overall['n_pos']} pos / {overall['n_neg']} neg); "
        f"worst source: "
        f"{min(rows, key=lambda r: r['auc'])['source']} "
        f"= {min(r['auc'] for r in rows):.4f}"
    )
    # On this synthetic corpus zh text is whitespace-tokenized like
    # every other language, so these features carry almost no signal
    # and the AUC lands near 0.5 — the evaluation step doing its job:
    # a pipeline that gated on this classifier here would be filtering
    # noise, and this is the number that tells you so BEFORE you ship.

    # 4. temperature mix ------------------------------------------------
    cnt = docs.groupBy("lang").agg(F.count("*").alias("nl"))
    tot = cnt.agg(
        F.sum("nl").alias("n"),
        F.sum(F.pow(F.col("nl").cast("double"), 0.3)).alias("z"),
    )
    quota = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "nl",
            F.least(
                F.col("nl"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.floor(
                        F.ceil(0.2 * F.col("n"))
                        * F.pow(F.col("nl").cast("double"), 0.3)
                        / F.col("z")
                        + 0.5
                    ).cast("long"),
                ),
            ).alias("quota"),
        )
        .orderBy("lang")
    )
    print("temperature quotas (alpha=0.3, 20% budget):")
    for r in quota.collect():
        print(f"  {r['lang']}: {r['nl']} docs -> quota {r['quota']}")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
