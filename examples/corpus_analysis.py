"""Corpus health report — the analysis surface a curation run consults
before touching anything: profile, language mix, duplication (document-,
span-, and source-level), boilerplate, rare-token quality, and PII
exposure, each a registered oracle-gated operator (svs_spark.query_defs)
run here against a documents directory.

Usage: python examples/corpus_analysis.py [sf_dir]   (default sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from svs_spark import get_session
from svs_spark.functions import text as T
from svs_spark.operators import dedup as D


def main(sf_dir: str) -> None:
    spark = get_session("corpus_analysis")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n = docs.count()
    print(f"== corpus: {n} documents from {sf_dir}\n")

    print("-- language / source mix")
    docs.groupBy("lang").count().orderBy(F.desc("count")).show(5)

    print("-- exact duplicate groups (top 5)")
    (
        docs.groupBy(F.xxhash64("text").alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("canonical"))
        .filter(F.col("n") > 1)
        .orderBy(F.desc("n"))
        .select("canonical", "n")
        .show(5)
    )

    print("-- span-level duplication (per-doc dup-window ratio deciles)")
    (
        D.dup_substring_stats(docs)
        .groupBy(F.floor(F.col("dup_ratio") * 10).alias("decile"))
        .count()
        .orderBy("decile")
        .show()
    )

    print("-- most widely duplicated 30-char spans")
    wins = D.substring_windows(docs, hashed=False)
    (
        wins.groupBy("win")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "win")
        .show(5, truncate=40)
    )

    print("-- PII exposure (counts across the corpus)")
    ne, np_, ni = T.pii_counts("text")
    docs.select(
        F.sum(ne).alias("emails"),
        F.sum(np_).alias("phones"),
        F.sum(ni).alias("ipv4s"),
    ).show()

    print("-- near-dup pairs (MinHash-LSH, J >= 0.5): count")
    print(D.minhash_lsh_pairs(docs).count())

    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
