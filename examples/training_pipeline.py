"""End-to-end training-data pipeline over a raw JSONL dump: ingest →
PII-scrub → quality-filter → dedup → split/decontaminate → shard-export
— every stage a distributed DataFrame op (see svs_spark.query_defs for
the oracle-gated versions of each operator over the driver testdata).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from svs_spark import get_session
from svs_spark.sources.corpus import ingest_jsonl, write_corpus
from svs_spark.functions import text as T


def main(jsonl_path: str, out_dir: str) -> None:
    spark = get_session("training_pipeline")

    docs = ingest_jsonl(spark, jsonl_path, source="dump")

    # PII scrub first — redactions must happen before any content hash
    # or fingerprint is derived (pure codegen'd regex in the scan
    # projection; patterns shared with the oracle-gated pii_scrub query)
    docs = docs.withColumn("text", T.scrub_pii("text")).withColumn(
        "n_chars", F.length("text")
    )

    # quality filter: min length, min tokens, composite score
    toks = T.whitespace_token_count("text")
    good = docs.filter(
        (F.col("n_chars") >= 50)
        & (toks >= 20)
        & (T.quality_score("text") >= 0.5)
    )

    # exact dedup: lowest doc_id per content hash survives (one shuffle
    # on the 8-byte hash; see minhash_lsh_pairs for the near-dup family)
    w = Window.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    unique = (
        good.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # deterministic 90/10 split — xxhash64 re-hash (ids here span the
    # full 64-bit range, so the Knuth multiply used on small testdata
    # ids would overflow; this is the documented scale path)
    bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(1000))
    final = unique.withColumn(
        "split", F.when(bucket < 900, "train").otherwise("test")
    )

    # decontaminate: drop train docs sharing any 5-gram with the test
    # split (the shared ngram_hashes helper also powers the streaming
    # screen in svs_spark.streaming.decontaminate, so a live ingest
    # applies the identical filter)
    from svs_spark.streaming.decontaminate import (
        build_test_index, ngram_hashes,
    )

    test_idx = build_test_index(final.filter(F.col("split") == "test"))
    tainted = (
        final.filter(F.col("split") == "train")
        .select("doc_id", F.explode(ngram_hashes()).alias("h"))
        .join(test_idx, "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    final = final.join(tainted, "doc_id", "left_anti")

    # shard export: the train split lands as contiguous ~1M-token shard
    # partitions in deterministic shuffle order (two-level global cumsum
    # — no single-task sort; see operators/sharding.py)
    from svs_spark.operators.sharding import token_budget_shards

    train = final.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    sharded = token_budget_shards(
        train, budget=1_000_000, weight_col="n_tokens"
    ).drop("n_tokens")
    write_corpus(sharded, os.path.join(out_dir, "train"), partition_by=("shard",))
    write_corpus(
        final.filter(F.col("split") == "test"), os.path.join(out_dir, "test")
    )
    final.groupBy("split").count().show()


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2])
