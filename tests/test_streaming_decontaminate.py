"""Streaming decontamination / quality gate validated against batch
twins over the same documents parquet (availableNow drain → memory
sink, then compare with the equivalent batch computation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.streaming.decontaminate import (
    build_test_index,
    contaminated_ids_stream,
    ngram_hashes,
    quality_gate_stream,
    stream_docs,
)
from svs_spark.streaming.sessions import run_to_memory


def test_contaminated_ids_match_batch(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # protect every 10th doc as the "benchmark" set; screen the rest
    protected = docs.filter(F.col("doc_id") % 10 == 0)
    candidates_batch = docs.filter(F.col("doc_id") % 10 != 0)
    index = build_test_index(protected).persist()
    index.count()

    stream = stream_docs(spark, SF_DIR).filter(F.col("doc_id") % 10 != 0)
    flagged = contaminated_ids_stream(stream, index)
    run_to_memory(flagged, "contaminated", output_mode="append")
    got = {r["doc_id"] for r in spark.table("contaminated").collect()}

    expected = {
        r["doc_id"]
        for r in candidates_batch.select(
            "doc_id", F.explode(ngram_hashes()).alias("h")
        )
        .join(index, "h", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got == expected
    # sanity: the synthetic corpus shares templates, so some but not
    # all candidates must be flagged
    assert 0 < len(got) < candidates_batch.count()


def test_ngram_hashes_short_docs_yield_empty_not_crash(spark):
    """Docs with fewer than n tokens must produce an empty shingle
    array — F.sequence(0, negative) would otherwise build a descending
    index range and element_at reads past the array (regression:
    real landing-zone streams contain short docs even though the
    synthetic corpus doesn't)."""
    df = spark.createDataFrame(
        [(1, "only four tokens here"), (2, "a b c d e f"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(ngram_hashes("text", 5)).alias("n")
        ).collect()
    }
    assert rows[1] == 0 and rows[3] == 0 and rows[2] == 2


def test_quality_gate_matches_batch_funnel_tail(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from svs_spark.functions import text as T

    p = (
        (F.length(F.col("text")) >= 50)
        & (T.whitespace_token_count("text") >= 20)
        & (T.quality_score("text") >= 0.5)
        & F.col("lang").isNotNull()
    )
    expected = {r["doc_id"] for r in docs.filter(p).select("doc_id").collect()}

    gated = quality_gate_stream(stream_docs(spark, SF_DIR)).select("doc_id")
    run_to_memory(gated, "quality_gate", output_mode="append")
    got = {r["doc_id"] for r in spark.table("quality_gate").collect()}
    assert got == expected and 0 < len(got) < docs.count()


def test_eval_containment_stream_matches_batch_twin(spark):
    """The streaming containment screen (foreachBatch twin of the
    registered decontaminate_fuzzy CONTRACT) must flag exactly the
    pairs the batch computation flags over the same corpus — including
    the asymmetric shape: an incoming doc that fully embeds a
    protected doc is flagged even though their Jaccard is tiny."""
    from svs_spark.streaming.decontaminate import (
        build_eval_containment_index,
        eval_containment_flags,
        eval_containment_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    protected = docs.filter(F.col("doc_id") % 10 == 0)
    incoming_batch = docs.filter(F.col("doc_id") % 10 != 0)
    eval_index, eval_counts = build_eval_containment_index(protected)
    eval_index = eval_index.persist()
    eval_counts = eval_counts.persist()
    eval_index.count(), eval_counts.count()

    stream = stream_docs(spark, SF_DIR).filter(F.col("doc_id") % 10 != 0)
    q = eval_containment_stream(
        stream, eval_index, eval_counts, "containment_flags", threshold=0.8
    )
    q.awaitTermination()
    got = {
        (r.id_train, r.id_eval, r.n_shared, r.eval_containment)
        for r in spark.table("containment_flags").collect()
    }
    want = {
        (r.id_train, r.id_eval, r.n_shared, r.eval_containment)
        for r in eval_containment_flags(
            incoming_batch, eval_index, eval_counts, threshold=0.8
        ).collect()
    }
    assert got == want
    assert got, "template corpus must produce containment flags"
    eval_index.unpersist(), eval_counts.unpersist()
