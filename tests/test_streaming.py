"""Streaming operators validated against their batch twins: drain each
stream with availableNow into a memory sink, then compare with a plain
batch computation over the same parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from svs_spark.queries import load
from svs_spark.streaming.sessions import (
    run_to_memory,
    running_user_totals,
    sessionize_stream,
    stream_events,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark):
    # load() normalizes ts to nanos-long regardless of the file's physical
    # timestamp type (NANOS vs MICROS testdata generations), exactly like
    # the streaming source does — so the parity holds on either.
    return load(spark, SF_DIR, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def test_windowed_counts_match_batch(spark, batch_events):
    stream = windowed_event_counts(stream_events(spark, SF_DIR))
    run_to_memory(stream, "win_counts", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in (
            batch_events.groupBy(
                F.window("event_time", "10 minutes").alias("w"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value",
            )
            .collect()
        )
    }
    assert got == expected and len(got) > 0


def test_session_windows_match_batch_sessionization(spark, batch_events):
    stream = sessionize_stream(stream_events(spark, SF_DIR))
    run_to_memory(stream, "sessions", output_mode="complete")
    got = spark.table("sessions")
    # batch twin: session_window works in batch mode too
    expected = (
        batch_events.groupBy(
            F.session_window("event_time", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    assert got.count() == expected.count() > 0
    # per-user session counts agree
    g = {r["user_id"]: r["n"] for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    e = {r["user_id"]: r["n"] for r in expected.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert g == e


def test_running_user_totals_state(spark):
    stream = running_user_totals(stream_events(spark, SF_DIR))
    run_to_memory(stream, "user_totals", output_mode="update")
    got = spark.table("user_totals")
    # last update per user should equal the batch totals
    last = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in got.collect()  # update mode: one row per user per batch
    }
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("t"),
        )
        .collect()
    }
    assert set(last) == set(batch)
    for uid in batch:
        assert last[uid][0] == batch[uid][0]
        assert abs(last[uid][1] - batch[uid][1]) < 1e-6


def test_streaming_dedup(spark):
    from svs_spark.streaming.sessions import dedup_stream

    # duplicate the stream by unioning it with itself: every event
    # appears twice; dedup must restore exact-once
    s1 = stream_events(spark, SF_DIR)
    doubled = s1.union(stream_events(spark, SF_DIR))
    deduped = dedup_stream(doubled, keys=["event_id"])
    run_to_memory(deduped, "dedup_out", output_mode="append")
    n = spark.table("dedup_out").count()
    expected = load(spark, SF_DIR, "events").count()
    assert n == expected


def test_stream_stream_attribution_join(spark):
    from svs_spark.streaming.sessions import purchase_attribution_stream

    ev = stream_events(spark, SF_DIR)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = purchase_attribution_stream(clicks, purchases)
    run_to_memory(joined, "attrib", output_mode="append")
    got = spark.table("attrib")

    # batch twin: plain interval join over the same data
    batch = load(spark, SF_DIR, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    bc = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_time").alias("click_time"),
    )
    bp = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_time").alias("purchase_time"),
    )
    expected = bp.join(
        bc,
        F.expr(
            "p_user = c_user AND click_time <= purchase_time "
            "AND click_time >= purchase_time - INTERVAL 30 minutes"
        ),
    )
    assert got.count() == expected.count() > 0
    g = sorted((r["purchase_id"], r["click_id"]) for r in got.collect())
    e = sorted(
        (r["purchase_id"], r["click_id"]) for r in expected.collect()
    )
    assert g == e


def test_streaming_ingest_into_kb(spark, tmp_path):
    """foreachBatch ingest: a parquet-drop document stream lands in the
    KB through the batch append path (bucketed layout, collision guard);
    a REPLAYED drop is dropped idempotently instead of raising."""
    import os

    from svs_spark.kb import KnowledgeBase
    from svs_spark.streaming.ingest import (
        ingest_stream_into_kb, prepare_doc_stream,
    )

    src = str(tmp_path / "drops")
    os.makedirs(src)
    docs1 = spark.createDataFrame(
        [(f"streamed document number {i} with plenty of text",)
         for i in range(30)] + [("x",)],  # one too-short doc filtered out
        "text string",
    )
    docs1.write.mode("overwrite").parquet(os.path.join(src, "drop1"))

    kb = KnowledgeBase(
        spark, str(tmp_path / "kbs"),
        embedding_params={"provider": "mock"}, force_fresh_db=True,
    )
    stream = spark.readStream.schema("text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(os.path.join(src, "*"))
    prepared = prepare_doc_stream(stream, min_chars=10)
    q = ingest_stream_into_kb(
        prepared, kb, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert len(kb) == 30  # the short doc was filtered

    # replay the same content as a new drop: idempotent (no growth)
    docs1.write.mode("overwrite").parquet(os.path.join(src, "drop2"))
    q2 = ingest_stream_into_kb(
        prepared, kb, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert len(kb) == 30

    # and the KB is fully functional over the streamed docs
    assert kb.wh.bucket_meta("docs") is not None
    some_id = kb.docs.first()["id"]
    assert kb.query_doc(some_id)["level"] == 0


def test_query_stream_matches_bulk_retrieval(spark, tmp_path):
    """streaming/retrieval.py: a drained query stream produces exactly
    the rows knn_join_batch gives for the same queries (per-batch one
    corpus scan; stateless, so availableNow drains in one trigger)."""
    from svs_spark.queries import fixed_query_vec
    from svs_spark.operators.similarity import knn_join_batch
    from svs_spark.streaming.retrieval import serve_query_stream, stream_queries

    corpus = load(spark, SF_DIR, "embeddings")
    qbatch = [(i, fixed_query_vec(64, seed=50 + i)) for i in range(6)]

    src = str(tmp_path / "qdrop")
    spark.createDataFrame(
        [(qid, [float(x) for x in v]) for qid, v in qbatch],
        "query_id long, embedding array<float>",
    ).write.parquet(src)

    sink = str(tmp_path / "answers")
    q = serve_query_stream(
        stream_queries(spark, src),
        corpus,
        k=5,
        sink_path=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["score"], 6))
        for r in spark.read.parquet(sink).collect()
    }
    expected = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["score"], 6))
        for r in knn_join_batch(corpus, qbatch, 5).collect()
    }
    assert got == expected


def test_quality_flag_stream_matches_batch_twin(spark):
    """The streaming quality-gate monitor must produce exactly the
    registered gopher_quality_flags batch rows after an availableNow
    drain (same Column expressions, complete-mode aggregate)."""
    from svs_spark.queries import queries
    from svs_spark.streaming.ingest import quality_flag_stream, stream_documents
    from svs_spark.streaming.sessions import run_to_memory

    stream = quality_flag_stream(stream_documents(spark, SF_DIR))
    run_to_memory(stream, "qflags_stream", output_mode="complete")
    got = {
        r.source: (r.n_docs, r.fail_word_count, r.fail_mean_word_len,
                   r.fail_symbol_ratio, r.fail_alpha_frac,
                   r.fail_stopwords, r.n_pass)
        for r in spark.table("qflags_stream").collect()
    }
    want = {
        r.source: (r.n_docs, r.fail_word_count, r.fail_mean_word_len,
                   r.fail_symbol_ratio, r.fail_alpha_frac,
                   r.fail_stopwords, r.n_pass)
        for r in queries()["gopher_quality_flags"](spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
