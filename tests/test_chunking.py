"""Materializing chunker (operators/chunking.py) + the hierarchical
chunk-into-children KB ingest (kb.add_chunked_documents_df) — the
distributed form of the reference's parent/child document-tree build
(reference kb.py:1486-1524)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from svs_spark.kb import KnowledgeBase
from svs_spark.operators.chunking import chunk_text_df, n_chunks_expr
from tests.test_kb import kb  # noqa: F401  (fixture reuse)


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_text_df(df, size=size, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    )
    return [r["chunk_text"] for r in rows]


class TestChunkTextDf:
    def test_boundaries_and_overlap(self, spark):
        text = "".join(chr(ord("a") + i % 26) for i in range(1000))
        got = _chunks(spark, text, 500, 400)
        # ceil((1000-500)/400)+1 = 3 windows
        assert len(got) == 3
        assert got[0] == text[0:500]
        assert got[1] == text[400:900]
        assert got[2] == text[800:1000]  # final window short, not padded
        # consecutive windows overlap by size - stride characters
        assert got[0][-100:] == got[1][:100]

    def test_reconstruction_invariant(self, spark):
        text = "the quick brown fox " * 37  # 740 chars
        size, stride = 200, 150
        got = _chunks(spark, text, size, stride)
        rebuilt = got[0] + "".join(c[size - stride:] for c in got[1:])
        assert rebuilt == text

    def test_short_text_single_chunk(self, spark):
        got = _chunks(spark, "tiny", 500, 400)
        assert got == ["tiny"]

    def test_exact_fit_single_chunk(self, spark):
        text = "x" * 500
        assert _chunks(spark, text, 500, 400) == [text]

    def test_count_matches_closed_form(self, spark):
        rows = [(i, "y" * n) for i, n in enumerate([1, 48, 400, 500, 501, 577, 900, 901])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = (
            chunk_text_df(df, size=500, stride=400)
            .groupBy("parent_id")
            .agg(F.count("*").alias("n"))
        )
        want = df.select(
            F.col("doc_id").alias("parent_id"),
            n_chunks_expr(F.length("text"), 500, 400).alias("n"),
        )
        assert {(r["parent_id"], r["n"]) for r in got.collect()} == {
            (r["parent_id"], r["n"]) for r in want.collect()
        }

    def test_bad_stride_raises(self, spark):
        df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        with pytest.raises(ValueError, match="stride"):
            chunk_text_df(df, size=100, stride=0)
        with pytest.raises(ValueError, match="stride"):
            chunk_text_df(df, size=100, stride=101)


class TestChunkedIngest:
    def test_tree_ingest_and_traversal(self, kb, spark):  # noqa: F811
        # non-repeating body so chunk prefixes locate uniquely
        long_text = "".join(f"{i:04d}" for i in range(310))  # 1240 chars
        df = spark.createDataFrame(
            [(10, long_text), (20, "short root body")],
            "doc_id long, text string",
        )
        n_parents, n_chunks = kb.add_chunked_documents_df(
            df, chunk_size=500, chunk_stride=400
        )
        assert n_parents == 2
        # doc 10: ceil((1240-500)/400)+1 = 3 chunks; doc 20: 1
        assert n_chunks == 4
        assert kb.count() == 6
        # parents are level-0 containers without embeddings; chunks are
        # embedded level-1 children of their parent
        p = kb.query_doc(10)
        assert p["level"] == 0 and p["embedding"] is False
        kids = kb.query_children(10)
        assert len(kids) == 3
        assert all(k["level"] == 1 and k["embedding"] is True for k in kids)
        # chunk text stitches back to the parent text
        texts = [k["text"] for k in kids]
        starts = sorted(long_text.index(t[:50]) for t in texts)
        assert starts == [0, 400, 800]
        # retrieval works over the chunk embeddings
        hits = kb.retrieve("0001 0002", n=3)
        assert len(hits) == 3

    def test_clash_with_existing_doc_raises(self, kb, spark):  # noqa: F811
        kb.add_doc("already here")  # takes id 1
        df = spark.createDataFrame([(1, "clash")], "doc_id long, text string")
        with pytest.raises(ValueError, match="already exist"):
            kb.add_chunked_documents_df(df)
        assert kb.count() == 1  # nothing written

    def test_embedding_provider_called_once_per_chunk(self, spark, tmp_path):
        """The provider must run exactly once per chunk per ingest: the
        clash/count/uniqueness checks run on the pre-embedding frame and
        the embedded frame is persisted before the multi-action append.
        Counted via an O_APPEND tally file because the provider executes
        inside mapInPandas Python workers (separate processes)."""
        import os

        tally = str(tmp_path / "embed_tally")

        def counting(texts):
            with open(tally, "a") as f:
                f.write(f"{len(texts)}\n")
            return [[1.0, 0.0, 0.0] for _ in texts]

        kb2 = KnowledgeBase(
            spark,
            str(tmp_path / "kb_tally"),
            embedding_func=counting,
            embedding_params={"provider": "mock"},
            force_fresh_db=True,
        )
        long_text = "".join(f"{i:04d}" for i in range(310))  # 1240 chars
        df = spark.createDataFrame(
            [(10, long_text), (20, "short root body")],
            "doc_id long, text string",
        )
        n_parents, n_chunks = kb2.add_chunked_documents_df(
            df, chunk_size=500, chunk_stride=400
        )
        assert (n_parents, n_chunks) == (2, 4)
        with open(tally) as f:
            embedded = sum(int(line) for line in f if line.strip())
        assert embedded == n_chunks

        # same guarantee for the flat bulk ingest path
        os.remove(tally)
        df2 = spark.createDataFrame(
            [(30, "another body"), (40, "yet another body")],
            "doc_id long, text string",
        )
        assert kb2.add_documents_df(df2) == 2
        with open(tally) as f:
            embedded = sum(int(line) for line in f if line.strip())
        assert embedded == 2
