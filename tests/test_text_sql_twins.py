"""Column-builder ≡ SQL-string equality for the text functions.

Round-9 optimization: detect_language / whitespace_token_count /
quality_score return one F.expr(sql) when given a column NAME (the
Column-builder tree cost hundreds of py4j round-trips per query build).
These tests pin the two construction paths to cell-identical results on
the real corpus, so the fast path can never drift from the reference
arithmetic that the DuckDB oracles mirror.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from svs_spark.functions import text as T
from svs_spark.session import get_session

SF_DIR = os.environ.get("SVS_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def spark():
    s = get_session("test_text_sql_twins", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _both(docs, fn):
    fast = docs.select("doc_id", fn("text").alias("v"))
    slow = docs.select("doc_id", fn(F.col("text")).alias("v"))
    a = {r["doc_id"]: r["v"] for r in fast.collect()}
    b = {r["doc_id"]: r["v"] for r in slow.collect()}
    return a, b


def test_detect_language_twin(docs):
    a, b = _both(docs, T.detect_language)
    assert a == b


def test_ws_token_count_twin(docs):
    a, b = _both(docs, T.whitespace_token_count)
    assert a == b


def test_quality_score_twin(docs):
    # exact equality, not approx: the SQL twin must be the SAME IEEE
    # expression tree, or the integer-nano-unit aggregates downstream
    # (text_quality_stats) would flip the driver's value hash
    a, b = _both(docs, T.quality_score)
    assert a == b


def test_twin_on_edge_strings(spark):
    rows = [
        (0, ""),
        (1, "   "),
        (2, "the and of is"),
        (3, "el la los es"),
        (4, "x"),
        (5, "a b c d e f . , ; : ! ?"),
        (6, "the the the the the"),
        (7, "der die und ist le les et est"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (T.detect_language, T.whitespace_token_count, T.quality_score):
        fast = {r["doc_id"]: r["v"] for r in df.select("doc_id", fn("text").alias("v")).collect()}
        slow = {r["doc_id"]: r["v"] for r in df.select("doc_id", fn(F.col("text")).alias("v")).collect()}
        assert fast == slow, fn.__name__
