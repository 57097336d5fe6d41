"""Corpus ingestion: normalize raw training-data dumps (JSONL, CSV,
directories of text files) into the canonical ``documents`` schema
``(doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG)``.

The reference has no ingestion layer beyond ``bulk_add_docs`` over an
in-process iterator (``src/svs/kb.py:1486-1524``); at 100 TB the dump
arrives as millions of files on an object store, so ingestion must be a
distributed scan, not a driver loop. Every reader here is a single
``spark.read`` with an EXPLICIT schema — schema inference would scan the
input twice, which at 100 TB doubles the most expensive stage of the
whole pipeline.

Doc-id policy: ids must be deterministic (reproducible across reruns and
cluster sizes — a retried ingest must not re-key the corpus, or every
downstream artifact invalidates). ``monotonically_increasing_id`` is
partition-layout-dependent, so ids are ``xxhash64(source, text)``
instead: stable, shuffle-free, and collision-checkable. Exact duplicate
texts within one source intentionally collapse to one id — dedup-at-
ingest; ``dedup_exact`` downstream handles cross-source copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

DOCUMENT_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]

_JSONL_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _finalize(df: DataFrame, source: str) -> DataFrame:
    """Project any (text, lang?) frame onto the documents schema."""
    if "lang" not in df.columns:
        df = df.withColumn("lang", F.lit(None).cast("string"))
    return (
        df.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            F.xxhash64(F.lit(source), F.col("text")).alias("doc_id"),
            "text",
            "lang",
            F.lit(source).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .dropDuplicates(["doc_id"])
    )


def ingest_jsonl(spark: SparkSession, path: str, source: str) -> DataFrame:
    """Read a JSONL dump ({"text": ..., "lang": ...} per line) into the
    documents schema. Explicit schema: no inference pass, malformed
    lines become NULL text rows and are dropped (PERMISSIVE mode), so
    one corrupt shard never kills a 100 TB ingest."""
    raw = spark.read.schema(_JSONL_SCHEMA).json(path)
    return _finalize(raw, source)


def ingest_csv(
    spark: SparkSession,
    path: str,
    source: str,
    text_col: str = "text",
    lang_col: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a CSV/TSV corpus. header=true by default; pass sep='\\t'
    etc. via options. Only the named columns are projected, so Spark's
    CSV reader prunes the rest at parse time."""
    opts = {"header": "true", **options}
    raw = spark.read.options(**opts).csv(path)
    cols = [F.col(text_col).alias("text")]
    if lang_col is not None:
        cols.append(F.col(lang_col).alias("lang"))
    return _finalize(raw.select(*cols), source)


def ingest_text_dir(spark: SparkSession, path: str, source: str) -> DataFrame:
    """Read a directory tree of plain-text files, one document per FILE
    (wholetext), lang unknown. File discovery and reads are distributed
    across executors by Spark's file index."""
    raw = spark.read.option("wholetext", "true").text(path)
    return _finalize(raw.withColumnRenamed("value", "text"), source)


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("source",),
) -> None:
    """Write a documents frame as a partitioned parquet corpus.

    Hive-style partition directories give free partition PRUNING for
    per-source / per-lang pipelines (the scan's PartitionFilters), and
    sorting within files by doc_id gives parquet min-max row-group
    skipping for point lookups. At 100 TB add a bucket count on doc_id
    for shuffle-free downstream joins."""
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(path)
    )
