"""Streaming decontamination + quality filtering — the continuous twins
of the batch training-data ops (``decontaminate_ngrams`` and
``quality_filter_funnel`` in query_defs).

Use case: documents stream in from a landing zone; before they are
admitted to a training corpus they must pass the same quality gates as
the batch pipeline AND be screened against a *static* benchmark/test-set
n-gram index so evaluation data never leaks into training.

Scale shape (100 TB/day):
- The n-gram screen is a stream-static LEFT SEMI join keyed on the
  64-bit xxhash of the shingle — Structured Streaming broadcasts or
  shuffle-joins the static index per micro-batch; no streaming state.
  The static side is the *test-set* shingle index (benchmark suites:
  thousands-to-millions of shingles), typically broadcast-sized; the
  unbounded training stream stays on the stream side.
- ``dropDuplicates`` on doc_id bounds per-batch flag output; its state
  is bounded by the optional watermark (pass an event-time column for
  continuous jobs; the availableNow drain in tests needs none).
- The quality gate is pure Column arithmetic — stateless, fuses into
  the scan stage of each micro-batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def stream_docs(spark, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (file source needs a
    directory; see ``stage_single_file_dir``)."""
    from svs_spark.streaming import stage_single_file_dir

    src = stage_single_file_dir(
        f"{sf_dir}/documents.parquet", "documents.parquet"
    )
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def ngram_hashes(text_col: str = "text", n: int = 5) -> F.Column:
    """Distinct xxhash64'd word n-gram shingles of ``text_col`` — the
    exact arithmetic of the batch ``decontaminate_ngrams`` query (which
    imports this same helper), so a static index built by the batch job
    screens the stream correctly. Documents shorter than ``n`` tokens
    yield an empty array (F.sequence(0, negative) would otherwise build
    a descending index range and element_at would read past the end)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    empty = F.array().cast("array<long>")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        " ",
                        *[F.element_at(toks, i + j + 1) for j in range(n)],
                    )
                ),
            )
        ),
    ).otherwise(empty)


def build_test_index(docs: DataFrame, text_col: str = "text",
                     n: int = 5) -> DataFrame:
    """Static contamination index: one row per distinct shingle hash of
    the protected (test/benchmark) corpus. Batch job; persist or write
    once, reuse across streams."""
    return (
        docs.filter(F.size(F.split(F.lower(F.col(text_col)), " ")) >= n)
        .select(F.explode(ngram_hashes(text_col, n)).alias("h"))
        .distinct()
    )


def contaminated_ids_stream(
    stream: DataFrame,
    test_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    watermark: Optional[tuple[str, str]] = None,
) -> DataFrame:
    """Streaming doc_ids that share ≥1 word n-gram with the static
    test index (append-mode safe: explode → stream-static left-semi
    join → stateful doc_id dedup).

    ``watermark=(event_time_col, delay)`` bounds the dedup state for
    continuous jobs: the event-time column is threaded through the
    explode/join and the dedup becomes ``dropDuplicatesWithinWatermark``
    (state evicted once the watermark passes, without needing the
    event-time column in the dedup key). Leave None for availableNow
    drains, where unbounded-state ``dropDuplicates`` is fine."""
    carry = [id_col] + ([watermark[0]] if watermark else [])
    exploded = stream.select(
        *carry, F.explode(ngram_hashes(text_col, n)).alias("h")
    )
    if watermark is not None:
        exploded = exploded.withWatermark(*watermark)
    hits = exploded.join(test_index, "h", "left_semi")
    if watermark is not None:
        return hits.dropDuplicatesWithinWatermark([id_col]).select(id_col)
    return hits.select(id_col).dropDuplicates([id_col])


def quality_gate_stream(
    stream: DataFrame,
    text_col: str = "text",
    min_chars: int = 50,
    min_tokens: int = 20,
    min_quality: float = 0.5,
    require_lang: bool = True,
) -> DataFrame:
    """Stateless quality gate: the streaming twin of the batch
    ``quality_filter_funnel`` stages (min length → min tokens →
    composite quality score → known lang), identical Column arithmetic,
    so a stream drained through this gate admits exactly the batch
    funnel's final-stage survivors. Stateless ⇒ fuses into each
    micro-batch's scan; no watermark or state store involved."""
    from svs_spark.functions import text as T

    c = F.col(text_col)
    pred = (
        (F.length(c) >= min_chars)
        & (T.whitespace_token_count(text_col) >= min_tokens)
        & (T.quality_score(text_col) >= min_quality)
    )
    if require_lang:
        pred = pred & F.col("lang").isNotNull()
    return stream.filter(pred)


def build_eval_containment_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Static index for the CONTAINMENT screen (the streaming twin of
    the registered ``decontaminate_fuzzy`` contract): returns
    ``(eval_index, eval_counts)`` where eval_index = one row per
    (trigram hash, protected doc id) and eval_counts = the FULL
    per-doc shingle count (the containment denominator). Batch job;
    persist once, reuse across streams. Benchmark suites are
    thousands-to-millions of shingles — broadcast-sized."""
    sh = docs.filter(
        F.size(F.split(F.lower(F.col(text_col)), " ")) >= 3
    ).select(
        F.col(id_col).alias("id_eval"),
        F.explode(ngram_hashes(text_col, n=3)).alias("h"),
    )
    counts = sh.groupBy("id_eval").agg(F.count("*").alias("c"))
    return sh, counts


def eval_containment_flags(
    batch: DataFrame,
    eval_index: DataFrame,
    eval_counts: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag (incoming doc, protected eval doc) pairs where the incoming
    TRAINING-candidate document covers ≥ ``threshold`` of the eval
    doc's trigram shingles — the asymmetric containment that a
    shared-shingle EXISTS screen (``contaminated_ids_stream``) cannot
    express and a Jaccard screen silently under-flags. Pure batch
    function: run it inside ``foreachBatch`` (each incoming document
    is one atomic row, so per-batch semantics are exact — no streaming
    state, no watermark).

    Scale shape: incoming shingles explode in the scan stage; the join
    keys on the 8-byte shingle hash against the benchmark-sized static
    index (stats-driven broadcast); the pair aggregate groups on
    (incoming id, eval id) — output bounded by true overlaps, and the
    denominator joins from the tiny static counts table."""
    inc = batch.filter(
        F.size(F.split(F.lower(F.col(text_col)), " ")) >= 3
    ).select(
        F.col(id_col).alias("id_train"),
        F.explode(ngram_hashes(text_col, n=3)).alias("h"),
    )
    return (
        inc.join(eval_index, "h")
        .groupBy("id_train", "id_eval")
        .agg(F.count("*").alias("n_shared"))
        .join(eval_counts, "id_eval")
        .withColumn(
            "eval_containment",
            F.round(F.col("n_shared").cast("double") / F.col("c"), 6),
        )
        .filter(F.col("eval_containment") >= threshold)
        .select("id_train", "id_eval", "n_shared", "eval_containment")
    )


def eval_containment_stream(
    stream: DataFrame,
    eval_index: DataFrame,
    eval_counts: DataFrame,
    sink_table: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch driver for :func:`eval_containment_flags`: each
    micro-batch of landing-zone documents is containment-screened
    against the static benchmark index and flagged pairs append to
    ``sink_table`` (an in-memory list-backed global temp view in this
    helper; production swaps the writer for kafka/delta/parquet).
    Returns the started query (caller awaits)."""
    spark = stream.sparkSession
    acc: list = []

    def sink(batch: DataFrame, _bid: int) -> None:
        rows = eval_containment_flags(
            batch, eval_index, eval_counts, threshold, id_col, text_col
        ).collect()
        acc.extend(rows)
        spark.createDataFrame(
            acc or [],
            "id_train long, id_eval long, n_shared long,"
            " eval_containment double",
        ).createOrReplaceTempView(sink_table)

    return (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
