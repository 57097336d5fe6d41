"""Lexical retrieval / sparse-vector similarity kernels.

Shared by the registered queries (query_defs: bm25_topk,
tfidf_cosine_pairs) and the 1M-doc scale harness
(tools/corpus_bench.py). Both operators follow the inverted-index
discipline of operators/dedup.py: per-term posting lists are the only
join surface, terms cross exchanges as 8-byte xxhash64 keys, and
hot-term fan-out is capped the same way LSH buckets are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) over lowercase whitespace tokens."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 (Robertson-Sparck Jones idf with the +1 floor) of a
    fixed term set against every document: (doc_id, score).

    Scale shape: doc length comes from size(split(...)) in the scan
    stage; only rows containing a query term survive the
    generate+filter, the per-term df table and the 1-row corpus stats
    broadcast, and the only exchange keys on doc_id for the final
    per-doc sum.
    """
    tk = F.split(F.lower(F.col(text_col)), " ")
    t = docs.select(
        "doc_id", F.size(tk).alias("dl"), F.explode(tk).alias("term")
    ).filter(F.col("term").isin(*terms))
    stats = docs.agg(
        F.count("*").cast("double").alias("nd"),
        F.avg(F.size(tk)).alias("avgdl"),
    )
    q = t.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    tf = t.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    idf = F.log(
        (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    return (
        tf.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                idf
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )


def tfidf_weights(
    docs: DataFrame,
    text_col: str = "text",
    rel_df_cap: float = 0.4,
    abs_df_cap: int = 1000,
) -> DataFrame:
    """(doc_id, tk, dfc, wt): TF-IDF weights over the df-capped
    vocabulary — terms with df > least(rel_df_cap * N, abs_df_cap) are
    dropped entirely (they are stopwords for similarity purposes AND
    the quadratic risk of the pair join: per-term fan-out is bounded
    by abs_df_cap^2 at any corpus size, the hot-bucket discipline).
    ``tk`` is the xxhash64 of the term (8-byte exchange keys)."""
    t = term_frequencies(docs, text_col)
    nn = docs.agg(F.count("*").cast("double").alias("n"))
    dfq = t.groupBy("term").agg(F.count("*").alias("dfc"))
    vocab = dfq.crossJoin(F.broadcast(nn)).filter(
        F.col("dfc")
        <= F.least(
            F.ceil(rel_df_cap * F.col("n")).cast("long"),
            F.lit(abs_df_cap),
        )
    )
    return (
        t.join(vocab.select("term", "dfc"), "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            F.xxhash64("term").alias("tk"),
            "dfc",
            (F.col("tf") * F.log(F.col("n") / F.col("dfc"))).alias("wt"),
        )
    )


def tfidf_cosine_pairs(
    w: DataFrame,
    threshold: float = 0.3,
    limit: int | None = 2000,
) -> DataFrame:
    """Document pairs with TF-IDF cosine >= threshold from a
    tfidf_weights table: (id_a, id_b, cos_sim), cos rounded to 6 and
    the cut total-ordered (cos DESC, id_a, id_b) so an optional top-N
    limit is deterministic.

    The caller is responsible for caching ``w`` when it is rebuilt per
    reference (3-way fan-out: norms + both join sides)."""
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nr")
    )
    wj = w.filter(F.col("dfc") >= 2)
    a = wj.select(F.col("doc_id").alias("id_a"), "tk", F.col("wt").alias("wa"))
    b = wj.select(F.col("doc_id").alias("id_b"), "tk", F.col("wt").alias("wb"))
    dots = (
        a.join(b, "tk")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nr").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nr").alias("nb"))
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
    )
    return out.limit(limit) if limit is not None else out


# ---------------------------------------------------------------------------
# Rule-based quality gating (Gopher-style; Rae et al. 2021 §A1.1 subset)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rule_flags(text_col: str = "text") -> list:
    """The five deterministic Gopher-style rule-violation flags as pure
    Column expressions (scan-stage codegen, stream-safe — no state, no
    Python): f_words (word count outside [5, 10000]), f_wlen (mean word
    length outside [3, 10]), f_sym (non-alphanumeric ratio > 0.1),
    f_alpha (< 80% of words contain a letter), f_stop (< 2 of the 8
    Gopher stopwords present). Shared by the registered batch query
    (query_defs.gopher_quality_flags, DuckDB-oracle-gated) and the
    streaming ingest monitor (streaming.ingest.quality_flag_stream);
    callers must pre-filter length(text) > 0."""
    c = F.col(text_col)
    words = F.split(c, " ")
    n_words = F.size(words)
    mean_wlen = F.length(F.regexp_replace(c, " ", "")).cast("double") / n_words
    sym_ratio = (
        F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", "")).cast("double")
        / F.length(c)
    )
    alpha_frac = (
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words
    )
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = F.when(padded.contains(f" {w} "), F.lit(1)).otherwise(F.lit(0))
        stop_hits = hit if stop_hits is None else stop_hits + hit
    return [
        F.when((n_words < 5) | (n_words > 10000), 1).otherwise(0).alias("f_words"),
        F.when((mean_wlen < 3) | (mean_wlen > 10), 1).otherwise(0).alias("f_wlen"),
        F.when(sym_ratio > 0.1, 1).otherwise(0).alias("f_sym"),
        F.when(alpha_frac < 0.8, 1).otherwise(0).alias("f_alpha"),
        F.when(stop_hits < 2, 1).otherwise(0).alias("f_stop"),
    ]


def gopher_flag_aggs() -> list:
    """The aggregate list pairing ``gopher_rule_flags`` — per-group doc
    count, per-rule failure counts, and the all-rules-pass count."""
    all_pass = (
        F.col("f_words") + F.col("f_wlen") + F.col("f_sym")
        + F.col("f_alpha") + F.col("f_stop")
    ) == 0
    return [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("f_words").cast("long").alias("fail_word_count"),
        F.sum("f_wlen").cast("long").alias("fail_mean_word_len"),
        F.sum("f_sym").cast("long").alias("fail_symbol_ratio"),
        F.sum("f_alpha").cast("long").alias("fail_alpha_frac"),
        F.sum("f_stop").cast("long").alias("fail_stopwords"),
        F.sum(F.when(all_pass, 1).otherwise(0)).cast("long").alias("n_pass"),
    ]
