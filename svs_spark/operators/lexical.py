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
