"""Distributed BPE tokenizer training (Sennrich et al. 2016).

`bpe_merge_candidates` (query_defs) is one trainer iteration; this
module is the full loop — the thing you actually run to learn a merge
table from a 100 TB corpus. The key scale observation: after the first
word-count aggregation, training never touches the corpus again. The
working set is the WORD VOCABULARY (Heaps-sublinear; tens of millions
of rows at web scale, each a short symbol array + a count), so every
iteration is one small aggregate over the vocab table:

  1. corpus -> (word, count)            one exchange, map-side combine
  2. repeat n_merges times:
       pair counts = explode adjacent symbol pairs weighted by word
                     count (pure codegen transform/explode)
       argmax     -> ONE collected row (count DESC, pair ASC tiebreak
                     so training is deterministic)
       apply      -> left-to-right non-overlapping replacement inside
                     each word's symbol array (Arrow-batched pandas
                     fold; vocab-cardinality, never corpus)
       localCheckpoint every few rounds to cut the growing lineage
       (same discipline as clustering.kmeans_lloyd)

Pair counting includes overlapping occurrences ('aaa' yields (a,a)
twice) and the merge applies left-to-right non-overlapping — byte-for-
byte the reference algorithm from the paper, which the pure-Python
twin in tests/test_bpe.py replicates independently.

Words carry the classic '</w>' end-of-word marker as a final symbol so
word-final merges stay distinct from word-internal ones.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

END = "</w>"

_PAIRS_EXPR = (
    "transform(sequence(0, size(sym) - 2),"
    " i -> struct(sym[i] AS a, sym[i + 1] AS b))"
)


def words_from_corpus(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) vocabulary: whitespace words, lowercased — the one
    corpus-wide exchange in the whole training run."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def init_symbols(words: DataFrame) -> DataFrame:
    """(sym array<string>, cnt): characters plus the '</w>' marker."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("sym"),
        "cnt",
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies (overlaps included), weighted by word
    count — one codegen explode + one aggregate over the vocabulary."""
    return (
        vocab.filter(F.size("sym") >= 2)
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def _apply_merge(a: str, b: str):
    merged = a + b

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for sym in pdf["sym"]:
                s = list(sym)
                res = []
                i = 0
                n = len(s)
                while i < n:
                    if i + 1 < n and s[i] == a and s[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"sym": out, "cnt": pdf["cnt"]})

    return fold


def bpe_train(
    words: DataFrame,
    n_merges: int,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` merges from a (word, cnt) vocabulary.

    Returns (merge list in learned order, final symbolized vocab).
    Stops early when the best remaining pair falls under ``min_count``
    (merging singletons memorizes the corpus instead of compressing
    it). Deterministic: argmax ties break on (a ASC, b ASC).
    """
    vocab = init_symbols(words)
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.mapInPandas(
            _apply_merge(a, b), "sym array<string>, cnt long"
        )
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge table (driver-side twin
    used by tests and by callers embedding the table in a UDF)."""
    s = list(word) + [END]
    for a, b in merges:
        res = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(s[i])
                i += 1
        s = res
    return s


def encode_df(df: DataFrame, text_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Append ``tokens array<string>``: BPE-encode every whitespace
    word of ``text_col``. The merge table ships to executors in the
    closure (it is n_merges rows — broadcast-sized by construction)."""
    mg = list(merges)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in str(text).lower().split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = bpe_encode(w, mg)
                    out.extend(cache[w])
                toks.append(out)
            pdf = pdf.copy()
            pdf["tokens"] = toks
            yield pdf

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(fold, f"{fields}, tokens array<string>")
