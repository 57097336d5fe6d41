"""BPE trainer (operators/bpe.py) vs an independent pure-Python twin."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from svs_spark.operators import bpe as B


# --- independent reference implementation (Sennrich alg. 1) ---------------

def ref_train(word_counts, n_merges, min_count=2):
    vocab = {tuple(list(w) + [B.END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    + ["lowest"] * 4 + ["new"] * 2
)


@pytest.fixture(scope="module")
def words_df(spark):
    rows = [(w, 1) for w in CORPUS]
    df = spark.createDataFrame(rows, ["word", "one"])
    return df.groupBy("word").agg(F.sum("one").alias("cnt"))


class TestBpeTrain:
    def test_merges_match_reference(self, words_df):
        merges, _ = B.bpe_train(words_df, n_merges=12)
        want, _ = ref_train(Counter(CORPUS), 12)
        assert merges == want
        assert len(merges) >= 6  # the corpus supports real merges

    def test_final_vocab_matches_reference(self, words_df):
        merges, vocab = B.bpe_train(words_df, n_merges=12)
        got = {
            tuple(r["sym"]): r["cnt"]
            for r in vocab.collect()
        }
        _, want = ref_train(Counter(CORPUS), 12)
        assert got == want

    def test_partitioning_invariance(self, words_df):
        m1, _ = B.bpe_train(words_df.repartition(1), n_merges=8)
        m7, _ = B.bpe_train(words_df.repartition(7), n_merges=8)
        assert m1 == m7

    def test_min_count_stops_early(self, words_df):
        merges, _ = B.bpe_train(words_df, n_merges=500, min_count=3)
        want, _ = ref_train(Counter(CORPUS), 500, min_count=3)
        assert merges == want
        assert len(merges) < 500

    def test_overlap_counting(self, spark):
        # 'aaaa' -> pairs (a,a) x3; one merge yields [aa, aa, </w>]
        df = spark.createDataFrame([("aaaa", 10)], ["word", "cnt"])
        merges, vocab = B.bpe_train(df, n_merges=1, min_count=1)
        assert merges == [("a", "a")]
        sym = vocab.collect()[0]["sym"]
        assert sym == ["aa", "aa", B.END]


class TestEncode:
    def test_encode_follows_merge_order(self, words_df):
        merges, _ = B.bpe_train(words_df, n_merges=12)
        got = B.bpe_encode("lowest", merges)
        assert "".join(got) == "lowest" + B.END
        # encoding a training word reproduces its final vocab symbols
        _, vocab = B.bpe_train(words_df, n_merges=12)
        final = {
            "".join(r["sym"]): list(r["sym"]) for r in vocab.collect()
        }
        assert got == final["lowest" + B.END]

    def test_encode_df_roundtrip(self, spark, words_df):
        merges, _ = B.bpe_train(words_df, n_merges=12)
        docs = spark.createDataFrame(
            [(1, "newest lower"), (2, "low widest")], ["id", "text"]
        )
        out = {r["id"]: r["tokens"] for r in B.encode_df(docs, "text", merges).collect()}
        assert out[1] == B.bpe_encode("newest", merges) + B.bpe_encode("lower", merges)
        assert out[2] == B.bpe_encode("low", merges) + B.bpe_encode("widest", merges)

    def test_words_from_corpus(self, spark):
        docs = spark.createDataFrame(
            [(1, "A a  b"), (2, "b c")], ["id", "text"]
        )
        got = {
            r["word"]: r["cnt"]
            for r in B.words_from_corpus(docs, "text").collect()
        }
        assert got == {"a": 2, "b": 2, "c": 1}
