"""Hot-bucket candidate cap for the banded SimHash / MinHash joins.

The adversarial case: a mega-cluster of (near-)identical documents puts
B rows in one (segment|band, value) bucket and the candidate join emits
O(B²) pairs — at 1M docs the 48-bit SimHash config spent 160 s mostly
materializing one cluster's pairs (CORPUS_BENCH_r03). The cap excludes
over-cap buckets from candidate generation, keeps every pair that
agrees on at least one COLD bucket (emitted exactly once, at its first
cold agreeing segment/band), and reports the skipped mass — no silent
caps.
"""

from __future__ import annotations

import pytest

from svs_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

def _text(seed: int, n: int = 30) -> str:
    # multiplicative mixing over a LARGE token space: simhash majority
    # votes concentrate if the vocabulary is small (a 64-token vocab
    # put every doc in the same segment buckets), and linear seed*a +
    # i*b over a small modulus collapses to gcd-many variants
    return " ".join(
        f"tok{((seed + 1) * 2654435761 + i * 40503 + seed * i * 97) % 100003:06d}"
        for i in range(n)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # mega-cluster: 60 identical docs (every banded bucket it occupies
    # goes over any cap < 60)
    for i in range(60):
        rows.append((i, _text(3)))
    # planted isolated duplicate pairs (identical text — always within
    # any LSH recall, so a miss can only be the cap's fault)
    for k, base in enumerate((101, 202, 303)):
        t = _text(base + 10)
        rows.append((1000 + 2 * k, t))
        rows.append((1001 + 2 * k, t))
    # background singletons
    for i in range(40):
        rows.append((2000 + i, _text(500 + i * 17)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairset(df):
    rows = df.select("id_a", "id_b").collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    return set(pairs)


def test_simhash_cap_none_vs_huge_identical(corpus):
    exact = _pairset(simhash_pairs(corpus, max_hamming=4, bits=48))
    capped = _pairset(
        simhash_pairs(corpus, max_hamming=4, bits=48, bucket_cap=10**6)
    )
    assert exact == capped


def test_simhash_cap_drops_cluster_keeps_planted(corpus):
    report: dict = {}
    got = _pairset(
        simhash_pairs(
            corpus, max_hamming=4, bits=48, bucket_cap=50,
            skip_report=report,
        )
    )
    # the planted isolated near-dups survive (their buckets are cold)
    for k in range(3):
        assert (1000 + 2 * k, 1001 + 2 * k) in got, (k, sorted(got)[:10])
    # the 60-doc cluster's C(60,2) pairs are gone
    cluster = {(a, b) for a in range(60) for b in range(a + 1, 60)}
    assert not (got & cluster)
    # and the skip is reported, not silent
    assert report["skipped_buckets"] >= 5  # all 5 segments of the cluster
    assert report["skipped_rows"] >= 60 * 5


def test_minhash_cap_none_vs_huge_identical(corpus):
    kw = dict(num_hashes=16, bands=4, jaccard_threshold=0.5)
    exact = _pairset(minhash_lsh_pairs(corpus, **kw))
    capped = _pairset(minhash_lsh_pairs(corpus, bucket_cap=10**6, **kw))
    assert exact == capped


def test_minhash_cap_drops_cluster_keeps_planted(corpus):
    report: dict = {}
    got = _pairset(
        minhash_lsh_pairs(
            corpus, num_hashes=16, bands=4, jaccard_threshold=0.5,
            bucket_cap=50, skip_report=report,
        )
    )
    for k in range(3):
        assert (1000 + 2 * k, 1001 + 2 * k) in got
    cluster = {(a, b) for a in range(60) for b in range(a + 1, 60)}
    assert not (got & cluster)
    assert report["skipped_buckets"] >= 4  # all 4 bands of the cluster
    assert report["skipped_rows"] >= 60 * 4


# ---------------------------------------------------------------------------
# Stop-phrase cap for the chunk-boundary seam join (round-4 verdict,
# What's wrong #5): same discipline, single join key instead of bands.
# ---------------------------------------------------------------------------


def _boundary_pairset(df):
    rows = df.select("id_tail", "id_head").collect()
    pairs = [(r.id_tail, r.id_head) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    return set(pairs)


@pytest.fixture(scope="module")
def boundary_corpus(spark):
    from pyspark.sql import functions as F  # noqa: F401

    rows = []
    # stop-phrase spike: 40 docs END with the phrase, 40 docs START
    # with it → 1600 seam pairs from pure boilerplate
    stop = "click here now"
    for i in range(40):
        rows.append((i, f"{_text(i)} {stop}"))
        rows.append((100 + i, f"{stop} {_text(900 + i)}"))
    # planted genuine seam: unique boundary phrase
    seam = "zq1 zq2 zq3"
    rows.append((500, f"{_text(777)} {seam}"))
    rows.append((501, f"{seam} {_text(778)}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boundary_cap_none_vs_huge_identical(boundary_corpus):
    from svs_spark.operators.dedup import boundary_overlap_pairs

    exact = _boundary_pairset(boundary_overlap_pairs(boundary_corpus))
    capped = _boundary_pairset(
        boundary_overlap_pairs(boundary_corpus, phrase_cap=10**6)
    )
    assert exact == capped
    assert (500, 501) in exact
    # the spike really is in the uncapped set
    assert (0, 100) in exact and len(exact) >= 1600


def test_boundary_cap_drops_stop_phrase_keeps_planted(boundary_corpus):
    from svs_spark.operators.dedup import boundary_overlap_pairs

    report: dict = {}
    got = _boundary_pairset(
        boundary_overlap_pairs(
            boundary_corpus, phrase_cap=50, skip_report=report
        )
    )
    assert got == {(500, 501)}
    assert report["skipped_phrases"] == 1
    assert report["skipped_rows"] == 80  # 40 tails + 40 heads
