"""Misra-Gries frequent items: batch guarantee gates and the streaming
twin's agreement with exact prefix counts."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from svs_spark.operators.sketch import _mg_reduce, frequent_items
from svs_spark.queries import load
from tests.conftest import SF_DIR


def _zipf_items(n: int, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # zipf-ish: a few hot items over a long uniform tail
    ranks = rng.zipf(1.5, size=n)
    return pd.DataFrame({"item": [f"t{r}" for r in np.minimum(ranks, 5000)]})


def test_frequent_items_guarantees(spark):
    pdf = _zipf_items(200_000)
    df = spark.createDataFrame(pdf).repartition(16)
    cap = 64
    got = {
        r["item"]: (r["est_count"], r["n_total"])
        for r in frequent_items(df, "item", capacity=cap).collect()
    }
    true = pdf["item"].value_counts()
    n = len(pdf)
    assert all(nt == n for _, nt in got.values())
    # presence: every item with true count > 2n/cap must be in the output
    for item, c in true.items():
        if c > 2 * n / cap:
            assert item in got, (item, c)
    # estimate bound: undercount only, by at most n/cap
    for item, (est, _) in got.items():
        t = int(true.get(item, 0))
        assert est <= t, (item, est, t)
        assert t - est <= n / cap, (item, est, t)
    # output size bound
    assert len(got) <= cap


def test_frequent_items_on_corpus_tokens(spark):
    """Stopword-dominated token stream from the documents table: the MG
    survivors must be exactly the tokens whose true count clears the
    output threshold modulo the error band (sanity on real testdata)."""
    docs = load(spark, SF_DIR, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("item")
    )
    cap = 32
    out = frequent_items(toks, "item", capacity=cap).collect()
    assert out
    true = {
        r["item"]: r["c"]
        for r in toks.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    n = sum(true.values())
    must_have = {t for t, c in true.items() if c > 2 * n / cap}
    got = {r["item"] for r in out}
    assert must_have <= got
    for r in out:
        assert r["est_count"] <= true[r["item"]]
        assert true[r["item"]] - r["est_count"] <= n / cap


def test_streaming_twin_matches_mg_on_prefix(spark, tmp_path):
    """Drain the full stream in one trigger: the stream state equals a
    single-pass MG over the same rows (recomputed here in pandas), and
    the emitted set obeys the presence guarantee vs exact counts."""
    from svs_spark.streaming.heavy_hitters import heavy_hitters_stream
    from svs_spark.streaming.sessions import run_to_memory

    pdf = _zipf_items(50_000, seed=9)
    pdf["grp"] = "g1"
    src = tmp_path / "hh"
    src.mkdir()
    pdf.to_parquet(src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    cap = 64
    run_to_memory(
        heavy_hitters_stream(stream, "grp", "item", capacity=cap),
        "hh_out",
        output_mode="update",
    )
    rows = spark.table("hh_out").collect()
    assert rows
    got = {r["item"]: r["est_count"] for r in rows}
    n = len(pdf)
    assert all(r["n_seen"] == n for r in rows)
    true = pdf["item"].value_counts()
    for item, c in true.items():
        if c > 2 * n / cap:
            assert item in got
    for item, est in got.items():
        t = int(true.get(item, 0))
        assert est <= t and t - est <= n / cap


def test_mg_reduce_bound():
    """Pure-kernel property: after reduction no counter exceeds its true
    count and the total decrement is bounded by n/ (capacity+1) per
    reduction step (textbook MG invariant)."""
    counts = {f"i{i}": i + 1 for i in range(100)}
    red = _mg_reduce(dict(counts), 10)
    assert len(red) <= 10
    for k, v in red.items():
        assert 0 < v <= counts[k]


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_count_min_bounds(spark):
    """CM never undercounts; overcount stays within 3·n/width for the
    probed items (Markov bound gives n·e/width per row; min over 4
    independent rows makes 3n/w conservative)."""
    from svs_spark.operators.sketch import count_min

    pdf = _zipf_items(100_000, seed=21)
    df = spark.createDataFrame(pdf).repartition(12)
    cm = count_min(df, "item", width=2048, depth=4)
    true = pdf["item"].value_counts()
    assert cm.n == len(pdf)
    probe = list(true.index[:50]) + [f"absent{i}" for i in range(50)]
    for item in probe:
        t = int(true.get(item, 0))
        est = cm.estimate(item)
        assert est >= t, (item, est, t)
        assert est - t <= 3 * cm.n / cm.width, (item, est, t)


def test_count_min_merge_linearity(spark):
    """The distributed build must equal a single-pass local build —
    the linearity property that makes partition partials mergeable by
    plain addition."""
    import numpy as np

    from svs_spark.operators.sketch import (
        CountMin, _cm_positions, count_min,
    )

    pdf = _zipf_items(20_000, seed=4)
    df = spark.createDataFrame(pdf).repartition(8)
    cm = count_min(df, "item", width=512, depth=4)
    local = np.zeros((4, 512), dtype=np.int64)
    for item, c in pdf["item"].value_counts().items():
        for row, p in enumerate(_cm_positions(str(item), 512, 4)):
            local[row, p] += int(c)
    assert (cm.table == local).all()
