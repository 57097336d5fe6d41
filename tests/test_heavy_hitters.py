"""Misra-Gries frequent items: batch guarantee gates and the streaming
twin's agreement with exact prefix counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

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


# ---------------------------------------------------------------------------
# Time-decayed (trending) heavy hitters
# ---------------------------------------------------------------------------


def _run_decayed(spark, tmp_path, frames, half_life=10.0, capacity=64,
                 one_per_trigger=False):
    from svs_spark.streaming.heavy_hitters import decayed_heavy_hitters_stream
    from svs_spark.streaming.sessions import run_to_memory

    src = tmp_path / "decay"
    src.mkdir(exist_ok=True)
    for i, f in enumerate(frames):
        f.to_parquet(src / f"part-{i}.parquet")
    schema = spark.read.parquet(str(src)).schema
    reader = spark.readStream.schema(schema)
    if one_per_trigger:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(str(src))
    name = f"decay_out_{len(frames)}_{one_per_trigger}"
    run_to_memory(
        decayed_heavy_hitters_stream(
            stream, "grp", "item", "ts", half_life, capacity
        ),
        name, output_mode="update",
    )
    rows = spark.table(name).collect()
    best = {}
    for r in rows:
        if r["item"] not in best or r["w_total"] > best[r["item"]][1]:
            best[r["item"]] = (r["weight"], r["w_total"])
    return best


def test_decayed_single_batch_matches_numpy(spark, tmp_path):
    rng = np.random.default_rng(8)
    n = 5000
    pdf = pd.DataFrame({
        "grp": "g",
        "item": rng.choice([f"t{i}" for i in range(20)], size=n),
        "ts": rng.uniform(0, 50, size=n),
    })
    got = _run_decayed(spark, tmp_path, [pdf], half_life=10.0, capacity=64)
    T = pdf["ts"].max()
    w = 2.0 ** (-(T - pdf["ts"]) / 10.0)
    want = pd.Series(w.values, index=pdf["item"]).groupby(level=0).sum()
    # capacity 64 > 20 distinct items: NO reduction — weights exact
    assert set(got) == set(want.index)
    for item, (weight, _) in got.items():
        assert weight == pytest.approx(want[item], rel=1e-9)


def test_decay_flips_raw_count_ranking(spark, tmp_path):
    """1000 early 'old' occurrences vs 400 recent 'hot' ones: raw counts
    say old wins, the decayed monitor must rank hot first."""
    early = pd.DataFrame({"grp": "g", "item": "old", "ts": [0.0] * 1000})
    late = pd.DataFrame({"grp": "g", "item": "hot", "ts": [100.0] * 400})
    got = _run_decayed(
        spark, tmp_path, [pd.concat([early, late], ignore_index=True)],
        half_life=10.0,
    )
    # 'hot' dominates at its closed-form decayed weight; 'old' has
    # decayed to 1000·2^-10 ≈ 0.98 — BELOW the w_total/capacity
    # emission threshold, so the monitor drops it entirely (the raw
    # count ranking would have put it first at 1000 vs 400)
    assert got["hot"][0] == pytest.approx(400.0)
    assert "old" not in got or got["old"][0] < got["hot"][0]


def test_decayed_two_trigger_state_path(spark, tmp_path):
    """Split the stream at t=50 and drain one file per trigger: the
    carried state (decayed by the reference advance) must equal the
    single-pass closed form."""
    rng = np.random.default_rng(5)
    f1 = pd.DataFrame({
        "grp": "g",
        "item": rng.choice(["a", "b", "c"], size=3000),
        "ts": rng.uniform(0, 50, size=3000),
    })
    f2 = pd.DataFrame({
        "grp": "g",
        "item": rng.choice(["b", "c", "d"], size=3000),
        "ts": rng.uniform(50, 100, size=3000),
    })
    got = _run_decayed(
        spark, tmp_path, [f1, f2], half_life=10.0, one_per_trigger=True
    )
    allpdf = pd.concat([f1, f2], ignore_index=True)
    T = allpdf["ts"].max()
    w = 2.0 ** (-(T - allpdf["ts"]) / 10.0)
    want = pd.Series(w.values, index=allpdf["item"]).groupby(level=0).sum()
    for item in want.index:
        thr = want.sum() / 64
        if want[item] > thr * 1.05:
            assert item in got, item
            assert got[item][0] == pytest.approx(want[item], rel=1e-9)


def test_frequent_items_counts_cancelled_partitions(spark):
    """A partition whose MG summary cancels completely (all counters
    stripped by the reduction) must still contribute its row count to
    n_total — the NULL-item sentinel row. Before the fix n_total
    undercounted and the est_count > n_total/capacity threshold went
    too permissive (ADVICE r3)."""
    heavy = spark.createDataFrame([("x",)] * 10, "item string").coalesce(1)
    # 3 distinct singletons with capacity=2: dec strips every counter
    cancel = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "item string"
    ).coalesce(1)
    df = heavy.union(cancel)  # union preserves the 2 input partitions
    rows = frequent_items(df, "item", capacity=2).collect()
    assert rows, "heavy item must survive"
    assert all(r.n_total == 13 for r in rows), rows
    items = {r.item: r.est_count for r in rows}
    assert "x" in items and items["x"] >= 10 - 13 // 2
