"""isotonic_calibration: the registered minimax closed form must equal
the classic stack-based pool-adjacent-violators fit (weighted, ties
merged) — on the real corpus and on planted corpora engineered to force
specific poolings — and the output must be monotone non-decreasing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def registry():
    from svs_spark.queries import queries

    return queries()


def pav_fit(n: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Weighted PAV over score-ordered bins: pools = (weight, pos-sum)
    stack, merge while the previous pool's mean EXCEEDS the current's
    (non-decreasing fit). Exact integer cross-multiplication — no
    float compare inside the pooling."""
    pools: list[list[int]] = []  # [weight, possum, span]
    for wi, pi in zip(n.tolist(), p.tolist()):
        pools.append([wi, pi, 1])
        while (
            len(pools) > 1
            and pools[-2][1] * pools[-1][0] > pools[-1][1] * pools[-2][0]
        ):
            w2, s2, c2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
            pools[-1][2] += c2
    out = []
    for w, s, c in pools:
        out.extend([s / w] * c)
    return np.asarray(out)


def _bins_pd(docs: pd.DataFrame) -> pd.DataFrame:
    s = docs.n_chars.to_numpy(dtype=np.int64)
    y = (docs.lang == "zh").to_numpy(dtype=np.int64)
    b = np.minimum(9, s * 10 // (s.max() + 1))
    return (
        pd.DataFrame({"bin": b, "y": y})
        .groupby("bin")
        .agg(n=("y", "size"), p=("y", "sum"))
        .reset_index()
        .sort_values("bin")
    )


def test_isotonic_matches_stack_pav_on_corpus(spark, registry):
    out = (
        registry["isotonic_calibration"](spark, SF_DIR)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    bins = _bins_pd(pd.read_parquet(f"{SF_DIR}/documents.parquet"))
    want = pav_fit(bins.n.to_numpy(), bins.p.to_numpy())
    assert out.bin.tolist() == bins.bin.tolist()
    assert out.n_docs.tolist() == bins.n.tolist()
    assert out.n_pos.tolist() == bins.p.tolist()
    assert np.allclose(out.calibrated.to_numpy(), np.round(want, 6))
    # monotone non-decreasing — the defining isotonic property
    cal = out.calibrated.to_numpy()
    assert (np.diff(cal) >= -1e-12).all()
    # the corpus pair is engineered to be NON-monotone in the raw
    # rates, so the fit must actually pool somewhere (a gate where
    # calibrated == raw everywhere would be plumbing-only)
    assert (out.calibrated.to_numpy() != out.raw_rate.to_numpy()).any()


def test_isotonic_planted_pooling(spark, registry, tmp_path):
    """Rates [0, 1, 0] across three occupied bins: PAV must pool the
    last two to 0.5 and leave the first at 0 (the textbook
    violation-merge), with empty bins simply absent."""
    rows = []
    # maxs = 99 -> bin = n_chars // 10
    for i, (nc, lang) in enumerate(
        [(5, "en"), (6, "en"),      # bin 0: rate 0
         (55, "zh"), (56, "zh"),    # bin 5: rate 1
         (95, "en"), (99, "en")]    # bin 9: rate 0
    ):
        rows.append((i, "x " * nc, lang, "s0", nc))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        int(r.bin): r
        for r in registry["isotonic_calibration"](spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [0, 5, 9]
    assert out[0].calibrated == 0.0
    assert out[5].calibrated == 0.5 and out[5].raw_rate == 1.0
    assert out[9].calibrated == 0.5 and out[9].raw_rate == 0.0
    # cross-check the planted case against the stack PAV too
    want = pav_fit(np.array([2, 2, 2]), np.array([0, 2, 0]))
    assert np.allclose([out[0].calibrated, out[5].calibrated,
                        out[9].calibrated], want)


def test_isotonic_already_monotone_is_identity(spark, registry, tmp_path):
    """Monotone raw rates: PAV must change nothing."""
    rows = []
    i = 0
    for nc, n_docs, n_zh in [(5, 4, 0), (55, 4, 2), (95, 4, 4)]:
        for j in range(n_docs):
            rows.append(
                (i, "x", "zh" if j < n_zh else "en", "s0", nc)
            )
            i += 1
    # ensure maxs = 99 so bins stay at nc // 10
    rows.append((i, "x", "en", "s0", 99))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = registry["isotonic_calibration"](spark, str(tmp_path)).collect()
    for r in out:
        assert r.calibrated == r.raw_rate, r
