"""Streaming anomaly detection over the events stream.

``zscore_outlier_stream`` is a custom stateful operator
(applyInPandasWithState): per event_type it maintains exact running
moments (count, mean, M2) via Chan's parallel Welford merge — O(1)
state per key, no sample buffer — and flags each micro-batch's rows
whose |value - mean| exceeds ``k`` cumulative standard deviations.

Relationship to the batch twin (query_defs.q_event_outliers_mad): the
batch operator uses median/MAD — robust, but quantiles need either a
sort or a sketch. Two streaming forms are provided: z-scores over
exact O(1) moments (this function), and ``robust_outlier_stream`` —
running median/MAD via P² quantile estimators in state (still O(1)
per key) for value distributions heavy-tailed enough that the mean
itself is dragged.

Semantics: rows are screened against the stats INCLUDING their own
micro-batch (merge first, then flag), so a single availableNow drain
over a static file equals the batch global z-score screen — that
equivalence is the parity test. Across multiple triggers the screen
is cumulative: later batches are judged against everything seen so
far.

Scale shape: state is 3 doubles per event_type; the only exchange is
the groupBy(event_type) hash partitioning; flagged rows stream out
append-style. At 100 TB/day this is the canonical metrics-firehose
screen (state size independent of volume).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import col
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("mean", DoubleType()),
    StructField("m2", DoubleType()),
])

_OUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("value", DoubleType()),
    StructField("z", DoubleType()),
])


def zscore_outlier_stream(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Flag per-event_type z-score outliers against exact cumulative
    moments. Input needs (event_type, event_id, user_id, value)."""

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (event_type,) = key
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        frames = [p for p in pdfs if len(p)]  # empty frames poison
        # concat dtype inference (pandas FutureWarning -> all-NA cols)
        batch = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {c: pd.Series([], dtype="float64") for c in
                 ("event_id", "user_id", "value")}
            )
        )
        v = batch["value"].to_numpy(dtype=np.float64)
        nb = len(v)
        if nb:
            mb = float(v.mean())
            m2b = float(((v - mb) ** 2).sum())
            delta = mb - mean
            nt = n + nb
            mean = mean + delta * nb / nt
            m2 = m2 + m2b + delta * delta * n * nb / nt
            n = nt
            state.update((n, mean, m2))
        std = (m2 / n) ** 0.5 if n > 1 else 0.0
        if nb and std > 0.0:
            z = (v - mean) / std
            mask = abs(z) > k
            out = batch.loc[mask, ["event_id", "user_id", "value"]]
            yield pd.DataFrame(
                {
                    "event_type": event_type,
                    "event_id": out["event_id"].to_numpy(),
                    "user_id": out["user_id"].to_numpy(),
                    "value": out["value"].to_numpy(),
                    "z": z[mask].round(6),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "value": pd.Series([], dtype="float64"),
                    "z": pd.Series([], dtype="float64"),
                }
            )

    return (
        events.select("event_type", "event_id", "user_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_zscore_outliers(events: DataFrame, k: float = 3.0) -> DataFrame:
    """The batch twin: same flag rule over the full table's moments
    (population std), for parity tests and backfills."""
    from pyspark.sql import functions as F

    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mean"),
        F.stddev_pop("value").alias("std"),
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(
            (col("std") > 0)
            & (F.abs((col("value") - col("mean")) / col("std")) > k)
        )
        .select(
            "event_type",
            "event_id",
            "user_id",
            "value",
            F.round((col("value") - col("mean")) / col("std"), 6).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Robust variant: P² (Jain & Chlamtac 1985) running quantile estimators in
# state — O(1) per-key state like the moment screen, but tracking the
# MEDIAN and the median absolute deviation instead of mean/std, so a
# heavy-tailed value distribution cannot drag the threshold.
# ---------------------------------------------------------------------------

def _p2_init() -> list:
    # [n0..n4 positions (as floats), q0..q4 heights, count]
    return [0.0] * 11


def _p2_update(s: list, xs) -> list:
    """Feed values into a P² median estimator packed as a flat list of
    11 doubles: marker positions n1..n5, marker heights q1..q5, count.
    Pure Python over a NumPy batch — the per-value work is O(1) and the
    batch sizes are micro-batch sized."""
    n = [s[0], s[1], s[2], s[3], s[4]]
    q = [s[5], s[6], s[7], s[8], s[9]]
    cnt = int(s[10])
    for x in xs:
        x = float(x)
        if cnt < 5:
            q[cnt] = x
            cnt += 1
            if cnt == 5:
                q.sort()
                n[:] = [1.0, 2.0, 3.0, 4.0, 5.0]
            continue
        # locate cell
        if x < q[0]:
            q[0] = x
            k = 0
        elif x < q[1]:
            k = 0
        elif x < q[2]:
            k = 1
        elif x < q[3]:
            k = 2
        elif x <= q[4]:
            k = 3
        else:
            q[4] = x
            k = 3
        for i in range(k + 1, 5):
            n[i] += 1.0
        cnt += 1
        # desired positions for the median configuration (p = 0.5):
        # d = [1, (cnt-1)/4+1, (cnt-1)/2+1, 3(cnt-1)/4+1, cnt]
        d = [
            1.0,
            (cnt - 1) * 0.25 + 1.0,
            (cnt - 1) * 0.5 + 1.0,
            (cnt - 1) * 0.75 + 1.0,
            float(cnt),
        ]
        for i in (1, 2, 3):
            di = d[i] - n[i]
            if (di >= 1.0 and n[i + 1] - n[i] > 1.0) or (
                di <= -1.0 and n[i - 1] - n[i] < -1.0
            ):
                sgn = 1.0 if di > 0 else -1.0
                # parabolic (P²) prediction
                qp = q[i] + sgn / (n[i + 1] - n[i - 1]) * (
                    (n[i] - n[i - 1] + sgn)
                    * (q[i + 1] - q[i])
                    / (n[i + 1] - n[i])
                    + (n[i + 1] - n[i] - sgn)
                    * (q[i] - q[i - 1])
                    / (n[i] - n[i - 1])
                )
                if q[i - 1] < qp < q[i + 1]:
                    q[i] = qp
                else:  # linear fallback
                    j = i + (1 if sgn > 0 else -1)
                    q[i] = q[i] + sgn * (q[j] - q[i]) / (n[j] - n[i])
                n[i] += sgn
    return [*n, *q, float(cnt)]


def _p2_value(s: list) -> float:
    cnt = int(s[10])
    if cnt == 0:
        return 0.0
    if cnt < 5:
        xs = sorted(s[5 : 5 + cnt])
        mid = cnt // 2
        return xs[mid] if cnt % 2 else 0.5 * (xs[mid - 1] + xs[mid])
    return s[7]  # q3 = median marker


_ROBUST_STATE_SCHEMA = StructType([
    StructField("med_sketch", StructType(
        [StructField(f"v{i}", DoubleType()) for i in range(11)]
    )),
    StructField("mad_sketch", StructType(
        [StructField(f"v{i}", DoubleType()) for i in range(11)]
    )),
])


def robust_outlier_stream(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Streaming median/MAD outlier screen: two P² estimators per
    event_type — one tracks the running median m, the other the median
    of |value - m| (deviations measured against the *current* median
    estimate, the standard adaptive-MAD streaming construction). A row
    is flagged when |value - m| > k * MAD against the post-batch
    estimates. State is 22 doubles per key regardless of volume.

    Compared to zscore_outlier_stream this trades exactness of the
    sufficient statistics for robustness of the statistic itself:
    moments are exact but fragile to heavy tails; P² quantiles are
    approximate (markers converge as O(1/n)) but bounded-influence.
    The output ``score`` column is the |value-m|/MAD ratio.
    """

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (event_type,) = key
        if state.exists:
            med_s, mad_s = state.get
            med_s, mad_s = list(med_s), list(mad_s)
        else:
            med_s, mad_s = _p2_init(), _p2_init()
        frames = [p for p in pdfs if len(p)]
        batch = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {c: pd.Series([], dtype="float64") for c in
                 ("event_id", "user_id", "value")}
            )
        )
        v = batch["value"].to_numpy(dtype=np.float64)
        if len(v):
            med_s = _p2_update(med_s, v)
            m = _p2_value(med_s)
            mad_s = _p2_update(mad_s, np.abs(v - m))
            state.update((tuple(med_s), tuple(mad_s)))
        m = _p2_value(med_s)
        mad = _p2_value(mad_s)
        if len(v) and mad > 0.0:
            score = abs(v - m) / mad
            mask = score > k
            out = batch.loc[mask, ["event_id", "user_id", "value"]]
            yield pd.DataFrame(
                {
                    "event_type": event_type,
                    "event_id": out["event_id"].to_numpy(),
                    "user_id": out["user_id"].to_numpy(),
                    "value": out["value"].to_numpy(),
                    "z": score[mask].round(6),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "value": pd.Series([], dtype="float64"),
                    "z": pd.Series([], dtype="float64"),
                }
            )

    return (
        events.select("event_type", "event_id", "user_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_ROBUST_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Online changepoint detection: Page's CUSUM test in stream state — the
# streaming complement of the batch cusum_changepoints query (which
# scans a finished series for its peak excursion; this fires ALARMS as
# a level shift happens).
# ---------------------------------------------------------------------------

_CUSUM_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("mean", DoubleType()),
    StructField("m2", DoubleType()),
    StructField("pos", DoubleType()),
    StructField("neg", DoubleType()),
])

_CUSUM_OUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("event_id", LongType()),
    StructField("value", DoubleType()),
    StructField("direction", StringType()),
    StructField("excursion", DoubleType()),
])


def cusum_changepoint_stream(
    events: DataFrame,
    k: float = 1.0,
    h: float = 6.0,
    warmup: int = 100,
) -> DataFrame:
    """Page's two-sided CUSUM per event_type: standardized residuals
    z = (v - mean)/std feed S⁺ = max(0, S⁺ + z - k) and
    S⁻ = max(0, S⁻ - z - k); an alarm row is emitted when either
    exceeds ``h``, after which that side resets (the classic restart
    rule). The reference mean/std are the exact cumulative Welford
    moments — adaptive, so after a sustained shift the alarms stop
    once the reference catches up (drift-tolerant monitoring, not
    point outlier detection: ``k`` absorbs noise that z-score screens
    would flag).

    ``warmup`` rows per key must pass before alarms can fire (the
    moment estimates are meaningless at tiny n). Defaults: textbook
    CUSUM uses k = delta/2 = 0.5 for a known in-control distribution,
    but here the reference is ESTIMATED from the stream (self-starting
    operation) — a ~0.1 sigma bias in an immature mean acts as a
    standing drift that collapses the in-control ARL, so the default
    allowance is k = 1.0 (measured: 2 percent false-alarm rate over
    1200-draw stationary runs vs ~35 percent at k = 0.5/h = 8). State is 5 doubles
    per key; per-row work is O(1) in a sequential pass over the
    micro-batch (row order within a batch = event arrival order as
    delivered, like any online detector).
    """

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (event_type,) = key
        n, mean, m2, pos, neg = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0, 0.0)
        )
        frames = [p for p in pdfs if len(p)]
        out_ids, out_vals, out_dir, out_exc = [], [], [], []
        if frames:
            # the groupBy exchange does NOT preserve arrival order
            # within the micro-batch; an online detector is
            # order-sensitive, so pin the batch to event_id order
            # (monotone with arrival in the events shape)
            frames = [
                pd.concat(frames, ignore_index=True).sort_values("event_id")
            ]
        for pdf in frames:
            for eid, v in zip(
                pdf["event_id"].to_numpy(),
                pdf["value"].to_numpy(dtype=np.float64),
            ):
                v = float(v)
                # alarm BEFORE folding v into the reference when warm:
                # the shifted value should not drag its own baseline
                if n >= warmup and m2 > 0.0:
                    std = (m2 / n) ** 0.5
                    z = (v - mean) / std
                    pos = max(0.0, pos + z - k)
                    neg = max(0.0, neg - z - k)
                    if pos > h:
                        out_ids.append(int(eid))
                        out_vals.append(v)
                        out_dir.append("up")
                        out_exc.append(round(pos, 6))
                        pos = 0.0
                    if neg > h:
                        out_ids.append(int(eid))
                        out_vals.append(v)
                        out_dir.append("down")
                        out_exc.append(round(neg, 6))
                        neg = 0.0
                # exact sequential Welford fold
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2, pos, neg))
        yield pd.DataFrame(
            {
                "event_type": pd.Series(
                    [event_type] * len(out_ids), dtype="object"
                ),
                "event_id": pd.Series(out_ids, dtype="int64"),
                "value": pd.Series(out_vals, dtype="float64"),
                "direction": pd.Series(out_dir, dtype="object"),
                "excursion": pd.Series(out_exc, dtype="float64"),
            }
        )

    return (
        events.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=_CUSUM_OUT_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming quantiles: the KLL sketch (operators/sketch.py) in stream
# state — running per-key quantile estimates over an unbounded feed in
# O(k log n) state, where the exact twin (percentile over the prefix)
# would have to retain every value.
# ---------------------------------------------------------------------------

_KLL_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("levels", ArrayType(ArrayType(DoubleType()))),
])


def kll_quantile_stream(
    events: DataFrame,
    probs: "list[float]" = (0.5, 0.9, 0.99),
    k: int = 200,
) -> DataFrame:
    """Per-event_type running quantile estimates via a KLL sketch held
    in applyInPandasWithState state. Each micro-batch folds its values
    into the sketch and emits one row per key with the current
    estimates (update mode) — same ≤O(1/k) rank-error contract as the
    batch twin, applied to the stream prefix."""
    from svs_spark.operators.sketch import KLL

    probs = [float(p) for p in probs]
    out_fields = [StructField("event_type", StringType()),
                  StructField("n_seen", LongType())] + [
        StructField(f"q{i}", DoubleType()) for i in range(len(probs))
    ]
    out_schema = StructType(out_fields)

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            n, levels = state.get
            sk = KLL.from_row(k, n, levels)
        else:
            sk = KLL(k)
        for pdf in pdfs:
            if len(pdf):
                sk.update_many(pdf["value"].to_numpy())
        state.update((sk.n, [list(l) for l in sk.levels]))
        qs = sk.quantiles(probs)
        row = {"event_type": [event_type], "n_seen": [sk.n]}
        for i, q in enumerate(qs):
            row[f"q{i}"] = [q]
        yield pd.DataFrame(row)

    return (
        events.select("event_type", col("value").cast("double").alias("value"))
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_KLL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
