"""Streaming anomaly detection over the events stream.

``zscore_outlier_stream`` is a custom stateful operator
(applyInPandasWithState): per event_type it maintains exact running
moments (count, mean, M2) via Chan's parallel Welford merge — O(1)
state per key, no sample buffer — and flags each micro-batch's rows
whose |value - mean| exceeds ``k`` cumulative standard deviations.

Relationship to the batch twin (query_defs.q_event_outliers_mad): the
batch operator uses median/MAD — robust, but quantiles need either a
sort or a sketch. The streaming form uses moment-based z-scores
because moments merge exactly in O(1); swap in a quantile sketch
(KLL/t-digest) in state for a robust streaming variant if the value
distribution is heavy-tailed enough that the mean itself is dragged.

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
    DoubleType, LongType, StringType, StructField, StructType,
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
        batch = pd.concat(list(pdfs), ignore_index=True)
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
