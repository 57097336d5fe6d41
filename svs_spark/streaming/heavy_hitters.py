"""Streaming heavy hitters: Misra-Gries summaries in stream state.

The streaming complement of the batch ``frequent_items`` sketch
(operators/sketch.py): per group (e.g. per event_type), keep at most
``capacity`` counters in ``applyInPandasWithState`` state and emit the
current frequent-item estimates every micro-batch. State is O(capacity)
per key forever — the property that lets a heavy-hitter monitor run
unbounded over a firehose (top tokens, top URLs, hot join keys for
skew detection) where an exact per-item count would grow without limit.

Same MG guarantee as the batch twin, applied to the stream prefix seen
so far: estimates undercount true prefix counts by at most
``n_seen/capacity``, and any item with true frequency above
``2·n_seen/capacity`` is in the emitted set.

Output mode: ``update`` — each micro-batch re-emits the groups that
changed.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from svs_spark.operators.sketch import _mg_reduce

_STATE_SCHEMA = StructType([
    StructField("items", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
    StructField("n", LongType()),
])

_OUT_SCHEMA = StructType([
    StructField("group_key", StringType()),
    StructField("item", StringType()),
    StructField("est_count", LongType()),
    StructField("n_seen", LongType()),
])


def heavy_hitters_stream(
    events: DataFrame,
    group_col: str,
    item_col: str,
    capacity: int = 64,
) -> DataFrame:
    """Per-group Misra-Gries heavy hitters over an unbounded stream.

    Emits (group_key, item, est_count, n_seen) rows per micro-batch for
    every group that received data, keeping only items whose estimate
    exceeds ``n_seen/capacity`` (so true frequency > 2·n_seen/capacity
    guarantees presence)."""

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (group_key,) = key
        if state.exists:
            items, counts, n = state.get
            mg = dict(zip(items, counts))
        else:
            mg, n = {}, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            vc = pdf[item_col].astype(str).value_counts()
            n += int(vc.sum())
            for item, c in vc.items():
                mg[item] = mg.get(item, 0) + int(c)
            mg = _mg_reduce(mg, capacity)
        state.update((list(mg), [int(v) for v in mg.values()], n))
        out = [
            (group_key, item, int(c), n)
            for item, c in sorted(mg.items(), key=lambda t: (-t[1], t[0]))
            if c > n / capacity
        ]
        yield pd.DataFrame(
            out, columns=["group_key", "item", "est_count", "n_seen"]
        )

    return (
        events.select(
            events[group_col].cast("string").alias(group_col),
            events[item_col].cast("string").alias(item_col),
        )
        .groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
