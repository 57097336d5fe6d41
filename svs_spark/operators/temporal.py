"""Temporal join operators (as-of join) — beyond-reference extension.

An as-of join matches each left row to the most recent right row at or
before (backward) its timestamp, per key — the core primitive for
point-in-time feature joins in training-data pipelines ("what was the
last purchase before this event?").

Spark has no native ASOF JOIN; the scalable formulation is the
union+window trick: tag both sides, union, sort within each key by
(time, side), and carry the last-seen right payload forward with
``last(..., ignorenulls=True)``. One shuffle on the key, no range
explosion — O(n log n) per key vs the O(n·m) naive range join. The
correctness oracle runs DuckDB's *native* ASOF JOIN, so the two
implementations are genuinely independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts`` < (or <= when not strict) ``left_ts``, same key.

    Returns the left DataFrame plus ``asof_ts`` and ``asof_<payload>``
    columns (NULL when no prior right row exists — left-join semantics).
    """
    payload_struct = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in payload_cols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        payload_struct.alias("_payload"),
    )
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        # at equal time: strict ⇒ left (0) sorts before right (1) so the
        # same-instant right row is invisible; non-strict ⇒ left (2)
        # sorts after and sees it
        F.lit(0 if strict else 2).alias("_side"),
        left_struct.alias("_left"),
    ).withColumn("_payload", F.lit(None).cast(rt.schema["_payload"].dataType))
    rt = rt.withColumn(
        "_left", F.lit(None).cast(lt.schema["_left"].dataType)
    ).select("_k", "_t", "_side", "_left", "_payload")

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).withColumn(
        "_last_payload", F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_left").isNotNull()).select(
        F.col("_left.*"),
        F.col("_last_payload._rts").alias("asof_ts"),
        *[
            F.col(f"_last_payload.{c}").alias(f"asof_{c}")
            for c in payload_cols
        ],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_point: str,
    right_lo: str,
    right_hi: str,
    band: int,
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join without a cross join: match
    left rows whose ``left_point`` falls in a right row's
    [``right_lo``, ``right_hi``) interval, same ``key``.

    Naive inequality joins degenerate to per-key cross products (Spark
    plans BroadcastNestedLoopJoin when the only equi-key is skewed or
    absent). The banded rewrite makes the join an EQUI join: each
    interval is exploded onto the fixed grid of ``band``-width bands it
    overlaps, each probe point maps to exactly one band, and the hash
    join on (key, band) bounds candidates to one grid cell before the
    precise containment filter. Choose ``band`` ≈ typical interval
    width: intervals then explode to ≤2 grid rows, and the exchange
    stays O(|right| + |left|) instead of O(|left|×|right| per key).

    All three range columns must be integer-typed (epoch seconds/us).
    ``how='left'``: left rows with no containing interval survive with
    NULL right payload (count with F.count of a right column).
    """
    r_bands = right.withColumn(
        "_band",
        F.explode(
            F.sequence(
                (F.col(right_lo) / band).cast("long"),
                # hi is exclusive: a hi exactly on a grid line adds no band
                ((F.col(right_hi) - 1) / band).cast("long"),
            )
        ),
    )
    l_banded = left.withColumn("_band", (F.col(left_point) / band).cast("long"))
    cond = (
        (l_banded[key] == r_bands[key])
        & (l_banded["_band"] == r_bands["_band"])
        & (r_bands[right_lo] <= l_banded[left_point])
        & (l_banded[left_point] < r_bands[right_hi])
    )
    joined = l_banded.join(r_bands, cond, how)
    # drop the right key/band duplicates, keep left intact
    return joined.drop(r_bands[key]).drop(r_bands["_band"]).drop(
        l_banded["_band"]
    )
