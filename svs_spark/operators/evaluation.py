"""Filter-evaluation metrics for curation pipelines.

The reference engine stops at *producing* quality signals; a training
pipeline also has to decide whether a signal is worth filtering on.
The standard instrument is ROC-AUC of the signal against a known label
(duplicate / contaminated / held-out-spam ...): AUC 0.5 means the
filter is noise, 1.0 means it separates perfectly.

Distributed formulation (tie-exact Mann-Whitney, no pairwise join):

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg)

Group rows by DISTINCT score value, count positives ``p_s`` and
negatives ``n_s`` per value, scan values in ascending-score order
keeping the cumulative negative count ``cum_before``; each value
contributes ``p_s * (cum_before + n_s / 2)`` won pairs. Everything up
to the final division is BIGINT (the half-credit is folded in by
doubling), so the result is exact in any aggregation order.

Scale shape: one exchange to the (group, score) grain, then a window
over DISTINCT SCORE VALUES per group — bounded by score cardinality,
not row count (callers quantize the score; a fixed-point score with k
decimal digits bounds the window input at 10^k rows per group
regardless of corpus size), then a tiny per-group aggregate. No
single-partition pass over the corpus at any point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def binary_auc(
    df: DataFrame,
    score: Column | str,
    label: Column | str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ROC-AUC of ``score`` against boolean ``label``, per group.

    ``score`` must be discrete/quantized (integer or fixed-point): the
    per-group window runs over its distinct values. Groups with no
    positives or no negatives are dropped (AUC undefined there).

    Returns ``group_cols + [n_pos, n_neg, auc]`` with ``auc`` rounded
    to 6 decimals.
    """
    group_cols = list(group_cols or [])
    s = F.col(score) if isinstance(score, str) else score
    y = F.col(label) if isinstance(label, str) else label

    per_value = (
        df.select(*group_cols, s.alias("_s"), y.cast("int").alias("_y"))
        .groupBy(*group_cols, "_s")
        .agg(
            F.sum("_y").cast("long").alias("_p"),
            (F.count("*") - F.sum("_y")).cast("long").alias("_n"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc("_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cum negatives strictly below this score value
    scanned = per_value.withColumn(
        "_cum_before", F.sum("_n").over(w) - F.col("_n")
    )
    # 2 * won-pairs stays integral: p * (2*below + ties)
    agg = scanned.groupBy(*group_cols).agg(
        F.sum("_p").alias("n_pos"),
        F.sum("_n").alias("n_neg"),
        F.sum(
            F.col("_p") * (2 * F.col("_cum_before") + F.col("_n"))
        ).alias("_num2"),
    )
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            *group_cols,
            "n_pos",
            "n_neg",
            F.round(
                F.col("_num2").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
    )
