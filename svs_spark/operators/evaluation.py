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


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    out_col: str = "calibrated",
    bin_col: str = "bin",
) -> DataFrame:
    """Isotonic (PAV) calibration applied as a scoring TRANSFORM: fit
    the best monotone-non-decreasing map from score bin to positive
    rate and ATTACH the calibrated probability to every row — the
    operator a pipeline actually consumes (r8 verdict ask #4; the
    registered ``isotonic_calibration`` query reports the fitted bin
    table, this maps scores through it).

    Fit: one map-side-combined ``n_bins`` aggregate (scan-stage integer
    binning against a 1-row max broadcast), then pool-adjacent-
    violators on the collected ≤ ``n_bins`` rows driver-side — the
    stack algorithm with exact integer cross-multiplication, no float
    compares inside the pooling (equal by construction to the minimax
    identity the registered query computes in SQL; pytest pins both
    against each other). Apply: a broadcast join of the ≤ ``n_bins``-row
    fitted map — no second shuffle of the data.

    Properties (tests/test_isotonic_transform.py): ``out_col`` is
    non-decreasing in ``score_col``; on a signal whose bin-wise
    positive rate is already monotone the transform is the identity on
    those rates; pooled bins share one value (the weighted mean of the
    violating run).

    Scale shape: the corpus is touched twice — once for the bin
    aggregate (combiner-friendly), once for the broadcast-join apply —
    with nothing data-sized on the driver (``n_bins`` ints). Integral
    score columns bin with exact ``div`` arithmetic (the oracle-parity
    form); fractional scores use floor division on doubles.

    ``label_col`` must be 0/1 and non-null (cast to long plan-side;
    the same contract as hard_negative_join's labels).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    dtype = dict(df.dtypes).get(score_col)
    if dtype is None:
        raise ValueError(f"no column {score_col!r} in frame")
    mx = df.agg(F.max(score_col).alias("_maxs"))
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        bin_expr = F.least(
            F.lit(n_bins - 1),
            F.expr(f"{score_col} * {n_bins} div (_maxs + 1)"),
        ).cast("long")
    else:
        bin_expr = F.least(
            F.lit(n_bins - 1).cast("long"),
            F.floor(
                F.col(score_col) * n_bins / (F.col("_maxs") + F.lit(1e-9))
            ),
        ).cast("long")
    # binned feeds BOTH the fit's bin aggregate (collected below) and
    # the returned apply join — untracked, the apply recomputed the
    # scan + max-broadcast subtree, so one calibrate call paid 4 corpus
    # passes (max, bin-agg, max again, join) instead of 2 + a cache
    # read. Registry-scoped persist (released when the next registered
    # query builds, or by release_caches()).
    from svs_spark.cache_hooks import persist_tracked

    binned = persist_tracked(
        df.crossJoin(F.broadcast(mx))
        .withColumn(bin_col, bin_expr)
        .drop("_maxs")
    )
    rows = sorted(
        binned.groupBy(bin_col)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("p"),
        )
        .collect(),
        key=lambda r: r[bin_col],
    )
    if any(r["p"] is None for r in rows):
        raise ValueError(f"{label_col} contains nulls (0/1 contract)")
    # stack PAV over the score-ordered bins: merge while the previous
    # pool's mean exceeds the current's (exact integer cross-multiply)
    pools: "list[list[int]]" = []  # [weight, possum, bins-in-pool]
    spans: "list[list[int]]" = []  # bin ids per pool
    for r in rows:
        pools.append([int(r["n"]), int(r["p"])])
        spans.append([int(r[bin_col])])
        while (
            len(pools) > 1
            and pools[-2][1] * pools[-1][0] > pools[-1][1] * pools[-2][0]
        ):
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
            spans[-2].extend(spans.pop())
    fitted = [
        (b, s / w) for (w, s), bs in zip(pools, spans) for b in bs
    ]
    calmap = df.sparkSession.createDataFrame(
        fitted, f"{bin_col} long, {out_col} double"
    )
    return binned.join(F.broadcast(calmap), bin_col, "left")
