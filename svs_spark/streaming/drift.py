"""Windowed distribution-drift monitoring: bounded per-window value
histograms as a PURE built-in streaming aggregate, evaluated for drift
(two-sample KS against a reference) on the drained tables.

The split of labor mirrors the sketch-window family (cm_window /
hll_window / minhash_window): the STREAM ships only bounded state — an
``n_buckets``-cell histogram per (window, group), maintained by a
watermarked built-in ``count`` aggregate (counts are sum-mergeable, so
closed windows also merge across windows/days like the persisted
rollups) — and the DRIFT VERDICT is a cheap batch computation over
those tiny tables, so "did this hour's value distribution shift away
from the reference?" never re-reads the stream.

The KS evaluation is the same integer-exact construction as the batch
``source_length_ks`` query: ECDFs compared at every bucket boundary
with cross-multiplied BIGINT numerators (|cum_a·N_b − cum_b·N_a|), one
float division at the end — order-independent and engine-exact.

Equal-width bucketing over a FIXED [lo, hi) domain (not data-driven
min/max) keeps the cell key stable across windows and restarts — the
precondition for comparing histograms at all; out-of-range values
clamp into the edge buckets so mass is never dropped silently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def bucket_expr(
    value_col: str, lo: float, hi: float, n_buckets: int
) -> Column:
    """Equal-width bucket index over a fixed [lo, hi) domain, clamped
    to [0, n_buckets-1]. Pure scan-stage arithmetic."""
    raw = F.floor(
        (F.col(value_col) - F.lit(lo))
        / F.lit((hi - lo) / float(n_buckets))
    ).cast("long")
    return F.least(
        F.lit(n_buckets - 1), F.greatest(F.lit(0), raw)
    )


def value_histogram_cells(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 64,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row histogram contribution: (bucket) + passthrough columns.
    Stateless — identical on batch and streaming frames (the
    stream ≡ batch equality tests hinge on this shared definition)."""
    extra = list(extra_cols or [])
    return df.select(
        *extra, bucket_expr(value_col, lo, hi, n_buckets).alias("bucket")
    )


def value_histogram_stream(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "event_time",
    window_duration: str = "6 hours",
    watermark: str = "1 hour",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_buckets: int = 64,
) -> DataFrame:
    """Watermarked windowed histogram: one built-in count aggregate,
    state bounded at n_buckets cells per (window, group). Output rows
    (window_start, group, bucket, n) are the drift monitor's unit of
    persistence — mergeable across windows by a further sum."""
    cells = value_histogram_cells(
        events.withWatermark(ts_col, watermark),
        value_col,
        lo,
        hi,
        n_buckets,
        extra_cols=[ts_col, group_col],
    )
    return (
        cells.groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col(group_col).alias("grp"),
            "bucket",
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "grp", "bucket", "n")
    )


def ks_vs_reference(
    hist: DataFrame,
    reference: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Two-sample KS between each keyed histogram and a reference
    histogram (columns: bucket, n). Both ECDFs are evaluated at every
    bucket boundary (the sup of two step functions lives at a jump);
    the numerator and argmax stay in BIGINT via cross-multiplication,
    exactly like the batch ``source_length_ks`` query. Returns one row
    per key group: (keys..., n_obs, ks_stat, at_bucket).

    Scale: everything after the (key, bucket) aggregate is
    bucket-cardinality — the windows below partition by key over
    ≤ n_buckets rows per group."""
    keys = list(keys or ["window_start", "grp"])
    # The reference histogram is bucket-cardinality BY CONSTRUCTION, so
    # materialize it driver-side and re-create it as a literal frame:
    # (a) it was going to be broadcast anyway, (b) reference and hist
    # commonly share lineage (reference = the pooled history of the
    # same sink table), which otherwise trips Spark's conflicting-
    # reference resolution in the grid's cross+left join pair.
    spark = hist.sparkSession
    ref_rows = (
        reference.groupBy("bucket").agg(F.sum("n").alias("ref_n")).collect()
    )
    ref = spark.createDataFrame(
        [(r["bucket"], r["ref_n"]) for r in ref_rows],
        "bucket long, ref_n long",
    )
    ref_tot = ref.agg(F.sum("ref_n").alias("ref_total"))
    g = hist.groupBy(*keys, "bucket").agg(F.sum("n").alias("n"))
    # grid: every key group needs a row for every reference bucket so
    # the ECDF carry-forward is exact; the grid is bounded by
    # (#groups × n_buckets), never the stream. Built as a zero-row
    # UNION + re-aggregate (not a left join back onto g — a join of two
    # frames from the same memory-sink view trips Spark's conflicting-
    # reference resolution).
    grp = g.select(*keys).distinct()
    zeros = grp.crossJoin(F.broadcast(ref.select("bucket"))).withColumn(
        "n", F.lit(0).cast("long")
    )
    full = (
        zeros.select(*keys, "bucket", "n")
        .unionByName(g.select(*keys, "bucket", "n"))
        .groupBy(*keys, "bucket")
        .agg(F.sum("n").alias("n"))
    )
    # LEFT join: the window may hold mass in buckets the reference
    # never saw (that's exactly what drift looks like) — an inner join
    # here would silently drop those cells, undercounting N and cum and
    # understating the KS stat precisely when drift is largest. Absent
    # reference cells contribute ref_n = 0 (a flat ECDF segment).
    grid = full.join(F.broadcast(ref), "bucket", "left").withColumn(
        "ref_n", F.coalesce(F.col("ref_n"), F.lit(0).cast("long"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*keys)
    c = (
        grid.withColumn("cum", F.sum("n").over(w))
        .withColumn("rcum", F.sum("ref_n").over(w))
        .withColumn("N", F.sum("n").over(tot))
        .crossJoin(F.broadcast(ref_tot))
    )
    dnum = F.abs(F.col("cum") * F.col("ref_total") - F.col("rcum") * F.col("N"))
    wr = Window.partitionBy(*keys).orderBy(F.desc("dnum"), F.asc("bucket"))
    return (
        c.withColumn("dnum", dnum)
        .withColumn("rn_", F.row_number().over(wr))
        .filter(F.col("rn_") == 1)
        .select(
            *keys,
            F.col("N").alias("n_obs"),
            # Guard the one float division: an empty reference (or an
            # all-zero group, impossible from a count aggregate but
            # cheap to guard) would raise DIVIDE_BY_ZERO under ANSI.
            F.when(
                (F.col("N") > 0) & (F.col("ref_total") > 0),
                F.round(
                    F.col("dnum").cast("double")
                    / (F.col("N") * F.col("ref_total")),
                    6,
                ),
            ).alias("ks_stat"),
            F.col("bucket").alias("at_bucket"),
        )
    )
