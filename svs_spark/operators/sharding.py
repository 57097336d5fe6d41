"""Corpus sharding / global-ordering utilities for training-data export.

A training pipeline's last mile is deterministic: shuffle the corpus
reproducibly, then deal documents into shards — either round-robin by
descending length (balanced shard sizes) or contiguously by a token
budget (fixed ~N-token shard files). All three need a GLOBAL total
order, and the naive Spark form (`row_number() OVER (ORDER BY ...)`
with no PARTITION BY) collapses the whole table into one partition —
a single-task sort that dies long before 100 TB.

The scalable decomposition used here is the classic two-level rank:

1. bucket every row by an ORDER-ALIGNED bucket expression (every row
   of bucket i sorts before every row of bucket i+1 — e.g. the leading
   bits of the sort key);
2. rank/cumsum WITHIN each bucket (hash-partitioned window — parallel);
3. compute per-bucket offsets on the tiny bucket-aggregate table (one
   row per bucket; the only single-partition window runs over ≤ a few
   thousand rows) and broadcast-join them back.

`global_rn = bucket_offset + within_bucket_rank` is then exactly the
single-window answer, with the corpus shuffled once by bucket and never
concentrated on one task. Equivalence to the naive window is pinned by
``tests/test_sharding.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Knuth multiplicative hash, portable across Spark and DuckDB (pure
# BIGINT arithmetic — same form as query_defs.q_train_test_split; for
# ids beyond ~2^32 swap for xxhash64, which no longer needs to be
# SQL-portable once the oracle only checks aggregates).
SHUFFLE_MULT = 2654435761
SHUFFLE_MOD = 4294967296


def shuffle_hash(id_col: Column | str, seed: int = 12345) -> Column:
    """Deterministic pseudo-random sort key in [0, 2^32).

    The id is first reduced mod 2^31-1 (pmod — safe for negative ids,
    e.g. xxhash64-derived ones) so the Knuth multiply never overflows
    BIGINT under ANSI mode: (2^31-1)·2654435761 < 2^63. For ids below
    2^31 the reduction is the identity, which keeps the SQL oracles
    (which skip it) exact on the testdata domain.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    r = F.pmod(c, F.lit(2147483647))
    return (r * F.lit(SHUFFLE_MULT) + F.lit(seed)) % F.lit(SHUFFLE_MOD)


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    rank_name: str = "global_rn",
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` without a global
    sort. ``bucket`` MUST be order-aligned: rows in a smaller bucket
    value sort strictly before rows in a larger one (pass e.g. the
    leading bits of the primary sort key, or its negation for DESC).
    """
    b = df.withColumn("_bucket", bucket)
    w_in = Window.partitionBy("_bucket").orderBy(*order_cols)
    counts = b.groupBy("_bucket").agg(F.count("*").alias("_n"))
    # one row per bucket — the single-partition window is bounded by the
    # bucket count, not the table size
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_bucket", "_off")
    return (
        b.join(F.broadcast(offs), "_bucket")
        .withColumn(
            rank_name, (F.col("_off") + F.row_number().over(w_in)).cast("long")
        )
        .drop("_bucket", "_off")
    )


def bucketed_global_cumsum(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    val_col: str,
    cum_name: str = "cum",
) -> DataFrame:
    """Global running sum of ``val_col`` in ``order_cols`` order (the
    row's own value included), decomposed the same two-level way."""
    b = df.withColumn("_bucket", bucket)
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = b.groupBy("_bucket").agg(F.sum(val_col).alias("_tot"))
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_bucket", "_off")
    return (
        b.join(F.broadcast(offs), "_bucket")
        .withColumn(
            cum_name,
            (F.col("_off") + F.sum(val_col).over(w_in)).cast("long"),
        )
        .drop("_bucket", "_off")
    )


def _with_desc_value_buckets(
    df: DataFrame, metric: str, n_buckets: int
) -> DataFrame:
    """Attach an order-aligned ``_vbucket`` column for DESCENDING order
    on a non-negative integer ``metric``: equi-width bins over the
    observed [min, max] range (one tiny min/max aggregate broadcast
    back), bin 0 = the highest values. Bucket count is bounded by
    ``n_buckets`` regardless of the metric's cardinality — the fix for
    ``bucket = -metric`` (one bucket per distinct value), whose offsets
    table grows with the value cardinality and stops being
    broadcastable for near-unique metrics like lifetime spend.

    Equi-width (not sampled quantiles) keeps the decomposition
    deterministic cross-run; a heavily-tied single value still lands in
    one bucket — unavoidable for an exact global order on ties, and the
    same behavior Spark's range partitioner has on a constant key.
    All arithmetic is integer ``div`` (never float division — quotient
    doubles round up near exact multiples once numerators pass 2^41ish,
    off-by-one-ing the bin).
    """
    stats = df.agg(
        F.min(metric).alias("_vlo"), F.max(metric).alias("_vhi")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_vw", F.expr(f"(_vhi - _vlo) div {n_buckets} + 1"))
        .withColumn("_vbucket", F.expr(f"(_vhi - {metric}) div _vw"))
    )


def ranked_desc_by_value(
    df: DataFrame,
    metric: str,
    tiebreak: str,
    n_buckets: int = 1024,
    rank_name: str = "global_rn",
) -> DataFrame:
    """Global 1-based rank in ``(metric DESC, tiebreak ASC)`` order via
    the two-level decomposition — the scalable stand-in for
    ``row_number() OVER (ORDER BY metric DESC, tiebreak)`` (and hence
    for ``ntile`` — see :func:`ntile_expr`). One bounded-width bucket
    exchange + a broadcast offsets join; no single-partition sort of
    the input."""
    b = _with_desc_value_buckets(df, metric, n_buckets)
    out = bucketed_global_rank(
        b,
        bucket=F.col("_vbucket"),
        order_cols=[F.col(metric).desc(), F.col(tiebreak).asc()],
        rank_name=rank_name,
    )
    return out.drop("_vlo", "_vhi", "_vw", "_vbucket")


def ranked_asc_by_value(
    df: DataFrame,
    metric: str,
    tiebreak: str,
    n_buckets: int = 1024,
    rank_name: str = "global_rn",
) -> DataFrame:
    """Ascending twin of :func:`ranked_desc_by_value`: global 1-based
    rank in ``(metric ASC, tiebreak ASC)`` order, same two-level
    decomposition (equi-width ASC-aligned buckets: bin 0 = the lowest
    values)."""
    stats = df.agg(F.min(metric).alias("_vlo"), F.max(metric).alias("_vhi"))
    b = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_vw", F.expr(f"(_vhi - _vlo) div {n_buckets} + 1"))
        .withColumn("_vbucket", F.expr(f"({metric} - _vlo) div _vw"))
    )
    out = bucketed_global_rank(
        b,
        bucket=F.col("_vbucket"),
        order_cols=[F.col(metric).asc(), F.col(tiebreak).asc()],
        rank_name=rank_name,
    )
    return out.drop("_vlo", "_vhi", "_vw", "_vbucket")


def cumsum_desc_by_value(
    df: DataFrame,
    metric: str,
    tiebreak: str,
    val_col: str,
    n_buckets: int = 1024,
    cum_name: str = "cum",
) -> DataFrame:
    """Global running sum of ``val_col`` in ``(metric DESC, tiebreak)``
    order (own row included), two-level — the scalable stand-in for
    ``sum(v) OVER (ORDER BY metric DESC, tiebreak ROWS UNBOUNDED
    PRECEDING)``."""
    b = _with_desc_value_buckets(df, metric, n_buckets)
    out = bucketed_global_cumsum(
        b,
        bucket=F.col("_vbucket"),
        order_cols=[F.col(metric).desc(), F.col(tiebreak).asc()],
        val_col=val_col,
        cum_name=cum_name,
    )
    return out.drop("_vlo", "_vhi", "_vw", "_vbucket")


def multi_ranked_by_value(
    df: DataFrame,
    specs: list[tuple[str, str, str]],
    tiebreak: str,
    n_buckets: int = 1024,
    n_name: str | None = None,
) -> DataFrame:
    """Several independent global ranks over the SAME rows in ONE
    two-level pass (optimization guide §2.4 — share one exchange):
    ``specs`` is a list of ``(metric, direction, rank_name)`` with
    direction ``"asc"`` or ``"desc"``; the result has one row per input
    row of ``df`` restricted to ``tiebreak`` plus one BIGINT rank column
    per spec (and, when ``n_name`` is given, the total row count — the
    ntile denominator).

    Equivalence to chaining :func:`ranked_asc_by_value` /
    :func:`ranked_desc_by_value` per metric (pinned in
    tests/test_sharding.py): a DESC rank over ``m`` is the ASC rank over
    ``-m`` (same total order incl. the tiebreak), and with
    ``lo' = min(-m) = -max(m)`` the ASC bucket ``(-m - lo') div w``
    equals the DESC bucket ``(max(m) - m) div w`` with the identical
    width ``w = (hi - lo) div n_buckets + 1``. Chaining the single-metric
    helpers instead re-plans the whole upstream chain inside each
    metric's min/max broadcast subtree — k metrics cost O(k²) upstream
    recomputes; this form unpivots to (tiebreak, sig, ord) rows and pays
    ONE data exchange (the per-(sig,bucket) window; the bucket-count
    aggregate reuses it) plus the final tiebreak-keyed pivot aggregate.
    """
    cells = [
        F.struct(
            F.lit(i).cast("int").alias("_sig"),
            (
                (-F.col(m)) if direction == "desc" else F.col(m)
            ).cast("long").alias("_ord"),
        )
        for i, (m, direction, _) in enumerate(specs)
    ]
    stack = df.select(
        tiebreak, F.explode(F.array(*cells)).alias("_c")
    ).select(tiebreak, F.col("_c._sig").alias("_sig"), F.col("_c._ord").alias("_ord"))
    stats = stack.groupBy("_sig").agg(
        F.min("_ord").alias("_vlo"),
        F.max("_ord").alias("_vhi"),
        F.count("*").alias("_n"),
    )
    b = (
        stack.join(F.broadcast(stats), "_sig")
        .withColumn("_vw", F.expr(f"(_vhi - _vlo) div {n_buckets} + 1"))
        .withColumn("_vbucket", F.expr("(_ord - _vlo) div _vw"))
    )
    w_in = Window.partitionBy("_sig", "_vbucket").orderBy(
        F.col("_ord").asc(), F.col(tiebreak).asc()
    )
    counts = b.groupBy("_sig", "_vbucket").agg(F.count("*").alias("_bn"))
    w_off = (
        Window.partitionBy("_sig")
        .orderBy("_vbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_bn").over(w_off), F.lit(0))
    ).select("_sig", "_vbucket", "_off")
    ranked = b.join(F.broadcast(offs), ["_sig", "_vbucket"]).withColumn(
        "_rn", (F.col("_off") + F.row_number().over(w_in)).cast("long")
    )
    aggs = [
        F.max(F.when(F.col("_sig") == i, F.col("_rn"))).alias(rank_name)
        for i, (_, _, rank_name) in enumerate(specs)
    ]
    if n_name is not None:
        aggs.append(F.max("_n").alias(n_name))
    return ranked.groupBy(tiebreak).agg(*aggs)


def ntile_expr(rank_col: str, n_col: str, k: int) -> Column:
    """SQL-standard ``ntile(k)`` from a global rank and the total row
    count: the first ``n mod k`` tiles get ``n div k + 1`` rows, the
    rest ``n div k`` (larger tiles FIRST — note the even-spread formula
    ``(rank-1)*k div n + 1`` is NOT ntile: it interleaves the big
    tiles). Integer ``div`` throughout; the q = 0 case (n < k) is fully
    covered by the first branch, so the else-side ``div q`` never
    divides by zero on a row it evaluates."""
    q = f"({n_col} div {k})"
    rem = f"({n_col} % {k})"
    big = f"({rem} * ({q} + 1))"
    return F.expr(
        f"CASE WHEN {rank_col} <= {big} "
        f"THEN ({rank_col} - 1) div ({q} + 1) + 1 "
        f"ELSE {rem} + ({rank_col} - 1 - {big}) div {q} + 1 END"
    ).cast("long")


def round_robin_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    tiebreak_col: str = "doc_id",
    shard_name: str = "shard",
) -> DataFrame:
    """Deal rows into ``n_shards`` round-robin in DESCENDING weight
    order (longest-first card dealing — the standard near-balanced
    token-budget heuristic: shard totals differ by at most one max-row
    weight). Bucket = negated weight, so each bucket is one weight value
    and ascending bucket order IS descending weight order.
    """
    ranked = bucketed_global_rank(
        df,
        bucket=-F.col(weight_col),
        order_cols=[F.col(tiebreak_col)],
    )
    return ranked.withColumn(
        shard_name, ((F.col("global_rn") - 1) % n_shards).cast("int")
    ).drop("global_rn")


def token_budget_shards(
    df: DataFrame,
    budget: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 12345,
    n_buckets_log2: int = 6,
    shard_name: str = "shard",
) -> DataFrame:
    """Contiguous ~``budget``-token shards in deterministic shuffle
    order: shuffle-hash each id, take the global running token sum, and
    cut a new shard every time it crosses the budget
    (``shard = (cum - w) div budget`` — each shard holds ≥ budget -
    max_row tokens, ≤ budget + max_row). Bucket = leading bits of the
    32-bit shuffle hash (order-aligned by construction, uniformly
    sized).
    """
    h = shuffle_hash(id_col, seed)
    with_h = df.withColumn("_h", h)
    cum = bucketed_global_cumsum(
        with_h,
        bucket=F.expr(f"_h div {1 << (32 - n_buckets_log2)}"),
        order_cols=[F.col("_h"), F.col(id_col)],
        val_col=weight_col,
    )
    # integer div: identical floor semantics in Spark (`div`) and the
    # DuckDB oracle (`//` on BIGINT)
    return cum.withColumn(
        shard_name,
        F.expr(f"(cum - {weight_col}) div {budget}").cast("int"),
    ).drop("_h", "cum")
