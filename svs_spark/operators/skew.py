"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join splitting (enabled in svs_spark.session) handles most
runtime skew; these explicit operators cover the two cases AQE can't:
aggregation skew (one giant group) and broadcast-infeasible joins with a
known-hot key set.

Both are semantics-preserving rewrites: results are identical to the
unsalted plan (asserted in tests/test_skew.py), only the shuffle
distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count: bool = True,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys, salt) — the hot group splits into ``salt``
    partial groups that aggregate in parallel; phase 2 merges partials
    on the true keys. Works for algebraic aggregates (sum/count here;
    min/max/avg-as-sum+count compose the same way).
    """
    sum_cols = sum_cols or []
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt)
    )
    partial_aggs = [F.sum(c).alias(f"_s_{c}") for c in sum_cols]
    if count:
        partial_aggs.append(F.count("*").alias("_s_cnt"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        final_aggs.append(F.sum("_s_cnt").alias("n"))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the (small) right side ``salt``
    times, give each left row a deterministic salt, join on (key, salt).

    The hot left key's rows spread over ``salt`` reducers instead of one.
    Right-side replication costs salt× its size — use only when the
    right side is too big to broadcast but far smaller than the left.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    right_rep = right.withColumn("_salt", salts)
    left_salted = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), salt).cast("int"),
    )
    joined = left_salted.join(right_rep, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def top_frequent_keys(
    df: DataFrame, key: str, min_count: int
) -> list:
    """Identify hot keys (driver-side list, bounded output) — input to a
    split-plan strategy: broadcast-join the hot keys, shuffle-join the
    rest, union."""
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .collect()
    )
    return [r[key] for r in rows]
