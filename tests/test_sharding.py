"""operators/sharding.py: the two-level (bucketed) global rank/cumsum
must be EXACTLY the naive single-window answer, and the shard dealers
built on it must satisfy their balance/budget contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from svs_spark.operators import sharding as SH


@pytest.fixture(scope="module")
def weighted(spark):
    # 500 rows, skewed weights, duplicate weight values (the tie case
    # the bucket=weight decomposition must order deterministically)
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 97 + 3).cast("int").alias("w"),
    )


def test_bucketed_rank_equals_naive_window(spark, weighted):
    naive = weighted.withColumn(
        "global_rn",
        F.row_number()
        .over(Window.orderBy(F.col("w").desc(), "doc_id"))
        .cast("long"),
    )
    two_level = SH.bucketed_global_rank(
        weighted, bucket=-F.col("w"), order_cols=[F.col("doc_id")]
    )
    got = {r.doc_id: r.global_rn for r in two_level.collect()}
    want = {r.doc_id: r.global_rn for r in naive.collect()}
    assert got == want


def test_bucketed_cumsum_equals_naive_window(spark, weighted):
    h = SH.shuffle_hash("doc_id")
    base = weighted.withColumn("_h", h)
    naive = base.withColumn(
        "cum",
        F.sum("w")
        .over(
            Window.orderBy("_h", "doc_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    two_level = SH.bucketed_global_cumsum(
        base,
        bucket=F.expr(f"_h div {1 << 26}"),
        order_cols=[F.col("_h"), F.col("doc_id")],
        val_col="w",
    )
    got = {r.doc_id: r.cum for r in two_level.collect()}
    want = {r.doc_id: r.cum for r in naive.collect()}
    assert got == want


def test_no_full_table_single_partition_window(weighted):
    """The plan gate: the corpus-sized window must be hash-partitioned;
    only the per-bucket offsets aggregate (≤ n_buckets rows) may pass
    through a SinglePartition exchange."""
    plan = SH.bucketed_global_rank(
        weighted, bucket=-F.col("w"), order_cols=[F.col("doc_id")]
    )._jdf.queryExecution().executedPlan().toString()
    # the big-side window must come with a hashpartitioning exchange on
    # the bucket column
    assert "hashpartitioning(_bucket" in plan


def test_round_robin_shards_balance(weighted):
    n = 8
    sh = SH.round_robin_shards(weighted, n_shards=n, weight_col="w")
    stats = (
        sh.groupBy("shard").agg(F.sum("w").alias("tot")).collect()
    )
    assert len(stats) == n
    tots = [r.tot for r in stats]
    max_w = 99  # (id*37)%97+3 ≤ 99
    # longest-first dealing: shard totals within one max-row weight of
    # each other is the textbook bound for round-robin on sorted input
    assert max(tots) - min(tots) <= max_w


def test_token_budget_shards_bounds(weighted):
    budget = 700
    sh = SH.token_budget_shards(weighted, budget=budget, weight_col="w")
    rows = sh.collect()
    # shard of a row is floor(preceding_cum / budget): totals per shard
    # land in [budget - max_w, budget + max_w] except the final shard
    stats = {}
    for r in rows:
        stats.setdefault(r.shard, 0)
        stats[r.shard] += r.w
    shards = sorted(stats)
    assert shards == list(range(len(shards)))  # contiguous ids from 0
    max_w = 99
    for s in shards[:-1]:
        assert budget - max_w <= stats[s] <= budget + max_w
    # deterministic: same seed ⇒ same assignment
    again = {
        r.doc_id: r.shard
        for r in SH.token_budget_shards(
            weighted, budget=budget, weight_col="w"
        ).collect()
    }
    assert again == {r.doc_id: r.shard for r in rows}

# ---------------------------------------------------------------------------
# Value-ordered two-level rank/cumsum (the ntile / Pareto-cumsum path):
# bounded equi-width buckets instead of one bucket per distinct value,
# so near-unique metrics (lifetime spend) keep a broadcastable offsets
# table.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def metrics(spark):
    # near-unique metric values (the case bucket=-metric can't handle)
    # plus a block of exact ties (the ordering-determinism case)
    return spark.range(400).select(
        F.col("id").alias("ck"),
        F.when(F.col("id") < 50, F.lit(7777))
        .otherwise((F.col("id") * 104729) % 1000003)
        .cast("long")
        .alias("m"),
    )


def test_ranked_desc_by_value_equals_naive_window(spark, metrics):
    naive = metrics.withColumn(
        "global_rn",
        F.row_number()
        .over(Window.orderBy(F.col("m").desc(), F.col("ck").asc()))
        .cast("long"),
    )
    got = {
        r.ck: r.global_rn
        for r in SH.ranked_desc_by_value(metrics, "m", "ck").collect()
    }
    want = {r.ck: r.global_rn for r in naive.collect()}
    assert got == want


def test_cumsum_desc_by_value_equals_naive_window(spark, metrics):
    naive = metrics.withColumn(
        "cum",
        F.sum("m")
        .over(
            Window.orderBy(F.col("m").desc(), F.col("ck").asc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    got = {
        r.ck: r.cum
        for r in SH.cumsum_desc_by_value(
            metrics, "m", "ck", val_col="m"
        ).collect()
    }
    want = {r.ck: r.cum for r in naive.collect()}
    assert got == want


@pytest.mark.parametrize("n", [1, 3, 4, 5, 6, 7, 10, 400])
def test_ntile_expr_matches_sql_ntile(spark, n):
    # SQL ntile: first (n mod k) tiles get one extra row — NOT the
    # even-spread floor((rank-1)k/n)+1 binning (differs at n=6, k=4)
    df = spark.range(n).select(F.col("id").alias("ck"))
    ranked = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("ck")).cast("long")
    ).withColumn("nn", F.lit(n).cast("long"))
    got = {
        r.ck: r.t
        for r in ranked.withColumn(
            "t", SH.ntile_expr("rn", "nn", 4)
        ).collect()
    }
    want = {
        r.ck: r.t
        for r in df.withColumn(
            "t", F.ntile(4).over(Window.orderBy("ck")).cast("long")
        ).collect()
    }
    assert got == want


def test_value_rank_window_is_bucket_partitioned(spark, metrics):
    plan = (
        SH.ranked_desc_by_value(metrics, "m", "ck")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(_bucket" in plan
    # bounded bucket count: the offsets table stays broadcastable
    n_buckets = (
        SH._with_desc_value_buckets(metrics, "m", 1024)
        .select("_vbucket")
        .distinct()
        .count()
    )
    assert n_buckets <= 1025


def test_ranked_asc_by_value_equals_naive_window(spark, metrics):
    naive = metrics.withColumn(
        "global_rn",
        F.row_number()
        .over(Window.orderBy(F.col("m").asc(), F.col("ck").asc()))
        .cast("long"),
    )
    got = {
        r.ck: r.global_rn
        for r in SH.ranked_asc_by_value(metrics, "m", "ck").collect()
    }
    want = {r.ck: r.global_rn for r in naive.collect()}
    assert got == want


def test_ranked_asc_by_value_is_bucket_partitioned(spark, metrics):
    plan = (
        SH.ranked_asc_by_value(metrics, "m", "ck")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(_bucket" in plan, plan[:1500]


# ---------------------------------------------------------------------------
# Fused multi-metric rank (round-9 optimization): one two-level pass
# must equal the per-metric single-rank composition, mixed directions,
# including ties and a near-unique metric.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def multi_metrics(spark):
    return spark.range(400).select(
        F.col("id").alias("ck"),
        F.when(F.col("id") < 50, F.lit(7777))
        .otherwise((F.col("id") * 104729) % 1000003)
        .cast("long")
        .alias("m1"),
        ((F.col("id") * 7919) % 97).cast("long").alias("m2"),
        (F.col("id") % 3).cast("long").alias("m3"),
    )


def test_multi_ranked_equals_single_rank_composition(spark, multi_metrics):
    fused = {
        r.ck: (r.r1, r.r2, r.r3, r.n)
        for r in SH.multi_ranked_by_value(
            multi_metrics,
            [("m1", "desc", "r1"), ("m2", "asc", "r2"), ("m3", "desc", "r3")],
            tiebreak="ck",
            n_name="n",
        ).collect()
    }
    r1 = {
        r.ck: r.r1
        for r in SH.ranked_desc_by_value(
            multi_metrics, "m1", "ck", rank_name="r1"
        ).collect()
    }
    r2 = {
        r.ck: r.r2
        for r in SH.ranked_asc_by_value(
            multi_metrics, "m2", "ck", rank_name="r2"
        ).collect()
    }
    r3 = {
        r.ck: r.r3
        for r in SH.ranked_desc_by_value(
            multi_metrics, "m3", "ck", rank_name="r3"
        ).collect()
    }
    n = multi_metrics.count()
    assert fused == {ck: (r1[ck], r2[ck], r3[ck], n) for ck in r1}


def test_multi_ranked_window_is_bucket_partitioned(spark, multi_metrics):
    plan = (
        SH.multi_ranked_by_value(
            multi_metrics,
            [("m1", "desc", "r1"), ("m2", "asc", "r2")],
            tiebreak="ck",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every corpus-sized window hash-partitions on (signal, bucket) —
    # never an empty partition spec (single-task global sort)
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(_sig" in line, line
    assert "hashpartitioning(_sig" in plan, plan[:1500]
