"""Salting operators must be pure plan rewrites: identical results to
the unsalted equivalents on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from svs_spark.operators.skew import salted_agg, salted_join, top_frequent_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows for key 'hot', a few for everything else
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("cold"), F.col("id") % 10).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["n"])
        for r in salted_agg(skewed, ["k"], sum_cols=["v"], salt=8).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2")], "k string, tag string"
    )
    plain = (
        skewed.join(dim, "k")
        .groupBy("k", "tag")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(skewed, dim, "k", salt=8)
        .groupBy("k", "tag")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_top_frequent_keys(spark, skewed):
    hot = top_frequent_keys(skewed, "k", min_count=1000)
    assert hot == ["hot"]
