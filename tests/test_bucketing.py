"""Bucketed-table co-location: a join between two tables bucketed on
the same key with the same bucket count must plan WITHOUT any shuffle
exchange — the 100 TB repeated-join strategy (write once bucketed,
join/aggregate forever shuffle-free)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from svs_spark.operators.bucketing import (
    colocated_join,
    join_is_shuffle_free,
    write_bucketed_table,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8,
                         sort_by="o_orderkey", path=str(wh / "b_orders"))
    write_bucketed_table(lineitem, "b_lineitem", "o_orderkey", 8,
                         sort_by="o_orderkey", path=str(wh / "b_lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = colocated_join(spark, lt, rt, "o_orderkey")
    assert join_is_shuffle_free(j), (
        j._jdf.queryExecution().executedPlan().toString()[:2000]
    )


def test_colocated_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = colocated_join(spark, lt, rt, "o_orderkey")
    plain = spark.read.parquet(f"{SF_DIR}/orders.parquet").join(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity",
            "l_extendedprice",
        ),
        "o_orderkey",
    )
    assert j.count() == plain.count()


def test_bucketed_aggregation_no_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also skips the exchange."""
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("o_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert join_is_shuffle_free(agg), (
        agg._jdf.queryExecution().executedPlan().toString()[:2000]
    )


class TestMergeInto:
    def _wh(self, spark, tmp_path):
        from svs_spark.sources.warehouse import Warehouse

        wh = Warehouse(spark, str(tmp_path / "wh"))
        base = spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], "k long, payload string"
        )
        wh.write_bucketed("t", base, "k", 8)
        return wh

    def test_upsert_replaces_and_inserts(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        updates = spark.createDataFrame(
            [(3, "NEW3"), (11, "NEW11"), (100, "NEW100")],
            "k long, payload string",
        )
        stats = wh.merge_into("t", updates)
        assert stats["buckets"] == [3, 4]  # pmod(3)=3, pmod(11)=3, pmod(100)=4
        got = {r.k: r.payload for r in wh.read("t").collect()}
        assert len(got) == 41
        assert got[3] == "NEW3" and got[11] == "NEW11"
        assert got[100] == "NEW100"
        assert got[5] == "v5"  # untouched row intact

    def test_delete_removes_only_given_keys(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        dels = spark.createDataFrame([(7,), (15,)], "k long")
        wh.merge_into("t", dels, delete=True)
        ks = {r.k for r in wh.read("t").collect()}
        assert 7 not in ks and 15 not in ks and len(ks) == 38

    def test_merge_touches_only_matched_buckets(self, spark, tmp_path):
        import os

        wh = self._wh(spark, tmp_path)
        path = wh.table_path("t")

        def inventory():
            out = {}
            for d in os.listdir(path):
                if d.startswith("_pb="):
                    sub = os.path.join(path, d)
                    out[d] = {
                        (f, os.stat(os.path.join(sub, f)).st_mtime_ns)
                        for f in os.listdir(sub)
                    }
            return out

        before = inventory()
        updates = spark.createDataFrame([(9, "X")], "k long, payload string")
        wh.merge_into("t", updates)
        after = inventory()
        assert after["_pb=1"] != before["_pb=1"]
        for d in before:
            if d != "_pb=1":
                assert after[d] == before[d], f"{d} must stay byte-identical"
