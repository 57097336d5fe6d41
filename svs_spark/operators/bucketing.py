"""Co-located joins via Spark bucketed tables — the zero-shuffle path
for repeated large-×-large joins.

At 100 TB the dominant cost of a fact⋈fact join (orders⋈lineitem,
docs⋈chunks, corpus⋈dedup-pairs) is the shuffle of BOTH sides. If the
tables are written once with ``bucketBy(n, key)`` into the catalog, every
subsequent equi-join or aggregation on that key is exchange-free: each
task reads bucket i of both sides and joins locally (Spark's
SortMergeJoin with bucketed scan, no ShuffleExchange in the plan).

This module wraps the write/read/verify pattern; the plan gate lives in
``tests/test_bucketing.py`` (no ``Exchange`` node on the join key).
Bucket counts should match downstream parallelism (a divisor/multiple of
executor cores × nodes); mismatched-bucket joins fall back to shuffling
the smaller side only.

The KB warehouse's ``_pb``-partitioned docs layout (point-update
locality) and this catalog bucketing (join locality) are complementary:
partitioning prunes reads, bucketing pre-co-locates joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog bucketed parquet table (external at
    ``path`` when given — bucket metadata lives in the catalog either
    way, which is what lets the planner elide the exchange).

    ``sortBy`` within buckets additionally enables sort-merge joins to
    skip the per-task sort (both sides pre-sorted on the key).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts the physical plan contains NO shuffle
    exchange — each task reads corresponding buckets of both tables.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)


def join_is_shuffle_free(df: DataFrame) -> bool:
    """True when the executed plan has no shuffle Exchange node
    (bucketed co-location worked).  AQE wraps plans, so inspect the
    full string form."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
