"""Shared plumbing for the persisted sketch-rollup family
(hll_rollup: max-merge, cm_rollup: sum-merge, minhash_rollup:
min-merge).

Concurrency/atomicity contract (ADVICE round 4, enforced round 6): the
rollup tables are plain partitioned parquet, so appends require a
SINGLE WRITER per rollup path — Spark's dynamic partition overwrite is
not transactional, and a failure mid-commit can leave a touched day
partition partially rewritten (re-run the append to repair: the merge
is idempotent because it recomputes from the batch + the surviving
cells). Round 6 turns the assumption into an invariant: every
day-partition overwrite runs under the advisory cross-process writer
lock (``sources.warehouse.path_writer_lock``), so a second concurrent
appender fails fast instead of interleaving its read-merge-write with
ours. The overwrite mode is scoped to the one writer via the
DataFrameWriter option, never the session conf, so concurrent writers
to OTHER paths in the same session are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from svs_spark.sources.warehouse import path_writer_lock


def overwrite_day_partitions(df: DataFrame, path: str) -> None:
    """Dynamic-overwrite ONLY the day partitions present in ``df``,
    under the per-path writer lock (concurrent appenders to the same
    rollup would otherwise interleave read-merge-write cycles).

    The ``partitionOverwriteMode`` writer option takes precedence over
    ``spark.sql.sources.partitionOverwriteMode`` and applies to this
    write alone — no session-global conf flip (which would leak dynamic
    overwrite into concurrent writers for the duration of the write).
    """
    with path_writer_lock(path):
        (
            df.repartition("day")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(path)
        )


def rollup_day_range(spark: SparkSession, path: str) -> tuple[int, int]:
    """Min/max day present, from partition DIRECTORY NAMES only (no
    data read) — via the Hadoop FileSystem API, so it works for any
    supported filesystem (file://, hdfs://, s3a://...), not just the
    local filesystem ``os.listdir`` can see."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    days = [
        int(name.split("=", 1)[1])
        for st in fs.listStatus(hpath)
        if (name := st.getPath().getName()).startswith("day=")
    ]
    if not days:
        raise ValueError(f"no day= partitions under {path}")
    return min(days), max(days)
