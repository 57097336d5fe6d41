"""Registry-wide audit gates, wrapping the standalone tools so drift is
caught by `pytest` instead of a manual run:

- TYPE parity: every oracle output column's DuckDB type must map to the
  Spark type exactly (a HUGEINT from sum(INTEGER) hash-mismatches in
  the driver even when values are equal — caught live in round 5 on
  temperature_resample's id_checksum).
- PLAN anti-patterns: no CartesianProduct / BroadcastNestedLoopJoin
  outside the documented 1-row-scalar-cross allowlist, and no
  row-at-a-time Python UDF (BatchEvalPython) anywhere.
- GREEN-ON-EMPTY: every registered query must return >= 1 row at
  sf0.1 OR name the planted-truth pytest that exercises it on a
  non-empty corpus (the bag-of-words / source_dup_overlap class of
  silent pass, round-5 verdict ask #7).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from tests.conftest import SF_DIR
from svs_spark.queries import oracle_sql, queries


@pytest.fixture(scope="module")
def duck_views():
    from type_audit import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_oracle_types_match_spark(spark, duck_views):
    from type_audit import duck_type_to_spark

    q, o = queries(), oracle_sql()
    bad = {}
    for name in sorted(o):
        s_types = dict(q[name](spark, SF_DIR).dtypes)
        d = duck_views.sql(f"DESCRIBE ({o[name]})").fetchall()
        d_types = {row[0]: duck_type_to_spark(row[1]) for row in d}
        if set(s_types) != set(d_types):
            bad[name] = ("columns", sorted(s_types), sorted(d_types))
            continue
        mism = {
            c: (s_types[c], d_types[c])
            for c in s_types
            if s_types[c] != d_types[c]
        }
        if mism:
            bad[name] = mism
    assert not bad, bad


# Queries whose sf0.1 result is LEGITIMATELY empty (the synthetic
# corpus lacks the phenomenon), each credited to the pytest that runs
# it against planted non-empty truth. test_planted_truth_allowlist_is_live
# asserts the referenced tests exist, so the allowlist cannot go stale.
PLANTED_TRUTH = {
    "dedup_bag_of_words":
        "test_quality_ops.py::test_dedup_bag_of_words_planted_groups",
    "source_dup_overlap":
        "test_quality_ops.py::test_source_dup_overlap_planted_cross_source",
}

SF01_DIR = "/root/testdata/sf0.1"


def test_no_green_on_empty(spark):
    """Every registered query must prove it can produce rows: >= 1 row
    on the sf0.1 corpus (falling back to the sf0.01 oracle corpus —
    some thresholds legitimately cross zero in one direction, e.g.
    tpch_q11ish's value-share cut yields 238 rows at sf0.01 and none
    at sf0.1), or a planted-truth pytest in PLANTED_TRUTH."""
    from tests.conftest import SF_DIR_ORACLE

    bad = []
    for name, fn in sorted(queries().items()):
        if name in PLANTED_TRUTH:
            continue
        if not fn(spark, SF01_DIR).head(1) and not fn(
            spark, SF_DIR_ORACLE
        ).head(1):
            bad.append(name)
    assert not bad, (
        f"queries empty at sf0.1 AND sf0.01 with no planted-truth "
        f"pytest: {bad}"
    )


def test_planted_truth_allowlist_is_live():
    here = os.path.dirname(__file__)
    for name, nodeid in PLANTED_TRUTH.items():
        fname, func = nodeid.split("::")
        path = os.path.join(here, fname)
        assert os.path.exists(path), (name, path)
        with open(path) as f:
            assert f"def {func}(" in f.read(), (name, nodeid)


def test_no_plan_antipatterns(spark):
    from plan_audit import ONE_ROW_CROSS_OK

    bad = {}
    for name, fn in sorted(queries().items()):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        findings = []
        if "CartesianProduct" in plan and name not in ONE_ROW_CROSS_OK:
            findings.append("CartesianProduct")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in ONE_ROW_CROSS_OK
        ):
            findings.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            findings.append("row-at-a-time Python UDF")
        if findings:
            bad[name] = findings
    assert not bad, bad
