"""Registry-wide audit gates, wrapping the standalone tools so drift is
caught by `pytest` instead of a manual run:

- TYPE parity: every oracle output column's DuckDB type must map to the
  Spark type exactly (a HUGEINT from sum(INTEGER) hash-mismatches in
  the driver even when values are equal — caught live in round 5 on
  temperature_resample's id_checksum).
- PLAN anti-patterns: no CartesianProduct / BroadcastNestedLoopJoin
  outside the documented 1-row-scalar-cross allowlist, and no
  row-at-a-time Python UDF (BatchEvalPython) anywhere.
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
