"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle is run on Spark AND DuckDB at sf0.01 and compared on
row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR_ORACLE


def _normalize(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 6)
    return val


def _spark_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(_normalize(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def _duck_rows(con, sql):
    res = con.sql(sql)
    cols = res.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [
        tuple(_normalize(row[i]) for i in order) for row in res.fetchall()
    ]
    return sorted(cols), sorted(rows, key=repr)


def _all_pairs():
    from svs_spark.queries import queries, oracle_sql

    q = queries()
    o = oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize(
    "name,fn,oracle", _all_pairs(), ids=[p[0] for p in _all_pairs()]
)
def test_oracle_parity(spark, duck, name, fn, oracle):
    df = fn(spark, SF_DIR_ORACLE)
    s_cols, s_rows = _spark_rows(df)
    assert len(s_rows) >= 0
    if oracle is None:
        assert len(s_rows) > 0, f"{name}: rows-only query returned 0 rows"
        return
    d_cols, d_rows = _duck_rows(duck, oracle)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
