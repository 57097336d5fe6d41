"""Exact-value parity diff between Spark queries() and DuckDB oracle_sql().

The driver's correctness gate hashes exact values (no float rounding);
this tool mirrors that and prints the first differing cells per query so
float-drift / regex-semantics mismatches can be root-caused.

Usage: python tools/parity_debug.py [query ...]   (default: all)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SVS_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def spark_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def duck_rows(con, sql):
    res = con.sql(sql)
    cols = res.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(row[i]) for i in order) for row in res.fetchall()]
    return sorted(cols), sorted(rows, key=repr)


def main():
    import duckdb

    from svs_spark.queries import oracle_sql, queries
    from svs_spark.session import get_session

    names = sys.argv[1:]
    q = queries()
    o = oracle_sql()
    if not names:
        names = sorted(n for n in q if n in o)

    spark = get_session("parity_debug")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = []
    for name in names:
        if name not in o:
            print(f"{name}: no oracle (rows-only)")
            continue
        try:
            s_cols, s = spark_rows(q[name](spark, SF_DIR))
            d_cols, d = duck_rows(con, o[name])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            bad.append(name)
            continue
        if s_cols != d_cols:
            print(f"{name}: COLS {s_cols} vs {d_cols}")
            bad.append(name)
            continue
        if len(s) != len(d):
            print(f"{name}: ROWS {len(s)} vs {len(d)}")
            bad.append(name)
            continue
        diffs = [(a, b) for a, b in zip(s, d) if a != b]
        if diffs:
            print(f"{name}: {len(diffs)}/{len(s)} rows differ; cols={s_cols}")
            for a, b in diffs[:3]:
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"    col {s_cols[i]}: spark={x!r} duck={y!r}")
            bad.append(name)
        else:
            print(f"{name}: OK ({len(s)} rows)")
    print(f"\n{len(bad)} mismatched: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
