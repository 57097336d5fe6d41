"""Audit output TYPE parity between Spark queries() and DuckDB oracle_sql().

The driver hashes result values after engine-native extraction, so a
DuckDB HUGEINT (from ``sum(INTEGER)``) vs a Spark BIGINT hash-mismatches
even when the numbers are equal.  This audits every registered query:
each output column's DuckDB type must map to the Spark type exactly.

Also flags order-DEPENDENT float aggregates (sum/avg over DOUBLE reaching
the output) which drift between Spark's partial aggregation and DuckDB's
serial fold — those need fixed-point or decimal summation.

Usage: python tools/type_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SVS_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# DuckDB type -> Spark dtype string (canonical forms)
DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "hugeint",       # never equal to any Spark type -> always flagged
    "UBIGINT": "uhugeint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "REAL": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp",
    "DATE": "date",
    "BLOB": "binary",
}


def duck_type_to_spark(t: str) -> str:
    t = t.strip()
    m = re.match(r"^DECIMAL\((\d+),(\d+)\)$", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.match(r"^(.*)\[\]$", t)
    if m:
        return f"array<{duck_type_to_spark(m.group(1))}>"
    return DUCK_TO_SPARK.get(t, f"?{t}?")


def main():
    import duckdb

    from svs_spark.queries import oracle_sql, queries
    from svs_spark.session import get_session

    names = sys.argv[1:]
    q = queries()
    o = oracle_sql()
    if not names:
        names = sorted(q)

    spark = get_session("type_audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = []
    for name in names:
        if name not in o:
            continue
        try:
            s_types = dict(q[name](spark, SF_DIR).dtypes)
            d = con.sql(f"DESCRIBE ({o[name]})").fetchall()
            d_types = {row[0]: duck_type_to_spark(row[1]) for row in d}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            bad.append(name)
            continue
        if set(s_types) != set(d_types):
            print(f"{name}: COLUMN SET {sorted(s_types)} vs {sorted(d_types)}")
            bad.append(name)
            continue
        mismatch = {
            c: (s_types[c], d_types[c])
            for c in s_types
            if s_types[c] != d_types[c]
        }
        if mismatch:
            print(f"{name}: TYPES {mismatch}")
            bad.append(name)
    print(f"\n{len(bad)} queries with type mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
