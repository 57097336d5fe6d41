"""Driver simulation: exercises the __spark_entry__ contract exactly as
the round driver does (entry smoke + queries-vs-DuckDB-oracle compare).

Usage:
    python tools/drive_entry.py                # full oracle compare at sf0.01
    SVS_DRIVE_SF=/root/testdata/sf0.1 \
        python tools/drive_entry.py --counts-only
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    return v


def main() -> int:
    counts_only = "--counts-only" in sys.argv
    sf = os.environ.get("SVS_DRIVE_SF", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = E.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")

    qs, oracles = E.queries(), E.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles")
    fails = 0

    if counts_only:
        for name, fn in sorted(qs.items()):
            print(f"  {name}@{sf}: {fn(spark, sf).count()} rows")
        spark.stop()
        return 0

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        scols = sorted(sdf.columns)
        srows = sorted(
            [tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=repr
        )
        if name not in oracles:
            print(f"  {name}: rows-only {len(srows)} rows")
            if not srows:
                fails += 1
                print(f"  {name}: FAIL rows-only query returned 0 rows")
            continue
        res = con.sql(oracles[name])
        dcols_raw = res.columns
        order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        drows = sorted(
            [tuple(norm(row[i]) for i in order) for row in res.fetchall()],
            key=repr,
        )
        ok = scols == sorted(dcols_raw) and srows == drows
        if not ok:
            fails += 1
            print(
                f"  {name}: MISMATCH cols {scols} vs {sorted(dcols_raw)} "
                f"rows {len(srows)} vs {len(drows)}"
            )
            shown = 0
            for a, b in zip(srows, drows):
                if a != b and shown < 3:
                    print("    ", a, "!=", b)
                    shown += 1
        else:
            print(f"  {name}: MATCH ({len(srows)} rows)")
    print("FAILURES:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
