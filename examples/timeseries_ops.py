"""Time-series operations tour over the events stream.

Demonstrates the round-3 temporal/quality operators end-to-end:

1. GAP FILL    — per-user hourly grid, LOCF and linear interpolation
                 (query_defs.q_gapfill_locf / q_gapfill_interpolate)
2. OUTLIERS    — batch median/MAD screen (q_event_outliers_mad), then
                 the streaming twins: exact-moment z-scores and the
                 P² robust median/MAD screen, replayed over the same
                 parquet with availableNow
3. LAYOUT      — rewrite events z-ordered on (user, hour) and measure
                 how many files a 2-D box predicate touches vs a
                 time-sorted layout (operators/layout.py)

Usage:
    python examples/timeseries_ops.py [sf_dir]  (default /root/testdata/sf0.01)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from svs_spark import get_session
from svs_spark.operators import layout as LAY
from svs_spark.queries import load, queries
from svs_spark.streaming.anomaly import (
    batch_zscore_outliers,
    robust_outlier_stream,
    zscore_outlier_stream,
)
from svs_spark.streaming.sessions import run_to_memory, stream_events


def main(sf_dir: str) -> None:
    spark = get_session("timeseries_ops_example")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()

    print("== 1. gap fill ==")
    locf = reg["gapfill_locf"](spark, sf_dir)
    interp = reg["gapfill_interpolate"](spark, sf_dir)
    n_grid = locf.count()
    n_gaps = locf.filter(F.col("n_events") == 0).count()
    print(f"grid rows: {n_grid}, filled gaps: {n_gaps}")
    print("sample (interpolated):")
    interp.filter(F.col("n_events") == 0).show(5, truncate=False)

    print("== 2. outliers ==")
    mad = reg["event_outliers_mad"](spark, sf_dir)
    mad.show(truncate=False)
    zb = batch_zscore_outliers(load(spark, sf_dir, "events"), k=3.0)
    print(f"batch z-score flags (k=3): {zb.count()}")
    run_to_memory(
        zscore_outlier_stream(stream_events(spark, sf_dir), k=3.0),
        "ex_z_flags", output_mode="append",
    )
    run_to_memory(
        robust_outlier_stream(stream_events(spark, sf_dir), k=6.0),
        "ex_robust_flags", output_mode="append",
    )
    print(
        "streaming flags — exact-moment:",
        spark.table("ex_z_flags").count(),
        " robust P²(k=6):",
        spark.table("ex_robust_flags").count(),
    )

    print("== 3. z-order layout ==")
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000 div 3600000000").alias("b"), "value"
    )
    mnb = ev.agg(F.min("b")).collect()[0][0]
    norm = ev.select("user_id", (F.col("b") - F.lit(mnb)).alias("y"), "value")
    with tempfile.TemporaryDirectory() as tmp:
        zdir, tdir = f"{tmp}/z", f"{tmp}/t"
        LAY.write_zordered(
            norm, zdir, [F.col("user_id"), F.expr("y * 149 div 719")],
            n_files=32,
        )
        (
            norm.repartitionByRange(32, "y")
            .sortWithinPartitions("y")
            .write.mode("overwrite").parquet(tdir)
        )
        box = (
            (F.col("user_id").between(40, 47)) & (F.col("y").between(100, 163))
        )
        zt = LAY.files_touched(spark.read.parquet(zdir).filter(box))
        tt = LAY.files_touched(spark.read.parquet(tdir).filter(box))
        print(
            f"2-D box predicate: z-ordered touches {zt}/32 files, "
            f"time-sorted touches {tt}/32"
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
