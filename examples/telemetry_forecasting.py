"""Telemetry forecasting & drift monitoring tour over the events
stream — the round-6 temporal family end-to-end:

1. TREND      — Theil-Sen robust slope per event type (median of
                pairwise daily slopes: outlier-proof "is it growing")
2. FORECAST   — Holt-Winters additive level+trend+season fit on the
                daily series (weekly season), with the fit-quality
                numbers a forecasting pipeline monitors and the
                next-step forecast from the final state
3. ANOMALIES  — EWMA level + 3σ residual flags over the same series
                (the streaming z-score's batch twin)
4. DRIFT      — each type's VALUE histogram vs the 'view' type as
                reference via the two-sample KS evaluator — including
                mass in buckets the reference never saw; then the
                SAME evaluator applied to a live windowed histogram
                stream drained with availableNow (state bounded at 32
                cells per window×type, drift verdicts computed on the
                drained table without re-reading the stream)

All batch steps are registered, oracle-gated queries; the streaming
step reuses the exact evaluator the batch query runs.

Usage: python examples/telemetry_forecasting.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import functions as F

    from svs_spark.session import get_session
    from svs_spark.queries import queries
    from svs_spark.streaming.drift import (
        ks_vs_reference,
        value_histogram_stream,
    )
    from svs_spark.streaming.sessions import run_to_memory, stream_events

    spark = get_session("telemetry_forecasting")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    print(f"=== telemetry forecasting report: {SF} ===\n")

    trend = {r["event_type"]: r for r in q["theil_sen_trend"](spark, SF).collect()}
    hw = {r["event_type"]: r for r in q["holt_winters_forecast"](spark, SF).collect()}
    ew = {r["event_type"]: r for r in q["ewma_anomaly_counts"](spark, SF).collect()}
    for et in sorted(trend):
        t, h, e = trend[et], hw.get(et), ew.get(et)
        line = (
            f"{et:<10} slope {t['slope_per_day']:+.2f}/day over "
            f"{t['n_days']} days"
        )
        if h is not None:
            rmse = (h["sse_fp"] / 1e6 / max(h["n_fitted"], 1)) ** 0.5
            line += (
                f"; HW fit rmse {rmse:.2f} over {h['n_fitted']} steps, "
                f"next {h['next_forecast']:.1f}"
            )
        if e is not None:
            line += f"; {e['n_anomalies']}/{e['n_obs']} EWMA 3-sigma days"
        print(line)

    print("\n--- value-distribution drift vs 'view' reference ---")
    for r in sorted(
        q["value_drift_ks"](spark, SF).collect(),
        key=lambda r: -r["ks_stat"],
    ):
        print(
            f"{r['event_type']:<10} KS {r['ks_stat']:.4f} at bucket "
            f"{r['at_bucket']} over {r['n_obs']} events"
        )

    print("\n--- streaming drift monitor (availableNow drain) ---")
    stream = value_histogram_stream(
        stream_events(spark, SF),
        window_duration="6 hours",
        watermark="1 hour",
        lo=0.0,
        hi=1000.0,
        n_buckets=32,
    )
    run_to_memory(stream, "telemetry_drift_sink", output_mode="append")
    hist = spark.table("telemetry_drift_sink")
    ref = hist.groupBy("bucket").agg(F.sum("n").alias("n"))
    verdicts = (
        ks_vs_reference(hist, ref)
        .orderBy(F.desc("ks_stat"))
        .limit(5)
        .collect()
    )
    n_windows = hist.select("window_start").distinct().count()
    print(
        f"{n_windows} closed 6h windows drained; top drifting "
        f"(window, type) cells vs pooled history:"
    )
    for r in verdicts:
        print(
            f"  {r['window_start']} {r['grp']:<10} KS {r['ks_stat']:.4f} "
            f"(n={r['n_obs']})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
