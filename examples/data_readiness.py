"""Training-data readiness report — the final pre-flight a data team
runs AFTER curation, answering "is this snapshot safe and efficient to
train on?", built entirely from registered engine queries:

  packing      512-token context-window economics (padding waste,
               boundary-split docs, worst-case fragmentation)
  leakage      fuzzy train/eval contamination (3-gram eval containment)
               + near-dup clusters straddling the split boundary
  drift        per-source length-distribution KS vs the corpus
  thresholds   cross-source decile alignment of the quality score
               (can one global filter threshold be trusted?)
  calibration  reliability bins of the score against a label
  semantics    SemDeDup within-cluster near-duplicate pairs

Usage: python examples/data_readiness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from svs_spark.session import get_session
    from svs_spark.queries import queries

    spark = get_session("data_readiness")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    print(f"=== data readiness report: {SF} ===\n")

    pack = q["sequence_packing_stats"](spark, SF).first()
    waste = pack["pad_tokens"] / max(pack["total_tokens"], 1)
    print(
        f"packing   ctx={pack['ctx']}: {pack['n_windows']} windows for "
        f"{pack['total_tokens']} tokens, pad waste {waste:.4%}, "
        f"{pack['n_split_docs']}/{pack['n_docs']} docs split across a "
        f"boundary, max {pack['max_docs_per_window']} docs in one window"
    )

    leaks = q["decontaminate_fuzzy"](spark, SF).collect()
    print(
        f"leakage   {len(leaks)} (train, eval) pairs at >=80% eval "
        f"containment (worst: "
        f"{max((r['eval_containment'] for r in leaks), default=0):.3f})"
    )
    clusters = q["split_leakage_clusters"](spark, SF).collect()
    print(
        f"          {len(clusters)} near-dup clusters straddle the "
        f"train/test boundary (move whole clusters to one side)"
    )

    ks = q["source_length_ks"](spark, SF).collect()
    worst = max(ks, key=lambda r: r["ks_stat"])
    print(
        f"drift     worst source-vs-corpus length KS: {worst['source']} "
        f"D={worst['ks_stat']:.3f} at n_chars={worst['at_n_chars']}"
    )

    align = q["score_quantile_align"](spark, SF).collect()
    worst_shift = max(align, key=lambda r: abs(r["shift_fp"]))
    print(
        f"threshold largest decile shift vs corpus: "
        f"{worst_shift['source']} decile {worst_shift['decile']} "
        f"({worst_shift['shift_fp']:+d} fixed-point)"
    )

    bins = q["score_calibration_bins"](spark, SF).collect()
    n = sum(r["n_docs"] for r in bins)
    ece = sum(
        r["n_docs"] * abs(r["acc_fp"] - r["conf_fp"]) for r in bins
    ) / max(n, 1) / 1e6
    print(f"calibrate ECE of the score vs label: {ece:.4f} over {len(bins)} bins")

    sem = q["semdedup_pairs"](spark, SF).collect()
    print(
        f"semantics {len(sem)} SemDeDup within-cluster pairs above "
        f"threshold (candidates for keep-lowest-id removal)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
