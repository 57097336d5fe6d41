"""Split & mixing tour — how the engine takes a curated corpus to a
training-ready configuration, built entirely from registered queries:

  1. naive split        train_test_split (per-doc hash — fast, leaky)
  2. measure the leak   split_leakage_clusters (near-dup clusters that
                        straddle the naive train/test boundary)
  3. fix it             cluster_safe_split (whole clusters assigned via
                        canonical-id hash — zero leaks by construction)
  4. mix                domain_reweighting (hardness-proportional source
                        weights) + corpus_mix_allocation (weights ->
                        per-source take counts)

Usage: python examples/splits_and_mixing.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from svs_spark.queries import queries
    from svs_spark.session import get_session

    spark = get_session("splits_and_mixing")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()

    print(f"# Split & mixing report — {SF}\n")

    print("## 1. Naive per-doc split")
    for r in reg["train_test_split"](spark, SF).collect():
        print(f"  {r['split']}: {r['n_docs']} docs (avg {r['avg_chars']:.0f} chars)")

    print("\n## 2. Leakage the naive split causes")
    leaks = reg["split_leakage_clusters"](spark, SF).collect()
    if leaks:
        for r in leaks[:5]:
            print(f"  cluster {r[0]}: spans splits ({tuple(r)[1:]})")
        print(f"  ... {len(leaks)} leaking clusters total")
    else:
        print("  no cross-split near-dup clusters at this sf (the synthetic")
        print("  corpus is leak-light; the planted pytest exercises the leak)")

    print("\n## 3. Cluster-safe split (leak-free by construction)")
    for r in reg["cluster_safe_split"](spark, SF).collect():
        print(
            f"  {r['split']}: {r['n_docs']} docs in {r['n_clusters']} clusters"
            f" (docs-clusters gap {r['n_docs'] - r['n_clusters']})"
        )

    print("\n## 4. Source mixing")
    w = sorted(
        reg["domain_reweighting"](spark, SF).collect(),
        key=lambda r: -r["mix_weight"],
    )
    for r in w[:3]:
        print(
            f"  {r['source']}: weight {r['mix_weight']:.4f}"
            f" ({r['decibits_per_token']} decibits/token,"
            f" {r['n_tokens']} tokens)"
        )
    print("  ... lowest:", ", ".join(
        f"{r['source']} {r['mix_weight']:.4f}" for r in w[-2:]
    ))
    alloc = reg["corpus_mix_allocation"](spark, SF).limit(3).collect()
    cols = alloc[0].asDict().keys() if alloc else []
    print(f"  allocation preview ({', '.join(cols)}):")
    for r in alloc:
        print(f"    {tuple(r)}")

    spark.stop()


if __name__ == "__main__":
    main()
