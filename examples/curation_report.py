"""Curation health report — the one-stop pre-training corpus review a
data team runs before cutting a snapshot, built entirely from
registered engine queries:

  duplication   exact/canonical survivor groups, containment subsets,
                chunk-boundary split artifacts, length-decile dup mix
  novelty       per-source n-gram novelty (is more crawl still adding
                information?)
  quality       multi-gate survival funnel, length Gini concentration
  tokenizer     top BPE merge candidates (vocabulary fit signal)
  embeddings    per-label centroid drift + norm-outlier batches

Usage: python examples/curation_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from svs_spark.session import get_session
    from svs_spark.queries import queries

    spark = get_session("curation_report")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()

    def rows(name, limit=5):
        return reg[name](spark, SF).limit(limit).collect()

    print(f"# Curation report — {SF}\n")

    print("## Duplication")
    surv = reg["dedup_canonical_pick"](spark, SF)
    agg = surv.groupBy().sum("group_size", "chars_removed").first()
    n_groups = surv.count()
    print(
        f"  survivor groups: {n_groups}"
        + (
            f" | docs in groups: {agg[0]} | chars reclaimed: {agg[1]}"
            if n_groups
            else ""
        )
    )
    print(f"  containment subsets (>=0.9): {reg['ngram_containment_pairs'](spark, SF).count()}")
    print(f"  chunk-boundary artifacts:    {reg['chunk_boundary_overlap'](spark, SF).count()}")
    for r in rows("length_decile_dup_rate", 3):
        print(f"  decile {r['decile']}: {r['n_dup']}/{r['n_docs']} dup docs")

    print("\n## Novelty by source (lowest 3)")
    nov = sorted(
        reg["ngram_novelty_rate"](spark, SF).collect(),
        key=lambda r: r["novelty_rate"],
    )
    for r in nov[:3]:
        print(
            f"  {r['source']}: novelty {r['novelty_rate']:.3f}"
            f" ({r['n_novel']}/{r['n_doc_grams']} grams first-seen here)"
        )

    print("\n## Quality")
    for r in rows("doc_quality_funnel", 6):
        print(f"  {r['stage']}: {r['survivors']} docs survive")
    for r in rows("doc_length_gini", 3):
        print(f"  {r['source']}: length gini {r['gini']:.3f}")

    print("\n## Tokenizer fit — top BPE merge candidates")
    for r in rows("bpe_merge_candidates", 5):
        print(f"  ('{r['tok_a']}', '{r['tok_b']}') x{r['n']}")

    print("\n## Embedding health")
    for r in rows("embedding_centroid_drift", 3):
        print(
            f"  label {r['label']}: half-vs-half cos {r['centroid_cos']:.4f}"
            f" ({r['n_even']}+{r['n_odd']} vecs)"
        )
    for r in rows("embedding_norm_outliers", 3):
        print(
            f"  label {r['label']}: {r['n_outliers']}/{r['n_vecs']}"
            f" norm outliers (mean |v|^2 {r['mean_norm2']:.3f})"
        )

    print("\n## Rule gate (Gopher-style) — worst 3 sources by pass rate")
    gate = sorted(
        reg["gopher_quality_flags"](spark, SF).collect(),
        key=lambda r: r["n_pass"] / r["n_docs"],
    )
    for r in gate[:3]:
        print(
            f"  {r['source']}: {r['n_pass']}/{r['n_docs']} pass"
            f" (wc {r['fail_word_count']}, wlen {r['fail_mean_word_len']},"
            f" sym {r['fail_symbol_ratio']}, alpha {r['fail_alpha_frac']},"
            f" stop {r['fail_stopwords']})"
        )

    print("\n## Mix + privacy")
    for r in sorted(
        reg["source_lang_entropy"](spark, SF).collect(),
        key=lambda r: r["lang_entropy_nats"],
    )[:3]:
        print(
            f"  {r['source']}: lang entropy {r['lang_entropy_nats']:.3f} nats"
            f" over {r['n_langs']} langs"
        )
    ka = reg["k_anonymity_audit"](spark, SF).first()
    print(
        f"  k-anonymity: {ka['n_groups']} QI classes, min size"
        f" {ka['min_group_size']}; rows below k=5: {ka['rows_below_k5']}"
    )

    print("\n## Diversity coreset (greedy k-center coverage radii)")
    for r in rows("kcenter_coreset", 4):
        rad = "seed" if r["radius"] is None else f"{r['radius']:.4f}"
        print(f"  pick {r['pick_round']}: vec {r['vec_id']} (radius {rad})")

    spark.stop()


if __name__ == "__main__":
    main()
