"""Corpus internationalization health check — the pre-ingest pass a
multilingual training pipeline runs before choosing tokenizers,
language filters and dedup keys, built from registered engine queries
plus a planted multilingual slice that demonstrates what each signal
catches:

  script mix     per-source code-point mass by script class
                 (`script_mix_profile`) — mixed-script documents that
                 per-doc language labels flatten
  normalization  NFD/NFC split detection (`nfc_normalization_audit`) —
                 the byte-level divergence that silently defeats every
                 hash-keyed dedup stage
  language       per-(lang, source) document counts (`lang_id_counts`)
  chunking       code-point chunk economics on multilingual text
                 (`rag_chunk_materialized` boundaries are code-point
                 exact across Spark / Python / DuckDB — see
                 tests/test_unicode_semantics.py)

Usage: python examples/i18n_health_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import functions as F

    from svs_spark.session import get_session
    from svs_spark.queries import queries

    spark = get_session("i18n_health_check")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    print(f"=== i18n health check: {SF} ===\n")

    # -- 1. the real corpus, as stored -----------------------------------
    mix = q["script_mix_profile"](spark, SF).collect()
    print("script mix (code points; non-ASCII sources listed):")
    total = sum(r["total_chars"] for r in mix)
    ascii_total = sum(r["ascii_chars"] for r in mix)
    print(
        f"  corpus: {len(mix)} sources,"
        f" ascii={ascii_total / max(total, 1):.4f}"
    )
    for r in sorted(mix, key=lambda r: r["ascii_ratio"]):
        if r["ascii_ratio"] < 0.999:
            print(
                f"  {r['source']:<10} ascii={r['ascii_ratio']:.3f}"
                f" cjk={r['cjk_chars']} arabic={r['arabic_chars']}"
                f" devanagari={r['devanagari_chars']}"
            )

    nfc = q["nfc_normalization_audit"](spark, SF).collect()
    bad = [r for r in nfc if r["n_not_nfc"]]
    print(
        f"\nNFC audit: {sum(r['n_not_nfc'] for r in nfc)} unnormalized"
        f" docs across {len(bad)} source(s)"
    )
    for r in bad:
        print(
            f"  {r['source']:<10} not_nfc={r['n_not_nfc']}"
            f" codepoints_saved={r['codepoints_saved']}"
        )

    # -- 2. a planted multilingual slice: what the signals catch ---------
    nfd = unicodedata.normalize("NFD", "café noël résumé déjà vu")
    rows = [
        (1, "pure ascii training text about nothing in particular", "en"),
        (2, "你好世界 这是 一个 多语言 语料 样本 文档", "zh"),
        (3, "مرحبا بالعالم هذا نص تجريبي للنموذج اللغوي", "ar"),
        (4, nfd + " (decomposed — same glyphs, different bytes)", "fr"),
        (5, unicodedata.normalize("NFC", nfd) + " (composed twin)", "fr"),
        (6, "mixed 语言 doc: english text مع العربية और हिन्दी 🎉", "en"),
    ]
    tmp = tempfile.mkdtemp(prefix="i18n_demo_")
    spark.createDataFrame(
        [(i, t, lang, "demo", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    print("\nplanted multilingual slice:")
    r = q["script_mix_profile"](spark, tmp).first()
    print(
        f"  script mix: ascii={r['ascii_ratio']:.3f} cjk={r['cjk_chars']}"
        f" arabic={r['arabic_chars']} devanagari={r['devanagari_chars']}"
    )
    r = q["nfc_normalization_audit"](spark, tmp).first()
    print(
        f"  NFC audit: {r['n_not_nfc']} unnormalized doc(s),"
        f" {r['codepoints_saved']} code point(s) saved by composition"
        "  <- docs 4 and 5 are byte-different, glyph-identical"
    )
    ch = q["rag_chunk_materialized"](spark, tmp)
    n_chunks, n_docs = ch.agg(
        F.count("*"), F.countDistinct("doc_id")
    ).first()
    print(
        f"  chunking: {n_chunks} code-point-exact windows over"
        f" {n_docs} multilingual docs"
    )
    spark.stop()
    print("\ndone.")


if __name__ == "__main__":
    main()
