"""Decontamination screen→verify composition: the registered
decontaminate_fuzzy (containment-preserving prefix-filter screen →
exact containment verify on survivors; round-7 screen swap — the
previous MinHash band screen thresholds on Jaccard and silently drops
asymmetric-size leaks) must equal the full exact containment join — on
the real sf0.01 corpus and on planted-leak corpora with non-empty
truth, including the small-eval-inside-large-train shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tests.conftest import SF_DIR
from svs_spark.queries import queries


def _exact_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference recompute: the UN-screened exact containment join
    (the pre-round-6 registered body — every train×eval shingle match,
    df-capped, full-eval-count denominator)."""
    from svs_spark.query_defs import _tri3_index

    ex = _tri3_index(spark, sf_dir)
    is_test = (
        (F.col("doc_id") * F.lit(2654435761))
        % F.lit(4294967296) % F.lit(1000)
        >= 900
    )
    ext = ex.withColumn("is_test", is_test)
    n_eval = (
        ext.filter(F.col("is_test"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .select(F.col("doc_id").alias("id_eval"), "c")
    )
    keep = (
        ext.groupBy("g")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= 1000)
        .select("g")
    )
    exp = ext.join(keep, "g")
    tr = exp.filter(~F.col("is_test")).select(
        F.col("doc_id").alias("id_train"), "g"
    )
    ev = exp.filter(F.col("is_test")).select(
        F.col("doc_id").alias("id_eval"), "g"
    )
    p = (
        tr.join(ev, "g")
        .groupBy("id_train", "id_eval")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        p.join(n_eval, "id_eval")
        .withColumn(
            "eval_containment",
            F.round(F.col("n_shared").cast("double") / F.col("c"), 6),
        )
        .filter(F.col("eval_containment") >= 0.8)
        .select("id_train", "id_eval", "n_shared", "eval_containment")
    )


def _rows(df: DataFrame) -> set:
    return {
        (r.id_train, r.id_eval, r.n_shared, r.eval_containment)
        for r in df.collect()
    }


def test_fuzzy_composition_equals_exact_join_sf001(spark):
    """On the real corpus the screened composition and the exact join
    must emit the identical pair set (the property the 1M corpus_bench
    measured; this pins it at test scale)."""
    got = _rows(queries()["decontaminate_fuzzy"](spark, SF_DIR))
    want = _rows(_exact_containment(spark, SF_DIR))
    assert got == want


def test_fuzzy_composition_planted_leaks(spark, tmp_path):
    """Planted leaks with non-empty truth: a verbatim eval copy and a
    lightly-padded paraphrase in the train split must both surface
    with eval_containment >= 0.8; an unrelated train doc must not.
    Knuth-split facts: doc_id 3 hashes into the eval (is_test) split;
    1, 2, 4 land in train."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango uniform victor whiskey xray yankee zulu"
    )
    rows = [
        (3, base),                       # eval doc (is_test)
        (1, base),                       # verbatim leak in train
        (2, base + " extra trailing words appended here"),  # padded leak
        (4, "totally different content about nothing shared at all "
            "with the benchmark document in any trigram window"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = _rows(queries()["decontaminate_fuzzy"](spark, str(tmp_path)))
    want = _rows(_exact_containment(spark, str(tmp_path)))
    assert out == want
    flagged = {(a, b) for a, b, _, _ in out}
    assert (1, 3) in flagged
    assert (2, 3) in flagged
    assert (4, 3) not in flagged
    by_pair = {(a, b): c for a, b, _, c in out}
    assert by_pair[(1, 3)] == 1.0
    assert by_pair[(2, 3)] == 1.0


def test_asymmetric_size_leak_is_found(spark, tmp_path):
    """The contamination shape the Jaccard MinHash screen misses: a
    SMALL eval doc fully contained in a MUCH larger train doc has
    containment 1.0 but tiny Jaccard (~|e|/|t|), so its MinHash
    signatures essentially never agree in any band. The prefix-filter
    screen must surface it — and must still agree with the exact join.
    Knuth-split facts: doc_id 3 is eval; 1 and 4 are train."""
    eval_body = "alpha bravo charlie delta echo foxtrot golf hotel"
    # train doc 1 embeds the whole eval doc inside ~50x more text, so
    # Jaccard(eval, train) ~ 7/400 << any LSH threshold
    filler = " ".join(f"word{i:03d} token{i:03d}" for i in range(200))
    rows = [
        (3, eval_body),                       # eval (is_test)
        (1, filler + " " + eval_body + " " + filler[::-1].lower()),
        (4, "completely unrelated training text sharing no trigram "
            "with the benchmark at all in any window of words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = _rows(queries()["decontaminate_fuzzy"](spark, str(tmp_path)))
    want = _rows(_exact_containment(spark, str(tmp_path)))
    assert out == want
    flagged = {(a, b) for a, b, _, _ in out}
    assert (1, 3) in flagged          # the asymmetric leak is caught
    assert (4, 3) not in flagged
    by_pair = {(a, b): c for a, b, _, c in out}
    assert by_pair[(1, 3)] == 1.0     # full containment despite tiny Jaccard


def test_prefix_screen_never_misses_threshold_pairs(spark):
    """Direct pigeonhole-property test of containment_prefix_candidates:
    every (train, eval) pair whose exact kept-shingle containment
    passes the threshold must appear in the candidate set (zero false
    negatives), across eval docs of widely varying coverage."""
    from svs_spark.operators.dedup import containment_prefix_candidates

    # synthetic shingle universe: eval doc e covers fraction f of its
    # shingles in train doc t
    rows = []
    # eval 100: 10 shingles, train 200 shares 9 (containment .9 passes)
    rows += [(100, g, True) for g in range(10)]
    rows += [(200, g, False) for g in range(9)]
    # eval 101: 10 shingles, train 201 shares 7 (containment .7 fails)
    rows += [(101, 100 + g, True) for g in range(10)]
    rows += [(201, 100 + g, False) for g in range(7)]
    # eval 102: 5 shingles, train 202 shares all 5 via a huge doc
    rows += [(102, 200 + g, True) for g in range(5)]
    rows += [(202, 200 + g, False) for g in range(5)]
    rows += [(202, 1000 + g, False) for g in range(500)]  # bulk filler
    kept = spark.createDataFrame(rows, "doc_id long, g long, is_test boolean")
    g_df = kept.groupBy("g").agg(F.count("*").alias("_df"))
    eval_counts = (
        kept.filter("is_test")
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .select(F.col("doc_id").alias("id_eval"), "c")
    )
    got = {
        (r.id_train, r.id_eval)
        for r in containment_prefix_candidates(
            kept, g_df, eval_counts, threshold=0.8
        ).collect()
    }
    assert (200, 100) in got   # 0.9 >= 0.8 must be screened in
    assert (202, 102) in got   # 1.0, asymmetric size
    # the 0.7 pair MAY appear (screen over-includes) but the verify
    # stage drops it; what matters is nothing >= threshold is missing
