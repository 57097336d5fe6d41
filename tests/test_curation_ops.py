"""Planted-truth tests for the curation-audit pack (round 7, session 2):
gopher_quality_flags (each rule leg fires on exactly one planted doc —
the sf corpus passes every rule, so without these the rule legs would
be green-on-empty), customer_fuzzy_matches (blocked linkage semantics),
k_anonymity_audit, source_lang_entropy, seasonal_naive_mase (constructed
series with a hand-computable MASE)."""

import datetime as dt
import math

import pytest


@pytest.fixture(scope="module")
def spark():
    from svs_spark.session import get_session

    s = get_session("svs_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="module")
def registry():
    from svs_spark.queries import queries

    return queries()


def test_gopher_rule_legs_fire_independently(spark, registry, tmp_path):
    """One planted doc per rule, each violating ONLY its rule, plus two
    clean docs — per-rule failure counts and n_pass are exact."""
    rows = [
        # fails ONLY word-count (4 words < 5; stopwords the+and=2,
        # mean wlen 13/4=3.25, alpha 1.0, sym 0)
        (1, "S", "the cat and dog"),
        # fails ONLY mean-word-len (10 words mean 2.0 < 3; to+of=2 stops)
        (2, "S", "a an to of we it is on at by"),
        # fails ONLY symbol ratio (9 symbols / 44 chars = 0.204 > 0.1;
        # 8 words, mean 37/8=4.6, alpha 1.0, the+and=2)
        (3, "S", "the cat!!! and dog??? ran fast### okay right"),
        # fails ONLY alpha fraction (4 digit-words of 9 -> 5/9=0.56<0.8;
        # digits are alnum so sym=0; mean 31/9=3.4; the+and=2)
        (4, "S", "the 111 222 333 444 and nice words here"),
        # fails ONLY stopwords (6 words, zero of the 8 stopwords;
        # mean 26/6=4.3... chars no-space = 25? recomputed in assert)
        (5, "S", "cats dogs run very fast today"),
        # clean passes
        (6, "S", "the quick brown fox jumps over that lazy dog with style"),
        (7, "S", "we sailed to the harbor and found that quiet cove with ease"),
    ]
    docs = spark.createDataFrame(
        [(i, s, t) for (i, s, t) in rows], "doc_id long, source string, text string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = registry["gopher_quality_flags"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r.source,
        r.n_docs,
        r.fail_word_count,
        r.fail_mean_word_len,
        r.fail_symbol_ratio,
        r.fail_alpha_frac,
        r.fail_stopwords,
        r.n_pass,
    ) == ("S", 7, 1, 1, 1, 1, 1, 2)


def test_fuzzy_matches_blocked_linkage(spark, registry, tmp_path):
    """Distance-1 and distance-2 pairs inside a block are found; a
    distance-5 pair in the same block and an IDENTICAL name in a
    different block are both excluded (blocking is the contract)."""
    rows = [
        (1, "alpha", 0, "AUTO"),
        (2, "alphq", 0, "AUTO"),   # lev 1 vs alpha
        (3, "alpXY", 0, "AUTO"),   # lev 2 vs alpha, lev 3 vs alphq... recomputed below
        (4, "zzzzz", 0, "AUTO"),   # lev 5 vs all — excluded
        (5, "alpha", 1, "AUTO"),   # identical name, DIFFERENT block — excluded
    ]
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_mktsegment string"
    )
    cust = cust.withColumn(
        "c_acctbal", cust.c_custkey.cast("double")
    )
    cust.write.parquet(f"{tmp_path}/customer.parquet")
    out = registry["customer_fuzzy_matches"](spark, str(tmp_path)).collect()
    got = [(r.id_a, r.id_b, r.lev) for r in out]
    # alpha~alphq lev1; alpha~alpXY lev2 (ha -> XY); alphq~alpXY lev2
    assert got == [(1, 2, 1), (1, 3, 2), (2, 3, 2)]


def test_k_anonymity_planted(spark, registry, tmp_path):
    """2-row class + singleton class: class counts and below-k row
    masses are exact."""
    rows = [
        (1, "n1", 0, "AUTO", 1500.0),
        (2, "n2", 0, "AUTO", 1600.0),  # same (0, AUTO, bucket 1) class
        (3, "n3", 0, "AUTO", 2500.0),  # singleton class (bucket 2)
    ]
    cust = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_mktsegment string, c_acctbal double",
    )
    cust.write.parquet(f"{tmp_path}/customer.parquet")
    r = registry["k_anonymity_audit"](spark, str(tmp_path)).collect()[0]
    assert (
        r.n_groups,
        r.n_rows,
        r.min_group_size,
        r.rows_below_k2,
        r.rows_below_k5,
        r.rows_below_k10,
    ) == (2, 3, 1, 1, 3, 3)


def test_source_lang_entropy_planted(spark, registry, tmp_path):
    """50/50 two-language source has entropy ln 2 nats; a single-language
    source has exactly 0."""
    rows = [
        (1, "X", "en", "t"),
        (2, "X", "de", "t"),
        (3, "Y", "en", "t"),
        (4, "Y", "en", "t"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.source: (r.n_langs, r.n_docs, r.lang_entropy_nats)
        for r in registry["source_lang_entropy"](spark, str(tmp_path)).collect()
    }
    assert out["X"] == (2, 2, round(math.log(2), 6))
    assert out["Y"] == (1, 2, 0.0)


def test_seasonal_naive_mase_constructed_series(spark, registry, tmp_path):
    """Hourly counts n[t] = t for t in 1..30: the lag-24 error is
    constantly 24 and the lag-1 error constantly 1 on the observed
    grid, so MASE = 24 exactly, scored over hours 25..30."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(1, 31):
        for _ in range(t):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=t, minutes=1), 1, "a", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    out = registry["seasonal_naive_mase"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.n_hours_scored) == ("a", 6)
    assert (r.mae_seasonal_naive, r.mae_naive, r.mase) == (24.0, 1.0, 24.0)


def test_interval_overlap_planted(spark, registry, tmp_path):
    """User 1: click session [0, 10m] overlaps purchase session
    [5m, 7m] -> one pair, 120 s of overlap. User 2's purchase is 2 h
    after the click session -> no row."""
    base = dt.datetime(2024, 1, 1)

    def ev(eid, user, typ, minutes):
        return (eid, base + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0), ev(2, 1, "click", 10),
        ev(3, 1, "purchase", 5), ev(4, 1, "purchase", 7),
        ev(5, 2, "click", 0), ev(6, 2, "purchase", 120),
    ]
    frame = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    frame.write.parquet(f"{tmp_path}/events.parquet")
    out = registry["interval_overlap_join"](spark, str(tmp_path)).collect()
    assert [(r.user_id, r.n_overlaps, r.overlap_s) for r in out] == [(1, 1, 120)]


def test_kcenter_greedy_picks_and_ties(spark, registry, tmp_path):
    """2-D unit vectors with a hand-traceable greedy sequence: seed is
    min id (1,0); round 2 takes the antipode (distance 2); round 3 is a
    TIE between (0,1) and (0,-1) at min-distance 1 -> lower vec_id wins;
    round 4 takes the other at the same radius. The near-duplicate of
    the seed (0.8, 0.6)... is never picked."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),
        (3, [-1.0, 0.0], 0),
        (4, [0.0, -1.0], 0),
        (5, [0.8, 0.6], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(f"{tmp_path}/embeddings.parquet")
    out = registry["kcenter_coreset"](spark, str(tmp_path)).collect()
    got = [(r.pick_round, r.vec_id, r.radius) for r in out]
    assert got == [(1, 1, None), (2, 3, 2.0), (3, 2, 1.0), (4, 4, 1.0)]


def test_pareto_frontier_dominance(spark, registry, tmp_path):
    """Duplicates are co-frontier; same-price-smaller and same-size-
    pricier parts are dominated; the cheapest and the biggest survive."""
    rows = [
        (1, 10.0, 5),
        (2, 10.0, 5),   # exact duplicate of 1 — co-frontier
        (3, 10.0, 4),   # dominated by 1 (same price, smaller)
        (4, 20.0, 6),   # frontier (pricier but bigger than anything cheaper)
        (5, 20.0, 5),   # dominated by 1 (pricier, same size)
        (6, 5.0, 1),    # frontier (cheapest)
    ]
    part = spark.createDataFrame(rows, "p_partkey long, p_retailprice double, p_size int")
    part.write.parquet(f"{tmp_path}/part.parquet")
    out = registry["pareto_frontier_parts"](spark, str(tmp_path)).collect()
    got = sorted((r.p_partkey, r.price, r.size) for r in out)
    assert got == [(1, 10.0, 5), (2, 10.0, 5), (4, 20.0, 6), (6, 5.0, 1)]


def test_domain_reweighting_harder_source_weighs_more(spark, registry, tmp_path):
    """A source whose tokens are corpus-rare must get a larger mixture
    weight than one made of corpus-common tokens; weights sum to ~1."""
    rows = [
        # 'easy' source: the same common tokens over and over
        (1, "easy", "aa bb aa bb aa bb"),
        (2, "easy", "aa bb aa bb"),
        (3, "easy", "aa bb aa"),
        # 'hard' source: every token unique in the corpus
        (4, "hard", "qq ww ee rr tt yy"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.source: r for r in
        registry["domain_reweighting"](spark, str(tmp_path)).collect()
    }
    assert out["hard"].decibits_per_token > out["easy"].decibits_per_token
    assert out["hard"].mix_weight > out["easy"].mix_weight
    assert abs(out["hard"].mix_weight + out["easy"].mix_weight - 1.0) < 1e-6


def test_cluster_safe_split_keeps_clusters_whole(spark, registry, tmp_path):
    """A near-dup pair (one 2-doc cluster) plus three distinct
    singletons: whichever split gets the cluster shows n_docs exceeding
    n_clusters by exactly one; totals prove whole-unit assignment."""
    near = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, near, "xx", "s", len(near)),
        (2, near + " yes", "xx", "s", len(near) + 4),
        (10, "completely different text about sailing ships across oceans", "xx", "s", 60),
        (11, "numerical tables of crop yields for the northern region here", "xx", "s", 61),
        (12, "assembly instructions for the modular shelving system parts", "xx", "s", 60),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = registry["cluster_safe_split"](spark, str(tmp_path)).collect()
    assert sum(r.n_docs for r in out) == 5
    assert sum(r.n_clusters for r in out) == 4
    gaps = sorted(r.n_docs - r.n_clusters for r in out)
    assert gaps[-1] == 1 and all(g == 0 for g in gaps[:-1])


def test_conversion_latency_planted(spark, registry, tmp_path):
    """Hand-computed latencies: user 1 purchases 90 s after its second
    click (the as-of picks the LATEST prior click); user 2's purchase
    has no prior click (dropped); user 3's prior click is 25 h old
    (outside the 24 h window, dropped). One conversion, all quantiles
    exactly 90 s."""
    base = dt.datetime(2024, 5, 1)

    def ev(eid, user, typ, seconds):
        return (eid, base + dt.timedelta(seconds=seconds), user, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0), ev(2, 1, "click", 300), ev(3, 1, "purchase", 390),
        ev(4, 2, "purchase", 100), ev(5, 2, "click", 200),
        ev(6, 3, "click", 0), ev(7, 3, "purchase", 25 * 3600),
    ]
    frame = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    frame.write.parquet(f"{tmp_path}/events.parquet")
    r = registry["conversion_latency_quantiles"](spark, str(tmp_path)).collect()[0]
    assert (r.n_conversions, r.p50_s, r.p90_s, r.p99_s) == (1, 90.0, 90.0, 90.0)
