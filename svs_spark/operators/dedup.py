"""Deduplication operators for LLM-training-data pipelines.

Five families (BASELINE.json mandate, beyond the reference's V2 pairwise
dedup which this generalizes — reference usage in
``examples/dad_jokes/Build Dad Jokes KB.ipynb`` cells 14-18):

- exact:   hash-groupBy on a normalized key (one shuffle, map-side combine)
- minhash: portable arithmetic MinHash + banded LSH candidate join
- simhash: 32-bit SimHash + Hamming-distance pairs
- ngram:   Jaccard over shingle sets via inverted-index self-join
- cosine:  embedding near-dup via the blocked-GEMM pairwise operator

All hash functions are *pure integer arithmetic* (polynomial rolls,
affine permutations mod primes) rather than engine builtins like
xxhash64 — deterministic, portable, and exactly reproducible in the
DuckDB oracle SQL. At 100 TB: everything is one explode + one shuffle
keyed on (band, key) or shingle; no N² anywhere except the final
candidate verification, which LSH bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from svs_spark.cache_hooks import persist_tracked
from svs_spark.functions.text import FINGERPRINT_BASE, FINGERPRINT_MOD

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1
SIMHASH_BITS = 32
SIMHASH_MOD = 1_000_003


_MASK64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """splitmix64 finalizer (public-domain PRNG constants) — decorrelates
    consecutive seeds into independent-looking 64-bit values."""
    z = (x + 0x9E3779B97F4A7C15) & _MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    return z ^ (z >> 31)


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Affine permutation coefficients (a_j, b_j) for h'(x) = (a·x+b) mod P.

    Each pair is derived by splitmix64 mixing of the hash index, so the
    permutations are pairwise independent in practice.  (The previous
    family a_j = c·(j+1), b_j = d·(j+1)+17 was *linearly correlated
    across j* — every permutation ordered small hash sets identically,
    so the signature agreement rate collapsed to 0 or 1 instead of
    estimating Jaccard; caught by
    tests/test_properties.py::test_minhash_estimates_jaccard.)

    The constants are materialized in Python and embedded as int64
    literals in both the Spark expression and the DuckDB oracle SQL, so
    cross-engine parity is exact by construction.  a_j ∈ [1, P-1]
    (nonzero keeps the map a bijection mod P), b_j ∈ [0, P-1];
    a_j·h + b_j < 2^31·2^30 + 2^31 fits int64 with room to spare.
    """
    out = []
    for j in range(num_hashes):
        a = _splitmix64(2 * j) % (MINHASH_PRIME - 1) + 1
        b = _splitmix64(2 * j + 1) % MINHASH_PRIME
        out.append((a, b))
    return out


def token_hashes(text: Column | str, split_on: str = " ") -> Column:
    """Distinct tokens → polynomial-hash array (portable integer fold)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(F.split(F.lower(c), split_on))
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.filter(F.split(t, ""), lambda x: x != ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch))
            % F.lit(FINGERPRINT_MOD),
        ),
    )


def minhash_signature(tok_hashes: Column, num_hashes: int = 16) -> Column:
    """Array of num_hashes min-hash values over a token-hash array."""
    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    sigs = [
        F.array_min(F.transform(tok_hashes, perm(a, b)))
        for a, b in minhash_coeffs(num_hashes)
    ]
    return F.array(*sigs)


def _signature_batch_kernel(
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_size: int,
    passthrough: tuple = (),
):
    """Arrow-batched (shingle-hash, minhash-signature) kernel.

    Computes exactly the same integers as the SQL oracle (polynomial
    shingle hash + affine permutations, all int64) but fast: each batch
    memoizes shingle→hash in a dict and runs the permutations as one
    vectorized numpy broadcast per doc. Docs with fewer than
    ``shingle_size`` tokens are skipped (mirrored by the oracle filter).

    Shingles (not unigrams) are load-bearing for LSH bucket sizes: with
    a small vocabulary, every doc's unigram *set* is near-identical, so
    unigram MinHash puts whole corpora into one band bucket (observed:
    2.5k-doc buckets at sf0.1 → quadratic verification). k-word
    shingles make the sets distinctive, which is what bounds bucket
    size — the property the 100 TB scale path depends on.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    coeffs = np.asarray(minhash_coeffs(num_hashes), dtype=np.int64)
    a_vec = coeffs[:, 0][:, None]
    b_vec = coeffs[:, 1][:, None]

    def poly_hash(token: str) -> int:
        acc = 0
        for ch in token:
            acc = (acc * FINGERPRINT_BASE + ord(ch)) % FINGERPRINT_MOD
        return acc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Shingle hashes are computed by POLYNOMIAL DECOMPOSITION: the
        # base-31 fold over a shingle "t1 t2 t3" factors into per-token
        # hashes combined with powers of the base —
        #   h(acc ⧺ " t") = acc·B^(|t|+1) + 32·B^|t| + h(t)  (mod M)
        # so only unique TOKENS ever see the per-character Python loop
        # (memoized across batches), and every window combine is one
        # vectorized int64 numpy pass over all of the batch's windows.
        # Bit-identical to hashing the shingle string directly — the
        # identity the oracle relies on. Per-doc dedup keys on token
        # INTERN IDS (exact string identity, like the oracle's distinct
        # over shingle strings), not on hash values, so a hash
        # collision inside a doc cannot merge two distinct shingles.
        tok_cache: dict[str, tuple[int, int, int]] = {}
        pow_tab = [1, FINGERPRINT_BASE]
        k = shingle_size

        def pows_to(n: int) -> np.ndarray:
            while len(pow_tab) <= n:
                pow_tab.append(
                    pow_tab[-1] * FINGERPRINT_BASE % FINGERPRINT_MOD
                )
            return np.asarray(pow_tab, dtype=np.int64)

        for pdf in batches:
            docs_toks: list[list[str]] = []
            ids_out: list[int] = []
            keep_pos: list[int] = []
            for pos, (did, text) in enumerate(
                zip(pdf[id_col], pdf[text_col])
            ):
                toks = text.lower().split(" ")
                if len(toks) < k:
                    continue
                ids_out.append(did)
                keep_pos.append(pos)
                docs_toks.append(toks)
            if not ids_out:
                # typed empty frame: bare [] columns default to float64,
                # which Arrow cannot convert to the array<long> fields
                yield pd.DataFrame(
                    {
                        "did": pd.Series([], dtype="int64"),
                        "hs": pd.Series([], dtype="object"),
                        "sig": pd.Series([], dtype="object"),
                        **{
                            c: pdf[c].iloc[[]].reset_index(drop=True)
                            for c in passthrough
                        },
                    }
                )
                continue

            # memoization is an optimization only — cap the cross-batch
            # cache so an unbounded vocabulary (URLs, ids) can't grow it
            # into executor OOM; intern ids stay per-batch-consistent
            # because a cleared cache just re-interns from zero
            if len(tok_cache) > 4_000_000:
                tok_cache.clear()
            flat_ids, flat_h, flat_len = [], [], []
            for toks in docs_toks:
                for t in toks:
                    ent = tok_cache.get(t)
                    if ent is None:
                        ent = (len(tok_cache), poly_hash(t), len(t))
                        tok_cache[t] = ent
                    flat_ids.append(ent[0])
                    flat_h.append(ent[1])
                    flat_len.append(ent[2])
            TID = np.asarray(flat_ids, dtype=np.int64)
            H = np.asarray(flat_h, dtype=np.int64)
            L = np.asarray(flat_len, dtype=np.int64)
            P = pows_to(int(L.max()) + 2)

            n_wins = [len(t) - k + 1 for t in docs_toks]
            tok_off = np.concatenate(
                ([0], np.cumsum([len(t) for t in docs_toks]))
            )
            starts = np.concatenate(
                [
                    np.arange(tok_off[d], tok_off[d] + n_wins[d])
                    for d in range(len(docs_toks))
                ]
            )
            doc_idx = np.repeat(np.arange(len(docs_toks)), n_wins)

            acc = H[starts].copy()
            for j in range(1, k):
                lj = L[starts + j]
                acc *= P[lj + 1]
                acc %= FINGERPRINT_MOD
                acc += 32 * P[lj] + H[starts + j]
                acc %= FINGERPRINT_MOD

            dedup_cols = {"d": doc_idx}
            for j in range(k):
                dedup_cols[f"t{j}"] = TID[starts + j]
            dd = (
                pd.DataFrame(dedup_cols)
                .assign(h=acc)
                .drop_duplicates(subset=list(dedup_cols))
            )
            harr = dd["h"].to_numpy()
            counts = np.bincount(
                dd["d"].to_numpy(), minlength=len(docs_toks)
            )
            offsets = np.concatenate(([0], np.cumsum(counts)))
            hs_out = [
                harr[offsets[d] : offsets[d + 1]].tolist()
                for d in range(len(docs_toks))
            ]
            # chunk on doc boundaries so the (num_hashes × span)
            # permutation matrix stays ~tens of MB regardless of batch
            # size / doc length (the whole-batch matrix is O(batch ×
            # tokens) and can reach GBs on long-doc corpora)
            sig_parts = []
            max_span = max(1, 4_000_000 // num_hashes)
            lo_doc = 0
            while lo_doc < len(ids_out):
                hi_doc = lo_doc
                while (
                    hi_doc < len(ids_out)
                    and offsets[hi_doc + 1] - offsets[lo_doc] <= max_span
                ):
                    hi_doc += 1
                hi_doc = max(hi_doc, lo_doc + 1)  # ≥1 doc per chunk
                span = harr[offsets[lo_doc] : offsets[hi_doc]]
                mat = a_vec * span
                mat += b_vec
                mat %= MINHASH_PRIME
                cuts = np.asarray(
                    [o - offsets[lo_doc] for o in offsets[lo_doc:hi_doc]]
                )
                sig_parts.append(np.minimum.reduceat(mat, cuts, axis=1))
                lo_doc = hi_doc
            sig = np.concatenate(sig_parts, axis=1)
            yield pd.DataFrame(
                {
                    "did": ids_out,
                    "hs": hs_out,
                    "sig": sig.T.tolist(),
                    **{
                        c: pdf[c].iloc[keep_pos].reset_index(drop=True)
                        for c in passthrough
                    },
                }
            )

    return run


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_size: int = 3,
    bucket_cap: int | None = None,
    skip_report: dict | None = None,
    emit_estimate: bool = False,
) -> DataFrame:
    """MinHash + banded-LSH near-dup join, verified with exact Jaccard.
    ``emit_estimate=True`` adds the signature-side Jaccard estimate
    (agreeing minhash positions / num_hashes) as ``est_jaccard`` —
    the calibration view of the estimator the banding thresholds on.

    Pipeline: shingle → signature → explode one row per band →
    self-join on (band, band-key) → distinct candidate pairs → exact
    shingle-set Jaccard filter. The only shuffle keys on the band key;
    at 100 TB band buckets are small by construction (a hot bucket
    means actual duplicates, which is the signal we want).

    Pre-flight: ``operators.sketch.estimate_join_size`` on the band
    keys (self-join form) predicts the candidate volume from one scan
    — run it before committing a 100 TB banded join to decide
    ``bucket_cap``.

    ``bucket_cap``: per-band-bucket candidate ceiling for adversarial
    corpora (a B-row bucket emits O(B²) candidates). Over-cap buckets
    are excluded; a pair survives iff at least one of its agreeing
    bands is cold, emitted once at its first COLD agreeing band (hot
    sets are ≤ total_rows/cap entries per band — per-row InSet, no
    extra join). Pass ``skip_report={}`` to receive
    {"skipped_buckets", "skipped_rows"} — no silent caps. Default
    None = exact, oracle-parity behavior.

    Returns (id_a, id_b, jaccard).
    """
    rows = num_hashes // bands
    base = docs.select(id_col, text_col).mapInPandas(
        _signature_batch_kernel(id_col, text_col, num_hashes, shingle_size),
        schema="did long, hs array<long>, sig array<long>",
    )
    # base feeds the band explode AND both verification sides — persist
    # so the signature kernel runs once, not three times (tracked:
    # released when the registry builds the next query)
    base = persist_tracked(base)

    # Band keys collapse to 8-byte xxhash64 longs before the exchange
    # (DEVNOTES invariant 7) and every row carries the full key array,
    # so duplicate-band matches can be killed by a per-row predicate
    # instead of a .distinct() shuffle over the matched set.
    # (one SQL string instead of bands*rows Column builders — round-9
    # py4j diet; identical expression tree)
    key_arr = F.expr(
        "array("
        + ", ".join(
            "xxhash64(concat_ws('-', "
            + ", ".join(
                f"CAST(sig[{bi * rows + ri}] AS STRING)"
                for ri in range(rows)
            )
            + "))"
            for bi in range(bands)
        )
        + ")"
    )
    band_rows = base.select("did", key_arr.alias("keys")).select(
        "did", "keys", F.posexplode("keys").alias("band", "key")
    )

    # hot-bucket cap (see simhash_pairs): collect over-cap (band, key)
    # buckets per band, report the skipped mass, drop their rows
    hot_by_band: dict[int, list] = {}
    if bucket_cap is not None:
        hot_rows = (
            band_rows.groupBy("band", "key")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > bucket_cap)
            .collect()
        )
        for r in hot_rows:
            hot_by_band.setdefault(r["band"], []).append(r["key"])
        if skip_report is not None:
            skip_report["skipped_buckets"] = len(hot_rows)
            skip_report["skipped_rows"] = int(
                sum(r["_bn"] for r in hot_rows)
            )
        if hot_by_band:
            is_hot = F.lit(False)
            for bi, keys in hot_by_band.items():
                is_hot = is_hot | (
                    (F.col("band") == bi) & F.col("key").isin(keys)
                )
            band_rows = band_rows.filter(~is_hot)

    a = band_rows.select(
        F.col("did").alias("id_a"), F.col("keys").alias("ka"), "band", "key"
    )
    b = band_rows.select(
        F.col("did").alias("id_b"), F.col("keys").alias("kb"), "band", "key"
    )
    # A pair agreeing on several bands would surface once per band:
    # emit it only at its FIRST agreeing band (all earlier bands
    # differ) — the same codegen'd filter as simhash_pairs, replacing
    # the distinct() that dominated this operator's runtime (100k-doc
    # probe: candidates 33 s → 2.7 s, identical pair set). Under a
    # bucket_cap, first COLD agreeing band (an agreeing-but-skipped
    # earlier band never produced the candidate; both members share
    # that bucket, so either side's key identifies it).
    if not hot_by_band:
        # SQL fast path (py4j diet): same nested CASE tree as the
        # Column fold below, built in one round-trip
        def _ed(i: int) -> str:
            if i == 0:
                return "true"
            return "(true AND " + " AND ".join(
                f"(ka[{j}] != kb[{j}])" for j in range(i)
            ) + ")"

        fm_sql = "true"
        for i in range(bands - 1, -1, -1):
            fm_sql = f"(CASE WHEN band = {i} THEN {_ed(i)} ELSE {fm_sql} END)"
        first_match = F.expr(fm_sql)
    else:
        first_match = F.lit(True)
        for i in range(bands - 1, -1, -1):
            earlier_differ = F.lit(True)
            for j in range(i):
                differs = F.col("ka")[j] != F.col("kb")[j]
                if hot_by_band.get(j):
                    differs = differs | F.col("ka")[j].isin(hot_by_band[j])
                earlier_differ = earlier_differ & differs
            first_match = F.when(
                F.col("band") == i, earlier_differ
            ).otherwise(first_match)
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_match)
        .select("id_a", "id_b")
    )

    ta = base.select(
        F.col("did").alias("id_a"), F.col("hs").alias("hs_a"),
        F.col("sig").alias("sig_a"),
    )
    tb = base.select(
        F.col("did").alias("id_b"), F.col("hs").alias("hs_b"),
        F.col("sig").alias("sig_b"),
    )
    verified = (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
        )
        .filter(F.col("jac") >= jaccard_threshold)
    )
    if emit_estimate:
        # the signature-side Jaccard ESTIMATE: fraction of minhash
        # positions that agree — calibration telemetry for choosing
        # num_hashes/bands (the estimator the banded join implicitly
        # thresholds on, exposed next to the exact value it estimates)
        agree = F.size(
            F.filter(
                F.zip_with(
                    "sig_a", "sig_b", lambda x, y: x == y
                ),
                lambda v: v,
            )
        )
        return verified.select(
            "id_a", "id_b", F.round("jac", 6).alias("jaccard"),
            (agree.cast("double") / F.lit(float(num_hashes))).alias(
                "est_jaccard"
            ),
        )
    return verified.select(
        "id_a", "id_b", F.round("jac", 6).alias("jaccard")
    )


def bit_weight(i: int) -> int:
    """Signed-64 weight of bit i: 2^i for i<63; bit 63 is the sign bit,
    so its weight is -2^63 (the int64 two's-complement value with only
    that bit set) — this is what lets a 64-bit SimHash signature live in
    a BIGINT in both engines."""
    return 2**i if i < 63 else -(2**63)


def simhash(tok_hashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over a token-hash array: per bit i, each token votes
    ±1 via an affine hash; bit set iff the vote sum is positive."""
    def voter(i: int):
        return (
            lambda acc, h: acc
            + ((h * (2 * i + 3) + i) % SIMHASH_MOD) % 2 * 2
            - 1
        )

    total = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(tok_hashes, F.lit(0).cast("long"), voter(i))
        total = total + F.when(
            vote > 0, F.lit(bit_weight(i)).cast("long")
        ).otherwise(0)
    return total


def simhash_segments(bits: int, n_segments: int) -> list[tuple[int, int]]:
    """Partition ``bits`` signature bits into ``n_segments`` contiguous
    (offset, width) segments, widest first (e.g. 32/7 → 5,5,5,5,4,4,4)."""
    base, extra = divmod(bits, n_segments)
    out, off = [], 0
    for i in range(n_segments):
        width = base + (1 if i < extra else 0)
        out.append((off, width))
        off += width
    return out


def _simhash_batch_kernel(id_col: str, text_col: str, bits: int):
    """Arrow-batched SimHash signatures: identical integers to the
    ``simhash()`` Column spec (token poly-hash → per-bit affine parity
    votes) but one vectorized (tokens × bits) NumPy pass per doc instead
    of ``bits`` interpreted HigherOrderFunction folds — the Column form
    is ~10× slower because per-token lambda folds never enter
    whole-stage codegen (DEVNOTES invariant #5)."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    i_arr = np.arange(bits, dtype=np.int64)
    mult = 2 * i_arr + 3
    # bit-reinterpret uint64 powers as int64 so bit 63 becomes -2^63
    # (matches bit_weight(); astype would be UB for out-of-range values)
    weights = (np.uint64(1) << i_arr.astype(np.uint64)).view(np.int64)

    def poly_hash(token: str) -> int:
        acc = 0
        for ch in token:
            acc = (acc * FINGERPRINT_BASE + ord(ch)) % FINGERPRINT_MOD
        return acc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            # flatten the whole batch to one (Σ|tokens|,) hash vector +
            # per-doc offsets: ONE (pairs × bits) vote matrix and a
            # segment-sum (reduceat) replace the per-doc Python loop —
            # the loop's small-matrix dispatch overhead dominated at
            # ~100 tokens/doc
            all_hs: list[int] = []
            offsets = [0]
            ids_out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for t in dict.fromkeys(text.lower().split(" ")):
                    h = cache.get(t)
                    if h is None:
                        h = poly_hash(t)
                        cache[t] = h
                    all_hs.append(h)
                offsets.append(len(all_hs))
                ids_out.append(did)
            if not ids_out:  # zero-row batch: np.concatenate([]) raises
                yield pd.DataFrame(
                    {
                        "did": pd.Series([], dtype="int64"),
                        "sh": pd.Series([], dtype="int64"),
                    }
                )
                continue
            harr = np.asarray(all_hs, dtype=np.int64)[:, None]
            # chunk on doc boundaries: the (span × bits) vote matrix
            # stays ~tens of MB regardless of batch size / doc length.
            # Empty docs (offsets[i] == offsets[i+1]) would break
            # reduceat; the split guarantees ≥1 token ('' splits to [''])
            sh_parts = []
            max_span = max(1, 4_000_000 // bits)
            lo_doc = 0
            while lo_doc < len(ids_out):
                hi_doc = lo_doc
                while (
                    hi_doc < len(ids_out)
                    and offsets[hi_doc + 1] - offsets[lo_doc] <= max_span
                ):
                    hi_doc += 1
                hi_doc = max(hi_doc, lo_doc + 1)
                span = harr[offsets[lo_doc] : offsets[hi_doc]]
                votes = span * mult
                votes += i_arr
                votes %= SIMHASH_MOD
                votes %= 2
                votes *= 2
                votes -= 1
                cuts = np.asarray(
                    [o - offsets[lo_doc] for o in offsets[lo_doc:hi_doc]]
                )
                sums = np.add.reduceat(votes, cuts, axis=0)
                sh_parts.append((weights * (sums > 0)).sum(axis=1))
                lo_doc = hi_doc
            sh_out = np.concatenate(sh_parts)
            yield pd.DataFrame({"did": ids_out, "sh": sh_out})

    return run


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bits: int = SIMHASH_BITS,
    bucket_cap: int | None = None,
    skip_report: dict | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Candidate generation is a *pigeonhole-banded equi-join*, not an
    all-pairs theta join: the signature splits into (max_hamming+1)
    contiguous bit segments; two signatures within Hamming distance
    max_hamming must agree exactly on at least one segment, so an
    equi-join on (segment_index, segment_value) finds every true pair.
    Candidates are then verified with the exact xor+popcount.

    Scale notes (100 TB): the only shuffle keys on (segment, value) —
    same shape as the MinHash band join, and the exact result set is
    unchanged (pigeonhole is lossless, so this stays parity-identical
    to the oracle's all-pairs formulation). With a 32-bit signature the
    segment value space is 2^4..2^5 per segment, which bounds pruning
    to ~(bits/segments)·2^width buckets; for web-scale corpora use a
    64-bit signature and max_hamming ≤ 3 (4 segments × 16 bits →
    65536 buckets/segment), which this function supports via
    ``simhash(..., bits=64)`` + the same pigeonhole argument.

    ``bucket_cap``: per-bucket candidate ceiling for adversarial
    corpora (a (segment, value) bucket of B rows emits O(B²)
    candidates — a single mega-cluster can dominate the whole run).
    Buckets larger than the cap are EXCLUDED from candidate
    generation; a pair survives iff at least one of its agreeing
    segments is cold, and is emitted exactly once, at its first COLD
    agreeing segment (the hot set is tiny — ≤ total_rows/cap entries —
    so earlier-segment hotness evaluates as a per-row InSet, no extra
    join). No silent caps: pass ``skip_report={}`` to receive
    {"skipped_buckets", "skipped_rows"} (one tiny eager aggregate).
    Default None = exact, oracle-parity behavior.
    """
    sh = docs.select(id_col, text_col).mapInPandas(
        _simhash_batch_kernel(id_col, text_col, bits),
        schema="did long, sh long",
    )
    sh = persist_tracked(sh)

    segs = simhash_segments(bits, max_hamming + 1)
    seg_rows = sh.select(
        "did",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg"),
                        F.shiftrightunsigned(F.col("sh"), off)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("segval"),
                    )
                    for i, (off, width) in enumerate(segs)
                ]
            )
        ).alias("sv"),
    ).select(
        "did", "sh",
        F.col("sv.seg").alias("seg"), F.col("sv.segval").alias("segval"),
    )

    # hot-bucket cap: collect the (tiny) set of over-cap buckets as
    # combined seg*2^32+segval longs, report the skipped mass, and drop
    # those rows from BOTH join sides
    hot_keys: set[int] = set()
    if bucket_cap is not None:
        hot_rows = (
            seg_rows.groupBy("seg", "segval")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > bucket_cap)
            .collect()
        )
        hot_keys = {r["seg"] * (1 << 32) + r["segval"] for r in hot_rows}
        if skip_report is not None:
            skip_report["skipped_buckets"] = len(hot_rows)
            skip_report["skipped_rows"] = int(
                sum(r["_bn"] for r in hot_rows)
            )
        if hot_keys:
            combined = F.col("seg") * F.lit(1 << 32) + F.col("segval")
            seg_rows = seg_rows.filter(~combined.isin(list(hot_keys)))

    a = seg_rows.select(
        F.col("did").alias("id_a"), F.col("sh").alias("sh_a"), "seg", "segval"
    )
    b = seg_rows.select(
        F.col("did").alias("id_b"), F.col("sh").alias("sh_b"), "seg", "segval"
    )

    # A pair within the Hamming bound can agree on several segments and
    # would surface once per agreeing segment. Instead of a .distinct()
    # shuffle over the (large) matched set, emit each pair only at its
    # FIRST agreeing segment: keep a candidate matched on segment i iff
    # no earlier segment also agrees — a pure per-row codegen'd filter.
    # Under a bucket_cap, "first agreeing" means first COLD agreeing:
    # an earlier segment that agrees but whose bucket was skipped never
    # produced the candidate, so the current segment must emit it. Both
    # pair members share the earlier bucket when they agree on it, so
    # either side's own segment value identifies the bucket.
    def seg_of(col: str, off: int, width: int) -> F.Column:
        return F.shiftrightunsigned(F.col(col), off).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    first_match = F.lit(True)
    for i in range(len(segs) - 1, -1, -1):
        earlier_differ = F.lit(True)
        for j in range(i):
            joff, jwidth = segs[j]
            differs = seg_of("sh_a", joff, jwidth) != seg_of(
                "sh_b", joff, jwidth
            )
            if hot_keys:
                j_hot = (
                    F.lit(j) * F.lit(1 << 32) + seg_of("sh_a", joff, jwidth)
                ).isin(list(hot_keys))
                differs = differs | j_hot
            earlier_differ = earlier_differ & differs
        first_match = F.when(F.col("seg") == i, earlier_differ).otherwise(
            first_match
        )

    pairs = (
        a.join(b, ["seg", "segval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_match)
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with score ≥ threshold via
    blocked GEMMs (see similarity.block_pairwise_topk for the scale
    analysis; here we keep every pair over threshold instead of top-k)."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    blocked = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.floor(F.col(id_col) / block_size).alias("blk"),
    )
    mats = blocked.groupBy("blk").agg(
        F.collect_list(F.struct("vid", "vec")).alias("items")
    )
    a = mats.select(F.col("blk").alias("blk_a"), F.col("items").alias("items_a"))
    b = mats.select(F.col("blk").alias("blk_b"), F.col("items").alias("items_b"))
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def score_blocks(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for items_a, items_b in zip(pdf["items_a"], pdf["items_b"]):
                ia = np.fromiter((x["vid"] for x in items_a), dtype=np.int64)
                ma = np.vstack([x["vec"] for x in items_a]).astype(np.float64)
                ib = np.fromiter((x["vid"] for x in items_b), dtype=np.int64)
                mb = np.vstack([x["vec"] for x in items_b]).astype(np.float64)
                gram = ma @ mb.T
                ii, jj = np.nonzero(
                    (ia[:, None] < ib[None, :]) & (gram >= threshold)
                )
                if len(ii) == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "id_a": ia[ii],
                        "id_b": ib[jj],
                        "score": np.round(gram[ii, jj], 6),
                    }
                )

    return pairs.mapInPandas(
        score_blocks, schema="id_a long, id_b long, score double"
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph via iterative
    min-label propagation — turns pairwise matches into dedup clusters
    (doc_id, canonical_id = min id in component).

    Each iteration is one neighbor join + one pointer-jumping join
    (label-of-my-label), both shuffling on node id. Pointer jumping
    (path doubling) makes label distance shrink geometrically, so
    convergence is O(log diameter) rounds instead of O(diameter) — for
    a 1000-node chain that is ~10 rounds, not 1000. No driver-side
    graph materialization.
    """
    und = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).unionByName(
        pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
    )
    from pyspark.sql import Observation

    und = und.persist()
    # localCheckpoint (eager) truncates lineage each round — without it
    # the iterated plan nests exponentially and the driver OOMs building
    # plan strings long before any data is large
    #
    # Fused round (optimization guide §2.4 — remove shuffles outright):
    # the neighbor-min join and the pointer-jumping self-join both probe
    # `labels` on an id key, so union their probe sides — the undirected
    # edges (a, b) plus the (node, label) pairs — and pay ONE join + ONE
    # aggregation per round instead of two joins, two left-join merges
    # and a change-check join.  new_label[a] = min(neighbor labels,
    # label[label[a]]) equals the unfused least(label, nmin, jmin):
    # labels are monotone non-increasing node ids (label[x] <= x), so
    # the label-of-label term is always <= the own-label term.
    #
    # Round 1 needs no join at all: from identity labels the fused
    # update is new_label[a] = min(a, min of a's neighbors), one
    # aggregation over the edge list — so the identity-label init table
    # (a distinct pass + its own checkpoint action) never materializes.
    #
    # Convergence probe: sum(label) strictly decreases while any label
    # changes (labels only decrease). The sum rides the SAME action as
    # the checkpoint via observe() — round-9 profiling showed the
    # separate collect()-based probe cost a driver round-trip per round
    # (~0.1-0.15 s each) on top of the checkpoint job.
    def _sum_col():
        return F.sum(F.col("label").cast("decimal(38,0)")).alias("s")

    obs0 = Observation()
    labels = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("_nmin"))
        .select("node", F.least("node", "_nmin").alias("label"))
        .observe(obs0, _sum_col())
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]
    for _ in range(max_iter - 1):
        targets = und.unionByName(
            labels.select(
                F.col("node").alias("a"), F.col("label").alias("b")
            )
        )
        obs = Observation()
        new_labels = (
            targets.join(labels, targets["b"] == labels["node"])
            .groupBy(targets["a"].alias("node"))
            .agg(F.min("label").alias("label"))
            .observe(obs, _sum_col())
            .localCheckpoint()
        )
        cur_sum = obs.get["s"]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    und.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_id")
    )


def band_bucket(vec_col: str, band: int, nbits: int, dim: int) -> Column:
    """Sign-bit bucket for one LSH band: band ``j`` uses hyperplanes
    ``j*nbits .. (j+1)*nbits-1`` (disjoint plane sets per band)."""
    from svs_spark.operators.ann import hyperplane
    from svs_spark.functions.vector import dot_literal

    b = F.lit(0).cast("long")
    for i in range(nbits):
        h = hyperplane(band * nbits + i, dim)
        b = b + F.when(
            dot_literal(vec_col, h) > 0, F.lit(2**i).cast("long")
        ).otherwise(0)
    return b


def embedding_near_dup_lsh_pairs(
    embeddings: DataFrame,
    threshold: float,
    bands: int = 8,
    nbits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded hyperplane-LSH near-dup pairs — the candidate-pruned
    scale path for embedding-cosine dedup (``embedding_near_dup_pairs``
    is the exact all-blocks form).

    Charikar-style sign-random-projection banding: a pair is a
    candidate iff SOME band's nbits sign bits agree (per-band collision
    prob (1-θ/π)^nbits), then candidates verify with the exact dot.
    Each band is a bucket equi-join — shuffle on the bucket key, never
    an all-pairs product; a pair matching several bands is emitted once
    via the first-agreeing-band predicate (the ``simhash_pairs``
    trick: pure per-row filter, no distinct shuffle).

    Band-width tuning: candidate volume is ~N²·bands/2^nbits, so nbits
    rises with corpus size and with the target threshold (true
    near-dups at cos ≥ 0.85 survive 16-bit bands with high recall;
    the 4-bit default here is sized for this corpus's low 0.4
    threshold). Recall is tested against the exact operator in
    tests/test_properties.py.

    Execution shape (the one that holds at 100 TB):

    1. ONE sign-bit pass computes all band buckets per row (the folds
       are interpreted higher-order Columns — DEVNOTES invariant 5 —
       so they run once, checkpointed, not once per join side).
    2. posexplode to (band, bucket) rows carrying only the id + the
       8-long bucket array — vectors do NOT ride the band shuffle.
    3. ONE self equi-join on (band, bucket); a pair agreeing in
       several bands is kept once by the first-agreeing-band filter
       (slice + zip_with on the 8-long arrays — pure per-row filter).
    4. Vectors are fetched for the surviving candidates by two id
       equi-joins, and scored in ONE Arrow kernel pass (row-wise
       float64 dots — the same NumPy arithmetic the exact blocked-GEMM
       operator uses, so threshold/rounding parity is identical).

    A per-band join carrying vectors and scoring with the interpreted
    Column fold measured 5.5 s at sf0.1; this shape is ~3× faster and
    its band shuffle carries 10-byte rows instead of 64-float vectors.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    from svs_spark.operators.ann import hyperplane

    # all bands' planes in one matrix: the sign pass is ONE GEMM per
    # Arrow batch ((batch × dim) @ (dim × bands·nbits)), then bit-packs
    # per band — the Column-fold form (band_bucket) is the spec/oracle
    # shape but runs interpreted (~0.65 ms/row measured; the kernel is
    # ~1000× cheaper). float64 GEMM vs the fold differs only if a plane
    # dot sits within ~1e-12 of 0 — the same fp-boundary class the
    # exact operator's `gram >= threshold` already accepts.
    planes = np.array(
        [
            hyperplane(j * nbits + i, dim)
            for j in range(bands)
            for i in range(nbits)
        ],
        dtype=np.float64,
    ).T  # (dim, bands·nbits)
    weights = (2 ** np.arange(nbits, dtype=np.int64)).reshape(1, 1, nbits)

    def bucketize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes) > 0  # (batch, bands·nbits)
            bks = (
                bits.reshape(len(mat), bands, nbits) * weights
            ).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].to_numpy(),
                    "bks": list(bks),
                }
            )

    withb = embeddings.select(id_col, vec_col).mapInPandas(
        bucketize, schema="vid long, bks array<long>"
    )
    side = withb.select(
        "vid", "bks", F.posexplode("bks").alias("band", "bucket")
    )
    a = side.select(
        F.col("vid").alias("id_a"),
        F.col("bks").alias("ba"),
        "band",
        "bucket",
    )
    b = side.select(
        F.col("vid").alias("id_b"),
        F.col("bks").alias("bb"),
        "band",
        "bucket",
    )
    cand = a.join(b, ["band", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    # first-agreeing-band dedup: drop the pair unless NO earlier band
    # already agreed (slice is 1-based; band is the 0-based position,
    # so slice(·, 1, band) is exactly the earlier bands; empty at band 0)
    earlier_agree = F.exists(
        F.zip_with(
            F.slice("ba", 1, F.col("band")),
            F.slice("bb", 1, F.col("band")),
            lambda x, y: x == y,
        ),
        lambda v: v,
    )
    cand = cand.filter(~earlier_agree).select("id_a", "id_b")

    va = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = cand.join(va, "id_a").join(vb, "id_b")

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ma = np.vstack(pdf["vec_a"].to_numpy()).astype(np.float64)
            mb = np.vstack(pdf["vec_b"].to_numpy()).astype(np.float64)
            raw = np.einsum("ij,ij->i", ma, mb)
            keep = raw >= threshold
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "score": np.round(raw[keep], 6),
                }
            )

    return pairs.mapInPandas(
        score, schema="id_a long, id_b long, score double"
    )


# ---------------------------------------------------------------------------
def boundary_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: int = 3,
    phrase_cap: int | None = None,
    skip_report: dict | None = None,
) -> DataFrame:
    """Split-artifact pairs: doc A's LAST ``n_tokens`` tokens equal doc
    B's FIRST ``n_tokens`` — the fingerprint of one original document
    cut into chunks mid-sentence. Returns (id_tail, id_head).

    Each doc contributes ONE head key and ONE tail key (scan-stage
    slices, no explode), both collapsed to xxhash64 longs; the
    tail=head equi-join exchanges 8-byte keys.

    ``phrase_cap``: stop-phrase ceiling for web scale — the same
    hot-bucket discipline as the banded joins (simhash_pairs /
    minhash_lsh_pairs above): a boilerplate boundary phrase ("click
    here to read", sentence-initial stock phrases) shared by B docs
    emits O(B²) pairs; any join key whose head-side + tail-side row
    count exceeds the cap is excluded from BOTH sides, with the
    skipped mass reported in ``skip_report`` ({"skipped_phrases",
    "skipped_rows"}) — no silent caps. Over-cap phrases are by
    construction boilerplate, not chunking seams.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    hk = docs.filter(F.size(toks) >= n_tokens).select(
        id_col,
        F.xxhash64(F.concat_ws(" ", F.slice(toks, 1, n_tokens))).alias(
            "head"
        ),
        F.xxhash64(
            F.concat_ws(" ", F.slice(toks, -n_tokens, n_tokens))
        ).alias("tail"),
    )
    a = hk.select(F.col(id_col).alias("id_tail"), "tail")
    b = hk.select(F.col(id_col).alias("id_head"), "head")
    if phrase_cap is not None:
        # only over-cap keys come back to the driver — bounded by the
        # stop-phrase population, not the corpus
        hot_rows = (
            a.select(F.col("tail").alias("k"))
            .unionByName(b.select(F.col("head").alias("k")))
            .groupBy("k")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > phrase_cap)
            .collect()
        )
        if skip_report is not None:
            skip_report["skipped_phrases"] = len(hot_rows)
            skip_report["skipped_rows"] = int(
                sum(r["_bn"] for r in hot_rows)
            )
        if hot_rows:
            hot = [r["k"] for r in hot_rows]
            a = a.filter(~F.col("tail").isin(hot))
            b = b.filter(~F.col("head").isin(hot))
    return (
        a.join(b, a["tail"] == b["head"])
        .filter(F.col("id_tail") != F.col("id_head"))
        .select("id_tail", "id_head")
    )


# Span-level exact-substring dedup (Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better", windowed approximation)
# and line-level boilerplate removal (C4 recipe).
# ---------------------------------------------------------------------------


def substring_windows(
    docs: DataFrame,
    k: int = 30,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """Explode each document into k-char windows at the given stride.

    Returns (id, wk) with the window reduced to an 8-byte xxhash64 key
    (the exchange-size discipline of DEVNOTES invariant 7), or
    (id, win) raw strings when ``hashed=False`` (report/oracle form).
    """
    base = docs.filter(F.length(text_col) >= k)
    pos = base.select(
        id_col,
        text_col,
        F.explode(
            F.sequence(
                F.lit(1), F.length(text_col) - F.lit(k - 1), F.lit(stride)
            )
        ).alias("pos"),
    )
    win = F.expr(f"substring({text_col}, pos, {k})")
    if hashed:
        return pos.select(id_col, F.xxhash64(win).alias("wk"))
    return pos.select(id_col, win.alias("win"))


def dup_substring_stats(
    docs: DataFrame,
    k: int = 30,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-window fraction: a window recurring in
    ≥2 DISTINCT documents marks its span as cross-corpus duplicated
    text. One window-key shuffle for the distinct-doc count, one
    key-partitioned join back, one doc-key aggregate — never all-pairs.
    """
    wins = substring_windows(docs, k, stride, id_col, text_col)
    keystats = wins.groupBy("wk").agg(
        F.countDistinct(id_col).alias("nd")
    )
    per = (
        wins.join(keystats, "wk")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    return per.select(
        id_col,
        "n_windows",
        "n_dup_windows",
        F.round(F.col("n_dup_windows") / F.col("n_windows"), 6).alias(
            "dup_ratio"
        ),
    )


def boilerplate_line_stats(
    docs: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group boilerplate-line report: split ``text_col`` on
    newlines, count each trimmed non-empty line's document frequency,
    and report how much of each group survives removing lines with
    df ≥ ``min_df`` (nav bars, cookie banners, license headers). Lines
    travel as xxhash64 keys; the frequency table is the only state.
    """
    raw = docs.select(
        id_col,
        group_col,
        F.explode(F.split(F.col(text_col), "\n")).alias("_raw"),
    )
    lines = raw.select(
        id_col, group_col, F.trim(F.col("_raw")).alias("_line")
    ).filter(F.col("_line") != "")
    keyed = lines.select(
        id_col, group_col, F.xxhash64("_line").alias("lk")
    )
    freq = keyed.groupBy("lk").agg(F.countDistinct(id_col).alias("df"))
    return (
        keyed.join(freq, "lk")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("df") >= min_df, 1).otherwise(0)).alias(
                "n_boiler"
            ),
        )
        .select(
            group_col,
            "n_lines",
            "n_boiler",
            F.round(
                F.lit(1.0) - F.col("n_boiler") / F.col("n_lines"), 6
            ).alias("retained_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental MinHash dedup: index the corpus's signatures once, then
# dedup each NEW batch by joining it against the stored index — the
# only affordable shape when a 100 TB corpus grows by daily increments
# (re-shingling petabytes per increment is the alternative).
# ---------------------------------------------------------------------------


def _minhash_key_arr(num_hashes: int, bands: int) -> Column:
    """Band-key array (xxhash64 longs) from a ``sig`` column."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    "-",
                    *[
                        F.col("sig")[bi * rows + ri].cast("string")
                        for ri in range(rows)
                    ],
                )
            )
            for bi in range(bands)
        ]
    )


def _first_agreeing_band(bands: int) -> Column:
    """True iff the current (band, key) match is the pair's FIRST
    agreeing band — kills multi-band duplicates without a distinct.
    Unrolled per band: ``sequence(0, band-1)`` descends at band=0 and
    must not be used here."""
    first_match = F.lit(True)
    for i in range(bands - 1, -1, -1):
        earlier_differ = F.lit(True)
        for j in range(i):
            earlier_differ = earlier_differ & (
                F.col("ka")[j] != F.col("kb")[j]
            )
        first_match = F.when(F.col("band") == i, earlier_differ).otherwise(
            first_match
        )
    return first_match


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """(did, hs, keys): shingle-hash set + band-key array per doc —
    the index row. Computing this is the expensive part of MinHash
    dedup (the Arrow shingling kernel scans every byte of text), which
    is exactly what the stored index lets increments skip."""
    base = docs.select(id_col, text_col).mapInPandas(
        _signature_batch_kernel(id_col, text_col, num_hashes, shingle_size),
        schema="did long, hs array<long>, sig array<long>",
    )
    return base.select(
        "did", "hs", _minhash_key_arr(num_hashes, bands).alias("keys")
    )


def build_minhash_index(
    docs: DataFrame,
    out_path: str,
    **kw,
) -> None:
    """Materialize the signature index as parquet. Append increments
    with mode='append' after deduping them (see
    ``minhash_incremental_pairs``)."""
    minhash_signatures(docs, **kw).write.mode("overwrite").parquet(out_path)


def minhash_incremental_pairs(
    spark,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_size: int = 3,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch: (new × indexed) ∪
    (new × new), exact-Jaccard verified — identical to what a full
    ``minhash_lsh_pairs`` over old ∪ new would report for every pair
    touching a new document, at increment-sized cost: only the new
    batch is shingled; the old corpus contributes pre-computed index
    rows, and the band join's shuffle carries the (small) new side
    against index partitions. Assumes new ids are disjoint from
    indexed ids (re-ingest dedup is the caller's exact-dedup step).

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    new_sigs = persist_tracked(
        minhash_signatures(
            new_docs, id_col, text_col, num_hashes, bands, shingle_size
        )
    )
    old_sigs = spark.read.parquet(index_path)

    def band_rows(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "did", "keys", F.posexplode("keys").alias("band", "key")
        )

    nb = band_rows(new_sigs)
    ob = band_rows(old_sigs)
    first = _first_agreeing_band(bands)

    n_side = nb.select(
        F.col("did").alias("id_n"), F.col("keys").alias("ka"), "band", "key"
    )
    o_side = ob.select(
        F.col("did").alias("id_o"), F.col("keys").alias("kb"), "band", "key"
    )
    old_new = (
        n_side.join(o_side, ["band", "key"])
        .filter(first)
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
    )
    a_side = nb.select(
        F.col("did").alias("id_a"), F.col("keys").alias("ka"), "band", "key"
    )
    b_side = nb.select(
        F.col("did").alias("id_b"), F.col("keys").alias("kb"), "band", "key"
    )
    new_new = (
        a_side.join(b_side, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first)
        .select("id_a", "id_b")
    )
    cands = old_new.unionByName(new_new)

    hs_all = new_sigs.select("did", "hs").unionByName(
        old_sigs.select("did", "hs")
    )
    ta = hs_all.select(F.col("did").alias("id_a"), F.col("hs").alias("hs_a"))
    tb = hs_all.select(F.col("did").alias("id_b"), F.col("hs").alias("hs_b"))
    verified = (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
        )
        .filter(F.col("jac") >= jaccard_threshold)
    )
    return verified.select(
        "id_a", "id_b", F.round("jac", 6).alias("jaccard")
    )


def append_minhash_index(
    new_docs: DataFrame, index_path: str, **kw
) -> None:
    """Fold a (deduped) increment into the stored index."""
    minhash_signatures(new_docs, **kw).write.mode("append").parquet(
        index_path
    )


def minhash_index_recall_telemetry(
    spark,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_size: int = 3,
    sample_rows: int = 2000,
) -> dict:
    """Per-increment recall telemetry for the stored-index dedup path.

    The banded candidate stage is the only lossy step (verification is
    exact Jaccard), and its recall can DRIFT as the index grows or the
    corpus shifts (signature collisions, band-key distribution). This
    probe measures it directly each increment: ground truth = exact
    shingle-set Jaccard of (new × deterministic index sample) ∪
    (new × new) — the sample bounds the quadratic truth computation at
    ``|new| · sample_rows`` array intersections, which is telemetry-
    sized, not corpus-sized — and recall = the fraction of true
    ≥-threshold pairs in that universe the banded
    ``minhash_incremental_pairs`` run surfaced. Returns
    {"true_pairs", "found_pairs", "recall"} (recall 1.0 when the
    universe holds no true pairs: nothing was missed).

    Wire it next to ``append_minhash_index`` in an ingestion loop and
    alert on a falling trend — the observable the round-3 verdict
    asked for (VERDICT r3 #8).
    """
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, num_hashes, bands, shingle_size
    ).persist()
    old = spark.read.parquet(index_path)
    # deterministic pseudo-random sample — stable run-to-run so the
    # telemetry series is comparable across increments
    samp = (
        old.orderBy(F.pmod(F.xxhash64(F.col("did")), F.lit(9973)), "did")
        .limit(sample_rows)
        .select("did", "hs")
        .persist()
    )
    universe = samp.unionByName(new_sigs.select("did", "hs"))
    na = new_sigs.select(
        F.col("did").alias("id_n"), F.col("hs").alias("hs_n")
    )
    ub = universe.select(
        F.col("did").alias("id_u"), F.col("hs").alias("hs_u")
    )
    jac = (
        F.size(F.array_intersect("hs_n", "hs_u")).cast("double")
        / (
            F.size("hs_n")
            + F.size("hs_u")
            - F.size(F.array_intersect("hs_n", "hs_u"))
        )
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in na.crossJoin(ub)
        .filter(F.col("id_n") != F.col("id_u"))
        .filter(jac >= jaccard_threshold)
        .select(
            F.least("id_n", "id_u").alias("id_a"),
            F.greatest("id_n", "id_u").alias("id_b"),
        )
        .distinct()
        .collect()
    }
    found_df = minhash_incremental_pairs(
        spark, new_docs, index_path, id_col, text_col,
        num_hashes, bands, jaccard_threshold, shingle_size,
    )
    universe_ids = {r["did"] for r in universe.select("did").collect()}
    found = {
        (r["id_a"], r["id_b"])
        for r in found_df.select("id_a", "id_b").collect()
        if r["id_a"] in universe_ids and r["id_b"] in universe_ids
    }
    new_sigs.unpersist()
    samp.unpersist()
    hit = len(truth & found)
    return {
        "true_pairs": len(truth),
        "found_pairs": hit,
        "recall": (hit / len(truth)) if truth else 1.0,
    }


def dedup_block_rewrite(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY span-level dedup: tile each document into non-overlapping
    k-char blocks, drop every block that also occurs in another
    document, and REWRITE the text from the surviving blocks — the
    applying counterpart of ``dup_substring_stats`` (which only
    measures). Block tiling is the SQL-exact approximation of
    suffix-array span removal (Lee et al. 2022): coarser boundaries,
    same removal semantics, and cheap enough to run inline in a
    curation pass.

    Returns (id, n_blocks, n_removed, cleaned).

    Scale shape: blocks shuffle as 8-byte xxhash64 keys for the
    cross-doc count, one key-partitioned join back, and the rewrite is
    a per-doc sorted reassembly (``array_sort`` on (pos, block) structs
    inside the doc-key aggregate — fan-out bounded by len/k, no window
    function, no second pass over the text).
    """
    # empty documents have no blocks: drop them BEFORE the sequence
    # (sequence(1, 0, k) raises "Illegal sequence boundaries"), exactly
    # like the oracle's empty range() drops them
    b = docs.filter(F.length(text_col) >= 1).select(
        id_col,
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length(text_col), F.lit(k))
        ).alias("pos"),
    ).select(
        id_col, "pos", F.expr(f"substring({text_col}, pos, {k})").alias("blk")
    )
    keyed = b.withColumn("bk", F.xxhash64("blk"))
    stats = keyed.groupBy("bk").agg(F.countDistinct(id_col).alias("nd"))
    joined = keyed.join(stats, "bk")
    kept_struct = F.when(
        F.col("nd") <= 1, F.struct(F.col("pos"), F.col("blk"))
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["blk"],
            ),
            "",
        ).alias("cleaned"),
    )


def longest_dup_span_pow2(
    docs: DataFrame,
    min_len: int = 16,
    max_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    prune_unflagged: bool = False,
    double_hash: bool = False,
) -> DataFrame:
    """Per-document longest cross-document duplicated span, to a power
    of two: the binary-lifting form of substring dedup (the doubling
    idea under suffix-array span dedup, Lee et al. 2022). Rabin-Karp
    hashes of every stride-1 window double in length each round —
    h(s1 ⧺ s2) = h(s1)·B^|s2| + h(s2) (mod M) — so ``log2(max/min)+1``
    rounds cover window lengths min_len, 2·min_len, …, max_len, and a
    window duplicated in ≥2 distinct documents at level L proves a
    shared span ≥ L. Output ``max_dup_len`` is the largest such L (0 if
    none) — a LOWER bound on the true longest shared span, tight to a
    factor of 2.

    Sliding (stride-1) windows are position-independent, so unlike the
    aligned-block operators nothing is missed by misalignment between
    the two copies. Hash equality stands in for string equality
    (classic Rabin-Karp caveat, M = 2^31-1; the oracle mirrors the
    same arithmetic, and production would pair two moduli).

    Scale shape: per-doc hash ladders live in array columns (one row
    per doc — no explode until the per-level duplicate check, which
    ships 8-byte values); each level's check is one value-key shuffle
    whose input halves as windows outgrow short docs. Cost is
    O(levels · corpus chars) rows total — the same asymptotics as one
    suffix-array pass, in plain DataFrame ops.

    ``prune_unflagged=True`` additionally drops docs NOT flagged at
    level L before computing level 2L: a shared 2L window contains
    shared L sub-windows (stride-1 sliding — no alignment caveat), so
    both members of any 2L match are already L-flagged and the prune is
    EXACT under true string equality. On a mostly-unique real corpus
    this collapses upper-ladder cost to the duplicated subset (the
    dominant term on web data); on the adversarial all-dup bench corpus
    it's a no-op.

    ``double_hash=True`` runs TWO independent Rabin-Karp ladders and
    matches on the combined (h1·2³¹ + h2) value: collision probability
    drops from ~1/2³¹ per window pair — which at corpus scale is not
    rare (measured: 11 of 240 sf0.001 docs carry a long-window
    collision flag under the single modulus) to ~1/2⁶², i.e. string
    equality in practice. The production configuration is
    ``prune_unflagged=True, double_hash=True`` (the prune's exactness
    argument is string-level, so it needs collision-free matching);
    the registered oracle-gated query keeps both off and mirrors the
    single-modulus arithmetic exactly. tests/test_kernels.py pins the
    double-hash ladder (pruned and unpruned) to brute-force string
    ground truth.
    """
    M = MINHASH_PRIME  # 2^31 - 1: products stay under 2^62 in int64
    # two independent (base, modulus) families; the second only
    # evaluates under double_hash. B2/M2: another prime base and a
    # distinct Mersenne-adjacent prime modulus < 2^31
    hash_cols = [("h", FINGERPRINT_BASE, M)] + (
        [("h2", 1_000_000_007 % M, 2_147_483_629)] if double_hash else []
    )

    base = docs.filter(F.length(text_col) >= min_len).select(
        id_col,
        *[
            F.expr(
                f"transform(sequence(1, length({text_col})),"
                f" i -> bigint(ascii(substring({text_col}, i, 1))))"
            ).alias(c)
            for c, _, _ in hash_cols
        ],
    )
    # double from single chars up to min_len
    cur = 1
    while cur < min_len:
        for c, b, m in hash_cols:
            p = pow(b, cur, m)
            base = base.withColumn(
                c,
                F.expr(
                    f"transform(sequence(0, size({c}) - 1 - {cur}),"
                    f" j -> ({c}[j] * {p} + {c}[j + {cur}]) % {m})"
                ),
            )
        cur *= 2
    base = persist_tracked(base)

    # combined match value: h alone, or h·2³¹ + h2 (< 2⁶² — exact)
    win_val = (
        F.expr("zip_with(h, h2, (a, b) -> a * 2147483648 + b)")
        if double_hash
        else F.col("h")
    )

    flags = None
    level = base
    length = min_len
    while length <= max_len:
        wins = level.select(id_col, F.explode(win_val).alias("v"))
        # "window value seen in >1 distinct docs" as min(id) != max(id):
        # countDistinct plans an Expand (2x the exploded window rows
        # through the value-key exchange); min/max partial-aggregate
        # map-side with no row multiplication (guide §2.3) and the
        # semi-join probe below reuses the same exchange.
        dup_vals = (
            wins.groupBy("v")
            .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("v")
        )
        lvl_flag = (
            wins.join(dup_vals, "v", "left_semi")
            .select(id_col)
            .distinct()
            .withColumn("dup_len", F.lit(length))
        )
        flags = lvl_flag if flags is None else flags.unionByName(lvl_flag)
        length *= 2
        if length > max_len:
            break
        if prune_unflagged:
            # only docs with a duplicated level-L window can hold a
            # duplicated 2L window — the level-0 prefilter
            level = level.join(
                lvl_flag.select(id_col), id_col, "left_semi"
            )
        # drop docs too short for the next level BEFORE the transform:
        # sequence(0, negative) DESCENDS (DEVNOTES invariant on
        # first-match filters) and would index past the array
        level = level.filter(F.size("h") > length // 2).select(
            id_col,
            *[
                F.expr(
                    f"transform(sequence(0, size({c}) - 1 - {length // 2}),"
                    f" j -> ({c}[j] * {pow(b, length // 2, m)}"
                    f" + {c}[j + {length // 2}]) % {m})"
                ).alias(c)
                for c, b, m in hash_cols
            ],
        )
        level = persist_tracked(level)

    best = flags.groupBy(id_col).agg(F.max("dup_len").alias("max_dup_len"))
    return (
        base.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("max_dup_len", F.lit(0)).alias("max_dup_len"),
        )
    )


def minhash_lsh_bipartite(
    docs: DataFrame,
    right_side: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_size: int = 3,
    candidates_only: bool = False,
) -> DataFrame:
    """Bipartite MinHash + banded LSH: candidates only BETWEEN the two
    sides of ``right_side`` (a boolean Column over the post-kernel
    ``did``), never within a side — the shape of fuzzy train/eval
    decontamination, where train×train pairs are dedup's business, not
    the leak check's. Same signature kernel, band keys, first-agreeing-
    band emission and exact-Jaccard verification as
    ``minhash_lsh_pairs``; returns (id_left, id_right, jaccard).

    ``candidates_only=True`` returns the raw band-collision pair set
    (id_left, id_right) BEFORE any Jaccard filter — the screen stage
    of a screen→exact-verify composition, where the caller applies its
    own (e.g. containment) verification to the survivors.

    Scale: this is the screen you run INSTEAD of the exact
    containment join when the corpus is large — the banded join only
    fans out where signatures collide, and the right (eval) side is
    small by construction, so candidate volume is bounded by eval
    bucket membership rather than the train corpus. The 1M-doc
    corpus_bench measures the exact screen at ~203 s; the banded
    bipartite screen scales with collisions, not with train size.
    """
    rows = num_hashes // bands
    base = docs.select(id_col, text_col).mapInPandas(
        _signature_batch_kernel(id_col, text_col, num_hashes, shingle_size),
        schema="did long, hs array<long>, sig array<long>",
    )
    base = persist_tracked(base)
    # (one SQL string instead of bands*rows Column builders — round-9
    # py4j diet; identical expression tree)
    key_arr = F.expr(
        "array("
        + ", ".join(
            "xxhash64(concat_ws('-', "
            + ", ".join(
                f"CAST(sig[{bi * rows + ri}] AS STRING)"
                for ri in range(rows)
            )
            + "))"
            for bi in range(bands)
        )
        + ")"
    )
    band_rows = base.select(
        "did", right_side.alias("is_right"), key_arr.alias("keys")
    ).select(
        "did", "is_right", "keys",
        F.posexplode("keys").alias("band", "key"),
    )
    a = band_rows.filter(~F.col("is_right")).select(
        F.col("did").alias("id_left"), F.col("keys").alias("ka"),
        "band", "key",
    )
    b = band_rows.filter(F.col("is_right")).select(
        F.col("did").alias("id_right"), F.col("keys").alias("kb"),
        "band", "key",
    )
    first_match = F.lit(True)
    for i in range(bands - 1, -1, -1):
        earlier_differ = F.lit(True)
        for j in range(i):
            earlier_differ = earlier_differ & (
                F.col("ka")[j] != F.col("kb")[j]
            )
        first_match = F.when(F.col("band") == i, earlier_differ).otherwise(
            first_match
        )
    cands = (
        a.join(b, ["band", "key"])
        .filter(first_match)
        .select("id_left", "id_right")
    )
    if candidates_only:
        return cands
    ta = base.select(F.col("did").alias("id_left"), F.col("hs").alias("hs_a"))
    tb = base.select(
        F.col("did").alias("id_right"), F.col("hs").alias("hs_b")
    )
    verified = (
        cands.join(ta, "id_left")
        .join(tb, "id_right")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
        )
        .filter(F.col("jac") >= jaccard_threshold)
    )
    out = verified.select(
        "id_left", "id_right", F.round("jac", 6).alias("jaccard")
    )
    return out


def containment_prefix_candidates(
    kept: DataFrame,
    g_df: DataFrame,
    eval_counts: DataFrame,
    threshold: float = 0.8,
    is_test_col: str = "is_test",
    id_col: str = "doc_id",
    g_col: str = "g",
) -> DataFrame:
    """Containment-preserving candidate screen (PPJoin-style prefix
    filter) for eval-side containment ≥ ``threshold`` — the screen a
    MinHash band join CANNOT be: MinHash signatures estimate JACCARD,
    so a small eval doc fully contained in a much larger train doc
    (containment 1.0, Jaccard ~|e|/|t| → 0 — the most common real
    contamination shape) essentially never agrees in any band and is
    silently dropped. The prefix filter instead uses the pigeonhole
    bound: if train covers ≥ m = ⌈threshold·c⌉ of the eval doc's c
    shingles, then among the eval doc's kept shingles E_k at most
    |E_k| − m can be uncovered, so train must contain at least one of
    ANY (|E_k| − m + 1)-subset — in particular the prefix of the
    |E_k| − m + 1 globally RAREST kept shingles. Indexing only that
    prefix per eval doc and joining it against the train side's kept
    shingles yields a candidate set with ZERO false negatives w.r.t.
    the exact verify, at ~(1−threshold) of the full inverted-index
    join's eval-side volume, with fan-out minimized by rarest-first
    prefix ordering (each prefix shingle's df is the smallest
    available, and all dfs are ≤ the caller's stop-shingle cap).

    Inputs: ``kept`` = df-capped exploded shingles
    (id_col, g_col, is_test_col); ``g_df`` = (g_col, _df) global
    document frequency of kept shingles; ``eval_counts`` =
    (id_eval, c) FULL (pre-cap) per-eval-doc shingle counts — the
    verify denominator. Returns distinct (id_train, id_eval).

    Scale shape: one shuffle on the shingle key for the df join, one
    per-eval-doc window (partition cardinality = shingles/doc, never
    corpus-sized), one prefix⨝train shuffle on the 8-byte shingle key,
    one distinct on the candidate pair. The eval side is small by
    construction (it is the benchmark split), and the threshold bounds
    the prefix at ~(1−threshold)·shingles/doc rows per eval doc.

    Reference parity: plays the screen role of svs's exact overlap
    scan (reference src/svs — single-node full join) for the
    decontamination family, with the exactness the MinHash screen
    lacks."""
    from pyspark.sql.window import Window

    ek = (
        kept.filter(F.col(is_test_col))
        .select(F.col(id_col).alias("id_eval"), F.col(g_col).alias("g"))
        .join(g_df.select(F.col(g_col).alias("g"), "_df"), "g")
    )
    nk = ek.groupBy("id_eval").agg(F.count("*").alias("n_kept"))
    # smallest integer n_shared that can pass round(n/c, 6) >= threshold:
    # widen by 1e-6·c against the round-6 on the verify side so the
    # screen can only over-include, never drop a passing pair
    bounds = (
        eval_counts.join(nk, "id_eval")
        .withColumn(
            "m_min",
            F.ceil((F.lit(threshold) - F.lit(1e-6)) * F.col("c")).cast("int"),
        )
        .withColumn("prefix_n", F.col("n_kept") - F.col("m_min") + 1)
        .filter(F.col("prefix_n") >= 1)  # n_kept < m_min can never pass
        .select("id_eval", "prefix_n")
    )
    w = Window.partitionBy("id_eval").orderBy(F.col("_df").asc(), F.col("g").asc())
    prefix = (
        ek.join(bounds, "id_eval")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("prefix_n"))
        .select("id_eval", "g")
    )
    tr = kept.filter(~F.col(is_test_col)).select(
        F.col(id_col).alias("id_train"), F.col(g_col).alias("g")
    )
    return prefix.join(tr, "g").select("id_train", "id_eval").dropDuplicates()
