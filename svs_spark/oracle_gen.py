"""DuckDB-SQL snippet generators that mirror svs_spark.functions.text.

Each generator builds the *same arithmetic* as the Column-based function
from the same constants (LANG_MARKERS, ENGLISH_STOPWORDS, weights), so
the Spark query and its oracle cannot drift apart.
"""

from __future__ import annotations

from svs_spark.functions.text import (
    ENGLISH_STOPWORDS,
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    LANG_MARKERS,
)


def padded_lower(col: str) -> str:
    return f"(' ' || lower({col}) || ' ')"


def count_occurrences_sql(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (
        f"((length({expr}) - length(replace({expr}, '{esc}', ''))) // {len(needle)})"
    )


def lang_score_sql(col: str, lang: str) -> str:
    p = padded_lower(col)
    terms = [count_occurrences_sql(p, m) for m in LANG_MARKERS[lang]]
    return "(" + " + ".join(terms) + ")"


def detect_language_sql(col: str) -> str:
    ordered = ["en", "es", "de", "fr"]
    scores = {lang: lang_score_sql(col, lang) for lang in ordered}
    # same precedence chain as functions.text.detect_language: first max
    # wins in en > es > de > fr order, all-zero -> 'und'
    clauses = []
    for lang in ordered:
        conds = [f"{scores[lang]} > 0"]
        for other in ordered:
            if other == lang:
                continue
            op = ">" if ordered.index(other) < ordered.index(lang) else ">="
            conds.append(f"{scores[lang]} {op} {scores[other]}")
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def ws_token_count_sql(col: str) -> str:
    t = f"trim({col})"
    return (
        f"(CASE WHEN length({t}) = 0 THEN 0 "
        f"ELSE {count_occurrences_sql(t, ' ')} + 1 END)"
    )


def stopword_hits_sql(col: str) -> str:
    p = padded_lower(col)
    return "(" + " + ".join(
        count_occurrences_sql(p, sw) for sw in ENGLISH_STOPWORDS
    ) + ")"


def stopword_ratio_sql(col: str) -> str:
    toks = ws_token_count_sql(col)
    return (
        f"(CASE WHEN {toks} > 0 THEN {stopword_hits_sql(col)}::DOUBLE / {toks} "
        f"ELSE 0.0 END)"
    )


def punct_ratio_sql(col: str) -> str:
    stripped = col
    for p in [".", ",", ";", ":", "!", "?"]:
        stripped = f"replace({stripped}, '{p}', '')"
    return (
        f"(CASE WHEN length({col}) > 0 THEN "
        f"(length({col}) - length({stripped}))::DOUBLE / length({col}) "
        f"ELSE 0.0 END)"
    )


def quality_score_sql(col: str) -> str:
    toks = ws_token_count_sql(col)
    len_term = f"least(1.0, {toks}::DOUBLE / 100.0)"
    sw_term = f"least(1.0, 4.0 * {stopword_ratio_sql(col)})"
    punct_term = f"(1.0 - least(1.0, 5.0 * {punct_ratio_sql(col)}))"
    return f"(0.4 * {len_term} + 0.4 * {sw_term} + 0.2 * {punct_term})"


def fingerprint_sql(col: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({col}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
    )


def token_hash_sql(tok_expr: str) -> str:
    """Polynomial hash of one token (same fold as fingerprint_sql)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({tok_expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
    )
