"""PII pattern parity: Java (Spark) and RE2 (DuckDB) must agree on a
battery of adversarial strings — the invariant behind the pii_scrub
oracle is that the shared regex subset (ASCII classes, bounded
repetition, \\b, no capture groups) has identical semantics in both
engines. The driver only sees the injected-PII happy path; this pins
the edge cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from svs_spark.functions.text import (
    PII_EMAIL as _PII_EMAIL,
    PII_IP as _PII_IP,
    PII_PHONE as _PII_PHONE,
)

CASES = [
    # emails: tags, subdomains, boundary chars, almost-emails
    "plain user@example.com end",
    "tagged user+tag@mail.example.co.uk!",
    "dotted.first.last@sub.domain.io,next",
    "no-tld user@localhost stays",
    "double a@b.cc c@d.ee two hits",
    "tight(user@x.org)paren",
    "leading @example.com bare-at",
    "trailing-dot user@example.com. period",
    # phones: word boundaries, longer digit runs, separators
    "call 555-123-4567 now",
    "overlong 1555-123-4567 run",
    "digits 555-123-45678 tail",
    "x555-123-4567 letter-prefix",
    "two 111-222-3333 and 444-555-6666",
    "dots 555.123.4567 not-a-match",
    # IPv4-ish: boundaries, octet counts, oversized octets
    "ip 10.0.0.1 plain",
    "ip 999.999.999.999 oversized-octets-still-shape-match",
    "ip 1.2.3.4.5 five-octets",
    "ver 1.2.3 three-octets",
    "glued x1.2.3.4 prefix-digit",
    "port 10.0.0.1:8080 suffix",
    # mixtures — replacement order email → phone → ip must agree
    "mix a@b.io then 555-000-1111 then 8.8.8.8 done",
]


def test_pii_regex_parity_battery(spark, duck):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], ["i", "t"]
    )
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    got = {
        r.i: (r.ne, r.np, r.ni, r.s)
        for r in df.select(
            "i",
            F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), 0)).alias("ne"),
            F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), 0)).alias("np"),
            F.size(F.regexp_extract_all("t", F.lit(_PII_IP), 0)).alias("ni"),
            scrub.alias("s"),
        ).collect()
    }
    for i, t in enumerate(CASES):
        row = duck.sql(
            f"""
            SELECT CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INTEGER),
                   CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INTEGER),
                   CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS INTEGER),
                   regexp_replace(regexp_replace(regexp_replace(
                     t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                     '{_PII_PHONE}', '<PHONE>', 'g'),
                     '{_PII_IP}', '<IP>', 'g')
            FROM (SELECT ?::VARCHAR AS t)
            """,
            params=[t],
        ).fetchone()
        assert got[i] == row, f"case {i!r} ({t!r}): spark={got[i]} duck={row}"


def test_pii_scrub_removes_all_matches(spark):
    """Post-scrub text must contain no residual pattern hits (the
    replacement tokens themselves must not re-trigger any pattern)."""
    df = spark.createDataFrame([(t,) for t in CASES], ["t"])
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    residual = df.select(
        (
            F.size(F.regexp_extract_all(scrub, F.lit(_PII_EMAIL), 0))
            + F.size(F.regexp_extract_all(scrub, F.lit(_PII_PHONE), 0))
            + F.size(F.regexp_extract_all(scrub, F.lit(_PII_IP), 0))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0].total
    assert residual == 0
