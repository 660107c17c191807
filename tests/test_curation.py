"""Curation + bloom-join unit tests (beyond the oracle gate)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kafka2delta_spark.functions.curation import (
    EMAIL_ORACLE_PFX,
    EMAIL_ORACLE_RE,
    EMAIL_RE,
    EMAIL_RE_JAVA,
    redact_pii,
)
from kafka2delta_spark.operators.advanced import (
    bloom_bitmap,
    bloom_might_contain,
)


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 2000).select((F.col("id") * 37 + 11).alias("k"))
    bitmap = bloom_bitmap(keys, "k")
    hits = (
        keys.join(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("k")))
        .count()
    )
    assert hits == 2000  # every inserted key must pass the filter


def test_bloom_rejects_most_non_members(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(keys, "k")
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = (
        probe.join(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("k")))
        .count()
    )
    # m/n ~ 33 bits/key at 2k keys -> FPR well under 1%
    assert fp < 100


def test_redact_pii_replaces_emails_and_phones(spark):
    rows = [
        ("mail me at a.b+c@ex-ample.org today", "[EMAIL]"),
        ("call 555-123-4567 now", "[PHONE]"),
        ("both x@y.io and 111-222-3333", "[EMAIL]"),
        ("no pii here", None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "t string")
    out = [r["r"] for r in df.select(redact_pii(F.col("t")).alias("r")).collect()]
    assert out[0] == "mail me at [EMAIL] today"
    assert out[1] == "call [PHONE] now"
    assert out[2] == "both [EMAIL] and [PHONE]"
    assert out[3] == "no pii here"


# The run-start-only email contract (curation.py: EMAIL_RE_JAVA comment).
# Each case pins Spark (lookbehind) == DuckDB (consuming prefix) on both
# the match COUNT and the redacted TEXT — the 2026-08-16 ADVICE found the
# two engines disagreed on abutting emails, where a second candidate
# starts immediately after a previous match's final TLD letter.
_EMAIL_PARITY_CASES = [
    "a@bb.cc1@dd.ee",          # abutting: 2nd starts right after 1st's TLD
    "a@b.cc.x@d.ee",           # abutting via '.' (in local-part class)
    "a@b.cc1@d.ee2@e.ff",      # chain of three abutting candidates
    "x@y.zz.a@b.cc",           # TLD-adjacent dot run
    "ab@cd@e.ff",              # '@' boundary exposes a run start
    "hi a@b.cc and c@d.ee!",   # ordinary separated emails
    "a@b.cc x@d.ee",           # single-space separation
    ".a@b.cc",                 # leading class char at string start
    "a@b.cc",                  # bare email, whole string
    "nomail",
    "",
]


def test_email_contract_spark_matches_duckdb(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_EMAIL_PARITY_CASES)], "i int, t string"
    )
    got = {
        r["i"]: (r["n"], r["red"])
        for r in df.select(
            "i",
            F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE_JAVA), 0)).alias("n"),
            F.regexp_replace("t", F.lit(EMAIL_RE_JAVA), F.lit("[EMAIL]")).alias(
                "red"
            ),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(_EMAIL_PARITY_CASES):
        n, red = con.execute(
            "SELECT len(regexp_extract_all(?, ?, 2)),"
            "       regexp_replace(?, ?, '\\1[EMAIL]', 'g')",
            [t, EMAIL_ORACLE_RE, t, EMAIL_ORACLE_PFX + EMAIL_RE],
        ).fetchone()
        assert got[i] == (n, red), f"case {t!r}: spark={got[i]} duckdb={(n, red)}"
    con.close()
