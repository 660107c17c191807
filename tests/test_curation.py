"""Curation + bloom-join unit tests (beyond the oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka2delta_spark.functions.curation import redact_pii
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
