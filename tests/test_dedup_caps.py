"""Candidate-explosion guards for the shingle/band dedup operators.

A stop phrase shared by every document would, uncapped, put all n docs in
one bucket and emit C(n, 2) pairs — the 100 TB failure mode VERDICT r1
flagged. These tests build a synthetic corpus where every doc shares a
3-token stop phrase and assert the capped operators' pair output is
bounded by genuine overlaps, not the corpus size.
"""

import os

import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.functions.dedup import (
    BAND_BUCKET_CAP,
    SHINGLE_DF_CAP,
    pairs_within_groups,
)

N_DOCS = 3 * SHINGLE_DF_CAP  # every-doc shingles exceed the cap 3x over


@pytest.fixture(scope="module")
def stop_phrase_dir(spark, tmp_path_factory):
    """documents.parquet where every doc starts with the same 3-token stop
    phrase; only doc pairs (2i, 2i+1) genuinely share their tail."""
    d = str(tmp_path_factory.mktemp("stopphrase"))
    rows = []
    for i in range(N_DOCS):
        tail = f"unique tail tokens pair{i // 2} alpha beta gamma delta"
        rows.append((i, f"the quick brown {tail}"))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_jaccard_df_cap_bounds_pairs(spark, stop_phrase_dir):
    from kafka2delta_spark.functions.dedup import q88_jaccard_similar_pairs

    out = q88_jaccard_similar_pairs(spark, stop_phrase_dir).collect()
    # Uncapped, the shared "the quick brown ..." shingles alone would emit
    # C(N_DOCS, 2) candidate pairs. Capped, only the genuine tail-sharing
    # pairs (2i, 2i+1) survive candidate generation.
    assert 0 < len(out) <= N_DOCS // 2
    assert all(r.doc_b == r.doc_a + 1 and r.doc_a % 2 == 0 for r in out)
    # Jaccard is exact on the reduced space: identical tails minus the
    # capped prefix shingles -> high similarity, and bounded by 1.
    assert all(0.12 <= r.jaccard <= 1.0 for r in out)


def test_minhash_band_cap_bounds_pairs(spark, stop_phrase_dir):
    from kafka2delta_spark.functions.dedup import q86_minhash_lsh_pairs

    out = q86_minhash_lsh_pairs(spark, stop_phrase_dir).toPandas()
    # Pair output is bounded by n_buckets * C(cap, 2), never C(N_DOCS, 2):
    # any band bucket wider than the cap (e.g. one dominated by the stop
    # phrase) is dropped whole.
    assert len(out) < N_DOCS * (N_DOCS - 1) // 2
    # the genuine near-dup pairs still collide in >=1 band
    genuine = out[(out.doc_b == out.doc_a + 1) & (out.doc_a % 2 == 0)]
    assert len(genuine) > 0


def test_pairs_within_groups_cap_contract(spark):
    """pairs_within_groups itself stays quadratic — callers must cap; the
    registry callers all do (df cap / band cap / LSH bucket width)."""
    grouped = spark.createDataFrame(
        [(1, list(range(10)))], "bucket int, ids array<int>"
    )
    n = pairs_within_groups(grouped).count()
    assert n == 45  # C(10, 2) — documents the quadratic contract
