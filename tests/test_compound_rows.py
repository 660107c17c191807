"""Compound-fixture pins (round-11 interaction campaign).

The six single-dimension fixtures each prove one corruption class in
isolation; `compound` composes ALL of them on one dataset (NULL keys on
pre-1970 rows, NULL event_type on the mass-tie rows, NaN/±Inf next to
NULL values, a ~1.1 MB emoji/CJK/combining body, NULL text inside the
unicode traps, ±100-year date shifts, hot-key skew on top of anonymous
rows, shuffled physical order) and pins that the classes neither mask
nor amplify each other. Fixture-shape test + a parity band chosen so
every pairwise interaction surface has at least one query. The full
228-query artifact is CORRECTNESS_DEGEN_compound.json
(`python tools/check_correctness.py --fixture compound`).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from build_degenerate_fixtures import build_compound  # noqa: E402
from check_correctness import normalize, register_oracle_views  # noqa: E402

SRC = "/root/testdata/sf0.001"

INTERACTION_AUDITED = [
    # NULL keys x timeskew x hot key (events)
    "q34_event_gaps",
    "q49_incremental_user_rollup",
    "q55_stream_dedup_within_watermark",
    "q58_stream_stream_left_outer_join",
    "qx39_session_attribution",
    "q62_salted_heavy_hitters",
    "q70_latest_event_per_user",
    # NULL event_type on the mass-tie rows (grouping under NULL keys
    # whose every member also shares one timestamp)
    "q37_pivot_event_types",
    "qx90_user_type_entropy",
    # NaN/Inf adjacent to NULL values
    "qx10_ewm_rolling_value",
    "qx30_exact_grouped_quantiles",
    "qx38_rolling_zscore_anomalies",
    # unicode x size (the 1.1 MB non-ASCII body) and unicode x NULL text
    "q78_doc_chunking",
    "q81_language_id",
    "q82_token_counting",
    "q83_doc_fingerprints",
    "qx21_bpe_pair_counts",
    # NULL text x dedup
    "q85_exact_dedup",
    "q86_minhash_lsh_pairs",
    # PII contract inside the compound context
    "q73_pii_redaction",
    # NULL embeddings
    "q90_cosine_topk_bruteforce",
    "qx41_embedding_dim_stats",
    # ±100-year dates through the TPC-H core
    "q01_pricing_summary",
    "q14_promo_revenue",
    "q47_resample_ffill",
]


@pytest.fixture(scope="module")
def compound_sf_dir(tmp_path_factory):
    return build_compound(SRC, str(tmp_path_factory.mktemp("compound")))


@pytest.fixture(scope="module")
def compound_oracle_con(compound_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, compound_sf_dir)
    yield con
    con.close()


def test_fixture_is_actually_compound(spark, compound_sf_dir):
    from pyspark.sql import functions as F

    from kafka2delta_spark.sources.tables import normalize_event_ts

    ev = normalize_event_ts(
        spark.read.parquet(f"{compound_sf_dir}/events.parquet")
    )
    stats = ev.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("null_users"),
        F.count(F.when(F.isnan("value"), 1)).alias("nans"),
        F.count(F.when(F.col("value") == float("inf"), 1)).alias("infs"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("null_vals"),
        F.count(F.when(F.col("event_type").isNull(), 1)).alias("null_types"),
        # the interaction rows themselves: anonymous AND pre-1970
        F.count(
            F.when(
                F.col("user_id").isNull()
                & (F.col("ts") < F.lit("1970-01-01").cast("timestamp")),
                1,
            )
        ).alias("null_user_pre1970"),
        F.max(
            F.when(F.col("user_id").isNotNull(), F.col("user_id"))
        ).alias("max_user"),
    ).collect()[0]
    assert stats["lo"].year < 1950 and stats["hi"].year > 2100
    for k in ("null_users", "nans", "infs", "null_vals", "null_types"):
        assert stats[k] > 0, k
    assert stats["null_user_pre1970"] > 0  # the classes genuinely overlap

    # hot-key skew survives alongside the NULL keys
    top = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id").count()
        .agg(F.max("count").alias("m"), F.sum("count").alias("s"))
        .collect()[0]
    )
    assert top["m"] > 0.3 * top["s"]

    docs = spark.read.parquet(f"{compound_sf_dir}/documents.parquet")
    d = docs.agg(
        F.count(F.when(F.col("text").isNull(), 1)).alias("null_texts"),
        F.max("n_chars").alias("max_chars"),
        F.max(F.octet_length("text")).alias("max_bytes"),
    ).collect()[0]
    assert d["null_texts"] > 0
    # the emoji/CJK/combining body: >1M in BOTH units — code points and
    # UTF-8 bytes diverge by ~2x on this text, which is the point
    assert d["max_chars"] > 1_000_000
    assert d["max_bytes"] > 2_000_000 and d["max_bytes"] > d["max_chars"]

    emb = spark.read.parquet(f"{compound_sf_dir}/embeddings.parquet")
    assert emb.filter(F.col("embedding").isNull()).count() > 0


@pytest.mark.parametrize("name", INTERACTION_AUDITED)
def test_compound_oracle_parity(
    spark, compound_sf_dir, compound_oracle_con, name
):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, compound_sf_dir).toPandas()
    odf = compound_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)


def test_qx58_fold_merges_null_event_type_groups(spark, tmp_path):
    """2026-08-16 ADVICE (medium): the agg0/deltas fold key (event_type)
    is nullable, and a using-column full_outer join is null-UNSAFE — a
    user whose PRE-split latest row has NULL event_type and then receives
    a post-split change produces a NULL-group retraction that must fold
    into agg0's NULL group, not sit on its own row. The compound fixture
    pins NULL-type rows to post-split timestamps, so this is the one
    interaction it cannot see; pin it with a minimal fixture where the
    NULL group is exercised on every delta path (retract-out,
    retract+re-add, fresh add, all-NULL-sum survivor)."""
    import pandas as pd

    from kafka2delta_spark.streaming.incremental import (
        qx58_ivm_retraction_agg,
    )

    pre = pd.Timestamp("2024-01-10 00:00:00")
    post = pd.Timestamp("2024-01-20 00:00:00")
    rows = [
        # pre-split latest is NULL-type; post-split change retracts it
        # out of the NULL group into 'click'
        (1, 10, None, 1.0, pre), (1, 20, "click", 2.0, post),
        # NULL-type survivor whose value is NULL: the NULL group's SUM
        # must stay NULL-aware through the fold
        (2, 11, None, None, pre),
        # fresh post-split arrival INTO the NULL group
        (3, 12, None, 3.0, post),
        # control: non-NULL retraction (delete)
        (4, 13, "view", 4.0, pre), (4, 14, "error", None, post),
        # NULL -> NULL update: retraction and add in the same NULL group
        (5, 15, None, 5.0, pre), (5, 16, None, 6.0, post),
        # untouched non-NULL state
        (6, 17, "click", 7.0, pre),
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "value", "ts"]
    )
    sf = str(tmp_path / "nulltype_fold")
    os.makedirs(sf)
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    sdf = qx58_ivm_retraction_agg(spark, sf).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        import __spark_entry__ as entry

        odf = con.execute(
            entry.oracle_sql()["qx58_ivm_retraction_agg"]
        ).fetchdf()
    finally:
        con.close()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    # exactly ONE NULL-group row may survive the fold
    assert int(sdf["event_type"].isna().sum()) == 1
    assert len(sdf) == len(odf), f"{len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)
