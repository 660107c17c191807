"""qx42 data-quality audit: structural invariants at sf0.001 — every
registered check reports, violation counts are bounded by rows checked,
and the generator's known-clean constraints really audit as clean (a
non-zero there would mean the check reads the wrong column, not that the
data went bad)."""

SF_DIR = "/root/testdata/sf0.001"

EXPECTED_CHECKS = {
    "customer_pk_unique", "orders_custkey_fk", "lineitem_orderkey_fk",
    "lineitem_qty_range", "orders_price_nonneg", "events_value_nonneg",
    "documents_text_complete", "events_event_id_unique",
}


def test_quality_audit_report_shape(spark):
    from kafka2delta_spark.functions.curation import qx42_data_quality_audit
    from kafka2delta_spark.sources.tables import load_table

    out = {r["check_name"]: r for r in qx42_data_quality_audit(spark, SF_DIR).collect()}
    assert set(out) == EXPECTED_CHECKS
    for r in out.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]
    # row counts audited == table row counts (each check scanned everything)
    assert out["customer_pk_unique"]["n_checked"] == load_table(
        spark, SF_DIR, "customer"
    ).count()
    assert out["lineitem_qty_range"]["n_checked"] == load_table(
        spark, SF_DIR, "lineitem"
    ).count()
    # the synthetic corpus is referentially clean on PKs/FKs
    for name in ("customer_pk_unique", "orders_custkey_fk",
                 "lineitem_orderkey_fk", "events_event_id_unique"):
        assert out[name]["n_violations"] == 0, name


def test_skew_profile_matches_bruteforce(spark):
    from collections import Counter

    from kafka2delta_spark.operators.advanced import (
        SKEW_TOP_KEYS,
        qx44_join_key_skew_profile,
    )
    from kafka2delta_spark.sources.tables import load_table

    counts = Counter(
        r["user_id"] for r in load_table(spark, SF_DIR, "events").collect()
    )
    rows = qx44_join_key_skew_profile(spark, SF_DIR).collect()
    summary = {r["metric"]: r["value"] for r in rows if r["metric"] != "top_key"}
    n_rows = sum(counts.values())
    assert summary["n_keys"] == len(counts)
    assert summary["n_rows"] == n_rows
    assert summary["max_key_rows"] == max(counts.values())
    assert summary["min_key_rows"] == min(counts.values())
    assert summary["sum_sq_rows"] == sum(v * v for v in counts.values())
    assert summary["skew_ratio_e6"] == max(counts.values()) * 10**6 * len(counts) // n_rows
    assert summary["collision_factor_e6"] == sum(v * v for v in counts.values()) * 10**6 // n_rows
    top = sorted(
        ((r["key"], r["value"]) for r in rows if r["metric"] == "top_key"),
        key=lambda kv: (-kv[1], kv[0]),
    )
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOP_KEYS]
    assert top == want


def test_table_stats_match_bruteforce(spark):
    from kafka2delta_spark.operators.advanced import (
        STATS_COLUMNS,
        qx45_table_stats_collect,
    )
    from kafka2delta_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").collect()
    out = {r["column_name"]: r for r in qx45_table_stats_collect(spark, SF_DIR).collect()}
    assert set(out) == set(STATS_COLUMNS)
    for c in STATS_COLUMNS:
        vals = [r[c] for r in li]
        r = out[c]
        assert r["n_rows"] == len(vals)
        assert r["n_null"] == sum(1 for v in vals if v is None)
        assert r["ndv"] == len({v for v in vals if v is not None})


def test_snapshot_fingerprint_detects_single_row_change(spark, tmp_path):
    """The manifest must be (a) invariant to row order / partitioning and
    (b) sensitive to a single-row edit in a single table."""
    import shutil

    from pyspark.sql import functions as F

    from kafka2delta_spark.operators.advanced import qx47_snapshot_fingerprint
    from kafka2delta_spark.sources.tables import load_table

    base = {r["table_name"]: r for r in qx47_snapshot_fingerprint(spark, SF_DIR).collect()}
    assert set(base) == {"documents", "events", "orders"}

    # (a) same data rewritten shuffled into 8 files -> identical manifest
    mirror = str(tmp_path / "mirror")
    for t in ("documents", "events", "orders"):
        load_table(spark, SF_DIR, t).repartition(8).write.parquet(
            f"{mirror}/{t}.parquet"
        )
    shuffled = {
        r["table_name"]: r for r in qx47_snapshot_fingerprint(spark, mirror).collect()
    }
    for t, r in base.items():
        assert (shuffled[t]["n_rows"], shuffled[t]["fingerprint"]) == (
            r["n_rows"], r["fingerprint"]
        ), t

    # (b) mutate ONE document's text -> only documents' fingerprint moves
    edited = str(tmp_path / "edited")
    docs = load_table(spark, SF_DIR, "documents")
    victim = docs.select(F.min("doc_id")).collect()[0][0]
    docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.concat(F.col("text"), F.lit(" x")))
        .otherwise(F.col("text")),
    ).write.parquet(f"{edited}/documents.parquet")
    import os

    for t in ("events", "orders"):
        src, dst = f"{SF_DIR}/{t}.parquet", f"{edited}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    got = {
        r["table_name"]: r for r in qx47_snapshot_fingerprint(spark, edited).collect()
    }
    assert got["documents"]["n_rows"] == base["documents"]["n_rows"]
    assert got["documents"]["fingerprint"] != base["documents"]["fingerprint"]
    for t in ("events", "orders"):
        assert got[t]["fingerprint"] == base[t]["fingerprint"], t
