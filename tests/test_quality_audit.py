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
