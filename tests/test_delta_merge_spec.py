"""Jar-free verification of the dormant Delta MERGE leg.

delta-spark is not on this environment's classpath, so `apply_cdc_delta`
never executes here (`test_delta_path.py` importorskips). These tests
close most of that gap WITHOUT the jar: the exact clause strings the
Delta binding would pass to `whenMatchedDelete` / `whenMatchedUpdate` /
`whenNotMatchedInsert` now come from the pure `delta_merge_spec`, and a
small MERGE interpreter executes those literal SQL condition strings
over a full-outer join — so the only thing left untested is Delta's own
MERGE executor, not our conditions.

Structural pins + a property check: interpreting the spec must reproduce
`merge_cdc_batch` (the parquet-path merge, itself property-tested
against a full-rewrite reference) on randomized insert/update/stale/
delete mixes.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka2delta_spark.cdc.merge import (
    DELETED_COL,
    LSN_COL,
    delta_merge_spec,
    merge_cdc_batch,
)

COLS = ["id", "name", LSN_COL, DELETED_COL]


def test_spec_structure():
    spec = delta_merge_spec(COLS, ["id"], ["year", "month"])
    # partition pruning: every key AND partition column equi-joins in ON
    assert spec["on"] == (
        "t.`id` = s.`id` AND t.`year` = s.`year` AND t.`month` = s.`month`"
    )
    # LSN guard on BOTH mutating clauses — the reference's unguarded-
    # delete replay gap stays closed in the Delta leg
    assert f"s.`{LSN_COL}` > t.`{LSN_COL}`" in spec["delete_condition"]
    assert f"s.`{LSN_COL}` > t.`{LSN_COL}`" in spec["update_condition"]
    # tombstones for unseen keys never insert
    assert spec["insert_condition"].startswith("NOT COALESCE")
    # the control column never lands in the target
    assert DELETED_COL not in spec["set_map"]
    assert set(spec["set_map"]) == {"id", "name", LSN_COL}
    assert spec["set_map"]["name"] == "s.`name`"


def _interpret_merge(spark, spec, target_df, source_df, target_cols):
    """Execute the spec's LITERAL clause strings the way Delta MERGE
    would: full-outer join on `on`, then per-row clause selection in
    Delta's clause order (matched-delete, matched-update, else keep;
    not-matched-insert when its condition holds)."""
    t = target_df.alias("t")
    s = source_df.alias("s")
    j = t.join(s, on=F.expr(spec["on"]), how="full_outer")
    matched = F.col("t.id").isNotNull() & F.col("s.id").isNotNull()
    s_row = F.struct(*[F.expr(v).alias(k) for k, v in spec["set_map"].items()])
    t_row = F.struct(*[F.col(f"t.{c}").alias(c) for c in target_cols])
    row = (
        F.when(matched & F.expr(spec["delete_condition"]), F.lit(None))
        .when(matched & F.expr(spec["update_condition"]), s_row)
        .when(matched, t_row)
        .when(
            F.col("t.id").isNull() & F.expr(spec["insert_condition"]), s_row
        )
        .when(F.col("t.id").isNull(), F.lit(None))  # tombstone, unseen key
        .otherwise(t_row)  # target-only rows persist
    )
    return (
        j.select(row.alias("__row"))
        .filter(F.col("__row").isNotNull())
        .select("__row.*")
    )


state_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)
change_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.sampled_from(["x", "y"]),
        st.integers(min_value=0, max_value=40),
        st.sampled_from(["true", "false"]),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(state=state_rows, changes=change_rows)
def test_spec_interpretation_equals_parquet_merge(spark, state, changes):
    target_cols = ["id", "name", LSN_COL]
    tdf = spark.createDataFrame(
        state, f"id long, name string, {LSN_COL} long"
    )
    cdf = spark.createDataFrame(
        changes, f"id long, name string, {LSN_COL} long, {DELETED_COL} string"
    )
    expected = sorted(
        map(tuple, merge_cdc_batch(tdf, cdf, ["id"]).collect())
    )
    spec = delta_merge_spec(COLS, ["id"])
    got = sorted(
        map(tuple, _interpret_merge(spark, spec, tdf, cdf, target_cols).collect())
    )
    assert got == expected


def test_kafka_source_options_spec():
    """Broker-free pin of the live-Kafka leg's configuration (the
    connector jar is absent here, so the option map is the testable
    surface — the binding passes it verbatim)."""
    from kafka2delta_spark.streaming.stream import kafka_source_options

    opts = kafka_source_options(
        "broker-1:9092,broker-2:9092",
        ["postgres.public.users", "postgres.public.orders"],
        starting_offset="latest",
        fail_on_data_loss=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "postgres.public.users,postgres.public.orders",
        "startingOffsets": "latest",
        # the connector rejects Python's str(False) capitalization
        "failOnDataLoss": "false",
    }
    assert kafka_source_options("b:9092", ["t"])["failOnDataLoss"] == "true"
    assert kafka_source_options("b:9092", ["t"])["startingOffsets"] == "earliest"
