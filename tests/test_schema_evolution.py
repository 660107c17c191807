"""merge_cdc_batch_evolving: Delta mergeSchema parity on the engine-neutral
path — widening (change set adds a column), narrowing (old replayed batch
lacks a column the store already has), and the LSN/delete semantics must
pass through unchanged.
"""

from pyspark.sql import functions as F

from kafka2delta_spark.cdc.merge import merge_cdc_batch_evolving


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_widening_null_fills_untouched_rows(spark):
    state = _df(spark, [(1, 10, "a"), (2, 20, "b")], "id long, lsn long, v string")
    changes = _df(
        spark,
        [(2, 21, "b2", 99, "false"), (3, 5, "c", 7, "false")],
        "id long, lsn long, v string, extra long, __deleted string",
    )
    out = {
        r["id"]: (r["lsn"], r["v"], r["extra"])
        for r in merge_cdc_batch_evolving(state, changes, ["id"], lsn_col="lsn").collect()
    }
    assert out == {
        1: (10, "a", None),   # untouched: new column null-filled
        2: (21, "b2", 99),    # updated: carries the new column
        3: (5, "c", 7),       # inserted
    }
    # column order: state columns first, new column appended
    cols = merge_cdc_batch_evolving(state, changes, ["id"], lsn_col="lsn").columns
    assert cols == ["id", "lsn", "v", "extra"]


def test_narrowing_replayed_old_batch(spark):
    # store already evolved; a replayed pre-evolution batch lacks `extra`
    state = _df(
        spark, [(1, 10, "a", 5)], "id long, lsn long, v string, extra long"
    )
    old_batch = _df(
        spark,
        [(1, 9, "stale", "false"), (2, 3, "new", "false")],
        "id long, lsn long, v string, __deleted string",
    )
    out = {
        r["id"]: (r["lsn"], r["v"], r["extra"])
        for r in merge_cdc_batch_evolving(state, old_batch, ["id"], lsn_col="lsn").collect()
    }
    # stale update rejected by the LSN guard; insert gets NULL extra
    assert out == {1: (10, "a", 5), 2: (3, "new", None)}


def test_delete_and_guard_semantics_survive_evolution(spark):
    state = _df(spark, [(1, 10, "a"), (2, 20, "b")], "id long, lsn long, v string")
    changes = _df(
        spark,
        [
            (1, 11, "x", 1, "true"),   # newer delete → removed
            (2, 19, "y", 2, "true"),   # stale delete → no-op
            (9, 1, "z", 3, "true"),    # delete of absent key → no-op
        ],
        "id long, lsn long, v string, extra long, __deleted string",
    )
    out = {
        r["id"]: r["v"]
        for r in merge_cdc_batch_evolving(state, changes, ["id"], lsn_col="lsn").collect()
    }
    assert out == {2: "b"}


def test_new_column_type_preserved(spark):
    state = _df(spark, [(1, 10, "a")], "id long, lsn long, v string")
    changes = _df(
        spark,
        [(1, 11, "a2", 1.5, "false")],
        "id long, lsn long, v string, score double, __deleted string",
    )
    merged = merge_cdc_batch_evolving(state, changes, ["id"], lsn_col="lsn")
    assert dict(merged.dtypes)["score"] == "double"
    assert merged.collect()[0]["score"] == 1.5
