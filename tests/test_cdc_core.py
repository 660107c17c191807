"""Unit tests for the CDC decode/dedup/merge core.

Modeled on the reference's test strategy (SURVEY §5): golden-payload style
decode tests with in-memory DataFrames — no Kafka/registry infrastructure.
"""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka2delta_spark.cdc.avro_codec import (
    avro_schema_to_spark,
    decode_avro,
    decode_avro_payload,
    encode_avro_payload,
)
from kafka2delta_spark.cdc.debezium import cast_debezium_columns
from kafka2delta_spark.cdc.dedup import latest_per_key
from kafka2delta_spark.cdc.merge import merge_cdc_batch, split_upserts_deletes
from kafka2delta_spark.cdc.wire import (
    avro_payload_col,
    make_confluent_envelope,
    parse_confluent_envelope,
    schema_id_col,
)

USERS_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "users",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
            {"name": "email", "type": "string"},
            {"name": "created_at", "type": {"type": "int", "logicalType": "date"}},
            {"name": "__deleted", "type": ["null", "string"], "default": None},
            {"name": "__timestamp", "type": ["null", "long"], "default": None},
            {"name": "__log_sequence_number", "type": ["null", "long"], "default": None},
        ],
    }
)

KEY_SCHEMA = json.dumps(
    {"type": "record", "name": "users_key", "fields": [{"name": "id", "type": "int"}]}
)


def user_record(uid, name, email, lsn, deleted="false"):
    return {
        "id": uid,
        "name": name,
        "email": email,
        "created_at": dt.date(2024, 3, 1),
        "__deleted": deleted,
        "__timestamp": 1700000000000 + lsn,
        "__log_sequence_number": lsn,
    }


# -- wire format -----------------------------------------------------------


def test_envelope_roundtrip(spark):
    payload = encode_avro_payload(user_record(1, "a", "a@x", 10), USERS_SCHEMA)
    env = make_confluent_envelope(1234, payload)
    df = spark.createDataFrame(
        [("t", 0, 0, dt.datetime(2024, 1, 1), 0, env, env)],
        "topic string, partition int, offset long, timestamp timestamp, "
        "timestampType int, key binary, value binary",
    )
    row = parse_confluent_envelope(df).collect()[0]
    assert row["key_schema_id"] == 1234
    assert row["value_schema_id"] == 1234
    assert bytes(row["value_avro"]) == payload


def test_envelope_null_safety(spark):
    df = spark.createDataFrame(
        [(None, None)], "key binary, value binary"
    ).select(schema_id_col("key").alias("sid"), avro_payload_col("value").alias("p"))
    row = df.collect()[0]
    assert row["sid"] is None
    assert bytes(row["p"]) == b""  # ref udf/udf.py:14-23 returns b"" for null


def test_schema_id_big_endian(spark):
    env = b"\x00" + (0x01020304).to_bytes(4, "big") + b"xyz"
    df = spark.createDataFrame([(env,)], "value binary")
    row = df.select(schema_id_col("value").alias("sid")).collect()[0]
    assert row["sid"] == 0x01020304


def test_sql_registered_parse_functions(spark):
    """Envelope parsers callable from SQL under the reference's names
    (ref stream/test/stream_test.py:129-131)."""
    from kafka2delta_spark.cdc.wire import register_sql_functions

    register_sql_functions(spark)
    env = b"\x00" + (4242).to_bytes(4, "big") + b"payload"
    spark.createDataFrame(
        [(env,), (None,)], "value binary"
    ).createOrReplaceTempView("wire_rows")
    rows = spark.sql(
        "SELECT get_schema_version(value) AS sid, "
        "get_confluent_avro_schema(value) AS p FROM wire_rows"
    ).collect()
    got = {(r["sid"], bytes(r["p"]) if r["p"] is not None else None) for r in rows}
    assert got == {(4242, b"payload"), (None, b"")}


# -- avro codec ------------------------------------------------------------


def test_avro_python_roundtrip():
    rec = user_record(7, "bob", "b@x", 42)
    payload = encode_avro_payload(rec, USERS_SCHEMA)
    out = decode_avro_payload(payload, USERS_SCHEMA)
    assert out["id"] == 7
    assert out["email"] == "b@x"
    assert out["created_at"] == dt.date(2024, 3, 1)
    assert out["__log_sequence_number"] == 42


def test_avro_schema_to_spark_types():
    st = avro_schema_to_spark(USERS_SCHEMA)
    fields = {f.name: f for f in st.fields}
    assert isinstance(fields["id"].dataType, T.IntegerType)
    assert isinstance(fields["created_at"].dataType, T.DateType)
    assert fields["__deleted"].nullable
    assert not fields["id"].nullable


def test_decode_avro_dataframe(spark):
    rows = [
        (encode_avro_payload(user_record(i, f"u{i}", f"u{i}@test.io", i * 10), USERS_SCHEMA),)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "value_avro binary")
    out = decode_avro(df, "value_avro", USERS_SCHEMA)
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 5
    assert got[3]["email"] == "u3@test.io"
    assert got[3]["created_at"] == dt.date(2024, 3, 1)


# -- debezium casts --------------------------------------------------------

ZONED_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "assetlog",
        "fields": [
            {"name": "id", "type": "int"},
            {
                "name": "created_at",
                "type": {
                    "type": "string",
                    "connect.name": "io.debezium.time.ZonedTimestamp",
                },
            },
            {
                "name": "updated_at",
                "type": [
                    "null",
                    {
                        "type": "string",
                        "connect.name": "io.debezium.time.ZonedTimestamp",
                    },
                ],
            },
            {"name": "town", "type": "string"},
        ],
    }
)


def test_cast_debezium_columns_types(spark):
    df = spark.createDataFrame(
        [(1, "2024-03-01T10:00:00Z", "2024-03-02T11:30:00Z", "Springfield")],
        "id int, created_at string, updated_at string, town string",
    )
    out = df.select(*cast_debezium_columns(ZONED_SCHEMA))
    fields = {f.name: f.dataType for f in out.schema.fields}
    assert isinstance(fields["created_at"], T.TimestampType)
    assert isinstance(fields["updated_at"], T.TimestampType)  # union-wrapped
    assert isinstance(fields["town"], T.StringType)  # untouched
    row = out.collect()[0]
    assert row["created_at"] == dt.datetime(2024, 3, 1, 10, 0)


def test_cast_debezium_no_special_types():
    cols = cast_debezium_columns(USERS_SCHEMA)
    assert len(cols) == 7  # one per field, all plain


# -- dedup -----------------------------------------------------------------


@pytest.mark.parametrize("strategy", ["max_by", "window"])
def test_latest_per_key(spark, strategy):
    df = spark.createDataFrame(
        [
            (1, "old", 10),
            (1, "new", 30),
            (1, "mid", 20),
            (2, "only", 5),
        ],
        "id int, name string, __log_sequence_number long",
    )
    out = latest_per_key(df, ["id"], "__log_sequence_number", strategy=strategy)
    got = {r["id"]: r["name"] for r in out.collect()}
    assert got == {1: "new", 2: "only"}
    assert out.columns == df.columns


def test_latest_per_key_composite(spark):
    df = spark.createDataFrame(
        [(1, "a", "x", 1), (1, "a", "y", 2), (1, "b", "z", 1)],
        "k1 int, k2 string, v string, lsn long",
    )
    out = latest_per_key(df, ["k1", "k2"], "lsn")
    got = {(r["k1"], r["k2"]): r["v"] for r in out.collect()}
    assert got == {(1, "a"): "y", (1, "b"): "z"}


# -- merge -----------------------------------------------------------------


def _state(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, __log_sequence_number long")


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id int, name string, __log_sequence_number long, __deleted string"
    )


def test_merge_insert_update_delete(spark):
    state = _state(spark, [(1, "keep", 100), (2, "upd", 100), (3, "del", 100)])
    changes = _changes(
        spark,
        [
            (2, "updated", 200, "false"),  # newer → update
            (3, "gone", 150, "true"),  # delete (newer lsn → applies)
            (4, "new", 50, "false"),  # insert
        ],
    )
    out = merge_cdc_batch(state, changes, ["id"])
    got = {r["id"]: (r["name"], r["__log_sequence_number"]) for r in out.collect()}
    assert got == {1: ("keep", 100), 2: ("updated", 200), 4: ("new", 50)}
    assert "__deleted" not in out.columns


def test_merge_lsn_guard_rejects_stale(spark):
    state = _state(spark, [(1, "current", 500)])
    changes = _changes(spark, [(1, "stale", 400, "false")])
    out = merge_cdc_batch(state, changes, ["id"])
    assert out.collect()[0]["name"] == "current"  # ref stream/stream.py:125


def test_merge_lsn_guard_rejects_stale_delete(spark):
    """A replayed delete older than current state is a no-op (the guard
    covers deletes, closing the reference's late-replayed-delete gap)."""
    state = _state(spark, [(1, "current", 500)])
    changes = _changes(spark, [(1, "old-del", 400, "true")])
    out = merge_cdc_batch(state, changes, ["id"])
    assert [(r["id"], r["name"]) for r in out.collect()] == [(1, "current")]


def test_merge_null_deleted_flag_is_upsert(spark):
    """NULL __deleted (no SMT rewrite) counts as an upsert on the
    engine-neutral path — same semantics as the Delta path's COALESCE."""
    state = _state(spark, [(1, "old", 100)])
    changes = _changes(spark, [(1, "newer", 200, None), (2, "fresh", 50, None)])
    out = merge_cdc_batch(state, changes, ["id"])
    got = {r["id"]: r["name"] for r in out.collect()}
    assert got == {1: "newer", 2: "fresh"}


def test_merge_bootstrap_no_state(spark):
    changes = _changes(spark, [(1, "a", 1, "false"), (2, "b", 2, "true")])
    out = merge_cdc_batch(None, changes, ["id"])
    got = [r["id"] for r in out.collect()]
    assert got == [1]


def test_split_upserts_deletes(spark):
    df = _changes(spark, [(1, "a", 1, "false"), (2, "b", 2, "true"), (3, "c", 3, None)])
    up, de = split_upserts_deletes(df)
    assert sorted(r["id"] for r in up.collect()) == [1, 3]
    assert [r["id"] for r in de.collect()] == [2]


# -- corrupt payloads (the reference's FAILFAST contract) ------------------


def test_decode_avro_corrupt_payload_failfast_raises(spark):
    """FAILFAST (the reference's default, ref stream/stream.py:36-37): a
    corrupt Avro payload must kill the job loudly, not produce nulls —
    silent null state rows would be merged into the table."""
    good = encode_avro_payload(user_record(1, "a", "a@x", 10), USERS_SCHEMA)
    df = spark.createDataFrame(
        [(good,), (bytearray(b"\xff\xfe garbage not avro"),)], "value_avro binary"
    )
    out = decode_avro(df, "value_avro", USERS_SCHEMA)
    with pytest.raises(Exception):
        out.collect()


def test_decode_avro_corrupt_payload_permissive_nulls(spark):
    """PERMISSIVE mode: corrupt rows decode to all-null columns, good
    rows still decode — the quarantine-and-continue alternative."""
    good = encode_avro_payload(user_record(1, "a", "a@x", 10), USERS_SCHEMA)
    df = spark.createDataFrame(
        [(good,), (bytearray(b"\xff\xfe garbage not avro"),)], "value_avro binary"
    )
    out = decode_avro(df, "value_avro", USERS_SCHEMA, mode="PERMISSIVE").collect()
    by_id = {r["id"]: r for r in out}
    assert len(out) == 2
    assert by_id[1]["email"] == "a@x"
    assert by_id[None]["name"] is None  # corrupt row -> typed nulls
