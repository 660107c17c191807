"""Listener-synchronized streaming pipeline test + catalog registration.

Drives the real ``stream_to_delta`` shell with a file-source stand-in and
synchronizes on ``StreamProgressListener`` row barriers — the reference's
test-harness pattern (ref stream/test/stream_listener.py:10-80, polling)
re-expressed with condition-variable waits; no ``processAllAvailable``.

Also proves the S4 metastore parity: the state store registers
``schema.table`` in the session catalog and repoints it at every commit,
so state is queryable by name (ref utils/utils.py:37-58).
"""

import datetime as dt

import pytest

from kafka2delta_spark.cdc.registry import InMemorySchemaRegistry
from kafka2delta_spark.config import TableConfig
from kafka2delta_spark.streaming.listener import StreamProgressListener
from kafka2delta_spark.streaming.stream import stream_to_delta
from tests.test_cdc_pipeline import (
    KAFKA_SCHEMA,
    KEY_SCHEMA,
    TOPIC,
    USERS_V1,
    mk_record,
)


@pytest.fixture
def listener(spark):
    lst = StreamProgressListener()
    spark.streams.addListener(lst)
    yield lst
    spark.streams.removeListener(lst)


def test_stream_with_listener_sync_and_catalog(spark, tmp_path, listener):
    registry = InMemorySchemaRegistry()
    key_sid = registry.register(KEY_SCHEMA)
    v1 = registry.register(USERS_V1)
    config = TableConfig(
        schema_name="cdc_listener",
        table_name="users",
        path=str(tmp_path / "users"),
        additional_cols=["YEAR(created_at) AS year", "MONTH(created_at) AS month"],
        partition_cols=["year", "month"],
    )
    src_dir = str(tmp_path / "src")
    batch1 = [
        mk_record(USERS_V1, key_sid, v1, 1, 10, name="alice"),
        mk_record(USERS_V1, key_sid, v1, 2, 15, name="bob"),
    ]
    spark.createDataFrame(batch1, KAFKA_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)

    source = spark.readStream.schema(KAFKA_SCHEMA).parquet(src_dir)
    listener.mark()
    q = stream_to_delta(
        spark,
        "listener_test_q",
        "unused:9092",
        [TOPIC],
        {TOPIC: config},
        str(tmp_path / "ckpt"),
        registry,
        source_df=source,
    )
    try:
        assert listener.wait_for_rows(len(batch1), timeout=120), (
            listener.progress_summary()
        )
        # queryable BY NAME: the store registered cdc_listener.users
        assert spark.catalog.tableExists("cdc_listener.users")
        got = {
            r["id"]: r["name"]
            for r in spark.table("cdc_listener.users").collect()
        }
        assert got == {1: "alice", 2: "bob"}

        # batch 2 arrives; the barrier syncs on its rows, the catalog entry
        # repoints to the new snapshot
        listener.mark()
        batch2 = [mk_record(USERS_V1, key_sid, v1, 2, 30, name="bob_updated")]
        spark.createDataFrame(batch2, KAFKA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        assert listener.wait_for_rows(len(batch2), timeout=120), (
            listener.progress_summary()
        )
        got = {
            r["id"]: r["name"]
            for r in spark.table("cdc_listener.users").collect()
        }
        assert got == {1: "alice", 2: "bob_updated"}
    finally:
        q.stop()
    summary = listener.progress_summary()
    assert summary["total_rows"] >= 3 and summary["error"] is None
