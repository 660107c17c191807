"""Temporal-disorder CDC tests (round-11 campaign).

The five degenerate fixtures cover values, keys, unicode, and row size;
this file covers TIME on the CDC leg: duplicate LSNs inside one batch
(Debezium emits them on snapshot boundaries — all snapshot READ events
may share one source LSN), out-of-order and re-delivered batches with
interleaved deletes, and clock-skewed Debezium timestamps. Reference
semantics preserved: the LSN guard (ref stream/stream.py:125) and the
documented delete-then-stale-reinsert gap (SURVEY §4 — deleting a row
drops its LSN watermark, so a STALE upsert replayed after the delete
re-inserts; both engines define it that way).
"""

from __future__ import annotations

import datetime as dt
import json
import random

import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.cdc.avro_codec import encode_avro_payload
from kafka2delta_spark.cdc.dedup import latest_per_key
from kafka2delta_spark.cdc.merge import merge_cdc_batch
from kafka2delta_spark.cdc.registry import InMemorySchemaRegistry
from kafka2delta_spark.cdc.wire import make_confluent_envelope
from kafka2delta_spark.config import TableConfig
from kafka2delta_spark.streaming.stream import (
    apply_cdc_micro_batch,
    make_state_store,
)

SCHEMA = "pk long, val string, __log_sequence_number long, __deleted string"


# ---------------------------------------------------------------------------
# duplicate LSNs within a batch: the winner must be a pure function of
# row CONTENT (tie_break_hash), never of input order or partition layout
# ---------------------------------------------------------------------------

DUP_ROWS = [
    (1, "snapshot_a", 100, "false"),
    (1, "snapshot_b", 100, "false"),  # same (pk, lsn), different payload
    (1, "snapshot_c", 100, "false"),
    (2, "only", 100, "false"),
    (3, "x_del", 100, "true"),
    (3, "x_up", 100, "false"),  # upsert vs delete at the SAME lsn
]


def _dedup(spark, rows, strategy, partitions):
    df = spark.createDataFrame(rows, SCHEMA).repartition(partitions)
    out = latest_per_key(
        df, ["pk"], "__log_sequence_number",
        strategy=strategy, tie_break_hash=True,
    )
    return sorted(tuple(r) for r in out.collect())


def test_duplicate_lsn_winner_deterministic_across_layouts(spark):
    base = _dedup(spark, DUP_ROWS, "max_by", 1)
    assert len(base) == 3  # one winner per pk
    for order in (list(reversed(DUP_ROWS)), random.Random(7).sample(DUP_ROWS, len(DUP_ROWS))):
        for parts in (1, 3, 8):
            for strategy in ("max_by", "window"):
                assert _dedup(spark, order, strategy, parts) == base, (
                    f"winner changed under strategy={strategy} "
                    f"partitions={parts}"
                )


def test_duplicate_lsn_replay_is_idempotent(spark):
    """Replaying a duplicate-LSN batch must re-pick the same winner: the
    merge's LSN guard is strict (>), so an equal-LSN re-delivery never
    overwrites — but only a deterministic FIRST pick makes state stable."""
    df = spark.createDataFrame(DUP_ROWS, SCHEMA)
    deduped = latest_per_key(
        df, ["pk"], "__log_sequence_number", tie_break_hash=True
    )
    once = merge_cdc_batch(None, deduped, ["pk"])
    twice = merge_cdc_batch(once, deduped, ["pk"])
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b


# ---------------------------------------------------------------------------
# out-of-order / re-delivered batches with interleaved deletes
# ---------------------------------------------------------------------------


def _model_apply(state: dict, batch_rows) -> None:
    latest = {}
    for pk, val, lsn, deleted in batch_rows:
        if pk not in latest or lsn > latest[pk][2]:
            latest[pk] = (pk, val, lsn, deleted)
    for pk, row in latest.items():
        if row[3] == "true":
            if pk in state and row[2] > state[pk][2]:
                state.pop(pk)
        elif pk not in state or row[2] > state[pk][2]:
            state[pk] = (pk, row[1], row[2], None)


def _spark_apply(spark, state_df, batch_rows):
    batch = spark.createDataFrame(batch_rows, SCHEMA)
    deduped = latest_per_key(
        batch, ["pk"], "__log_sequence_number", tie_break_hash=True
    )
    return merge_cdc_batch(state_df, deduped, ["pk"])


def _collect(state_df):
    return sorted(
        (r["pk"], r["val"], r["__log_sequence_number"])
        for r in state_df.collect()
    )


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_shuffled_redelivered_batches_match_model(spark, seed):
    """Batches applied in a random order, with random re-deliveries and
    interleaved deletes: engine state equals the dict-model oracle run
    over the SAME disordered schedule (LSN-guard semantics, including
    the documented stale-reinsert-after-delete behavior)."""
    rng = random.Random(seed)
    ops = []
    lsn = 0
    for _ in range(20):
        lsn += 1
        ops.append((rng.choice([1, 2, 3, 4]), f"v{lsn}", lsn,
                    "true" if rng.random() < 0.3 else "false"))
    batches = [ops[i:i + 4] for i in range(0, len(ops), 4)]
    schedule = batches[:]  # out-of-order
    rng.shuffle(schedule)
    schedule += rng.sample(batches, 2)  # two re-deliveries

    state_df = None
    model: dict = {}
    for b in schedule:
        state_df = _spark_apply(spark, state_df, b)
        _model_apply(model, b)
    expected = sorted((pk, v[1], v[2]) for pk, v in model.items())
    assert _collect(state_df) == expected


def test_stale_upsert_after_delete_reinserts_documented_gap(spark):
    """Pin the DOCUMENTED semantics (SURVEY §4): deleting a row drops its
    LSN watermark, so a stale upsert re-delivered after the delete
    re-inserts old state. Both the reference and this engine define the
    delete MERGE that way; the pin exists so any future change to it is
    a conscious contract change, not an accident."""
    state = _spark_apply(spark, None, [(1, "new", 5, "false")])
    state = _spark_apply(spark, state, [(1, "del", 6, "true")])
    assert _collect(state) == []
    state = _spark_apply(spark, state, [(1, "old", 2, "false")])
    assert _collect(state) == [(1, "old", 2)]


# ---------------------------------------------------------------------------
# clock-skewed Debezium timestamps through the full envelope pipeline:
# __timestamp far pre-1970 / post-2100 must decode, merge, and round-trip
# ---------------------------------------------------------------------------

TOPIC = "postgres.public.skewed"
SKEW_VALUE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "skewed",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
            {
                "name": "created_at",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {"name": "__deleted", "type": "string"},
            {"name": "__timestamp", "type": "long"},
            {"name": "__log_sequence_number", "type": "long"},
        ],
    }
)
SKEW_KEY_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "skewed_key",
        "fields": [{"name": "id", "type": "int"}],
    }
)
KAFKA_SCHEMA = (
    "topic string, partition int, offset long, timestamp timestamp, "
    "timestampType int, key binary, value binary"
)

# epoch micros: 1944 (negative), -0.5 s (negative fractional second),
# 2124 (far future)
TS_1944 = -820_454_400_000_000
TS_NEG_HALF_S = -500_000
TS_2124 = 4_860_000_000_000_000


def _skew_record(key_sid, val_sid, uid, lsn, created_us):
    rec = {
        "id": uid,
        "name": f"user{uid}",
        "created_at": created_us,
        "__deleted": "false",
        "__timestamp": created_us // 1000,  # skewed wall-clock too
        "__log_sequence_number": lsn,
    }
    key = make_confluent_envelope(
        key_sid, encode_avro_payload({"id": uid}, SKEW_KEY_SCHEMA)
    )
    val = make_confluent_envelope(
        val_sid, encode_avro_payload(rec, SKEW_VALUE_SCHEMA)
    )
    return (TOPIC, 0, lsn, dt.datetime(2024, 3, 15, 12), 0, key, val)


def test_clock_skewed_timestamps_round_trip(spark, tmp_path):
    registry = InMemorySchemaRegistry()
    key_sid = registry.register(SKEW_KEY_SCHEMA)
    val_sid = registry.register(SKEW_VALUE_SCHEMA)
    config = TableConfig(
        schema_name="cdc", table_name="skewed", path=str(tmp_path / "skewed")
    )
    store = make_state_store(spark, config, backend="parquet")
    store.table_name = None
    batch = spark.createDataFrame(
        [
            _skew_record(key_sid, val_sid, 1, 10, TS_1944),
            _skew_record(key_sid, val_sid, 2, 11, TS_NEG_HALF_S),
            _skew_record(key_sid, val_sid, 3, 12, TS_2124),
        ],
        KAFKA_SCHEMA,
    )
    apply_cdc_micro_batch(batch, registry, {TOPIC: config}, {TOPIC: store})
    got = {
        r["id"]: F.lit(None) if r["created_at"] is None else r["created_at"]
        for r in store.read().collect()
    }
    state = store.read().select(
        "id", F.unix_micros("created_at").alias("us")
    )
    us = {r["id"]: r["us"] for r in state.collect()}
    assert us == {1: TS_1944, 2: TS_NEG_HALF_S, 3: TS_2124}, got
