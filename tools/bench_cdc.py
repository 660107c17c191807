#!/usr/bin/env python
"""End-to-end CDC throughput benchmark.

Measures the engine's core workload — the reference's reason to exist
(ref stream/stream.py:39-156): Confluent-envelope Kafka records ->
wire-format parse -> Avro decode -> Debezium casts -> latest-per-key dedup
-> LSN-guarded merge into the state store — as ONE streaming query over a
file source standing in for Kafka (connector jar absent here; the source
is the only substitution).

Envelope generation runs DISTRIBUTED (mapInPandas encoding Avro payloads
per partition) and is excluded from the timed window; the clock covers
only the live streaming query draining all micro-batches. Prints one JSON
line:

    {"metric": "cdc_rows_per_sec", "value": N, ...}

Workload shape: ``--events`` change events over ``--keys`` primary keys
(so later batches are mostly updates hitting existing state), 2% deletes,
spread over ``--batches`` micro-batch files consumed one per trigger.

Cardinality shapes (round-12 campaign — the CDC core must hold its
throughput story under the distributions that break hash-agg/merge
plans, not just the uniform one):

  uniform  — the default above.
  skew     — ONE key receives ~50% of all events: maximum hot-key
             pressure through latest_per_key's hash aggregation and the
             merge join (the map-side combine is what keeps this from
             shuffling the hot key's every event).
  churn    — delete-majority (60% deletes) with delete-then-reinsert
             loops as each key cycles: state is built and torn down
             continuously, stressing both LSN-guarded merge branches.
  distinct — every event a NEW key: state size == change volume, no
             update locality at all (snapshot/backfill shape).

Env knobs: SPARK_GRAFT_CDC_EVENTS / _KEYS / _BATCHES / _SHAPE override
defaults. Output includes the ``cdc_metrics`` contract counters
(null_key_rows) so drop-behavior regressions are visible in artifacts.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

N_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "200000"))
N_KEYS = int(os.environ.get("SPARK_GRAFT_CDC_KEYS", "50000"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_CDC_BATCHES", "4"))
SHAPE = os.environ.get("SPARK_GRAFT_CDC_SHAPE", "uniform")
SHAPES = ("uniform", "skew", "churn", "distinct")
TOPIC = "postgres.public.users"


def _shape_row(i: int) -> tuple[int, str]:
    """(uid, deleted) for event i under the configured cardinality shape."""
    if SHAPE == "skew":
        uid = 0 if i % 2 == 0 else i % N_KEYS
        return uid, "true" if i % 50 == 49 else "false"
    if SHAPE == "churn":
        # keys cycle every N_KEYS events at ascending LSN; 60% deletes so
        # most keys live through repeated delete -> reinsert loops
        return i % N_KEYS, "true" if i % 10 < 6 else "false"
    if SHAPE == "distinct":
        return i, "true" if i % 50 == 49 else "false"
    return i % N_KEYS, "true" if i % 50 == 49 else "false"

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
            {
                "name": "__log_sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
        ],
    }
)
KEY_SCHEMA = json.dumps(
    {"type": "record", "name": "k", "fields": [{"name": "id", "type": "int"}]}
)

KAFKA_SCHEMA = (
    "topic string, partition int, offset long, timestamp timestamp, "
    "timestampType int, key binary, value binary"
)


def _encode_partition(
    ksid: int, vsid: int
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    """Arrow-batched envelope encoder: (i) -> full Kafka-shaped row."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kafka2delta_spark.cdc.avro_codec import encode_avro_payload
        from kafka2delta_spark.cdc.wire import make_confluent_envelope

        base_date = dt.date(2024, 3, 1)
        base_ts = dt.datetime(2024, 3, 1)
        for pdf in batches:
            rows = {k: [] for k in (
                "topic", "partition", "offset", "timestamp",
                "timestampType", "key", "value",
            )}
            for i in pdf["id"]:
                i = int(i)
                uid, deleted = _shape_row(i)
                rec = {
                    "id": uid,
                    "name": f"user_{uid}_v{i}",
                    "email": f"user{uid}@example.test",
                    "created_at": base_date,
                    "__deleted": deleted,
                    "__timestamp": 1_700_000_000_000 + i,
                    "__log_sequence_number": i,
                }
                rows["topic"].append(TOPIC)
                rows["partition"].append(0)
                rows["offset"].append(i)
                rows["timestamp"].append(base_ts)
                rows["timestampType"].append(0)
                rows["key"].append(
                    make_confluent_envelope(
                        ksid, encode_avro_payload({"id": uid}, KEY_SCHEMA)
                    )
                )
                rows["value"].append(
                    make_confluent_envelope(
                        vsid, encode_avro_payload(rec, USERS_SCHEMA)
                    )
                )
            yield pd.DataFrame(rows)

    return encode


def main() -> None:
    from kafka2delta_spark import (
        InMemorySchemaRegistry,
        ParquetStateStore,
        TableConfig,
        build_session,
        stream_to_delta,
    )

    spark = build_session("bench_cdc")
    reg = InMemorySchemaRegistry()
    ksid, vsid = reg.register(KEY_SCHEMA), reg.register(USERS_SCHEMA)

    tmp = tempfile.mkdtemp(prefix="bench_cdc_")
    src, ckpt, store_path = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/users"

    # distributed generation, excluded from the timed window; one file per
    # intended micro-batch (maxFilesPerTrigger=1 downstream)
    (
        spark.range(N_EVENTS)
        .toDF("id")
        .repartition(N_BATCHES)
        .mapInPandas(_encode_partition(ksid, vsid), schema=KAFKA_SCHEMA)
        .write.mode("overwrite")
        .parquet(src)
    )

    cfg = TableConfig("cdc", "users", store_path)
    source = (
        spark.readStream.schema(KAFKA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = stream_to_delta(
        spark,
        "bench_cdc_q",
        "unused:9092",
        [TOPIC],
        {TOPIC: cfg},
        ckpt,
        reg,
        source_df=source,
        # pin the backend: the final state is read below with a raw
        # ParquetStateStore, which would miscount (stale MERGE files, no
        # _delta_log awareness) if 'auto' picked DeltaStateStore on a
        # machine where delta-spark imports
        store_backend="parquet",
    )
    q.processAllAvailable()
    q.stop()
    sec = time.time() - t0

    state = ParquetStateStore(spark, store_path, []).read()
    n_state = state.count()
    shutil.rmtree(tmp, ignore_errors=True)
    # analytic oracle: last op per key wins (LSN == i is ascending), so
    # the final state is exactly the keys whose newest op is an upsert —
    # the bench doubles as a correctness check at every shape
    last: dict[int, str] = {}
    for i in range(N_EVENTS):
        uid, deleted = _shape_row(i)
        last[uid] = deleted
    expected_state = sum(1 for d in last.values() if d == "false")

    metrics = q.cdc_metrics
    print(
        json.dumps(
            {
                "metric": "cdc_rows_per_sec",
                "value": round(N_EVENTS / sec, 1),
                "unit": "rows/sec",
                "n_events": N_EVENTS,
                "n_keys": N_EVENTS if SHAPE == "distinct" else N_KEYS,
                "batches": N_BATCHES,
                "shape": SHAPE,
                "sec": round(sec, 2),
                "state_rows": n_state,
                "expected_state_rows": expected_state,
                "state_ok": n_state == expected_state,
                # contract counters — drop-behavior regressions belong in
                # artifacts, not just test assertions (round-11 verdict #6)
                "cdc_metrics": {
                    "null_key_rows": metrics.null_key_rows(),
                    "batches_recorded": len(metrics.batches),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
