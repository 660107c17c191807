#!/usr/bin/env python
"""CDC merge cost vs STATE size (VERDICT r06 item 6).

BENCH_CDC.json grows state and batch together, so its 3-point fit cannot
separate per-event cost from state-scan cost. The 100 TB-relevant axis is
the other one: a FIXED batch merged into a growing existing state — the
reference prunes that read by partition (ref stream/stream.py:116-117),
and the parquet store's partition-selective merge is the analogue, so
per-batch cost should track TOUCHED partitions, not total state.

Workload: a fixed {N_EVENTS}-event batch over {N_KEYS} keys whose
created_at months all fall in {{1,2,3}} (immutable key->month, so a key
lives in exactly one partition), merged into a month-partitioned state
pre-seeded with mult x {N_EVENTS} extra rows spread over all 12 months
(mult in 0/4/16). Seeding is excluded from the timed window; the clock
covers one streaming drain of the single batch file.

Reported per point: wall seconds, merge rows/sec, and the PARTITION-
PRUNED READ FRACTION — state rows living in the batch's touched months
over total state rows (the fraction the selective merge actually reads;
~3/12 of the extras by construction). If merge cost is flat-ish across
0x/4x/16x while read fraction stays ~0.25, pruning works; cost growing
linearly with total state would mean the merge reads everything.

A 4th point stresses KEY SKEW: the same event count with one hot PK
taking 50% of the batch, merged into the 16x state. Because the
latest-per-key dedup is a max_by hash aggregation, the hot key collapses
map-side before the shuffle; the reported per-stage straggler ratio
(max/median task duration inside the timed window) shows whether salting
would be needed — a ratio near the uniform point's means no.

Prints one JSON line and writes BENCH_CDC_STATE.json at the repo root.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd

N_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "200000"))
N_KEYS = int(os.environ.get("SPARK_GRAFT_CDC_KEYS", "50000"))
SEED_MULTS = (0, 4, 16)
BATCH_MONTHS = (1, 2, 3)
SKEW_HOT_UID = 0  # month 1 — inside BATCH_MONTHS; gets 50% of the skew batch
TOPIC = "postgres.public.users"
EXTRA_UID0 = 10_000_000  # seed-extra uid space, disjoint from batch keys
BATCH_LSN0 = 1_000_000   # batch LSNs sit above every seed LSN

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


def _batch_uid(i: int) -> int:
    """i-th batch event's key: cycles the batch key space, but only ids
    whose month lands in BATCH_MONTHS (uid % 12 in {0,1,2})."""
    k = i % N_KEYS
    return k - (k % 12) + (i % len(BATCH_MONTHS))


def _month(uid: int) -> int:
    return uid % 12 + 1


def _encode_partition(ksid: int, vsid: int, kind: str):
    """Arrow-batched envelope encoder. kind='bootstrap' emits one insert
    per batch key (lsn=i); kind='batch' emits the fixed measured batch
    (lsn above every seed, 2% deletes)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kafka2delta_spark.cdc.avro_codec import encode_avro_payload
        from kafka2delta_spark.cdc.wire import make_confluent_envelope

        base_ts = dt.datetime(2024, 3, 1)
        for pdf in batches:
            rows = {k: [] for k in (
                "topic", "partition", "offset", "timestamp",
                "timestampType", "key", "value",
            )}
            for i in pdf["id"]:
                i = int(i)
                if kind == "bootstrap":
                    uid, lsn, deleted = _batch_uid(i), i, "false"
                elif kind == "skew":
                    # the Debezium hotspot: one PK takes half the batch
                    # (every i % 50 == 49 delete is odd, so never the hot key)
                    uid = SKEW_HOT_UID if i % 2 == 0 else _batch_uid(i)
                    lsn = BATCH_LSN0 + i
                    deleted = "true" if (i % 50 == 49) else "false"
                else:
                    uid = _batch_uid(i)
                    lsn = BATCH_LSN0 + i
                    deleted = "true" if (i % 50 == 49) else "false"
                rec = {
                    "id": uid,
                    "name": f"user_{uid}_v{lsn}",
                    "email": f"user{uid}@example.test",
                    "created_at": dt.date(2024, _month(uid), 1),
                    "__deleted": deleted,
                    "__timestamp": 1_700_000_000_000 + lsn,
                    "__log_sequence_number": lsn,
                }
                rows["topic"].append(TOPIC)
                rows["partition"].append(0)
                rows["offset"].append(lsn)
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


def _task_straggler(spark, t0_ms: float, t1_ms: float) -> dict | None:
    """Worst max/median task-duration ratio over stages that ran inside
    [t0_ms, t1_ms] — the skew signal the UI's task table would show.

    Reads the live AppStatusStore through py4j (``taskList(stageId,
    attempt, max)``); stage ids are globally increasing ints, so a bounded
    numeric probe finds every stage without the UI. Returns None when the
    store API is unavailable (degrades to wall-clock-only reporting)."""
    import statistics

    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        # Bound the numeric probe by the LIVE next stage id from the
        # DAGScheduler instead of a fixed 4000 (round-9 ADVICE: the skew
        # point runs last in the session, and a fixed cap silently
        # returns None — unreadable from "no skew data" — once earlier
        # points have consumed 4000 stage ids). nextStageId is the
        # scheduler's own monotonically-increasing counter, so every
        # stage that ever existed has id < nextStageId.
        try:
            probe_hi = int(
                spark.sparkContext._jsc.sc().dagScheduler().nextStageId()
            )
        except Exception:
            probe_hi = 4000  # scheduler API moved: keep the old bound
        worst = None
        for sid in range(0, probe_hi):
            try:
                tl = store.taskList(sid, 0, 100000)
            except Exception:
                continue
            n = tl.size()
            if n < 4:
                continue
            durs, launched = [], []
            for j in range(n):
                t = tl.apply(j)
                d = t.duration()
                if hasattr(d, "isDefined"):
                    if not d.isDefined():
                        continue
                    d = d.get()
                durs.append(int(d))
                launched.append(t.launchTime().getTime())
            if not durs or not (t0_ms <= min(launched) and max(launched) <= t1_ms):
                continue
            med = statistics.median(durs) or 1
            ratio = max(durs) / med
            if worst is None or ratio > worst["straggler_ratio"]:
                worst = {
                    "stage_id": sid,
                    "n_tasks": len(durs),
                    "max_task_ms": max(durs),
                    "median_task_ms": med,
                    "straggler_ratio": round(ratio, 2),
                }
        return worst
    except Exception:
        return None


def _run_point(
    spark, reg, ksid, vsid, mult: int, batch_src: str, tag: str = ""
) -> dict:
    from pyspark.sql import functions as F

    from kafka2delta_spark import ParquetStateStore, TableConfig, stream_to_delta

    tmp = tempfile.mkdtemp(prefix=f"bench_cdc_state_{mult}x{tag}_")
    store_path = f"{tmp}/users"
    cfg = TableConfig(
        "cdc",
        "users",
        store_path,
        additional_cols=["MONTH(created_at) AS month"],
        partition_cols=["month"],
    )

    # phase A (untimed): bootstrap the batch key space through the real
    # pipeline so the state schema/partitioning is exactly what the
    # measured merge will meet
    boot_src = f"{tmp}/boot"
    (
        spark.range(N_KEYS)
        .toDF("id")
        .repartition(4)
        .mapInPandas(_encode_partition(ksid, vsid, "bootstrap"), KAFKA_SCHEMA)
        .write.mode("overwrite")
        .parquet(boot_src)
    )
    q = stream_to_delta(
        spark, f"boot_{mult}x{tag}", "unused:9092", [TOPIC], {TOPIC: cfg},
        f"{tmp}/ckpt_boot",
        reg, source_df=spark.readStream.schema(KAFKA_SCHEMA).parquet(boot_src),
        store_backend="parquet",
    )
    q.processAllAvailable()
    q.stop()

    store = ParquetStateStore(spark, store_path, ["month"])
    state = store.read()

    # phase B (untimed): pre-seed mult*N_EVENTS extra rows over ALL 12
    # months, schema-identical, LSN 0 (below every batch LSN)
    n_extra = mult * N_EVENTS
    if n_extra:
        cols = state.columns
        extras = (
            spark.range(n_extra)
            .select((F.col("id") + EXTRA_UID0).alias("uid"))
            .select(
                F.col("uid").cast("int").alias("id"),
                F.concat(F.lit("seed_"), F.col("uid")).alias("name"),
                F.concat(F.lit("seed"), F.col("uid"), F.lit("@example.test"))
                .alias("email"),
                F.make_date(
                    F.lit(2024), (F.col("uid") % 12 + 1).cast("int"), F.lit(1)
                ).alias("created_at"),
                F.lit(1_700_000_000_000).alias("__timestamp"),
                F.lit(0).cast("long").alias("__log_sequence_number"),
                (F.col("uid") % 12 + 1).cast("int").alias("month"),
            )
            .select(*cols)
        )
        store.overwrite(state.unionByName(extras))
        state = store.read()
    state_rows = state.count()
    touched_rows = state.filter(
        F.col("month").isin(*BATCH_MONTHS)
    ).count()

    # phase C (TIMED): one fixed batch file through the live pipeline
    t0 = time.time()
    t0_ms = t0 * 1000
    q = stream_to_delta(
        spark, f"merge_{mult}x{tag}", "unused:9092", [TOPIC], {TOPIC: cfg},
        f"{tmp}/ckpt_batch",
        reg,
        source_df=spark.readStream.schema(KAFKA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_src),
        store_backend="parquet",
    )
    q.processAllAvailable()
    q.stop()
    sec = time.time() - t0
    straggler = _task_straggler(spark, t0_ms, time.time() * 1000)

    final_rows = store.read().count()
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "seed_mult": mult,
        "state_rows": state_rows,
        "touched_rows": touched_rows,
        "read_fraction": round(touched_rows / max(1, state_rows), 4),
        "batch_events": N_EVENTS,
        "sec": round(sec, 2),
        "merge_rows_per_sec": round(N_EVENTS / sec, 1),
        "final_state_rows": final_rows,
        "skewed": tag == "_skew",
        "straggler": straggler,
    }


def main() -> None:
    from kafka2delta_spark import InMemorySchemaRegistry, build_session

    spark = build_session("bench_cdc_state")
    reg = InMemorySchemaRegistry()
    ksid, vsid = reg.register(KEY_SCHEMA), reg.register(USERS_SCHEMA)

    # the ONE fixed batch, generated once and reused for every point
    batch_tmp = tempfile.mkdtemp(prefix="bench_cdc_state_batch_")
    batch_src = f"{batch_tmp}/batch"
    (
        spark.range(N_EVENTS)
        .toDF("id")
        .repartition(1)
        .mapInPandas(_encode_partition(ksid, vsid, "batch"), KAFKA_SCHEMA)
        .write.mode("overwrite")
        .parquet(batch_src)
    )

    points = [
        _run_point(spark, reg, ksid, vsid, m, batch_src) for m in SEED_MULTS
    ]

    # 4th point (VERDICT r07 item 6): key skew — same event count, but one
    # hot PK takes 50% of the batch (the realistic Debezium hotspot),
    # merged into the deepest (16x) state. The latest-per-key dedup is a
    # max_by hash-agg, so the hot key collapses in the map-side partial
    # aggregate BEFORE the shuffle — the straggler ratio is the proof.
    skew_src = f"{batch_tmp}/batch_skew"
    (
        spark.range(N_EVENTS)
        .toDF("id")
        .repartition(1)
        .mapInPandas(_encode_partition(ksid, vsid, "skew"), KAFKA_SCHEMA)
        .write.mode("overwrite")
        .parquet(skew_src)
    )
    points.append(
        _run_point(spark, reg, ksid, vsid, 16, skew_src, tag="_skew")
    )
    shutil.rmtree(batch_tmp, ignore_errors=True)
    out = {
        "metric": "cdc_merge_vs_state",
        "unit": "sec per fixed batch",
        "points": points,
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_CDC_STATE.json"), "w") as fh:
        fh.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
