"""Per-key lifetime aggregates via ``transformWithStateInPandas``.

Spark 4's successor to ``applyInPandasWithState`` (which q57 uses): typed
state primitives (ValueState / MapState / ListState) plus first-class
event-time timers, instead of one opaque state tuple + a single timeout.
This module implements a full-stream per-user aggregate that emits exactly
once per key — when an event-time timer registered at ``last_seen + 1h``
fires, i.e. once the watermark proves the key's stream is over.

ENV-GATED like the Delta MERGE path: ``transformWithStateInPandas`` runs a
protobuf-based state server between the JVM and a long-lived Python driver
worker, so it requires ``google.protobuf`` (absent in this sandbox — see
``requires_tws``) and the RocksDB state-store provider (bundled with Spark,
enabled per query). ``tests/test_lifetime_tws.py`` exercises the operator
end-to-end when the environment allows; semantics are the same as the
batch aggregate ``SELECT user_id, COUNT(*), COUNT(DISTINCT event_type),
SUM(FLOOR(value*1000)) FROM events GROUP BY user_id``.

Scale posture: state is one small ValueState row plus one MapState entry
per distinct event type per key, partitioned by the grouping key across the
cluster; timers are per-key and re-registered (delete + register) on every
batch the key appears in, so expired-timer work is O(keys finishing now),
not O(all keys).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, n_types BIGINT, v1000 BIGINT"
FLUSH_DELAY_MS = 3_600_000  # timer at last_seen + 1h — before the sentinel's
#                             +10h watermark jump, after any real gap


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    server; absent in this sandbox (no installs). Re-probed round 12
    (2026-08-16): ``import google.protobuf`` still fails, and ``pip
    download protobuf`` still dies at DNS resolution ("Name or service
    not known") — the package index is unreachable, not merely filtered. The
    round-9 full-disk sweep found only a renamed-namespace protobuf 4.23.2
    (``cloudsdk.google.protobuf`` inside the gcloud SDK) while pyspark's
    generated ``StateMessage_pb2`` hard-validates runtime >= 6.33.0
    (``ValidateProtobufRuntimeVersion(PUBLIC, 6, 33, 0)``), so even a
    PYTHONPATH shim of the on-disk copy cannot satisfy it.
    ``StatefulProcessor`` itself imports fine — the Python-side API is
    present, only the state-server wire dependency is missing, so the
    gate stands."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def make_lifetime_processor():
    """Build the StatefulProcessor (deferred import so the module stays
    importable without the streaming extras)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LifetimeStats(StatefulProcessor):
        """ValueState (count, fixed-point value sum, last event ms) +
        MapState (event_type → count) + one re-registered event-time
        timer; emits the key's final row on timer expiry."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.agg = handle.getValueState(
                "agg", "n BIGINT, v1000 BIGINT, max_ts_ms BIGINT"
            )
            self.types = handle.getMapState("types", "t STRING", "c BIGINT")
            self.handle = handle

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            v = 0
            mx = 0
            tcounts: dict[str, int] = {}
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                v += sum(int(math.floor(x * 1000)) for x in pdf["value"])
                mx = max(mx, int(pdf["ts"].astype("int64").max()) // 1_000_000)
                for t, c in pdf["event_type"].value_counts().items():
                    tcounts[t] = tcounts.get(t, 0) + int(c)
            if n == 0:
                return iter([])
            # mx is already epoch-MILLIseconds (pandas datetime64[ns]
            # .astype(int64) → ns, // 1e6 → ms); event-time timers compare
            # against the watermark in ms, so no further scaling.
            prev = self.agg.get() if self.agg.exists() else (0, 0, 0)
            new = (prev[0] + n, prev[1] + v, max(prev[2], mx))
            self.agg.update(new)
            for t, c in tcounts.items():
                old = (
                    self.types.getValue((t,))
                    if self.types.containsKey((t,))
                    else None
                )
                self.types.updateValue((t,), (old[0] + c,) if old else (c,))
            for tmr in self.handle.listTimers():
                self.handle.deleteTimer(tmr)
            self.handle.registerTimer(new[2] + FLUSH_DELAY_MS)
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self.agg.exists():
                return iter([])
            n, v, _ = self.agg.get()
            ntypes = sum(1 for _ in self.types.keys())
            self.agg.clear()
            self.types.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [ntypes],
                    "v1000": [v],
                }
            )

        def close(self) -> None:
            pass

    return LifetimeStats()


def lifetime_stats_stream(events: DataFrame) -> DataFrame:
    """Wire the processor onto a streaming events DataFrame (expects
    user_id/ts/event_type/value columns). Caller must enable the RocksDB
    provider (``ROCKSDB_PROVIDER``) on the session — transformWithState
    refuses the default HDFS-backed store."""
    return (
        events.select("user_id", "ts", "event_type", "value")
        .withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_lifetime_processor(), OUTPUT_SCHEMA, "append", "eventTime"
        )
    )


def lifetime_stats_batch_oracle(events: DataFrame) -> DataFrame:
    """The batch equivalent the streaming result must match."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("v1000"),
    )
