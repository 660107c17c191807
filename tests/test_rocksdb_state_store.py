"""The RocksDB state-store provider leg, exercised for real.

``session.py`` exposes SPARK_GRAFT_STATE_STORE=rocksdb (the provider that
spills per-key streaming state to local disk instead of holding it
in-heap — the knob that matters when per-partition state approaches
executor memory at 100 TB) and documents a measured HDFS-vs-RocksDB
comparison, but no test pinned that the bundled provider actually works
in this Spark build. This one runs a stateful streaming aggregation with
the provider set for the query, asserts the results equal the batch
answer, and proves RocksDB engaged by inspecting the checkpoint's state
directory (the RocksDB provider writes zip/changelog artifacts, not the
HDFS provider's .delta files).
"""

from __future__ import annotations

import os
import tempfile

from tests.conftest import SF_DIR

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def test_streaming_agg_on_rocksdb_provider(spark):
    from pyspark.sql import functions as F

    from kafka2delta_spark.sources.tables import load_table

    ev_batch = load_table(spark, SF_DIR, "events")
    expected = {
        r["event_type"]: r["n"]
        for r in ev_batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    src = tempfile.mkdtemp(prefix="rocksdb_src_")
    os.symlink(f"{SF_DIR}/events.parquet", f"{src}/events.parquet")
    ckpt = tempfile.mkdtemp(prefix="rocksdb_ckpt_")

    prev = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        agg = (
            spark.readStream.schema(ev_batch.schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("rocksdb_counts")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, prev)

    got = {
        r["event_type"]: r["n"]
        for r in spark.table("rocksdb_counts").collect()
    }
    assert got == expected

    # prove the RocksDB provider actually held the state: its checkpoint
    # artifacts are .zip snapshots / .changelog files (plus SST data
    # inside), never the HDFS provider's .delta files
    state_files = []
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        state_files += files
    assert state_files, "no state files written"
    assert not any(f.endswith(".delta") for f in state_files), (
        f"HDFS-provider artifacts found — RocksDB did not engage: "
        f"{sorted(state_files)[:8]}"
    )
    assert any(
        f.endswith(".zip") or f.endswith(".changelog") for f in state_files
    ), f"no RocksDB artifacts: {sorted(state_files)[:8]}"
