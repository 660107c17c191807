"""transformWithStateInPandas lifetime aggregate — runs only where
google.protobuf is importable (the API's state server requires it; this
sandbox has no installs). Mirrors tests/test_delta_path.py's gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.streaming.lifetime import (
    ROCKSDB_PROVIDER,
    lifetime_stats_batch_oracle,
    lifetime_stats_stream,
    tws_available,
)

pytestmark = pytest.mark.skipif(
    not tws_available(),
    reason="google.protobuf absent — transformWithState state server "
    "cannot start in this environment",
)

SF_DIR = "/root/testdata/sf0.001"


def test_lifetime_stats_matches_batch_aggregate(spark, tmp_path):
    from kafka2delta_spark.sources.tables import load_table
    from kafka2delta_spark.streaming.stateful import SENTINEL_USER, _open_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        out = lifetime_stats_stream(_open_stream(spark, SF_DIR))
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("tws_lifetime")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.user_id, r.n_events, r.n_types, r.v1000)
            for r in spark.table("tws_lifetime")
            .filter(F.col("user_id") != SENTINEL_USER)
            .collect()
        )
        exp = sorted(
            (r.user_id, r.n_events, r.n_types, r.v1000)
            for r in lifetime_stats_batch_oracle(
                load_table(spark, SF_DIR, "events")
            ).collect()
        )
        assert got == exp
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
