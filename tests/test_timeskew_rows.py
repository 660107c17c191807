"""Temporal-disorder fixture pins (round-11 campaign).

Builds the `timeskew` fixture (clock-skewed 1944/2124 events, an epoch
-0.5 s row, mass exact-ts ties, ±100-year order/lineitem dates, physical
row order shuffled by key hash) and pins (a) the fixture shape itself and
(b) Spark-vs-oracle parity for the query band the sweep caught diverging
— the four fixed classes: accumulation-order cent flips (q46),
negative-epoch truncate-vs-floor (q47, q34), int64 overflow where DuckDB
widens to HUGEINT (qx29), and the epoch-0 watermark floor
(q55/q56/q57/q58/qx08) — plus time-sensitive controls. The full
228-query artifact is CORRECTNESS_DEGEN_timeskew.json
(`python tools/check_correctness.py --fixture timeskew`).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from build_degenerate_fixtures import build_timeskew  # noqa: E402
from check_correctness import normalize, register_oracle_views  # noqa: E402

SRC = "/root/testdata/sf0.001"

TIME_AUDITED = [
    # fixed in round 11 (each a class representative)
    "q46_sql_api_revenue_rank",
    "q47_resample_ffill",
    "qx29_user_value_trend",
    "q55_stream_dedup_within_watermark",
    "q56_stream_stream_interval_join",
    "q57_stateful_sessionize",
    "q58_stream_stream_left_outer_join",
    "qx08_stream_full_outer_join",
    # probed-and-pinned trunc pairing
    "q34_event_gaps",
    # time-bucketing / windowing controls over the skewed range
    "q29_trailing_hour_frame",
    "q53_stream_tumbling_counts",
    "q49_incremental_user_rollup",
    "qx39_session_attribution",
    "qy10_streaming_interarrival",
    # date-shifted TPC-H controls
    "q01_pricing_summary",
    "q04_order_priority_exists",
]


@pytest.fixture(scope="module")
def skew_sf_dir(tmp_path_factory):
    return build_timeskew(SRC, str(tmp_path_factory.mktemp("timeskew")))


@pytest.fixture(scope="module")
def skew_oracle_con(skew_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, skew_sf_dir)
    yield con
    con.close()


def test_fixture_actually_is_timeskewed(spark, skew_sf_dir):
    from pyspark.sql import functions as F

    from kafka2delta_spark.sources.tables import normalize_event_ts

    # same NTZ->TZ normalization every query sees (session tz is UTC, so
    # the cast is value-preserving); unix_micros requires plain TIMESTAMP
    ev = normalize_event_ts(spark.read.parquet(f"{skew_sf_dir}/events.parquet"))
    stats = ev.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.count(F.when(F.col("ts") < F.lit("1970-01-01").cast("timestamp"), 1))
        .alias("pre1970"),
        F.count(
            F.when(F.col("ts") == F.lit("2024-01-15 12:00:00").cast("timestamp"), 1)
        ).alias("ties"),
        F.count(F.when(F.unix_micros("ts") == -500_000, 1)).alias("neg_half"),
    ).collect()[0]
    assert stats["lo"].year < 1950 and stats["hi"].year > 2100
    assert stats["pre1970"] > 50  # the 1944 band + the -0.5 s rows
    assert stats["ties"] > 30  # mass ties at one exact timestamp
    assert stats["neg_half"] > 0  # negative epoch with fractional second
    od = spark.read.parquet(f"{skew_sf_dir}/orders.parquet").agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).collect()[0]
    assert od["lo"].year < 1950 and od["hi"].year > 2090


@pytest.mark.parametrize("name", TIME_AUDITED)
def test_timeskew_oracle_parity(spark, skew_sf_dir, skew_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, skew_sf_dir).toPandas()
    odf = skew_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)
