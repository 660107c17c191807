"""Degenerate-input robustness for the multimodal pandas kernels.

At 100 TB a media corpus WILL contain NULL payloads (failed fetches,
tombstoned rows) and mapInPandas tasks WILL see empty Arrow batches
(empty partitions after a selective filter). Neither may crash the task:
NULL payloads follow SQL semantics (row kept, NULL features) in the
feature extractor and the zero-windows contract in the PCM decoder, and
empty partitions pass through untouched.
"""

import pandas as pd
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("payload", T.BinaryType(), nullable=True),
    ]
)


def _payload_df(spark, rows):
    return spark.createDataFrame(rows, schema=PAYLOAD_SCHEMA)


def test_media_features_null_payload_yields_null_features(spark):
    from kafka2delta_spark.functions.multimodal import extract_media_features

    df = _payload_df(
        spark,
        [
            Row(doc_id=1, payload=b"a" * 700),
            Row(doc_id=2, payload=None),
            Row(doc_id=3, payload=bytes(range(16)) + b"xyz"),
        ],
    )
    got = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    assert set(got) == {1, 2, 3}  # NULL payload keeps its row
    r1 = got[1]
    assert (r1["n_bytes"], r1["fake_width"], r1["fake_height"]) == (700, 60, 220)
    assert r1["header_sum"] == 16 * ord("a")
    r2 = got[2]
    assert r2["n_bytes"] is None
    assert r2["fake_width"] is None
    assert r2["fake_height"] is None
    assert r2["header_sum"] is None
    assert got[3]["header_sum"] == sum(range(16))


def test_media_features_all_null_and_empty_partitions(spark):
    from kafka2delta_spark.functions.multimodal import extract_media_features

    # all-NULL payload column AND 16 partitions over 3 rows, so most
    # Arrow batches the kernel sees are empty
    df = _payload_df(
        spark, [Row(doc_id=i, payload=None) for i in (1, 2, 3)]
    ).repartition(16)
    rows = extract_media_features(df).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
    assert all(r["n_bytes"] is None and r["header_sum"] is None for r in rows)


def test_media_features_empty_input(spark):
    from kafka2delta_spark.functions.multimodal import extract_media_features

    out = extract_media_features(_payload_df(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bytes",
        "fake_width",
        "fake_height",
        "header_sum",
    ]


def test_pcm_energy_null_payload_contributes_zero_windows(spark):
    from kafka2delta_spark.functions.multimodal import (
        PCM_WINDOW,
        AUDIO_SCHEMA,
        pcm_window_energy,
    )

    # doc 1: exactly two windows of alternating +/-256; doc 2: NULL;
    # doc 3: shorter than one window (dropped by the trailing-samples rule)
    sample = (256).to_bytes(2, "little", signed=True) + (-256).to_bytes(
        2, "little", signed=True
    )
    df = _payload_df(
        spark,
        [
            Row(doc_id=1, payload=sample * PCM_WINDOW),  # 2*PCM_WINDOW samples
            Row(doc_id=2, payload=None),
            Row(doc_id=3, payload=sample),  # 2 samples < 1 window
        ],
    ).repartition(8)
    rows = (
        df.mapInPandas(pcm_window_energy, schema=AUDIO_SCHEMA)
        .orderBy("doc_id", "window_id")
        .collect()
    )
    assert [(r["doc_id"], r["window_id"]) for r in rows] == [(1, 0), (1, 1)]
    assert all(r["peak"] == 256 for r in rows)
    assert all(r["sum_sq"] == 256 * 256 * PCM_WINDOW for r in rows)


def test_media_features_empty_payload_is_zero_not_null(spark):
    """Empty-payload contract (2026-08-16 ADVICE): a PRESENT but zero-byte
    payload is a measurement — n_bytes 0, header_sum 0 — never NULL (NULL
    stays reserved for absent payloads). Pinned on BOTH engines: the
    kernel's sum(b''[:16]) = 0, and the oracle's COALESCE(list_sum(...), 0)
    over DuckDB's list_sum([]) IS NULL."""
    import duckdb

    from kafka2delta_spark.functions.multimodal import extract_media_features

    df = _payload_df(
        spark,
        [
            Row(doc_id=1, payload=b""),
            Row(doc_id=2, payload=None),
            Row(doc_id=3, payload=b"abc"),
        ],
    )
    got = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["n_bytes"] == 0
    assert got[1]["header_sum"] == 0  # zero, not NULL
    assert got[2]["header_sum"] is None  # absent payload stays NULL
    assert got[3]["header_sum"] == ord("a") + ord("b") + ord("c")

    # oracle side, same three docs (text '' / NULL / 'abc')
    from kafka2delta_spark.queryset import ORACLES, load_all_querysets

    load_all_querysets()
    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS
        SELECT * FROM (VALUES (1, ''), (2, NULL), (3, 'abc'))
        AS t(doc_id, text)""")
    odf = con.execute(ORACLES["q95_multimodal_features"]).fetchdf()
    con.close()
    orc = {int(r["doc_id"]): r for _, r in odf.iterrows()}
    assert orc[1]["n_bytes"] == 0 and orc[1]["header_sum"] == 0
    assert pd.isna(orc[2]["header_sum"])
    assert orc[3]["header_sum"] == got[3]["header_sum"]


def test_q95_oracle_arithmetic_unchanged_by_null_handling(spark, sf_dir):
    """The nullable-dtype change must be invisible on a null-free corpus:
    q95 over real testdata keeps exact non-null int results."""
    from kafka2delta_spark.functions.multimodal import q95_multimodal_features

    df = q95_multimodal_features(spark, sf_dir)
    assert df.schema["n_bytes"].dataType == T.IntegerType()
    assert df.schema["header_sum"].dataType == T.LongType()
    bad = df.filter(
        F.col("n_bytes").isNull()
        | (F.col("fake_width") != F.col("n_bytes") % 640)
        | (F.col("fake_height") != F.col("n_bytes") % 480)
    ).count()
    assert bad == 0
    assert df.count() > 0
