"""Confluent wire-format parsing as native Spark expressions.

The Confluent envelope is: magic byte ``0x00`` (1 B) + big-endian schema ID
(4 B) + Avro binary payload (ref README.md:15-18). The reference parses it
with two row-at-a-time Python UDFs (ref udf/udf.py:3-23) — per-record
serialization into forked Python workers on every Kafka record. Here the same
semantics are pure Catalyst expressions: JVM-side, whole-stage-codegen'd,
zero Python workers on the hot path. At 100 TB this is the difference between
the scan being I/O-bound and being Python-pickle-bound.

Spark's ``substring`` is 1-indexed and works on BinaryType directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Kafka source metadata columns we carry through (ref stream/stream.py:209-214).
KAFKA_META_COLS = ["topic", "partition", "offset", "timestamp", "timestampType"]


def schema_id_col(col: str | Column) -> Column:
    """Big-endian int32 schema ID from envelope bytes [1:5].

    Semantics match ref udf/udf.py:3-12 (None-safe: null in → null out).
    ``substring(col, 2, 4)`` = python ``col[1:5]``; decode via hex → base-10.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(None).cast("int"))
        .otherwise(F.conv(F.hex(F.substring(c, 2, 4)), 16, 10).cast("int"))
        .alias("schema_id")
    )


def avro_payload_col(col: str | Column) -> Column:
    """Avro payload bytes [5:] of the envelope.

    Semantics match ref udf/udf.py:14-23: empty bytes when input is
    null/empty, payload slice otherwise.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull() | (F.length(c) <= F.lit(5)), F.lit(b""))
        .otherwise(F.substring(c, 6, 2147483647))
        .alias("avro_payload")
    )


def parse_confluent_envelope(
    df: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Project Kafka records to metadata + schema IDs + Avro payload.

    Equivalent of the reference's envelope projection
    (ref stream/stream.py:209-218) with native expressions instead of UDFs:

    Output columns: ``topic partition offset timestamp timestampType
    key_schema_id value_schema_id value_avro`` — identical shape to the
    reference so downstream per-schema grouping is unchanged.
    """
    meta = [c for c in KAFKA_META_COLS if c in df.columns]
    return df.select(
        *meta,
        schema_id_col(key_col).alias("key_schema_id"),
        schema_id_col(value_col).alias("value_schema_id"),
        avro_payload_col(value_col).alias("value_avro"),
    )


def make_confluent_envelope(schema_id: int, payload: bytes) -> bytes:
    """Encode the wire format (test helper — driver-side only)."""
    return b"\x00" + int(schema_id).to_bytes(4, "big") + payload


def register_sql_functions(spark) -> None:
    """Make the envelope parsers SQL-callable under the reference's names.

    The reference registers its Python UDFs for SQL use as
    ``get_schema_version`` (schema id) and ``get_confluent_avro_schema``
    (payload slice) — ref stream/test/stream_test.py:129-131. Here they are
    SQL scalar functions (``CREATE FUNCTION ... RETURN <expr>``), so SQL
    callers get the same whole-stage-codegen'd expressions as the Column
    API — no Python worker round-trip, unlike ``spark.udf.register`` of a
    row-at-a-time UDF.
    """
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION get_schema_version(x BINARY)
        RETURNS INT
        RETURN CASE WHEN x IS NULL THEN CAST(NULL AS INT)
                    ELSE CAST(CONV(HEX(SUBSTRING(x, 2, 4)), 16, 10) AS INT) END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION get_confluent_avro_schema(x BINARY)
        RETURNS BINARY
        RETURN CASE WHEN x IS NULL OR LENGTH(x) <= 5 THEN CAST('' AS BINARY)
                    ELSE SUBSTRING(x, 6, 2147483647) END
        """
    )
