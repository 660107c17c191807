"""Avro binary decode.

Preferred path: Spark's built-in ``from_avro`` (JVM, vectorized), exactly as
the reference uses it (ref stream/stream.py:85-87). That requires the
``spark-avro`` module jar on the classpath; this environment does not ship
it, so a fallback decodes Avro with a small pure-Python binary reader inside
an Arrow-batched ``mapInPandas`` — batched, not row-at-a-time, and clearly
the slow path. ``decode_avro`` picks automatically.

The pure-Python reader supports the subset of Avro that Debezium's
``ExtractNewRecordState`` output uses (ref FIXTURES.md §A): primitives,
``["null", T]`` unions, records, enums, arrays, maps, and the logical types
``date`` (int days) and ``timestamp-millis``/``timestamp-micros``. It is an
original implementation of the public Avro 1.11 spec
(avro.apache.org/docs/1.11.1/specification/) — binary encoding is zigzag
varints + length-prefixed bytes.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Pure-Python Avro binary reader (Avro 1.11 spec, subset)
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share this encoding)."""
    b = buf.read(1)
    if not b:
        raise EOFError("unexpected end of Avro data")
    byte = b[0]
    n = byte & 0x7F
    shift = 7
    while byte & 0x80:
        byte = buf.read(1)[0]
        n |= (byte & 0x7F) << shift
        shift += 7
    return (n >> 1) ^ -(n & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _decode_value(buf: io.BytesIO, schema: Any) -> Any:
    """Decode one value per the Avro binary spec."""
    if isinstance(schema, str):
        kind = schema
        logical = None
    elif isinstance(schema, dict):
        kind = schema["type"]
        logical = schema.get("logicalType")
    elif isinstance(schema, list):  # union: zigzag index then value
        idx = _read_long(buf)
        return _decode_value(buf, schema[idx])
    else:  # pragma: no cover
        raise ValueError(f"unsupported Avro schema node: {schema!r}")

    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1) != b"\x00"
    if kind in ("int", "long"):
        v = _read_long(buf)
        if logical == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
        if logical == "timestamp-millis":
            return _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
                milliseconds=v
            )
        if logical == "timestamp-micros":
            return _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
                microseconds=v
            )
        return v
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "bytes":
        raw = _read_bytes(buf)
        if logical == "decimal":
            from decimal import Decimal

            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-schema.get("scale", 0))
        return raw
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "enum":
        return schema["symbols"][_read_long(buf)]
    if kind == "fixed":
        return buf.read(schema["size"])
    if kind == "record":
        return {f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]}
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode_value(buf, schema["items"]))
        return out
    if kind == "map":
        out_m: dict[str, Any] = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out_m[k] = _decode_value(buf, schema["values"])
        return out_m
    raise ValueError(f"unsupported Avro type: {kind}")


def decode_avro_payload(payload: bytes, avro_json_schema: str) -> dict[str, Any]:
    """Decode one Avro binary record (no envelope) against its writer schema."""
    schema = json.loads(avro_json_schema)
    return _decode_value(io.BytesIO(payload), schema)


# ---------------------------------------------------------------------------
# Encoder (test/fixture helper — driver-side; mirrors the decoder subset)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _encode_value(out: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for idx, branch in enumerate(schema):
            b_kind = branch if isinstance(branch, str) else branch.get("type")
            if value is None and b_kind == "null":
                _write_long(out, idx)
                return
            if value is not None and b_kind != "null":
                _write_long(out, idx)
                _encode_value(out, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    kind = schema if isinstance(schema, str) else schema["type"]
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if kind == "null":
        return
    if kind == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif kind in ("int", "long"):
        if logical == "date" and isinstance(value, _dt.date):
            value = (value - _dt.date(1970, 1, 1)).days
        elif logical == "timestamp-millis" and isinstance(value, _dt.datetime):
            value = int(value.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
        _write_long(out, int(value))
    elif kind == "float":
        out.write(struct.pack("<f", value))
    elif kind == "double":
        out.write(struct.pack("<d", value))
    elif kind == "bytes":
        _write_long(out, len(value))
        out.write(value)
    elif kind == "string":
        raw = value.encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
    elif kind == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif kind == "record":
        for f in schema["fields"]:
            _encode_value(out, f["type"], value[f["name"]])
    elif kind == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode_value(out, schema["items"], item)
        _write_long(out, 0)
    elif kind == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                raw = k.encode("utf-8")
                _write_long(out, len(raw))
                out.write(raw)
                _encode_value(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type: {kind}")


def encode_avro_payload(record: dict[str, Any], avro_json_schema: str) -> bytes:
    """Encode one record to Avro binary (no envelope)."""
    out = io.BytesIO()
    _encode_value(out, json.loads(avro_json_schema), record)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Avro-JSON schema → Spark StructType
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_SPARK = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "enum": T.StringType(),
    "fixed": T.BinaryType(),
}


def _avro_type_to_spark(node: Any) -> tuple[T.DataType, bool]:
    """Return (spark_type, nullable)."""
    if isinstance(node, list):  # union
        non_null = [n for n in node if n != "null"]
        nullable = len(non_null) < len(node)
        if len(non_null) != 1:
            raise ValueError(f"unsupported multi-branch union: {node}")
        dt, _ = _avro_type_to_spark(non_null[0])
        return dt, nullable
    if isinstance(node, str):
        return _PRIMITIVE_TO_SPARK[node], False
    kind = node["type"]
    logical = node.get("logicalType")
    if logical == "date":
        return T.DateType(), False
    if logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType(), False
    if logical == "decimal":
        return T.DecimalType(node.get("precision", 38), node.get("scale", 0)), False
    if kind == "record":
        return (
            T.StructType(
                [
                    T.StructField(f["name"], *_swap(_avro_type_to_spark(f["type"])))
                    for f in node["fields"]
                ]
            ),
            False,
        )
    if kind == "array":
        dt, n = _avro_type_to_spark(node["items"])
        return T.ArrayType(dt, n), False
    if kind == "map":
        dt, n = _avro_type_to_spark(node["values"])
        return T.MapType(T.StringType(), dt, n), False
    return _PRIMITIVE_TO_SPARK[kind], False


def _swap(t: tuple[T.DataType, bool]) -> tuple[T.DataType, bool]:
    return (t[0], t[1])


def avro_schema_to_spark(avro_json_schema: str) -> T.StructType:
    """Top-level record schema → StructType (field order preserved)."""
    node = json.loads(avro_json_schema)
    if not (isinstance(node, dict) and node.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in node["fields"]:
        dt, nullable = _avro_type_to_spark(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# DataFrame-level decode (jar-gated fast path + mapInPandas fallback)
# ---------------------------------------------------------------------------


_AVRO_PROBE: list[bool] = []  # process-global memo (empty = not probed yet)


def spark_avro_jar_available(spark) -> bool:
    """True iff the spark-avro module is usable (probed once per PROCESS by
    running a trivial from_avro — class-loading checks are unreliable).

    The memo is deliberately global, not per-session: the spark-avro jar is
    a JVM classpath property shared by every session and every foreachBatch
    session clone. Keying by session object (the old behavior) re-ran the
    failing probe inside EVERY micro-batch — one wasted failed job per
    batch, and the failed execution hitting the ExecutionListenerBus made
    ``Observation`` listeners throw (they force re-analysis of the failed
    from_avro plan), hanging any ``Observation.get`` riding the same batch.
    """
    if not _AVRO_PROBE:
        try:
            from pyspark.sql import functions as F
            from pyspark.sql.avro.functions import from_avro

            probe_schema = '{"type":"record","name":"p","fields":[{"name":"x","type":"int"}]}'
            spark.range(1).select(
                from_avro(F.lit(b"\x02"), probe_schema).alias("v")
            ).collect()
            _AVRO_PROBE.append(True)
        except Exception:
            _AVRO_PROBE.append(False)
    return _AVRO_PROBE[0]


def decode_avro(
    df: DataFrame,
    payload_col: str,
    avro_json_schema: str,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Binary Avro payload column → typed columns (struct flattened).

    Equivalent of ref stream/stream.py:85-87 (``from_avro`` + ``value.*``
    star-expansion). Keeps all other columns. FAILFAST matches the
    reference's default avro options (ref stream/stream.py:36-37).
    """
    spark = df.sparkSession
    other = [c for c in df.columns if c != payload_col]
    if spark_avro_jar_available(spark):
        from pyspark.sql import functions as F
        from pyspark.sql.avro.functions import from_avro

        decoded = df.select(
            *other,
            from_avro(F.col(payload_col), avro_json_schema, {"mode": mode}).alias("__v"),
        )
        return decoded.select(*other, "__v.*")

    # Fallback: Arrow-batched pure-Python decode (per-partition, not per-row).
    value_schema = avro_schema_to_spark(avro_json_schema)
    in_schema = df.schema
    fail_fast = mode.upper() == "FAILFAST"
    value_fields = list(value_schema.fields)
    if not fail_fast:
        # PERMISSIVE emits all-null rows for corrupt payloads, so every
        # value column must be nullable regardless of the Avro schema's
        # required fields (matches from_avro, which returns a null struct)
        value_fields = [
            T.StructField(f.name, f.dataType, nullable=True, metadata=f.metadata)
            for f in value_fields
        ]
    out_schema = T.StructType(
        [f for f in in_schema.fields if f.name != payload_col] + value_fields
    )
    payload_idx = payload_col
    schema_str = avro_json_schema

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        parsed_schema = json.loads(schema_str)
        for pdf in batches:
            rows = []
            for payload in pdf[payload_idx]:
                try:
                    rows.append(_decode_value(io.BytesIO(payload), parsed_schema))
                except Exception:
                    if fail_fast:
                        raise
                    rows.append({f.name: None for f in value_schema.fields})
            vals = pd.DataFrame(rows, columns=[f.name for f in value_schema.fields])
            out = pd.concat(
                [pdf.drop(columns=[payload_idx]).reset_index(drop=True), vals], axis=1
            )
            yield out

    return df.mapInPandas(_decode_batches, schema=out_schema)
