"""Debezium logical-type casting.

Debezium (with ``time.precision.mode: connect`` and
``decimal.handling.mode: precise``, ref resources/kafka-connector.yaml:16,32)
emits some column types that need an explicit cast after Avro decode. The
reference inspects the Avro-JSON value schema's ``connect.name`` annotations
and builds a per-column cast projection (ref utils/utils.py:61-103). Same
semantics here, driven by a declarative mapping table instead of inline
conditionals, and handling the three schema shapes a field type can take:
direct string, dict (annotated type), and ``["null", T]`` union.

Casts applied (ref utils/utils.py:73-76 and FIXTURES.md §A.4):
  * ``io.debezium.time.ZonedTimestamp``  — ISO-8601 string → timestamp
  * ``io.debezium.time.MicroTimestamp``  — long micros → timestamp
  * ``io.debezium.time.Timestamp``       — long millis → timestamp
  * ``io.debezium.time.Date``            — int days → date
  * ``org.apache.kafka.connect.data.Date`` — decoded natively by the Avro
    logical type ``date``; no cast needed (ref utils/test/avro_test.py:104-105)
  * ``io.debezium.time.ZonedTime`` — left as string (open edge in the
    reference too, ref utils/utils.py:75)
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ts_from_micros(c: Column) -> Column:
    return F.timestamp_micros(c.cast("long"))


def _ts_from_millis(c: Column) -> Column:
    return F.timestamp_millis(c.cast("long"))


def _date_from_days(c: Column) -> Column:
    return F.date_add(F.lit("1970-01-01").cast("date"), c.cast("int"))


# connect.name → cast builder. ZonedTimestamp is an ISO-8601 *string*;
# a plain timestamp cast parses it (the reference does exactly this cast).
_CONNECT_CASTS: dict[str, Callable[[Column], Column]] = {
    "io.debezium.time.ZonedTimestamp": lambda c: c.cast("timestamp"),
    "io.debezium.time.MicroTimestamp": _ts_from_micros,
    "io.debezium.time.Timestamp": _ts_from_millis,
    "io.debezium.time.Date": _date_from_days,
}


def _connect_name(field_type: Any) -> str | None:
    """Extract ``connect.name`` from the three field-type shapes:
    direct string (none), annotated dict, or ``["null", T]`` union
    (ref utils/utils.py:89-99 handles the same three cases)."""
    if isinstance(field_type, dict):
        return field_type.get("connect.name")
    if isinstance(field_type, list):
        for branch in field_type:
            if isinstance(branch, dict) and "connect.name" in branch:
                return branch["connect.name"]
    return None


def cast_debezium_columns(avro_json_schema: str) -> list[Column]:
    """Build the typed projection for a decoded Debezium row.

    Returns one Column per schema field: a cast where the ``connect.name``
    demands one, a plain ``col`` otherwise. Apply with ``df.select(*cols)``.
    Functional parity with ref utils/utils.py:61-103.
    """
    schema = json.loads(avro_json_schema)
    out: list[Column] = []
    for field in schema["fields"]:
        name = field["name"]
        caster = _CONNECT_CASTS.get(_connect_name(field.get("type")) or "")
        out.append(caster(F.col(name)).alias(name) if caster else F.col(name))
    return out
