"""kafka2delta_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference project
``sdaberdaku/kafka2delta`` (a Kafka→Delta CDC replication pipeline), expressed
idiomatically on Apache Spark: declarative DataFrame/SQL plans, native
(JVM-codegen) expressions instead of row-at-a-time Python UDFs, pure
unit-testable transform functions, and a thin Structured-Streaming shell.

Public API mirrors the reference's exports (see reference
``src/kafka2delta/__init__`` modules) plus the general analytics surface:

CDC core (reference parity):
  - ``stream_to_delta``            (ref stream/stream.py:161-235)
  - ``TableConfig``                (ref config/config.py:4-29)
  - ``schema_id_col`` / ``avro_payload_col``  (ref udf/udf.py:3-23, as native exprs)
  - ``cast_debezium_columns``      (ref utils/utils.py:61-103)
  - ``create_table_if_not_exists`` (ref utils/utils.py:37-58)
  - ``get_json_schema`` / ``get_column_names_from_schema`` (ref utils/utils.py:11-34)

Analytics surface (harness extensions): see ``kafka2delta_spark.operators``,
``kafka2delta_spark.functions``.
"""

__version__ = "0.9.0"

from kafka2delta_spark.config import TableConfig
from kafka2delta_spark.cdc.wire import schema_id_col, avro_payload_col, parse_confluent_envelope
from kafka2delta_spark.cdc.debezium import cast_debezium_columns
from kafka2delta_spark.cdc.registry import (
    SchemaRegistryClient,
    InMemorySchemaRegistry,
    get_json_schema,
    get_column_names_from_schema,
)
from kafka2delta_spark.cdc.dedup import latest_per_key
from kafka2delta_spark.cdc.merge import (
    exclude_null_key_changes,
    merge_cdc_batch,
    split_upserts_deletes,
)
from kafka2delta_spark.state.store import (
    DeltaStateStore,
    ParquetStateStore,
    create_table_if_not_exists,
)
from kafka2delta_spark.streaming.listener import StreamProgressListener
from kafka2delta_spark.streaming.stream import stream_to_delta
from kafka2delta_spark.session import build_session

__all__ = [
    "TableConfig",
    "schema_id_col",
    "avro_payload_col",
    "parse_confluent_envelope",
    "cast_debezium_columns",
    "SchemaRegistryClient",
    "InMemorySchemaRegistry",
    "get_json_schema",
    "get_column_names_from_schema",
    "latest_per_key",
    "exclude_null_key_changes",
    "merge_cdc_batch",
    "split_upserts_deletes",
    "DeltaStateStore",
    "ParquetStateStore",
    "StreamProgressListener",
    "create_table_if_not_exists",
    "stream_to_delta",
    "build_session",
]
