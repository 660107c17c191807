"""Per-topic table configuration.

Same information content as the reference's ``DeltaTableConfig``
(ref config/config.py:4-29): target schema/table identifiers, storage path,
user-supplied derived-column SQL expressions, and partition columns — but as
a frozen dataclass with validation and a computed fully-qualified name.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableConfig:
    """Configuration of one replicated target table.

    Attributes:
        schema_name: target database/schema (metastore namespace).
        table_name: target table name.
        path: storage location for the table's files.
        additional_cols: SQL expressions appended as derived columns, e.g.
            ``["YEAR(created_at) AS year", "MONTH(created_at) AS month"]``
            (ref stream/stream.py:99-103; ref stream/test/stream_test.py:108).
        partition_cols: hive-style partition columns of the target
            (ref utils/utils.py:56-57). Must be produced by the source
            schema or ``additional_cols``.
        on_null_key: policy for change rows whose primary key is NULL
            (a Debezium contract violation that Delta MERGE would turn
            into unbounded duplicate INSERTs): ``'drop'`` excludes them
            and logs a per-batch count; ``'error'`` fails the batch
            loudly on the first offending row.
    """

    schema_name: str
    table_name: str
    path: str
    additional_cols: list[str] = field(default_factory=list)
    partition_cols: list[str] = field(default_factory=list)
    on_null_key: str = "drop"

    def __post_init__(self) -> None:
        if not self.schema_name or not self.table_name:
            raise ValueError("schema_name and table_name are required")
        if not self.path:
            raise ValueError("path is required")
        if self.on_null_key not in ("drop", "error"):
            raise ValueError(
                f"on_null_key must be 'drop' or 'error', got {self.on_null_key!r}"
            )

    @property
    def full_table_name(self) -> str:
        """``schema.table`` identifier (ref config/config.py:24-29)."""
        return f"{self.schema_name}.{self.table_name}"


# Control-column names produced by the Debezium ExtractNewRecordState SMT
# (ref stream/stream.py:13-14; ref resources/kafka-connector.yaml:38-53).
DELETED_COL = "__deleted"
TIMESTAMP_COL = "__timestamp"
LSN_COL = "__log_sequence_number"
