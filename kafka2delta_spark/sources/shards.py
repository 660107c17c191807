"""Training-shard export: the sink at the end of the data pipeline.

After curation/dedup/packing, the corpus leaves the lakehouse as N
deterministic shards the trainer's data loader reads round-robin. The
writer here is the Spark-shaped version of that export:

  * shard assignment is a pure function of the data (hash of a key column,
    NOT ``spark_partition_id``/``monotonically_increasing_id`` — those
    depend on physical planning and are not reproducible across runs or
    cluster sizes);
  * one shuffle: ``repartition(n_shards, shard)`` so each shard is written
    by exactly one task as exactly one file — the trainer wants big
    sequential files, not a directory of task-fragments;
  * rows within a shard are sorted (``sortWithinPartitions``) so iteration
    order is deterministic too;
  * layout is hive-partitioned ``shard=K/part-*.parquet`` so a reader can
    open one shard without listing the others.

At 100 TB, n_shards is thousands and the single ``repartition`` is the
export's only shuffle; skew is impossible by construction (hash-uniform
assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assign_shard(key, n_shards: int):
    """Deterministic shard id from a key column: positive mod of the
    32-bit murmur hash (``F.hash``), a pure function of the key value."""
    return F.pmod(F.hash(key), F.lit(n_shards))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` hive-partitioned, internally-sorted
    parquet shards under ``path`` (``shard=K/``)."""
    sharded = df.withColumn("shard", assign_shard(F.col(key_col), n_shards))
    (
        sharded.repartition(n_shards, "shard")
        # shard leads the sort: two shard values can hash-collide into one
        # task, and the dynamic-partition writer's own partition-column
        # sort is not stability-guaranteed under spill — sorting
        # (shard, key...) satisfies the writer's required ordering
        # directly, so within-file order stays deterministic either way
        .sortWithinPartitions("shard", *(sort_cols or [key_col]))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shard(
    spark: SparkSession, path: str, shard: int
) -> DataFrame:
    """Open one shard by partition-pruned read (no full listing scan of
    the other shards' data files)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)
