"""SparkSession factory.

Mirrors the intent of the reference test fixture (ref conftest.py:71-110:
local master, Delta extension/catalog, warehouse config) but production-leaning:
AQE **on** (the reference disables it only for test determinism,
ref conftest.py:102), UTC session timezone (oracle comparability), Arrow
enabled for the pandas-UDF slow path, shuffle partitions sized to cores
rather than the 200 default.

Delta Lake jars are not available in this environment; when the ``delta``
package is importable the factory wires the Delta extension automatically so
the same code runs on a Delta-enabled cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def delta_available() -> bool:
    """Gate for the delta-spark leg. Re-probed round 12 (2026-08-16):
    ``import delta`` still fails, no ``delta-*.jar`` anywhere on disk, no
    ivy/maven cache, and ``pip download delta-spark`` still dies at DNS
    resolution ("Name or service not known" against the package index),
    so the round-9 finding — a live ``spark.jars.packages
    io.delta:delta-spark_2.13:4.0.0`` attempt dies with UNRESOLVED
    DEPENDENCIES — cannot have changed (Maven unreachable from this
    sandbox; installs forbidden). The jar-free MERGE narrowing stands: clause strings are
    spec-pure (cdc/merge.py) and an interpreter reproduces the
    property-tested parquet merge (tests/test_delta_merge_spec.py)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def local_rows(spark: SparkSession, data, schema):
    """Tiny driver-local literal frame in ONE partition.

    ``spark.createDataFrame(list, schema)`` parallelizes the rows into
    ``defaultParallelism`` slices, so a 3-row constant spine (or an empty
    typed frame) becomes cores-many partitions — every broadcast build,
    union, or scan over it then schedules a cluster-width round of
    mostly-empty no-op tasks, a fixed per-use cost that grows with
    executor count while the data does not. One explicit slice keeps
    literal frames O(1) regardless of cluster width."""
    return spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)


def build_session(
    app_name: str = "kafka2delta_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for this engine.

    Scale posture: on a real cluster, ``master``/memory come from
    spark-submit; everything set here is scale-neutral (AQE, skew-join
    handling, partition coalescing) and correct at any executor count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Streaming state-store backend. Default = HDFS-backed (in-heap); set
    # SPARK_GRAFT_STATE_STORE=rocksdb for the RocksDB provider (OSS Spark
    # ≥3.2). Measured on the q56+q57+q58 block at sf0.1 (n=3 medians,
    # tmpfs checkpoints): HDFS 9.8 s vs RocksDB 12.4 s — native DB
    # open/commit per store instance dominates while state is tiny. The
    # crossover is when per-partition state approaches executor heap:
    # RocksDB spills to local disk with changelog checkpointing instead
    # of OOMing. Scale-relevant knob, observable default.
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    if delta_available():
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
