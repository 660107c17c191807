"""Test-data table loading.

The harness tables (TESTDATA.md) are one parquet file per table. Loading is
plain ``spark.read.parquet`` — columnar scan with predicate pushdown and
column pruning handled by Catalyst. At 100 TB these would be multi-file
datasets (or Delta tables); nothing downstream assumes single-file inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-timezone TIMESTAMP.

    The column is TIMESTAMP(NANOS) in the parquet footer, which Spark
    surfaces differently by version: with
    ``spark.sql.legacy.parquet.nanosAsLong`` (<= 4.0) it arrives as long
    nanos; Spark 4.1+ reads it natively as TIMESTAMP_NTZ (micros, nanos
    truncated). Event-time streaming (watermarks) and ``unix_micros``
    require plain TIMESTAMP, so both shapes converge here. The session
    timezone is pinned to UTC, so the NTZ->TZ cast is value-preserving.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer division — nanos exceed double's 53-bit exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
