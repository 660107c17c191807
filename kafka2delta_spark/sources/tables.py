"""Test-data table loading.

The harness tables (TESTDATA.md) are one parquet file per table. Loading is
plain ``spark.read.parquet`` — columnar scan with predicate pushdown and
column pruning handled by Catalyst. At 100 TB these would be multi-file
datasets (or Delta tables); nothing downstream assumes single-file inputs.
"""

from __future__ import annotations

import os

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


def sf_fingerprint(sf_dir: str) -> tuple:
    """Content fingerprint of a data directory: (relative name, size,
    mtime_ns) of every parquet file under it, one directory level deep.

    Session caches of compute-once materializations (pair stats, edge
    lists, PQ quantizers) key on this in addition to ``(id(spark),
    sf_dir)``: a cache keyed on the PATH alone silently serves stale
    checkpoints if files under the path are rewritten mid-session. The
    scan is metadata-only (os.scandir stat calls, no data reads) — a few
    dozen stats per cache probe. Missing directories fingerprint to an
    empty tuple so cache probes never raise before Spark's own reader
    does."""
    entries = []
    try:
        with os.scandir(sf_dir) as it:
            for e in sorted(it, key=lambda e: e.name):
                if e.is_file() and e.name.endswith(".parquet"):
                    st = e.stat()
                    entries.append((e.name, st.st_size, st.st_mtime_ns))
                elif e.is_dir() and e.name.endswith(".parquet"):
                    with os.scandir(e.path) as inner:
                        for f in sorted(inner, key=lambda f: f.name):
                            if f.is_file():
                                st = f.stat()
                                entries.append(
                                    (
                                        f"{e.name}/{f.name}",
                                        st.st_size,
                                        st.st_mtime_ns,
                                    )
                                )
    except OSError:
        return ()
    return tuple(entries)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table under the vector-operator contract: rows with
    a NULL embedding (a failed encode — routine in a 100 TB corpus) are
    excluded at scan, where IsNotNull pushes down to parquet. A NULL
    vector cannot participate in any distance/dot computation, and the
    DuckDB oracles' ``list_inner_product`` rejects NULL lists outright,
    so every vector operator shares this rule (mirrored in its oracle as
    ``WHERE embedding IS NOT NULL``). Operators that also key on
    ``label`` drop NULL labels at their own call sites."""
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )


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
