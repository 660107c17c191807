"""Training-shard export: determinism, completeness, layout, pruning."""

import os

from pyspark.sql import functions as F

from kafka2delta_spark.sources.shards import (
    assign_shard,
    read_training_shard,
    write_training_shards,
)
from kafka2delta_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 4


def test_shard_export_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, N_SHARDS, "doc_id")

    back = spark.read.parquet(out)
    # complete and exact: every row survives the export
    assert back.count() == docs.count()
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )

    # layout: hive dirs, one data file per shard (one task wrote each)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) <= N_SHARDS  # empty shards write no dir
    for d in shard_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: expected one file, got {files}"

    # assignment is the declared pure function of the key
    expect = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", assign_shard(F.col("doc_id"), N_SHARDS).alias("s")
        ).collect()
    }
    for r in back.select("doc_id", "shard").collect():
        assert r["shard"] == expect[r["doc_id"]]


def test_shard_export_is_reproducible(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # different incoming partitioning must not change shard contents
    write_training_shards(docs, a, N_SHARDS, "doc_id")
    write_training_shards(docs.repartition(13), b, N_SHARDS, "doc_id")
    rows_a = sorted(
        (r["shard"], r["doc_id"])
        for r in spark.read.parquet(a).select("shard", "doc_id").collect()
    )
    rows_b = sorted(
        (r["shard"], r["doc_id"])
        for r in spark.read.parquet(b).select("shard", "doc_id").collect()
    )
    assert rows_a == rows_b


def test_single_shard_read_prunes(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, N_SHARDS, "doc_id")
    one = read_training_shard(spark, out, 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan: only shard=1's directory is read
    assert "PartitionFilters" in plan
    got = {r["doc_id"] for r in one.select("doc_id").collect()}
    expect = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", assign_shard(F.col("doc_id"), N_SHARDS).alias("s")
        ).collect()
        if r["s"] == 1
    }
    assert got == expect
