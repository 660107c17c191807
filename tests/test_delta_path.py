"""Delta-path tests for apply_cdc_delta — gated on delta-spark.

This environment has no delta-spark module, no delta jars under
$SPARK_HOME/jars, and no network for ``--packages`` resolution (probe
2026-08-13: repo1.maven.org unresolvable), so these tests SKIP here; on a
cluster with delta-spark they run the real ``DeltaTable.merge`` path
through the same scenarios the engine-neutral ``merge_cdc_batch`` covers
in tests/test_cdc_core.py — the two paths must share one semantics
(guarded upserts, guarded deletes, NULL flag = upsert).

Reference behavior mirrored: stream/stream.py:121-148 (two MERGEs there,
one combined MERGE here), stream/test/stream_test.py:164-323 scenarios.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta", reason="delta-spark not on the classpath")

from kafka2delta_spark.cdc.merge import apply_cdc_delta  # noqa: E402

SCHEMA = "id int, name string, __log_sequence_number long, __deleted string"


@pytest.fixture(scope="module")
def delta_spark():
    """A session with the Delta catalog extensions (separate from the plain
    session fixture — extensions must be set before the JVM starts)."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("delta_path_tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    s = configure_spark_with_delta_pip(builder).getOrCreate()
    yield s
    s.stop()


@pytest.fixture()
def target(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    delta_spark.createDataFrame(
        [(1, "keep", 100), (2, "upd", 100), (3, "del", 100)],
        "id int, name string, __log_sequence_number long",
    ).write.format("delta").save(path)
    return path


def _apply(delta_spark, path, rows):
    changes = delta_spark.createDataFrame(rows, SCHEMA)
    apply_cdc_delta(delta_spark, path, changes, ["id"])
    return {
        r["id"]: (r["name"], r["__log_sequence_number"])
        for r in delta_spark.read.format("delta").load(path).collect()
    }


def test_delta_merge_insert_update_delete(delta_spark, target):
    got = _apply(
        delta_spark,
        target,
        [
            (2, "updated", 200, "false"),  # newer → update
            (3, "gone", 150, "true"),  # newer delete → applies
            (4, "new", 50, "false"),  # insert
        ],
    )
    assert got == {1: ("keep", 100), 2: ("updated", 200), 4: ("new", 50)}


def test_delta_merge_stale_upsert_and_delete_are_noops(delta_spark, target):
    got = _apply(
        delta_spark,
        target,
        [(1, "stale", 50, "false"), (2, "old-del", 50, "true")],
    )
    assert got[1] == ("keep", 100)
    assert got[2] == ("upd", 100)


def test_delta_merge_null_flag_is_upsert(delta_spark, target):
    got = _apply(delta_spark, target, [(1, "newer", 200, None), (9, "n", 5, None)])
    assert got[1] == ("newer", 200)
    assert got[9] == ("n", 5)


def test_delta_merge_delete_absent_key_noop(delta_spark, target):
    got = _apply(delta_spark, target, [(42, "ghost", 999, "true")])
    assert 42 not in got and len(got) == 3
