"""qx28 composite-cell fusion pin (round 12, guide §2.4/§7.2).

The zone maps of BOTH layouts are folded from ONE composite
(zorder-file, linear-file) cell aggregate instead of two sibling aggs
over the events scan (which Catalyst planned as two full scans). This
file pins the fold's algebra on a crafted corpus that exercises every
reassociation the fusion relies on:

- count per file  = SUM of cell counts          (integer, exact)
- min/max per file = min-of-mins / max-of-maxes (exact)
- NULL transparency: a non-finite ``value`` has NULL zy/zval; its rows
  must land in the NULL-zval zorder file, keep NULL min_y/max_y when a
  cell is all-NULL, and stay invisible to surviving mins/maxes.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.operators.advanced import (
    PRUNE_PROBES,
    _z_interleave,
    qx28_zone_map_pruning,
)


@pytest.fixture(scope="module")
def zone_sf_dir(spark, tmp_path_factory):
    """A tiny events table spanning several zorder AND linear files,
    with non-finite values (NULL zone coordinates) mixed in."""
    dst = str(tmp_path_factory.mktemp("zonecells"))
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        # seconds chosen to cover the zx domain unevenly; every 13th row
        # is non-finite (NULL zy/zval), every 29th hits the same second
        # as a finite row so NULL and finite rows share a linear file
        sec = (i * 997) % 40960 if i % 29 else 17
        val = float("nan") if i % 13 == 5 else (
            float("inf") if i % 13 == 9 else (i * 31 % 5000) / 7.0
        )
        rows.append(
            (i, base + datetime.timedelta(seconds=sec), i % 7,
             "click", val, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    return dst


def _unfused_reference(spark, sf_dir):
    """The pre-round-12 formulation: one hash-agg per layout, two full
    scans — kept here as the semantic reference for the fused fold."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    zx = (F.expr("unix_micros(ts) div 1000000") % 4096).cast("bigint")
    zy = F.when(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf")),
        F.abs(F.floor(F.col("value") * 100).cast("bigint")) % 4096,
    ).cast("bigint")
    dims = ev.select(zx.alias("zx"), zy.alias("zy")).withColumn(
        "zval", _z_interleave(F.col("zx"), F.col("zy"))
    )

    def zones(file_col, layout):
        return dims.groupBy(file_col.alias("f")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zx").alias("min_x"),
            F.max("zx").alias("max_x"),
            F.min("zy").alias("min_y"),
            F.max("zy").alias("max_y"),
        ).withColumn("layout", F.lit(layout))

    zz = zones(F.shiftright("zval", 18), "zorder").unionByName(
        zones(F.expr("zx div 64"), "linear")
    )
    probes = spark.createDataFrame(
        PRUNE_PROBES, "probe string, x_lo long, x_hi long, y_lo long, y_hi long"
    )
    touched = (
        (F.col("max_x") >= F.col("x_lo"))
        & (F.col("min_x") <= F.col("x_hi"))
        & (F.col("max_y") >= F.col("y_lo"))
        & (F.col("min_y") <= F.col("y_hi"))
    ).cast("int")
    hits = zz.crossJoin(F.broadcast(probes)).select(
        "layout", "probe", "n_rows", touched.alias("touched")
    )
    return hits.groupBy("layout", "probe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("touched").cast("bigint").alias("files_touched"),
        F.sum(F.when(F.col("touched") == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_touched"),
        F.round(1.0 - F.sum("touched") / F.count(F.lit(1)), 4).alias(
            "files_pruned_pct"
        ),
    )


def test_fused_cells_match_unfused_zone_maps(spark, zone_sf_dir):
    got = {
        tuple(r[:2]): tuple(r[2:])
        for r in qx28_zone_map_pruning(spark, zone_sf_dir).collect()
    }
    want = {
        tuple(r[:2]): tuple(r[2:])
        for r in _unfused_reference(spark, zone_sf_dir).collect()
    }
    assert got == want
    # the crafted corpus really exercises both layouts and the NULL file
    assert len(got) == 2 * len(PRUNE_PROBES)


def test_fused_plan_scans_events_once(spark, zone_sf_dir):
    """The fusion's point: the two layouts fold ONE pinned cell grid, so
    the final plan holds no duplicated events scan (the grid producer is
    the only scan, materialized behind the lazy localCheckpoint)."""
    plan = qx28_zone_map_pruning(
        spark, zone_sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1
