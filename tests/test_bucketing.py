"""Bucketing: pre-shuffled table layout eliminates the join exchange.

The 100 TB claim behind it: lineitem ⋈ orders on the order key is the one
fact-fact join every TPC-H-shaped workload repeats. Bucketing both tables
by the join key at write time moves that shuffle from every query to once
at ingest — the physical plan must show NO Exchange on either join side.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord"))
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    yield spark.table("li_bucketed"), spark.table("ord_bucketed"), li, orders
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    li_b, ord_b, li, orders = bucketed_pair
    joined = li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # force a plan where the join runs as SMJ over bucketed scans
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_part = plan.split("HashAggregate")[-1]  # below the agg: join + scans
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_result_matches_plain(spark, bucketed_pair):
    li_b, ord_b, li, orders = bucketed_pair
    bucketed = (
        li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
