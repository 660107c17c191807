"""Validate the audit_plans global-window detector on the four structural
cases: a truly global rank window (must flag), a partitioned window (must
not), a limit-bounded global window (must not), and a partitioned window
whose plan ALSO contains a scalar-aggregate branch with its own legitimate
SinglePartition exchange — the qx49 false-positive shape (must not).
"""

import sys

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

sys.path.insert(0, "/root/repo/tools")


def _flags(spark, df):
    from audit_plans import audit

    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return audit("probe", plan)


def _events(spark):
    from kafka2delta_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_global_rank_window_is_flagged(spark):
    ev = _events(spark)
    df = ev.withColumn("rk", F.row_number().over(W.orderBy(F.desc("value"))))
    assert "global-window" in _flags(spark, df)


def test_partitioned_window_is_clean(spark):
    ev = _events(spark)
    df = ev.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("user_id").orderBy(F.desc("value"))),
    )
    assert "global-window" not in _flags(spark, df)


def test_bounded_global_window_is_clean(spark):
    ev = _events(spark)
    top = ev.orderBy(F.desc("value")).limit(10)
    df = top.withColumn("rk", F.row_number().over(W.orderBy(F.desc("value"))))
    assert "global-window" not in _flags(spark, df)


_BUILD_LEFT_PLAN = """\
== Physical Plan ==
* Window (7)
+- * Sort (6)
   +- * BroadcastHashJoin Inner BuildLeft (5)
      :- BroadcastExchange (2)
      :  +- Scan parquet  (1)
      +- Exchange (4)
         +- Scan parquet  (3)

(4) Exchange
Arguments: {ARGS}, ENSURE_REQUIREMENTS, [plan_id=42]
"""


def test_build_left_probe_single_partition_is_flagged():
    """The ADVICE false-negative shape: a BuildLeft join prints its
    broadcast BUILD side first, so a first-child-only spine walk would
    descend into the BroadcastExchange and miss the probe side's
    SinglePartition exchange. The all-branch walk must flag it."""
    from audit_plans import audit

    plan = _BUILD_LEFT_PLAN.replace("{ARGS}", "SinglePartition")
    assert "global-window" in audit("probe", plan)


def test_build_left_probe_hash_partitioned_is_clean():
    from audit_plans import audit

    plan = _BUILD_LEFT_PLAN.replace("{ARGS}", "hashpartitioning(k#1, 32)")
    assert "global-window" not in audit("probe", plan)


def test_scalar_agg_branch_not_charged_to_partitioned_window(spark):
    """The qx49 shape: a partitioned window over data cross-joined with a
    broadcast 1-row aggregate (whose plan has its own SinglePartition
    exchange). The old subtree walk flagged this; the spine walk must
    not."""
    ev = _events(spark)
    tot = ev.agg(F.countDistinct("event_type").alias("n_types"))
    joined = ev.crossJoin(F.broadcast(tot))
    df = joined.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("user_id").orderBy(F.desc("value"))),
    ).filter(F.col("rk") <= 3)
    assert "global-window" not in _flags(spark, df)
