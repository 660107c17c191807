"""Validate the audit_plans global-window detector on the four structural
cases: a truly global rank window (must flag), a partitioned window (must
not), a limit-bounded global window (must not), and a partitioned window
whose plan ALSO contains a scalar-aggregate branch with its own legitimate
SinglePartition exchange — the qx49 false-positive shape (must not).

Also validates the FORCED-BROADCAST detector (round-7): a broadcast hint
over a corpus-cardinality side must flag (the old dedup.py:563 per-doc
size table, a modulo sample, a rank-capped window over an unbounded
partition), while every legitimate bounded shape must pass (bounded-key
aggregate, semi-join reduction, id-range cap, IN-literal seeds, limit,
checkpointed artifact, rank-capped window over a bounded partition).
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


# ---------------------------------------------------------------------------
# forced-broadcast detector (analyzed logical plan)
# ---------------------------------------------------------------------------


def _fb(df):
    from audit_plans import audit_forced_broadcast

    return audit_forced_broadcast(
        df._jdf.queryExecution().analyzed().treeString()
    )


def _docs(spark):
    from kafka2delta_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def _emb(spark):
    from kafka2delta_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_forced_broadcast_of_per_doc_aggregate_is_flagged(spark):
    """The round-6 dedup.py:563 shape: broadcast hint over a per-document
    size table — corpus cardinality, dies at the 8 GB cap at 100 TB."""
    docs = _docs(spark)
    sizes = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = docs.limit(10).select(F.col("doc_id").alias("doc_a"))
    df = pairs.join(
        F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a")), "doc_a"
    )
    assert "forced-broadcast:documents" in _fb(df)


def test_forced_broadcast_of_modulo_sample_is_flagged(spark):
    """A modulo sample stays proportional to the corpus — not a bound."""
    docs = _docs(spark)
    s = docs.filter(F.col("doc_id") % 64 == 0).select("doc_id")
    assert "forced-broadcast:documents" in _fb(
        docs.join(F.broadcast(s), "doc_id")
    )


def test_rank_capped_window_over_unbounded_partition_is_flagged(spark):
    """top-k per USER is user-cardinality — broadcast hint must flag."""
    from kafka2delta_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    t3 = (
        ev.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.desc("value"))
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id")
    )
    assert "forced-broadcast:events" in _fb(
        ev.join(F.broadcast(t3), "user_id")
    )


def test_bounded_aggregate_broadcast_is_clean(spark):
    docs = _docs(spark)
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    assert _fb(docs.join(F.broadcast(per_src), "source")) == []


def test_semi_join_reduced_broadcast_is_clean(spark):
    """The dedup.py:1710 precedent: a corpus-sized table semi-joined down
    to a bounded key set may be hinted."""
    docs = _docs(spark)
    sizes = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    keys = docs.limit(10).select("doc_id")
    reduced = sizes.join(keys, "doc_id", "left_semi")
    assert _fb(docs.join(F.broadcast(reduced), "doc_id")) == []


def test_id_range_cap_broadcast_is_clean(spark):
    """The q90 query-set idiom: vec_id < N bounds rows on a unique id."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid")
    )
    assert _fb(emb.crossJoin(F.broadcast(q))) == []


def test_in_literal_seed_broadcast_is_clean(spark):
    """The q76 K_SEEDS idiom: IN over a literal list bounds rows."""
    emb = _emb(spark)
    seeds = emb.filter(F.col("vec_id").isin([0, 17, 34, 51])).select(
        "vec_id", "embedding"
    )
    assert _fb(emb.crossJoin(F.broadcast(seeds.drop("embedding")))) == []


def test_rank_capped_window_over_bounded_partition_is_clean(spark):
    """The qx51 shape: top-k per QUERY where qid derives from a capped
    filter — bounded via provenance through the join."""
    emb = _emb(spark)
    qq = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid")
    )
    scored = emb.join(qq, emb.vec_id != qq.qid).select("qid", "vec_id")
    topk = (
        scored.withColumn(
            "rk", F.row_number().over(W.partitionBy("qid").orderBy("vec_id"))
        )
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id")
    )
    assert _fb(emb.join(F.broadcast(topk), "vec_id")) == []


def test_checkpointed_artifact_broadcast_is_clean(spark):
    """localCheckpoint boundaries terminate lineage — hints over
    session-checkpointed pair/edge artifacts pass."""
    docs = _docs(spark)
    sizes = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ck = sizes.localCheckpoint(eager=False)
    pairs = docs.limit(10).select(F.col("doc_id").alias("doc_a"))
    df = pairs.join(
        F.broadcast(ck.withColumnRenamed("doc_id", "doc_a")), "doc_a"
    )
    assert _fb(df) == []


def test_unhinted_join_is_clean(spark):
    docs = _docs(spark)
    sizes = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    assert _fb(docs.join(sizes, "doc_id")) == []


def test_q36_plan_has_no_percentile_multiset(spark, sf_dir):
    """Round-7 rewrite pin: q36's exact median/p90 must come from the
    value-histogram closed form, never from a `percentile` aggregate
    whose ObjectHashAggregate state buffers a group's whole value
    multiset (O(n) in one task for a hot group at scale)."""
    import contextlib
    import io

    from kafka2delta_spark.operators.analytic import q36_stats_by_returnflag

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q36_stats_by_returnflag(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "Percentile" not in plan and "percentile" not in plan
    assert "ObjectHashAggregate" not in plan
