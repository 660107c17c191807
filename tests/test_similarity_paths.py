"""Dot-product execution paths agree.

``similarity.dot`` has two implementations: the default HOF ``aggregate``
(sequential accumulation, bit-identical to DuckDB ``list_dot_product`` —
the oracle-parity AND recommended production path per the measurements in
``similarity.py``) and an Arrow-batched numpy einsum behind
``K2D_VECTORIZED_DOT=1``. They may differ in the last ulp (summation
order), never more.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.functions import similarity as sim


@pytest.fixture()
def vec_df(spark):
    return spark.range(200).select(
        "id",
        F.expr("transform(sequence(1,64), i -> cast((id*i) % 97 AS double)/97.0)").alias(
            "a"
        ),
        F.expr("transform(sequence(1,64), i -> cast((id+i) % 89 AS double)/89.0)").alias(
            "b"
        ),
    )


def test_hof_and_numpy_dot_agree(vec_df):
    got = (
        vec_df.select(
            "id",
            sim._hof_dot(F.col("a"), F.col("b")).alias("hof"),
            sim.np_dot(F.col("a"), F.col("b")).alias("np"),
        )
        .toPandas()
        .sort_values("id")
    )
    assert np.allclose(got["hof"], got["np"], rtol=1e-12, atol=1e-12)


def test_dot_flag_switches_path(vec_df, monkeypatch):
    monkeypatch.delenv(sim.VECTORIZED_DOT_ENV, raising=False)
    assert not sim.vectorized_dot_enabled()
    monkeypatch.setenv(sim.VECTORIZED_DOT_ENV, "1")
    assert sim.vectorized_dot_enabled()
    # the vectorized plan carries a Python UDF node; the HOF plan does not
    plan = vec_df.select(sim.dot(F.col("a"), F.col("b")).alias("d"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_plane_buckets_identical_under_both_paths(vec_df, monkeypatch):
    """Bucket bits must not depend on the dot path (candidate-set safety)."""
    base = vec_df.select("id", F.col("a").alias("v"))
    monkeypatch.setenv(sim.VECTORIZED_DOT_ENV, "1")
    vec_on = base.select(
        "id", sim.plane_bucket_spark(F.col("v"), 0, 4).alias("bkt")
    ).toPandas()
    monkeypatch.delenv(sim.VECTORIZED_DOT_ENV)
    vec_off = base.select(
        "id", sim.plane_bucket_spark(F.col("v"), 0, 4).alias("bkt")
    ).toPandas()
    assert vec_on.sort_values("id")["bkt"].tolist() == vec_off.sort_values("id")[
        "bkt"
    ].tolist()


def test_quantized_ann_recall_matches_bruteforce(spark):
    """Recompute qx51 in plain Python: shared-scale int8 quantization,
    quantized-cosine ranking, recall vs the float top-k."""
    import math

    from kafka2delta_spark.functions.similarity import (
        N_QUERIES,
        QANN_LEVELS,
        TOP_K,
        qx51_quantized_ann_recall,
    )
    from kafka2delta_spark.sources.tables import load_table

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, "/root/testdata/sf0.001", "embeddings").collect()
    }
    gmax = max(abs(x) for v in vecs.values() for x in v)
    q = {i: [math.floor((x * QANN_LEVELS) / gmax) for x in v] for i, v in vecs.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    def topk(space, qid):
        scored = sorted(
            ((cos(space[qid], v), -nid) for nid, v in space.items() if nid != qid),
            reverse=True,
        )
        return {-nid for _, nid in scored[:TOP_K]}

    want = {}
    for qid in range(N_QUERIES):
        f = topk(vecs, qid)
        g = topk(q, qid)
        hits = len(f & g)
        want[qid] = (hits, round(hits / TOP_K, 4))

    out = {r["qid"]: r for r in qx51_quantized_ann_recall(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == set(want)
    for qid, (hits, rec) in want.items():
        assert (out[qid]["n_hits"], out[qid]["recall"]) == (hits, rec)


def test_range_partition_planner_matches_bruteforce(spark):
    from kafka2delta_spark.operators.advanced import (
        RANGE_BUCKETS,
        qx52_range_partition_planner,
    )
    from kafka2delta_spark.sources.tables import load_table

    us = sorted(
        int(r["ts"].timestamp() * 1_000_000)
        for r in load_table(spark, "/root/testdata/sf0.001", "events").collect()
    )
    n = len(us)

    def qtile(p):  # type-7 linear interpolation, exact at eighths
        idx = (n - 1) * p
        lo = int(idx)
        frac = idx - lo
        return us[lo] + frac * (us[min(lo + 1, n - 1)] - us[lo])

    bnds = [qtile(i / RANGE_BUCKETS) for i in range(1, RANGE_BUCKETS)]
    counts = [0] * RANGE_BUCKETS
    for x in us:
        counts[sum(1 for b in bnds if x > b)] += 1

    out = {r["bucket"]: r for r in qx52_range_partition_planner(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {i for i in range(RANGE_BUCKETS) if counts[i] > 0}
    for i, r in out.items():
        assert r["n_rows"] == counts[i]
        assert r["total_rows"] == n
        assert r["balance_e6"] == counts[i] * 10**6 * RANGE_BUCKETS // n
    # quantile boundaries on a continuous-ish key must balance well
    assert all(abs(r["balance_e6"] - 10**6) < 10**5 for r in out.values())


def test_both_dot_paths_propagate_null_vectors(spark):
    """dot(NULL, v) IS NULL on BOTH paths: the HOF exprs are
    null-propagating by Catalyst rules, and the numpy path must mask
    NULL rows instead of crashing np.stack on a None in the batch —
    a failed-encode embedding row is routine in a 100 TB corpus."""
    df = spark.range(6).select(
        "id",
        F.expr(
            "CASE WHEN id % 3 = 0 THEN NULL ELSE "
            "transform(sequence(1,8), i -> cast(id*i AS double)) END"
        ).alias("a"),
        F.expr(
            "CASE WHEN id % 2 = 1 THEN NULL ELSE "
            "transform(sequence(1,8), i -> cast(id+i AS double)) END"
        ).alias("b"),
    )
    got = (
        df.select(
            "id",
            sim._hof_dot(F.col("a"), F.col("b")).alias("hof"),
            sim.np_dot(F.col("a"), F.col("b")).alias("np"),
        )
        .orderBy("id")
        .collect()
    )
    for r in got:
        null_in = r["id"] % 3 == 0 or r["id"] % 2 == 1
        assert (r["hof"] is None) == null_in, r
        assert (r["np"] is None) == null_in, r
        if not null_in:
            want = sum(r["id"] * i * (r["id"] + i) for i in range(1, 9))
            assert r["hof"] == pytest.approx(want, rel=1e-12)
            assert r["np"] == pytest.approx(want, rel=1e-12)


def test_np_dot_all_null_batch(spark):
    """An all-NULL batch (e.g. one parquet file of tombstoned rows) must
    come back as all NULL, not a task crash or NaN."""
    df = spark.range(4).select(
        F.lit(None).cast("array<double>").alias("a"),
        F.expr("transform(sequence(1,8), i -> cast(i AS double))").alias("b"),
    )
    rows = df.select(sim.np_dot(F.col("a"), F.col("b")).alias("d")).collect()
    assert [r["d"] for r in rows] == [None] * 4
