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
