"""Focused tests for the round-12 qx57 rewrite: Gram-matrix pass + exact
driver-side power-iteration fold (the spark.ml PCA shape).

The rewrite's correctness claim is that folding the iterations against
G = X'X computes the SAME exact integers as the declared row-wise
formulation w = n*X'(Xv) - Sx*(1'Xv) — an integer-sum rearrangement.
``_reference_pca`` reimplements the row-wise oracle formula verbatim in
arbitrary-precision Python and the test pins query == reference on a
corpus small enough to enumerate, plus the degenerate corpora the driver
fold now handles explicitly (empty -> 0 rows, all-zero scatter -> NULL
eigenvector, single row).
"""

import math

import numpy as np
import pytest
from pyspark.sql import types as T

from kafka2delta_spark.functions.similarity import (
    PCA_D,
    PCA_ITERS,
    PCA_VSCALE,
    qx57_embedding_pca_power,
)


def _trunc_div(a: int, b: int) -> int:
    # both engines' integer division truncates toward zero
    return abs(a) // b * (1 if a >= 0 else -1)


def _reference_pca(vecs):
    """Row-wise oracle formula, verbatim: s = Xv per row, ss = 1'Xv,
    w_dim = n*sum_vec(x*s) - sx_dim*ss, renormalize to max |v| = 1e6.
    Coordinates quantize from the STORED float32 value (the table column
    is array<float>), widened to double exactly as the engines do."""
    xs = [
        [math.floor(float(np.float32(e)) * 1000) for e in vec]
        for vec in vecs
    ]
    n = len(xs)
    rng = range(PCA_D)
    sx = [sum(row[d] for row in xs) for d in rng]
    sxx = [sum(row[d] * row[d] for row in xs) for d in rng]
    v = [PCA_VSCALE] * PCA_D
    for _ in range(PCA_ITERS):
        s = [sum(row[d] * v[d] for d in rng) for row in xs]
        ss = sum(s)
        w = [
            n * sum(xs[r][d] * s[r] for r in range(n)) - sx[d] * ss
            for d in rng
        ]
        m = max(abs(x) for x in w)
        if m == 0:
            v = [None] * PCA_D
            break
        v = [_trunc_div(x * PCA_VSCALE, m) for x in w]
    return {
        d: (v[d], n * sxx[d] - sx[d] * sx[d]) for d in rng
    }


def _write_embeddings(spark, root, vecs):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.StringType()),
        ]
    )
    rows = [(i, [float(x) for x in vec], "l") for i, vec in enumerate(vecs)]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "embeddings.parquet"))
    return str(root)


def test_gram_fold_matches_rowwise_reference(spark, tmp_path):
    # deterministic, sign-varied, non-uniform cloud (no RNG in tests)
    vecs = [
        [((i * 37 + d * 11) % 19 - 9) / 10.0 for d in range(PCA_D)]
        for i in range(23)
    ]
    sf = _write_embeddings(spark, tmp_path, vecs)
    got = {
        r["dim"]: (r["v_e6"], r["var_num"])
        for r in qx57_embedding_pca_power(spark, sf).collect()
    }
    assert got == _reference_pca(vecs)


def test_gram_fold_single_row(spark, tmp_path):
    vecs = [[(d % 7 - 3) / 4.0 for d in range(PCA_D)]]
    sf = _write_embeddings(spark, tmp_path, vecs)
    got = {
        r["dim"]: (r["v_e6"], r["var_num"])
        for r in qx57_embedding_pca_power(spark, sf).collect()
    }
    assert got == _reference_pca(vecs)


def test_empty_corpus_returns_zero_rows(spark, tmp_path):
    sf = _write_embeddings(spark, tmp_path, [])
    assert qx57_embedding_pca_power(spark, sf).count() == 0


def test_all_zero_scatter_degrades_to_null_eigenvector(spark, tmp_path):
    # w = 0 everywhere -> m = 0 -> both engines' `x div 0` is NULL
    sf = _write_embeddings(spark, tmp_path, [[0.0] * PCA_D] * 3)
    rows = qx57_embedding_pca_power(spark, sf).collect()
    assert len(rows) == PCA_D
    assert all(r["v_e6"] is None and r["var_num"] == 0 for r in rows)
