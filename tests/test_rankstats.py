"""exact_percentiles_by_rank must reproduce Spark's exact ``percentile``
aggregate bit-for-bit on dyadic probabilities over integer values — the
whole point of the helper is swapping the O(group) multiset aggregate for
the two-pass rank shape WITHOUT changing a single output bit.

Covers: global + grouped, heavy ties, singleton and tiny groups, and the
frac=0 edge where the target rank lands exactly on a row (no hi neighbor
needed, and the hi row must not double-count).
"""

import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.operators.rankstats import exact_percentiles_by_rank


def _reference(df, numerators, denom, keys=()):
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")] + [
        F.expr(f"percentile(v, {num}/{denom})").alias(f"p{num}")
        for num in numerators
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.groupBy().agg(*aggs)


def _rows(df, keys):
    cols = sorted(df.columns)
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("denom,nums", [(2, [1]), (4, [1, 2, 3]), (8, list(range(1, 8)))])
def test_global_matches_percentile(spark, denom, nums):
    vals = [(i * 37) % 101 for i in range(1, 200)] + [50] * 40  # ties
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = exact_percentiles_by_rank(df, "v", nums, denom)
    want = _reference(df, nums, denom)
    assert _rows(got, ()) == _rows(want, ())


def test_grouped_matches_percentile_incl_tiny_groups(spark):
    rows = []
    for g, n in [("a", 1), ("b", 2), ("c", 7), ("d", 500)]:
        rows += [(g, (i * 13) % 97) for i in range(n)]
    rows += [("c", 5)] * 6  # tie block inside a small group
    df = spark.createDataFrame(rows, "k string, v long")
    got = exact_percentiles_by_rank(df, "v", [1, 2, 3], 4, keys=["k"])
    want = _reference(df, [1, 2, 3], 4, keys=["k"])
    assert _rows(got, ["k"]) == _rows(want, ["k"])


def test_frac_zero_lands_exactly_on_rank(spark):
    # n = 9 → p=1/2 targets rank 4 exactly (frac 0): the lo row alone
    # must carry weight 1 and the lo+1 row must not be double-counted.
    df = spark.createDataFrame([(v,) for v in [3, 1, 4, 1, 5, 9, 2, 6, 8]], "v long")
    got = exact_percentiles_by_rank(df, "v", [1, 2, 3], 4)
    want = _reference(df, [1, 2, 3], 4)
    assert _rows(got, ()) == _rows(want, ())


# Property: on random grouped integer multisets with random dyadic
# probabilities, the rank-statistics plan must agree with a pure-Python
# type-7 interpolation oracle (same definition percentile()/quantile_cont
# implement) — including duplicate-heavy and constant-valued groups.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _type7(vals, num, denom):
    s = sorted(vals)
    t = num * (len(s) - 1)
    lo, rem = divmod(t, denom)
    lo_v = float(s[lo])
    hi_v = float(s[lo + 1]) if rem else lo_v
    return lo_v + (hi_v - lo_v) * (rem / denom)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-50, 50)),
        min_size=1,
        max_size=120,
    ),
    denom_pow=st.integers(1, 3),
)
def test_matches_python_type7_oracle(spark, data, denom_pow):
    denom = 2 ** denom_pow
    nums = list(range(1, denom))
    df = spark.createDataFrame(data, "k string, v long")
    got = {
        r["k"]: [r[f"p{num}"] for num in nums]
        for r in exact_percentiles_by_rank(
            df, "v", nums, denom, keys=["k"]
        ).collect()
    }
    by_key = {}
    for k, v in data:
        by_key.setdefault(k, []).append(v)
    want = {
        k: [_type7(vals, num, denom) for num in nums]
        for k, vals in by_key.items()
    }
    assert got == want


def test_mid_rank_reconstruction_is_contiguous(spark):
    # Pins the implementation-detail assumption the module's rank
    # derivation is built on (see the CONTRACT RISK note in
    # rankstats.py): monotonically_increasing_id must be CONSECUTIVE
    # within each partition, not merely monotonic/unique as the API doc
    # guarantees. We rebuild global ranks with the exact mid-offset
    # idiom the helper uses — on an input forced across many partitions
    # — and assert the ranks form exactly 0..n-1 with the value at rank
    # i equal to the i-th order statistic. Any contiguity break (gaps in
    # ids inside a partition) makes the rank set non-consecutive and
    # fails this immediately.
    vals = [(i * 7919) % 4001 for i in range(4000)]  # dupes included
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ranked = (
        df.repartitionByRange(16, "v")
        .sortWithinPartitions("v")
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
    )
    counts = ranked.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"), F.min("__mid").alias("__mid0")
    )
    prior = counts.select(
        F.col("__pid").alias("__pid2"), F.col("__cnt").alias("__cnt2")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(
            F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__off"),
            F.min("__mid0").alias("__mid0"),
        )
    )
    rows = (
        ranked.join(F.broadcast(offsets), "__pid")
        .select(
            (F.col("__off") + (F.col("__mid") - F.col("__mid0"))).alias("rk"),
            "v",
        )
        .collect()
    )
    got = {r["rk"]: r["v"] for r in rows}
    n = len(vals)
    assert sorted(got) == list(range(n)), "ranks are not consecutive 0..n-1"
    expect = sorted(vals)
    assert [got[i] for i in range(n)] == expect
