"""Property equivalence: the q36 value-histogram rank bracket must agree
with the rankstats two-pass bracket — two independent implementations of
the same type-7 order statistic, checked against each other AND a plain
python sort on randomized multisets (heavy ties, skewed groups, n=1
groups — the shapes that break off-by-one rank arithmetic).

Contract note: `exact_rank_bracket` reports __hi = NULL whenever the
interpolation weight is zero (it never looks the value up), while the
histogram form reports the rank-(k+1) value whenever one exists. Every
consumer multiplies (hi - lo) by the fraction, so the two are
interchangeable; the comparison below therefore checks __hi only where
the fraction is nonzero.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka2delta_spark.operators.analytic import _histogram_rank_bracket
from kafka2delta_spark.operators.rankstats import exact_rank_bracket

PS = [(1, 2), (9, 10), (3, 4), (99, 100)]

groups = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=groups, p=st.sampled_from(PS))
def test_histogram_bracket_equals_rank_bracket(spark, rows, p):
    num, den = p
    df = spark.createDataFrame(rows, "k string, v long")
    got_h = {
        r["k"]: (r["__n"], r["__lo"], r["__hi"])
        for r in _histogram_rank_bracket(df, "k", "v", num, den).collect()
    }
    got_r = {
        r["k"]: (r["__n"], r["__lo"], r["__hi"])
        for r in exact_rank_bracket(df, "v", num, den, keys=["k"]).collect()
    }
    assert got_h.keys() == got_r.keys()
    # python third implementation
    by_k: dict = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        vals.sort()
        n = len(vals)
        lo_rk = num * (n - 1) // den
        frac = num * (n - 1) % den
        nh, loh, hih = got_h[k]
        nr, lor, hir = got_r[k]
        assert nh == nr == n, k
        assert loh == lor == vals[lo_rk], k
        if frac != 0:
            assert hih == hir == vals[lo_rk + 1], k
        # frac == 0: the histogram form may report the next value, the
        # two-pass form reports NULL — both interpolate to exactly lo
