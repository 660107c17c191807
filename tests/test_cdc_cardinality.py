"""Extreme-cardinality CDC schedules (round-12 verdict item 3).

The round-11 temporal campaign proved the merge core against ORDER
disorder; this module proves it against CARDINALITY disorder — the three
shapes that break hash-agg/merge plans in practice:

  * delete-majority batches, including delete-then-reinsert churn loops
    (state torn down and rebuilt continuously; both LSN-guarded merge
    branches fire for the same key within one log);
  * every-key-distinct (state size == change volume: no update locality,
    the snapshot/backfill shape);
  * one-key-only (maximum skew: every change in the log rides one
    ``latest_per_key`` hash-agg group and one merge-join key).

Each shape runs the same invariants as tests/test_cdc_properties.py —
batch-split invariance and replay idempotence against the dict-model
oracle — so the guarantees are shape-independent, not artifacts of the
uniform random logs the base suite draws. Reference semantics at stake:
the latest-per-key reduction + MERGE the reference builds on
(ref stream/stream.py:92-148).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_cdc_properties import (
    _collect,
    _model_apply,
    _op,
    _spark_apply,
)


def _run_invariants(spark, ops, cuts):
    """Assert one-batch, every-cut two-batch, and replayed applications
    all equal the dict model."""
    model: dict = {}
    _model_apply(model, ops)
    expected = sorted((pk, v[1], v[2]) for pk, v in model.items())

    one = _spark_apply(spark, None, ops)
    assert _collect(one) == expected

    for cut in cuts:
        cut = max(1, min(cut, len(ops) - 1))
        model2: dict = {}
        _model_apply(model2, ops[:cut])
        _model_apply(model2, ops[cut:])
        exp2 = sorted((pk, v[1], v[2]) for pk, v in model2.items())
        assert exp2 == expected  # the model itself must be split-invariant
        two = _spark_apply(spark, None, ops[:cut])
        two = _spark_apply(spark, two, ops[cut:])
        assert _collect(two) == expected

    replayed = _spark_apply(spark, one, ops)
    assert _collect(replayed) == expected


# --- shaped hypothesis strategies -----------------------------------------

# delete-majority: 75% deletes over a 3-key pool — long logs guarantee
# delete -> reinsert churn loops on every key
churn_ops = st.lists(
    st.tuples(
        st.sampled_from([1, 2, 3]),
        st.integers(min_value=0, max_value=3).map(lambda x: x > 0),
    ),
    min_size=6,
    max_size=24,
).map(lambda pairs: [_op(k, i + 1, d) for i, (k, d) in enumerate(pairs)])

# one key only: the entire log is a single latest_per_key group and a
# single merge-join key
one_key_ops = st.lists(
    st.booleans(), min_size=4, max_size=24
).map(lambda ds: [_op(1, i + 1, d) for i, d in enumerate(ds)])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=churn_ops, cut=st.integers(min_value=1, max_value=23))
def test_delete_majority_churn(spark, ops, cut):
    _run_invariants(spark, ops, cuts=[cut])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=one_key_ops, cut=st.integers(min_value=1, max_value=23))
def test_one_key_only_skew(spark, ops, cut):
    _run_invariants(spark, ops, cuts=[cut])


def test_every_key_distinct(spark):
    """State size == change volume: 40 keys, each exactly one op (last 8
    deletes-of-never-inserted keys must stay absent, not error)."""
    ops = [_op(k, k, k >= 32) for k in range(1, 41)]
    _run_invariants(spark, ops, cuts=[1, 20, 39])


def test_delete_then_reinsert_loop_exact(spark):
    """Deterministic churn pin: one key inserted, deleted, re-inserted,
    deleted, re-inserted across five separate batches — final state is
    the LAST re-insert; replaying ANY earlier batch afterwards (stale
    delete included) changes nothing."""
    batches = [
        [_op(1, 1, False)],
        [_op(1, 2, True)],
        [_op(1, 3, False)],
        [_op(1, 4, True)],
        [_op(1, 5, False)],
    ]
    state = None
    for b in batches:
        state = _spark_apply(spark, state, b)
    assert _collect(state) == [(1, "v5", 5)]
    for b in batches:  # replay every batch against the final state
        state = _spark_apply(spark, state, b)
        assert _collect(state) == [(1, "v5", 5)]


def test_delete_majority_single_batch_heavy(spark):
    """A 90%-delete batch over 30 keys: only keys whose newest op is an
    upsert survive; every delete of absent state is a no-op."""
    ops = [_op(1 + i % 30, i + 1, i % 10 != 7) for i in range(60)]
    _run_invariants(spark, ops, cuts=[10, 30, 50])
