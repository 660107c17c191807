"""Connected-components label propagation (q98's core).

Pairwise dedup alone is wrong under transitivity: A~B and B~C make
{A, B, C} one duplicate group even when A!~C. These tests pin the exact
component semantics on graphs that exercise the loop's edge cases:
chains (diameter > 1 round), cycles (would loop forever without the
fixpoint check), singletons (must survive as their own cluster), and
an empty edge set (fixpoint at round one).
"""

from pyspark.sql import functions as F

from kafka2delta_spark.functions.dedup import connected_components


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(
        edge_pairs or [], "doc_a long, doc_b long"
    )
    got = connected_components(nodes, edges).collect()
    return {r["node"]: r["label"] for r in got}


def test_chain_clusters_transitively(spark):
    # 0-1, 1-2, 2-3: one component even though 0 and 3 never pair directly
    labels = _cc(spark, range(4), [(0, 1), (1, 2), (2, 3)])
    assert labels == {0: 0, 1: 0, 2: 0, 3: 0}


def test_cycle_terminates_and_clusters(spark):
    labels = _cc(spark, range(3), [(0, 1), (1, 2), (2, 0)])
    assert labels == {0: 0, 1: 0, 2: 0}


def test_singletons_and_reverse_orientation(spark):
    # edge given high-to-low (5, 4); 9 has no edges
    labels = _cc(spark, [4, 5, 9], [(5, 4)])
    assert labels == {4: 4, 5: 4, 9: 9}


def test_empty_edges_every_node_is_own_cluster(spark):
    labels = _cc(spark, [7, 8], [])
    assert labels == {7: 7, 8: 8}


def test_long_chain_needs_multiple_rounds(spark):
    # diameter 9: min label must walk the whole chain end to end
    n = 10
    labels = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert set(labels.values()) == {0}


# Property: on random graphs the distributed propagation must agree with a
# trivial driver-side union-find oracle.
from hypothesis import given, settings, strategies as st


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component
    return {x: min(y for y in range(n_nodes) if find(y) == find(x)) for x in range(n_nodes)}


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=24),
    data=st.data(),
)
def test_matches_union_find_on_random_graphs(spark, n, data):
    edge = st.tuples(
        st.integers(min_value=0, max_value=n - 1),
        st.integers(min_value=0, max_value=n - 1),
    )
    pairs = data.draw(st.lists(edge, max_size=30))
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc(spark, range(n), pairs)
    assert got == _union_find(n, pairs)


# -- two-phase (large-star/small-star) equivalence + chain scaling --------


def _labels(df):
    return sorted(map(tuple, df.collect()))


def test_twophase_matches_label_propagation_random(spark):
    """Both algorithms produce label = component min; equivalence over
    random graphs is the safety net for the star-contraction rewiring."""
    import random

    from kafka2delta_spark.functions.dedup import (
        connected_components,
        connected_components_twophase,
    )

    rng = random.Random(7)
    n = 60
    for trial in range(3):
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 40))
            }
        )
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges = spark.createDataFrame(
            [(a, b) for a, b in pairs], "doc_a long, doc_b long"
        )
        lp = _labels(connected_components(nodes, edges))
        tp = _labels(connected_components_twophase(nodes, edges))
        assert lp == tp, f"trial {trial}: {pairs}"


def test_twophase_handles_chain_beyond_lp_cap(spark):
    """A 64-node path has diameter 63: label propagation's 20-round cap
    raises (documented contract), while two-phase contracts it in
    O(log n) rounds — the exact adversarial case the docstrings defer
    to the star algorithm."""
    import pytest as _pytest

    from kafka2delta_spark.functions.dedup import (
        connected_components,
        connected_components_twophase,
    )

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(nodes, chain)
    out = _labels(connected_components_twophase(nodes, chain))
    assert out == [(i, 0) for i in range(n)]  # one component, min label 0
