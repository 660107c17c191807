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
