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
