"""Degree-ordered triangle enumeration: the hub guard must fire
structurally (a hub contributes zero wedges regardless of its id — the
shape the old id-ordered enumeration exploded on when the hub had the
smallest id), and counts must stay exact on known graphs.
"""

from pyspark.sql import functions as F

from kafka2delta_spark.operators.mining import (
    node_degrees,
    orient_by_degree,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    ).distinct()


def test_hub_with_smallest_id_emits_zero_wedges(spark):
    # star: center 0 (smallest id) + 50 leaves, plus one leaf-leaf edge
    # so the graph isn't degenerate. id-ordered enumeration would build
    # C(50, 2) = 1225 wedges at the hub; degree-ordering must orient
    # every star edge INTO the hub, leaving it zero out-degree.
    pairs = [(0, i) for i in range(1, 51)] + [(1, 2)]
    e = _edges(spark, pairs)
    d = orient_by_degree(e, node_degrees(e))
    hub_out = d.where(F.col("src") == 0).count()
    assert hub_out == 0
    # total wedge work = sum over src of C(outdeg, 2): with the guard the
    # only multi-out-degree nodes are the two leaves of the closing edge
    out = {r["src"]: r["n"] for r in d.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert sum(n * (n - 1) // 2 for n in out.values()) <= 2
    # and the one real triangle (0,1,2) is still found
    tri = {r["node"]: r["n_tri"] for r in triangle_counts(e, node_degrees(e)).collect()}
    assert tri == {0: 1, 1: 1, 2: 1}


def test_k4_counts(spark):
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    e = _edges(spark, pairs)
    tri = {r["node"]: r["n_tri"] for r in triangle_counts(e, node_degrees(e)).collect()}
    assert tri == {0: 3, 1: 3, 2: 3, 3: 3}  # K4: every vertex in C(3,2) triangles


def test_matches_naive_enumeration(spark):
    # pseudo-random graph, fixed seed-free construction
    pairs = {((i * 7) % 23, (i * 13 + 5) % 23) for i in range(90)}
    pairs = {(a, b) for a, b in pairs if a != b}
    e = _edges(spark, pairs)
    # naive: canonical (x<y<z) enumeration via three self-joins
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    naive_nodes = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    naive = {
        r["node"]: r["n"]
        for r in naive_nodes.groupBy("node").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(e, node_degrees(e)).collect()
    }
    assert got == naive
