"""Invariant tests for the mining operators (qx36 co-occurrence, qx37
triangles) — brute-force recomputation in plain Python, so the checks are
independent of both Spark's plan and the DuckDB oracle's SQL.
"""

from collections import Counter
from itertools import combinations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_brand_cooccurrence_matches_bruteforce(spark):
    from kafka2delta_spark.operators.mining import (
        PAIR_MIN_SUPPORT,
        qx36_brand_cooccurrence,
    )
    from kafka2delta_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    rows = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    pair_n = Counter()
    brand_n = Counter()
    for brands in baskets.values():
        for b in brands:
            brand_n[b] += 1
        for a, b in combinations(sorted(brands), 2):
            pair_n[(a, b)] += 1
    n_orders = len(baskets)

    out = {
        (r["brand_a"], r["brand_b"]): r
        for r in qx36_brand_cooccurrence(spark, SF_DIR).collect()
    }
    expected = {p: n for p, n in pair_n.items() if n >= PAIR_MIN_SUPPORT}
    assert set(out) == set(expected)
    for (a, b), r in out.items():
        assert a < b, "pairs must be canonically ordered"
        assert r["n_both"] == expected[(a, b)]
        assert r["n_a"] == brand_n[a] and r["n_b"] == brand_n[b]
        assert r["n_orders"] == n_orders
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        lift = r["n_both"] * n_orders / (brand_n[a] * brand_n[b])
        assert abs(r["lift"] - lift) < 5e-5


def test_neardup_triangles_match_bruteforce(spark):
    from kafka2delta_spark.functions.dedup import _jaccard_edges
    from kafka2delta_spark.operators.mining import qx37_neardup_triangles

    edges = {
        (r["doc_a"], r["doc_b"]) for r in _jaccard_edges(spark, SF_DIR).collect()
    }
    assert edges, "fixture graph must have edges"
    nbrs: dict[int, set] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri_n = Counter()
    for a, b in edges:
        for c in nbrs[a] & nbrs[b]:
            # each triangle counted once per edge x common-neighbor = for
            # node c exactly once per triangle it belongs to, over its 3
            # edge-pairs -> divide by nothing: (a,b) ordered pairs iterate
            # each triangle's 3 edges once, crediting the third vertex.
            tri_n[c] += 1

    out = {r["doc_id"]: r for r in qx37_neardup_triangles(spark, SF_DIR).collect()}
    assert set(out) == set(nbrs)
    for node, r in out.items():
        assert r["degree"] == len(nbrs[node])
        assert r["n_triangles"] == tri_n.get(node, 0)
        d = r["degree"]
        cc = 2.0 * tri_n.get(node, 0) / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(r["clustering_coeff"] - cc) < 5e-5
