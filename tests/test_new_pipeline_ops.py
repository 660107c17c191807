"""Invariant tests for q75 (global row index), q76 (k-means), q78
(chunking) — properties the oracle hash can't see: the index is a
permutation, k-means assignments are genuinely nearest-centroid, chunks
reconstruct the document.
"""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_global_row_index_is_dense_permutation(spark):
    from kafka2delta_spark.functions.pipeline import (
        N_SHARDS,
        q75_global_row_index,
    )

    rows = q75_global_row_index(spark, SF_DIR).collect()
    n = len(rows)
    idxs = sorted(r["global_idx"] for r in rows)
    assert idxs == list(range(n)), "index must be dense 0..n-1"
    # order-preserving: doc_id order == index order
    by_idx = sorted(rows, key=lambda r: r["global_idx"])
    doc_ids = [r["doc_id"] for r in by_idx]
    assert doc_ids == sorted(doc_ids)
    # round-robin shards balance to within one row
    sizes = [sum(1 for r in rows if r["shard_id"] == s) for s in range(N_SHARDS)]
    assert max(sizes) - min(sizes) <= 1


def test_kmeans_assignments_are_nearest_centroid(spark):
    """Recompute the final centroids from the returned assignment and
    verify every vector's cluster is its argmin centroid (ties -> smallest
    cid) — i.e. the operator really ran Lloyd assignment, not a relabel."""
    from kafka2delta_spark.functions.clustering import (
        K_SEEDS,
        SCALE,
        q76_kmeans_lloyd,
    )
    from kafka2delta_spark.sources.tables import load_table

    out = {r["vec_id"]: r for r in q76_kmeans_lloyd(spark, SF_DIR).collect()}
    emb = {
        r["vec_id"]: [math.floor(x * SCALE) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
        .collect()
    }
    assert set(out) == set(emb)

    # rebuild the iteration-1 centroids exactly as the operator defines
    # them: assign to seeds, then integer-mean per cluster
    seeds = {s: emb[s] for s in K_SEEDS if s in emb}

    def sqdist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(centroids):
        res = {}
        for vid, v in emb.items():
            best = min(centroids, key=lambda c: (sqdist(v, centroids[c]), c))
            res[vid] = best
        return res

    a1 = assign(seeds)
    c1 = {}
    for cid in set(a1.values()):
        members = [emb[v] for v, c in a1.items() if c == cid]
        c1[cid] = [
            math.floor(sum(dims) / len(members)) for dims in zip(*members)
        ]
    a2 = assign(c1)
    for vid, r in out.items():
        assert r["cluster"] == a2[vid], f"vec {vid} not nearest-centroid"
        assert r["sq_dist"] == sqdist(emb[vid], c1[a2[vid]])


def test_chunks_reconstruct_documents(spark):
    from kafka2delta_spark.functions.pipeline import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q78_doc_chunking,
    )
    from kafka2delta_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
        if len(r["text"]) > 0
    }
    chunks = q78_doc_chunking(spark, SF_DIR).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, text in docs.items():
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        n = len(text)
        assert len(rows) == math.ceil(n / CHUNK_STRIDE)
        for i, r in enumerate(rows):
            assert r["chunk_start"] == i * CHUNK_STRIDE
            expect = text[r["chunk_start"] : r["chunk_start"] + CHUNK_SIZE]
            assert r["chunk_len"] == len(expect)
        # strides < size -> consecutive chunks overlap; full coverage
        last = rows[-1]
        assert last["chunk_start"] + last["chunk_len"] == n
