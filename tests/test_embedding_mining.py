"""Third-implementation (numpy) replicas for qx84 hard-negative mining
and qx85 product quantization at sf0.001 — independent of both Spark and
the DuckDB oracle, pinning the fixed-point geometry end-to-end.
"""

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _fixed(spark):
    from kafka2delta_spark.functions.clustering import SCALE
    from kafka2delta_spark.sources.tables import load_table

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    x = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * SCALE
    ).astype(np.int64)
    return ids, labels, x


def test_hard_negatives_match_numpy(spark):
    from kafka2delta_spark.functions.similarity import (
        HARDNEG_MOD,
        qx84_hard_negative_mining,
    )

    ids, labels, x = _fixed(spark)
    out = {r["vec_id"]: r for r in qx84_hard_negative_mining(spark, SF_DIR).collect()}
    anchors = ids[ids % HARDNEG_MOD == 0]
    assert set(out) == set(anchors.tolist())
    for aid in anchors:
        ai = np.where(ids == aid)[0][0]
        d2 = ((x - x[ai]) ** 2).sum(axis=1)
        same = (labels == labels[ai]) & (ids != aid)
        diff = labels != labels[ai]
        # farthest positive, tie-break smallest nid
        pmax = d2[same].max()
        pos_id = ids[same][d2[same] == pmax].min()
        nmin = d2[diff].min()
        neg_id = ids[diff][d2[diff] == nmin].min()
        r = out[aid]
        assert (r["pos_id"], r["d_pos"]) == (pos_id, pmax)
        assert (r["neg_id"], r["d_neg"]) == (neg_id, nmin)
        assert r["margin"] == nmin - pmax
        assert r["is_violation"] == (nmin <= pmax)


def _lloyd_np(ids, x, seeds, n_iters=2):
    cents = {s: x[np.where(ids == s)[0][0]].copy() for s in seeds}
    order = sorted(cents)
    for _ in range(n_iters - 1):
        c = np.stack([cents[s] for s in order])
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin picks first (smallest cid) on ties
        new = {}
        for j, s in enumerate(order):
            members = x[assign == j]
            if len(members):
                new[s] = np.floor(
                    members.sum(axis=0) / len(members)
                ).astype(np.int64)
            else:
                new[s] = cents[s]
        cents = new
    return np.stack([cents[s] for s in order]), order


def test_pq_encode_matches_numpy(spark):
    from kafka2delta_spark.functions.clustering import (
        K_SEEDS,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        qx85_pq_codebook_encode,
    )

    ids, _, x = _fixed(spark)
    out = {r["vec_id"]: r for r in qx85_pq_codebook_encode(spark, SF_DIR).collect()}
    assert set(out) == set(ids.tolist())
    total_err = {i: 0 for i in ids.tolist()}
    for s in range(PQ_SUBSPACES):
        xs = x[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
        cents, order = _lloyd_np(ids, xs, K_SEEDS)
        d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for i, vid in enumerate(ids.tolist()):
            assert out[vid][f"code{s}"] == order[assign[i]]
            total_err[vid] += int(d[i, assign[i]])
    for vid, err in total_err.items():
        assert out[vid]["recon_err"] == err


def test_ivfpq_adc_triangle_bound(spark):
    """ADC approximates d(q, y) by d(q, y_hat) with ||y - y_hat||^2 =
    qx85's recon_err; the triangle inequality bounds the true distance:
    |sqrt(exact) - sqrt(adc)| <= sqrt(recon_err(candidate)). Also pins
    ranking (rk follows adc_dist, tiebreak nid) and the self-exclusion."""
    import math

    from kafka2delta_spark.functions.clustering import (
        IVFPQ_TOP_K,
        qx85_pq_codebook_encode,
        qx94_ivfpq_adc_search,
    )

    recon = {
        r["vec_id"]: r["recon_err"]
        for r in qx85_pq_codebook_encode(spark, SF_DIR).collect()
    }
    rows = qx94_ivfpq_adc_search(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert len(rs) <= IVFPQ_TOP_K
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a["adc_dist"], a["nid"]) < (b["adc_dist"], b["nid"])
        for r in rs:
            assert r["nid"] != qid
            gap = abs(
                math.sqrt(r["exact_dist"]) - math.sqrt(r["adc_dist"])
            )
            assert gap <= math.sqrt(recon[r["nid"]]) + 1e-6
