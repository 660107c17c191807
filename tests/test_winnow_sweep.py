"""Winnowing (qx80) and the dedup threshold sweep (qx87).

The winnowing test checks the SIGMOD'03 guarantee the operator's value
rests on: two documents sharing a token run of length >= w + k - 1 must
share at least one selected fingerprint. The sweep test checks the
monotone structure a threshold sweep must have (edge sets shrink as the
threshold rises, components can only split).
"""

from collections import defaultdict

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _winnow_local(toks, k=3, w=4):
    """Pure-python replica of winnow_fingerprints for one token list."""
    import hashlib

    if len(toks) < k + w - 1:
        return set()
    hs = []
    for i in range(len(toks) - k + 1):
        gram = " ".join(toks[i : i + k])
        hs.append(int(hashlib.md5(gram.encode()).hexdigest()[:13], 16))
    return {min(hs[i - w + 1 : i + 1]) for i in range(w - 1, len(hs))}


def test_fingerprints_match_python_replica(spark):
    from kafka2delta_spark.functions.winnow import winnow_fingerprints
    from kafka2delta_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    got = defaultdict(set)
    for r in winnow_fingerprints(spark, SF_DIR).collect():
        got[r["doc_id"]].add(r["fp"])
    want = {d: _winnow_local(t) for d, t in docs.items()}
    want = {d: s for d, s in want.items() if s}
    assert dict(got) == want


def test_shared_run_guarantee(spark):
    # two synthetic docs sharing a (w + k - 1)-token run must share >= 1
    # fingerprint regardless of their differing surroundings
    from kafka2delta_spark.functions.winnow import WINNOW_K, WINNOW_W

    run = ["shared%d" % i for i in range(WINNOW_W + WINNOW_K - 1)]
    a = ["alpha%d" % i for i in range(10)] + run + ["omega%d" % i for i in range(10)]
    b = ["beta%d" % i for i in range(7)] + run + ["zeta%d" % i for i in range(3)]
    fa, fb = _winnow_local(a), _winnow_local(b)
    assert fa & fb, "winnowing guarantee violated on shared run"


def test_threshold_sweep_monotone(spark):
    from kafka2delta_spark.functions.dedup import (
        THRESH_SWEEP_E3,
        qx87_dedup_threshold_sweep,
    )

    rows = {
        r["threshold_e3"]: r
        for r in qx87_dedup_threshold_sweep(spark, SF_DIR).collect()
    }
    assert set(rows) == set(THRESH_SWEEP_E3)
    ts = sorted(THRESH_SWEEP_E3)
    for lo, hi in zip(ts, ts[1:]):
        assert rows[hi]["n_edges"] <= rows[lo]["n_edges"]
        assert rows[hi]["n_linked_docs"] <= rows[lo]["n_linked_docs"]
        # raising the threshold can only split components
        assert rows[hi]["n_clusters"] >= rows[lo]["n_clusters"]
        assert rows[hi]["largest_cluster"] <= rows[lo]["largest_cluster"]
        assert rows[hi]["n_removed"] <= rows[lo]["n_removed"]
    from kafka2delta_spark.sources.tables import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    for r in rows.values():
        assert r["n_clusters"] + r["n_removed"] == n_docs
        assert r["yield_e4"] == r["n_clusters"] * 10000 // n_docs
        # removed docs are linked docs that lost the canonical race
        assert r["n_removed"] <= r["n_linked_docs"]
