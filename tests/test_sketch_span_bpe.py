"""Invariant tests for qx19 (KMV distinct sketch), qx20 (duplicated
spans), qx21 (BPE pair counts) — properties the oracle hash can't see:
the sketch's estimation error and merge property, and full brute-force
Python recomputation of spans/pairs with independent tokenization.
"""

import re
from collections import Counter, defaultdict

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from kafka2delta_spark.sources.tables import load_table

    return [
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF_DIR, "documents").collect()
    ]


def test_kmv_estimate_within_error_bound_and_exact_when_small(spark):
    from kafka2delta_spark.operators.advanced import KMV_K, qx19_kmv_distinct_sketch
    from kafka2delta_spark.sources.tables import load_table

    out = {r["scope"]: r for r in qx19_kmv_distinct_sketch(spark, SF_DIR).collect()}
    events = load_table(spark, SF_DIR, "events")
    true = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg({"user_id": "approx_count_distinct"})
        .toDF("event_type", "n")
        .collect()
    }
    # exact truth (collect distinct pairs; tiny at sf0.001)
    pairs = events.select("event_type", "user_id").distinct().collect()
    true = Counter(r["event_type"] for r in pairs)
    all_users = len({r["user_id"] for r in pairs})

    for scope, row in out.items():
        t = all_users if scope == "ALL" else true[scope]
        assert 1 <= row["sketch_size"] <= KMV_K
        if t < KMV_K:
            # sketch holds the whole distinct set -> exact
            assert row["est_distinct"] == t
        else:
            # KMV std error ~ 1/sqrt(K-2) = 12.7%; allow 4 sigma
            assert abs(row["est_distinct"] - t) / t < 0.51, (scope, row, t)


def test_kmv_merged_sketch_equals_direct_sketch(spark):
    """Merging per-type k-min sets must equal the sketch built from the
    global key space directly — the property that makes KMV a valid
    partial aggregate."""
    import hashlib

    from kafka2delta_spark.operators.advanced import (
        KMV_K,
        KMV_SPACE,
        qx19_kmv_distinct_sketch,
    )
    from kafka2delta_spark.sources.tables import load_table

    out = {r["scope"]: r for r in qx19_kmv_distinct_sketch(spark, SF_DIR).collect()}
    users = {
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    }
    hashes = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) for u in users
    )
    kmins = hashes[:KMV_K]
    if len(kmins) < KMV_K:
        expect = len(kmins)
    else:
        expect = (KMV_K - 1) * KMV_SPACE // kmins[-1]
    assert out["ALL"]["est_distinct"] == expect


def test_duplicated_spans_match_bruteforce(spark):
    from kafka2delta_spark.functions.dedup import SPAN_W, qx20_duplicated_spans

    docs = _docs(spark)
    doc_spans = {}
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.lower())
        if len(toks) < SPAN_W:
            continue
        doc_spans[doc_id] = {
            " ".join(toks[i : i + SPAN_W]) for i in range(len(toks) - SPAN_W + 1)
        }
    freq = Counter()
    for spans in doc_spans.values():
        freq.update(spans)
    expect = {}
    for doc_id, spans in doc_spans.items():
        dup = sum(1 for s in spans if freq[s] >= 2)
        expect[doc_id] = (len(spans), dup, round(dup / len(spans), 4))

    got = {
        r["doc_id"]: (r["n_unique_spans"], r["n_dup_spans"], round(r["dup_coverage"], 4))
        for r in qx20_duplicated_spans(spark, SF_DIR).collect()
    }
    assert got == expect
    # sanity: the fixture corpus actually exercises the dup path
    assert any(v[1] > 0 for v in expect.values())


def test_bpe_pair_counts_match_bruteforce(spark):
    from kafka2delta_spark.functions.text import BPE_TOP_PAIRS, qx21_bpe_pair_counts

    docs = _docs(spark)
    counts = Counter()
    for _, text in docs:
        for wd in re.split(r"\s+", text.lower()):
            for i in range(len(wd) - 1):
                counts[(wd[i], wd[i + 1])] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]

    got = [
        ((r["pair_left"], r["pair_right"]), r["n_occurrences"])
        for r in qx21_bpe_pair_counts(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_pagerank_matches_bruteforce_integer_iteration(spark):
    from kafka2delta_spark.functions.dedup import (
        PR_ITERS,
        PR_SCALE,
        q88_jaccard_similar_pairs,
        qx22_pagerank_centrality,
    )

    edges = [
        (r["doc_a"], r["doc_b"])
        for r in q88_jaccard_similar_pairs(spark, SF_DIR).collect()
    ]
    nodes = [d for d, _ in _docs(spark)]
    und = defaultdict(list)
    for a, b in edges:
        und[a].append(b)
        und[b].append(a)
    base = PR_SCALE // len(nodes)
    r = {n: base for n in nodes}
    for _ in range(PR_ITERS):
        inc = defaultdict(int)
        for a, outs in und.items():
            c = r[a] // len(outs)
            for b in outs:
                inc[b] += c
        r = {n: 15 * base // 100 + 85 * inc[n] // 100 for n in nodes}

    got = {
        row["doc_id"]: row["pr_score"]
        for row in qx22_pagerank_centrality(spark, SF_DIR).collect()
    }
    assert got == r
    # the fixture graph actually has hubs above the isolated-node floor
    floor = 15 * base // 100
    assert min(got.values()) == floor and max(got.values()) > floor
