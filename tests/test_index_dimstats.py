"""Brute-force invariant tests for qx40 (inverted index) and qx41
(embedding dimension statistics) at sf0.001.
"""

import math
import re
from collections import Counter, defaultdict

SF_DIR = "/root/testdata/sf0.001"


def test_inverted_index_reconstructs_corpus(spark):
    from kafka2delta_spark.functions.retrieval import qx40_inverted_index
    from kafka2delta_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].lower())
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    tf = Counter()
    postings = defaultdict(set)
    for doc_id, toks in docs.items():
        for t in toks:
            tf[t] += 1
            postings[t].add(doc_id)

    out = {r["term"]: r for r in qx40_inverted_index(spark, SF_DIR).collect()}
    assert set(out) == set(postings)
    for term, r in out.items():
        # postings are emitted as a numerically-sorted '|'-joined string
        # (driver-canonicalizable; see qx40's docstring)
        assert r["postings"] == "|".join(
            str(d) for d in sorted(postings[term])
        )
        assert r["df"] == len(postings[term])
        assert r["total_tf"] == tf[term]
    # the index is lossless at the doc level: every doc appears in the
    # posting list of each of its distinct terms
    assert sum(r["df"] for r in out.values()) == sum(
        len(set(t)) for t in docs.values()
    )


def test_embedding_dim_stats_match_bruteforce(spark):
    from kafka2delta_spark.functions.similarity import (
        DIMSTAT_SCALE,
        qx41_embedding_dim_stats,
    )
    from kafka2delta_spark.sources.tables import load_table

    vecs = [
        [math.floor(float(x) * DIMSTAT_SCALE) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    ]
    dims = len(vecs[0])
    out = {r["dim"]: r for r in qx41_embedding_dim_stats(spark, SF_DIR).collect()}
    assert set(out) == set(range(1, dims + 1))
    for d in range(1, dims + 1):
        col = [v[d - 1] for v in vecs]
        n, s, ss = len(col), sum(col), sum(x * x for x in col)
        r = out[d]
        assert r["n"] == n
        # div truncates toward zero in both engines
        q = abs(s) // n
        assert r["mean_e6"] == (q if s >= 0 else -q)
        assert int(r["m2_num"]) == n * ss - s * s
        assert int(r["m2_num"]) >= 0  # variance numerator is a sum of squares
        assert (r["min_e6"], r["max_e6"]) == (min(col), max(col))


def test_characteristic_terms_match_bruteforce(spark):
    import math as m
    from collections import Counter, defaultdict

    from kafka2delta_spark.functions.retrieval import (
        CHAR_TERMS_TOP_K,
        qx49_source_characteristic_terms,
    )
    from kafka2delta_spark.sources.tables import load_table

    tf = Counter()
    src_of = defaultdict(set)
    sources = set()
    for r in load_table(spark, SF_DIR, "documents").collect():
        sources.add(r["source"])
        for t in re.split(r"\s+", r["text"].lower()):
            tf[(r["source"], t)] += 1
            src_of[t].add(r["source"])
    n_src = len(sources)

    want = {}
    for s in sources:
        scored = [
            (t, tf[(s, t)], len(src_of[t]),
             tf[(s, t)] * m.log((n_src + 1.0) / (len(src_of[t]) + 0.5)))
            for t in {t for (ss, t) in tf if ss == s}
        ]
        scored.sort(key=lambda x: (-x[3], x[0]))
        for rk, (t, f, d, sc) in enumerate(scored[:CHAR_TERMS_TOP_K], 1):
            want[(s, rk)] = (t, f, d, sc)

    out = {
        (r["source"], r["rk"]): r
        for r in qx49_source_characteristic_terms(spark, SF_DIR).collect()
    }
    assert set(out) == set(want)
    for k, (t, f, d, sc) in want.items():
        r = out[k]
        assert (r["term"], r["tf"], r["df"]) == (t, f, d), k
        assert abs(r["tfidf"] - sc) < 5e-5


def test_robust_dispersion_matches_bruteforce(spark):
    import statistics

    from kafka2delta_spark.operators.analytic import qx50_robust_dispersion
    from kafka2delta_spark.sources.tables import load_table

    by_type = {}
    for r in load_table(spark, SF_DIR, "events").collect():
        by_type.setdefault(r["event_type"], []).append(
            math.floor(r["value"] * 1000)
        )
    out = {r["event_type"]: r for r in qx50_robust_dispersion(spark, SF_DIR).collect()}
    assert set(out) == set(by_type)
    for t, vals in by_type.items():
        r = out[t]
        med = statistics.median(vals)  # type-7 at 0.5 == (a+b)/2, exact
        adev = [abs(v - med) for v in vals]
        mad = statistics.median(adev)
        assert r["n"] == len(vals)
        assert r["median_v1000"] == med
        assert r["mad_v1000"] == mad
        assert r["n_beyond_3mad"] == sum(1 for a in adev if a > 3 * mad)
