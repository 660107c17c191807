"""Engine-independent invariants for the round-7 third wave (qz11..qz17):
python third implementations over the real data plus closed-form
identities, on top of the DuckDB oracle gate."""

import math
from collections import Counter

from pyspark.sql import functions as F

from kafka2delta_spark.functions import robustats as rs
from kafka2delta_spark.functions.robustats import (
    EPOCH_BUDGET,
    TRIM_PCT,
    qz11_trimmed_winsorized_mean,
    qz12_ks_source_drift,
    qz13_langid_f1_report,
    qz14_spearman_length_quality,
    qz15_token_apportionment,
    qz16_kendall_retrieval_agreement,
    qz17_p99_interarrival,
)
from kafka2delta_spark.sources.tables import load_table


def _values_by_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    by = {}
    for r in ev.collect():
        by.setdefault(r.event_type, []).append(int(math.floor(r.value * 1000)))
    return by


def test_trimmed_winsorized_vs_python(spark, sf_dir):
    rows = {r.event_type: r for r in qz11_trimmed_winsorized_mean(spark, sf_dir).collect()}
    for et, vals in _values_by_type(spark, sf_dir).items():
        vals.sort()
        n = len(vals)
        g = n * TRIM_PCT // 100
        if n - 2 * g <= 0:
            assert et not in rows
            continue
        mid = vals[g : n - g]
        r = rows[et]
        assert r.n == n and r.n_trimmed_each == g
        assert r.trimmed_mean_milli == sum(mid) // len(mid)
        wins = sum(mid) + g * vals[g] + g * vals[n - g - 1]
        assert r.winsorized_mean_milli == wins // n
        assert r.raw_mean_milli == sum(vals) // n


def test_ks_vs_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    data = [(r.source, r.n_chars) for r in docs.collect()]
    rows = {r.source: r for r in qz12_ks_source_drift(spark, sf_dir).collect()}
    all_vals = sorted({v for _, v in data})
    for src in {s for s, _ in data}:
        a = sorted(v for s, v in data if s == src)
        b = sorted(v for s, v in data if s != src)
        na, nb = len(a), len(b)
        dnum = 0
        ia = ib = 0
        for v in all_vals:
            while ia < na and a[ia] <= v:
                ia += 1
            while ib < nb and b[ib] <= v:
                ib += 1
            dnum = max(dnum, abs(ia * nb - ib * na))
        r = rows[src]
        assert (r.n_source, r.n_rest) == (na, nb)
        assert r.d_num == dnum
        assert r.ks_e6 == dnum * 1_000_000 // (na * nb)
        assert 0 <= r.ks_e6 <= 1_000_000


def test_langid_f1_identities(spark, sf_dir):
    rows = qz13_langid_f1_report(spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    # every document is exactly one (true-class, maybe-correct) outcome
    assert sum(r.tp + r.fn for r in rows) == docs_n
    # predictions land on true classes only (the CASE emits known langs)
    assert sum(r.tp + r.fp for r in rows) == docs_n
    for r in rows:
        assert r.f1_e4 == (
            0
            if 2 * r.tp + r.fp + r.fn == 0
            else 2 * r.tp * 10_000 // (2 * r.tp + r.fp + r.fn)
        )
    macro = {r.macro_f1_e4 for r in rows}
    assert macro == {sum(r.f1_e4 for r in rows) // len(rows)}


def test_spearman_vs_python(spark, sf_dir):
    from kafka2delta_spark.functions.curation import quality_logits

    docs = load_table(spark, sf_dir, "documents")
    lg = {r.doc_id: r.logit_micro for r in quality_logits(docs).collect()}
    nc = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}

    def midrank2(vals):
        order = sorted(vals.items(), key=lambda kv: (kv[1], kv[0]))
        first = {}
        cnt = Counter(v for _, v in order)
        for i, (k, v) in enumerate(order, start=1):
            first.setdefault(v, i)
        return {k: 2 * first[v] + cnt[v] - 1 for k, v in vals.items()}

    rx, ry = midrank2(nc), midrank2(lg)
    n = len(rx)
    sx = sum(rx.values()); sy = sum(ry.values())
    sxx = sum(v * v for v in rx.values()); syy = sum(v * v for v in ry.values())
    sxy = sum(rx[k] * ry[k] for k in rx)
    cov = n * sxy - sx * sy
    rho = cov / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    row = qz14_spearman_length_quality(spark, sf_dir).collect()[0]
    assert row.n == n
    assert row.cov_num == cov
    assert abs(row.spearman_e6 - math.floor(rho * 1e6)) <= 1  # fp assoc slack
    assert -1_000_000 <= row.spearman_e6 <= 1_000_000


def test_apportionment_conservation(spark, sf_dir):
    rows = qz15_token_apportionment(spark, sf_dir).collect()
    assert sum(r.alloc_tokens for r in rows) == EPOCH_BUDGET
    for r in rows:
        assert r.remainder_seat in (0, 1)
        assert r.alloc_tokens in (r.floor_tokens, r.floor_tokens + 1)
    # monotone: more tokens never means a smaller floor quota
    by_tok = sorted(rows, key=lambda r: r.src_tokens)
    for a, b in zip(by_tok, by_tok[1:]):
        assert a.floor_tokens <= b.floor_tokens + 1


def test_kendall_bounds_and_pair_count(spark, sf_dir):
    from kafka2delta_spark.functions.corpuseval import qz06_rrf_hybrid_fusion

    union_n = qz06_rrf_hybrid_fusion(spark, sf_dir).count()
    row = qz16_kendall_retrieval_agreement(spark, sf_dir).collect()[0]
    assert row.n_pairs == union_n * (union_n - 1) // 2
    assert row.concordant + row.discordant <= row.n_pairs
    assert -1_000_000 <= row.tau_b_e6 <= 1_000_000


def test_p99_vs_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    gaps = {}
    by_user = {}
    for r in ev.collect():
        by_user.setdefault((r.user_id, r.event_type), []).append(
            (r.ts, r.event_id)
        )
    for (u, et), lst in by_user.items():
        lst.sort()
        for (t0, _), (t1, _) in zip(lst, lst[1:]):
            us0 = int(t0.timestamp() * 1_000_000)
            us1 = int(t1.timestamp() * 1_000_000)
            gaps.setdefault(et, []).append((us1 - us0) // 1_000_000)
    rows = {r.event_type: r for r in qz17_p99_interarrival(spark, sf_dir).collect()}
    for et, g in gaps.items():
        g.sort()
        n = len(g)
        k = 99 * (n - 1) // 100
        rem = 99 * (n - 1) % 100
        lo = g[k]
        hi = g[k + 1] if rem != 0 and k + 1 < n else lo
        r = rows[et]
        assert r.n_gaps == n
        assert r.max_gap_s == g[-1]
        assert r.p99_gap_cs == 100 * lo + rem * (hi - lo)


def test_cluster_debiased_sample_weights(spark, sf_dir):
    from kafka2delta_spark.functions.dedup import q98_neardup_clusters
    from kafka2delta_spark.functions.robustats import (
        DEBIAS_K,
        qz18_cluster_debiased_sample,
    )

    rows = qz18_cluster_debiased_sample(spark, sf_dir).collect()
    assert len(rows) == DEBIAS_K
    sizes = {
        r.doc_id: r.cluster_size
        for r in q98_neardup_clusters(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.cluster_size == sizes[r.doc_id]
        assert r.weight == 1_000_000 // r.cluster_size
    # ranking is by (key desc, doc_id): floor-e9 keys must be
    # non-increasing along rk up to equal-key doc_id tiebreaks
    by_rk = sorted(rows, key=lambda r: r.rk)
    for a, b in zip(by_rk, by_rk[1:]):
        assert a.key_e9 >= b.key_e9
    # debiasing pressure: the sample's mean cluster size must not exceed
    # the corpus mean (duplicated docs are downweighted, never upweighted)
    corpus_mean = sum(sizes.values()) / len(sizes)
    sample_mean = sum(r.cluster_size for r in rows) / len(rows)
    assert sample_mean <= corpus_mean + 1e-9
