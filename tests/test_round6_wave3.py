"""qx95 calibration, qx96 inter-arrival histogram, qx97 split OOV —
brute-force replicas and structural invariants at sf0.001.
"""

from collections import Counter, defaultdict

SF_DIR = "/root/testdata/sf0.001"


def test_calibration_deciles_partition_docs(spark):
    from kafka2delta_spark.functions.curation import (
        qx95_quality_calibration,
        quality_logits,
    )
    from kafka2delta_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n = quality_logits(docs).count()
    rows = sorted(
        qx95_quality_calibration(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    assert sum(r["n_docs"] for r in rows) == n
    # decile sizes differ by at most 1 (exact rank deciles)
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # logit ranges are non-overlapping and ordered
    for a, b in zip(rows, rows[1:]):
        assert a["logit_lo"] <= a["logit_hi"] <= b["logit_lo"]
        assert a["logit_hi"] <= b["logit_hi"]
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_docs"]
        assert r["dup_rate_e4"] == r["n_dup"] * 10000 // r["n_docs"]


def test_interarrival_matches_python_replay(spark):
    from kafka2delta_spark.operators.behavior import (
        INTERARRIVAL_MAX_BUCKET,
        qx96_interarrival_histogram,
    )
    from kafka2delta_spark.sources.tables import load_table

    by_key = defaultdict(list)
    for r in load_table(spark, SF_DIR, "events").collect():
        us = int(r["ts"].timestamp() * 1_000_000)
        by_key[(r["user_id"], r["event_type"])].append((us, r["event_id"]))
    hist = defaultdict(Counter)  # event_type -> bucket -> count
    gaps = defaultdict(lambda: defaultdict(list))
    for (u, t), evs in by_key.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            g = (b - a) // 1_000_000
            if g < 1:
                k = 0
            else:
                k = g.bit_length()  # g in [2^(k-1), 2^k) -> bit_length = k
                k = min(k, INTERARRIVAL_MAX_BUCKET)
            hist[t][k] += 1
            gaps[t][k].append(g)
    out = {
        (r["event_type"], r["bucket"]): r
        for r in qx96_interarrival_histogram(spark, SF_DIR).collect()
    }
    want_keys = {(t, k) for t, ks in hist.items() for k in ks}
    assert set(out) == want_keys
    for (t, k), r in out.items():
        assert r["n"] == hist[t][k]
        assert r["min_gap_s"] == min(gaps[t][k])
        assert r["max_gap_s"] == max(gaps[t][k])
        tot = sum(hist[t].values())
        assert r["share_e4"] == hist[t][k] * 10000 // tot


def test_split_oov_matches_python_replay(spark):
    from kafka2delta_spark.functions.dedup import (
        qx06_leakage_safe_split,
        qx97_split_vocab_oov,
    )
    from kafka2delta_spark.sources.tables import load_table

    splits = {
        r["doc_id"]: r["split"]
        for r in qx06_leakage_safe_split(spark, SF_DIR).collect()
    }
    texts = {
        r["doc_id"]: r["text"].lower().split()
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    train_vocab = set()
    for d, toks in texts.items():
        if splits[d] == "train":
            train_vocab.update(toks)
    want = {}
    for split in ("val", "test"):
        toks = [t for d, ts in texts.items() if splits[d] == split for t in ts]
        if not toks:
            continue
        oov = [t for t in toks if t not in train_vocab]
        want[split] = (
            len(toks),
            len(oov),
            len(oov) * 10000 // len(toks),
            len(set(toks)),
            len(set(oov)),
        )
    got = {
        r["split"]: (
            r["n_tokens"],
            r["n_oov"],
            r["oov_rate_e4"],
            r["n_distinct"],
            r["n_distinct_oov"],
        )
        for r in qx97_split_vocab_oov(spark, SF_DIR).collect()
    }
    assert got == want


def test_acf_matches_numpy(spark):
    import numpy as np

    from kafka2delta_spark.operators.behavior import (
        ACF_LAGS,
        qx98_daily_count_acf,
    )
    from kafka2delta_spark.sources.tables import load_table

    from collections import Counter

    counts = Counter()
    days = set()
    types = set()
    for r in load_table(spark, SF_DIR, "events").collect():
        d = r["ts"].date()
        counts[(r["event_type"], d)] += 1
        days.add(d)
        types.add(r["event_type"])
    days = sorted(days)
    out = {
        (r["event_type"], r["lag"]): r
        for r in qx98_daily_count_acf(spark, SF_DIR).collect()
    }
    for t in types:
        # the query joins on day+lag, so verify via actual date
        # arithmetic (not positional lags over observed days)
        by_day = {d: counts.get((t, d), 0) for d in days}
        import datetime as dt

        for lag in ACF_LAGS:
            xs, ys = [], []
            for d in days:
                d2 = d + dt.timedelta(days=lag)
                if d2 in by_day:
                    xs.append(by_day[d])
                    ys.append(by_day[d2])
            if not xs:
                assert (t, lag) not in out
                continue
            r = out[(t, lag)]
            assert r["n_pairs"] == len(xs)
            x, y = np.array(xs, dtype=np.int64), np.array(ys, dtype=np.int64)
            k = len(x)
            num = k * (x * y).sum() - x.sum() * y.sum()
            assert r["cov_num"] == num
            dx = k * (x * x).sum() - x.sum() ** 2
            dy = k * (y * y).sum() - y.sum() ** 2
            if dx > 0 and dy > 0:
                want = num / (np.sqrt(dx) * np.sqrt(dy))
                assert abs(r["acf"] - want) < 5e-4
            else:
                assert r["acf"] is None
