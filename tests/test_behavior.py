"""Brute-force invariant tests for the round-6 behavioral operators
(operators/behavior.py) at sf0.001: streak structure (qx81), the
interval-sweep concurrency maximum (qx82), Markov eval accounting
(qx86), seasonal triage shape (qx89), and entropy bounds (qx90).
"""

import math
from collections import Counter, defaultdict
from datetime import timedelta

SF_DIR = "/root/testdata/sf0.001"

GAP_US = 30 * 60 * 1_000_000


def _events(spark):
    from kafka2delta_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events").collect()


def test_streaks_match_bruteforce(spark):
    from kafka2delta_spark.operators.behavior import qx81_activity_streaks

    by_user = defaultdict(set)
    for r in _events(spark):
        by_user[r["user_id"]].add(r["ts"].date())
    out = {r["user_id"]: r for r in qx81_activity_streaks(spark, SF_DIR).collect()}
    assert set(out) == set(by_user)
    for uid, days in by_user.items():
        ds = sorted(days)
        streaks = []
        start = prev = ds[0]
        for d in ds[1:]:
            if (d - prev).days == 1:
                prev = d
            else:
                streaks.append((start, (prev - start).days + 1))
                start = prev = d
        streaks.append((start, (prev - start).days + 1))
        r = out[uid]
        assert r["n_active_days"] == len(ds)
        assert r["n_streaks"] == len(streaks)
        longest = max(s[1] for s in streaks)
        assert r["longest_streak"] == longest
        want_start = min(s[0] for s in streaks if s[1] == longest)
        assert r["longest_start"] == want_start.strftime("%Y-%m-%d")


def _sessions(rows):
    """Replay the 30-min gap rule in Python -> [(s_us, e_us)]."""
    by_user = defaultdict(list)
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        by_user[r["user_id"]].append((us, r["event_id"]))
    out = []
    for evs in by_user.values():
        evs.sort()
        s = e = evs[0][0]
        for us, _ in evs[1:]:
            if us - e > GAP_US:
                out.append((s, e))
                s = us
            e = us
        out.append((s, e))
    return out


def test_concurrency_matches_sweep_replay(spark):
    from kafka2delta_spark.operators.behavior import qx82_concurrent_sessions

    ivs = _sessions(_events(spark))
    # python sweep: per day, max of the step function over netted deltas
    per_day = defaultdict(Counter)  # day -> {us: net}
    n_segs = Counter()
    day_us = 86_400_000_000
    for s, e in ivs:
        d0, d1 = s // day_us, e // day_us
        for d in range(d0, d1 + 1):
            a, b = max(s, d * day_us), min(e, d * day_us + day_us - 1)
            per_day[d][a] += 1
            if b + 1 <= d * day_us + day_us - 1:
                per_day[d][b + 1] -= 1
            n_segs[d] += 1
    from datetime import date

    out = {r["day"]: r for r in qx82_concurrent_sessions(spark, SF_DIR).collect()}
    assert len(out) == len(per_day)
    for d, deltas in per_day.items():
        day_str = (date(1970, 1, 1) + timedelta(days=d)).strftime("%Y-%m-%d")
        run = best = 0
        for us in sorted(deltas):
            run += deltas[us]
            best = max(best, run)
        assert out[day_str]["peak_concurrency"] == best
        assert out[day_str]["n_sessions"] == n_segs[d]


def test_markov_eval_accounting(spark):
    from kafka2delta_spark.operators.behavior import qx86_markov_prediction_eval

    rows = _events(spark)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    out = {r["from_type"]: r for r in qx86_markov_prediction_eval(spark, SF_DIR).collect()}
    froms = {a for a, _ in trans}
    assert set(out) == froms
    for a in froms:
        tos = {b: n for (x, b), n in trans.items() if x == a}
        pred = min(sorted(tos), key=lambda b: (-tos[b], b))
        r = out[a]
        assert r["predicted"] == pred
        assert r["n_total"] == sum(tos.values())
        assert r["n_hits"] == tos[pred]
        assert r["hit_rate_e4"] == tos[pred] * 10000 // sum(tos.values())
    # the predictor must beat (or equal) the marginal-mode baseline
    total = sum(trans.values())
    hits = sum(out[a]["n_hits"] for a in froms)
    marginal = Counter()
    for (_, b), n in trans.items():
        marginal[b] += n
    assert hits >= max(marginal.values()) or total == 0


def test_seasonal_triage_shape(spark):
    from kafka2delta_spark.operators.behavior import (
        SEASONAL_TOP_K,
        qx89_seasonal_anomaly_days,
    )

    rows = qx89_seasonal_anomaly_days(spark, SF_DIR).collect()
    per = defaultdict(list)
    for r in rows:
        per[(r["event_type"], r["direction"])].append(r)
    for (t, d), rs in per.items():
        assert len(rs) <= SEASONAL_TOP_K
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))
        # high triage rows must not rank below low ones of the same type
        if d == "high":
            his = [r["ratio_e4"] for r in rs]
            los = [r["ratio_e4"] for r in per.get((t, "low"), [])]
            if los:
                assert min(his) >= max(los)


def test_entropy_bounds_and_exact_small_case(spark):
    from kafka2delta_spark.operators.behavior import qx90_user_type_entropy

    rows = qx90_user_type_entropy(spark, SF_DIR).collect()
    counts = defaultdict(Counter)
    for r in _events(spark):
        counts[r["user_id"]][r["event_type"]] += 1
    assert {r["user_id"] for r in rows} == set(counts)
    for r in rows:
        ks = counts[r["user_id"]]
        n = sum(ks.values())
        assert r["n_events"] == n
        assert r["n_types"] == len(ks)
        want = math.log(n) - sum(k * math.log(k) for k in ks.values()) / n
        assert abs(r["entropy"] - want) < 5e-4
        assert -1e-9 <= r["entropy"] <= math.log(len(ks)) + 1e-9
