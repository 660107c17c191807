"""Brute-force invariant tests for qx38 (rolling z-score anomalies) and
qx39 (first-touch session attribution) — plain-Python recomputation at
sf0.001, independent of Spark plans and the DuckDB oracle.
"""

import math
from collections import defaultdict

SF_DIR = "/root/testdata/sf0.001"


def _user_streams(spark):
    from kafka2delta_spark.sources.tables import load_table

    rows = load_table(spark, SF_DIR, "events").collect()
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append(
            (r["ts"], r["event_id"], math.floor(r["value"] * 1000), r["event_type"])
        )
    for s in streams.values():
        s.sort(key=lambda t: (t[0], t[1]))
    return streams


def test_zscore_anomalies_match_bruteforce(spark):
    from kafka2delta_spark.operators.analytic import (
        ANOM_MIN_N,
        ANOM_WINDOW,
        ANOM_Z2,
        qx38_rolling_zscore_anomalies,
    )

    expected = {}
    for uid, stream in _user_streams(spark).items():
        for i, (_, eid, v, _t) in enumerate(stream):
            win = [x[2] for x in stream[max(0, i - ANOM_WINDOW): i]]
            n = len(win)
            if n < ANOM_MIN_N:
                continue
            s, ss = sum(win), sum(x * x for x in win)
            if (n * v - s) ** 2 > ANOM_Z2 * (n * ss - s * s):
                expected[eid] = (uid, v, n, n * v - s)

    out = {r["event_id"]: r for r in qx38_rolling_zscore_anomalies(spark, SF_DIR).collect()}
    assert set(out) == set(expected)
    for eid, (uid, v, n, dev) in expected.items():
        r = out[eid]
        assert (r["user_id"], r["v1000"], r["n_window"], r["dev_num"]) == (uid, v, n, dev)
        assert r["direction"] == ("high" if dev > 0 else "low")


def test_session_attribution_matches_bruteforce(spark):
    from kafka2delta_spark.operators.analytic import (
        ATTR_GAP_MIN,
        qx39_session_attribution,
    )

    gap_us = ATTR_GAP_MIN * 60 * 1_000_000
    agg = defaultdict(lambda: [0, 0, set()])  # first_touch -> [n, rev, users]
    for uid, stream in _user_streams(spark).items():
        first_touch = None
        prev_us = None
        for ts, _eid, v, etype in stream:
            us = int(ts.timestamp() * 1_000_000)
            if prev_us is None or us - prev_us > gap_us:
                first_touch = etype
            prev_us = us
            if etype == "purchase":
                a = agg[first_touch]
                a[0] += 1
                a[1] += v
                a[2].add(uid)

    out = {r["first_touch"]: r for r in qx39_session_attribution(spark, SF_DIR).collect()}
    assert set(out) == set(agg)
    for ft, (n, rev, users) in agg.items():
        r = out[ft]
        assert (r["n_purchases"], r["revenue_1000"], r["n_users"]) == (n, rev, len(users))


def test_session_type_affinity_matches_bruteforce(spark):
    from collections import Counter

    from kafka2delta_spark.operators.analytic import (
        AFFINITY_MIN_SUPPORT,
        ATTR_GAP_MIN,
        qx48_session_type_affinity,
    )
    from itertools import combinations

    gap_us = ATTR_GAP_MIN * 60 * 1_000_000
    sessions = []
    for uid, stream in _user_streams(spark).items():
        prev_us, cur = None, None
        for ts, _eid, _v, etype in stream:
            us = int(ts.timestamp() * 1_000_000)
            if prev_us is None or us - prev_us > gap_us:
                cur = set()
                sessions.append(cur)
            prev_us = us
            cur.add(etype)

    type_n = Counter()
    pair_n = Counter()
    for types in sessions:
        for t in types:
            type_n[t] += 1
        for a, b in combinations(sorted(types), 2):
            pair_n[(a, b)] += 1
    n_sessions = len(sessions)

    out = {
        (r["type_a"], r["type_b"]): r
        for r in qx48_session_type_affinity(spark, SF_DIR).collect()
    }
    want = {p: n for p, n in pair_n.items() if n >= AFFINITY_MIN_SUPPORT}
    assert set(out) == set(want)
    for (a, b), r in out.items():
        assert r["n_both"] == want[(a, b)]
        assert (r["n_a"], r["n_b"]) == (type_n[a], type_n[b])
        assert r["n_sessions"] == n_sessions
        lift = r["n_both"] * n_sessions / (type_n[a] * type_n[b])
        assert abs(r["lift"] - lift) < 5e-5
