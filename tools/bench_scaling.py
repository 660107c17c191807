#!/usr/bin/env python
"""Empirical scaling-linearity study: does each headline operator's cost
grow ~linearly in data volume, as the 100 TB design claims?

Builds key-shifted replications of a base scale directory (factor k
replicates every fact row k times with per-replica key offsets, so join
keys, users, docs, and vectors all get k x the DISTINCT cardinality too
— not just k x the rows behind the same keys), times a representative
query band at factors 1/2/4, and fits the per-query scaling exponent

    alpha = log(t4 / t1) / log 4

using the min of REPS interleaved runs per cell (min is the standard
noise-robust location estimator on a co-tenant host; the round-9
calibration experiment measured ~5x within-session wall-clock spread, so
single-shot timings are meaningless here). alpha ~ 1 = linear; the flag
uses the TAIL exponent (top factor segment, where per-query fixed cost
matters least) and only fires when the top point carries real work.

Replication notes (deliberate, documented):
  * documents/embeddings replicas carry IDENTICAL text/vectors under new
    ids — so dedup and LSH queries see k x the true duplicate clusters.
    The candidate caps (SHINGLE_DF_CAP / BAND_BUCKET_CAP) are exactly
    what must keep those queries ~linear; an uncapped pair expansion
    would show up as alpha ~ 2 here.
  * events keep their timestamps — the time span is constant while
    volume grows, matching how a real corpus densifies. Grid-dominated
    ops (q47's resample) should show alpha < 1 (fixed grid + linear
    scan).
  * q90_cosine_topk_bruteforce broadcasts a FIXED query set (vec_id <
    N_QUERIES) against the linearly-scanned corpus, so O(n_q x corpus)
    degenerates to linear-in-corpus by construction; its inclusion pins
    that the broadcast side really is fixed (a corpus-proportional
    broadcast would read as alpha > 1 here and as an OOM at 100 TB).

Usage:
    python tools/bench_scaling.py [--src /root/testdata/sf0.1]
        [--factors 1,2,4] [--reps 3] [--out /root/repo/SCALING.json]
        [query ...]

Ratchet mode (round-12 verdict item 4 — the one-shot study becomes a
regression gate):

    # pin the current exponents (after a believed-good run)
    python tools/bench_scaling.py --factors 1,8 --write-pin
    # per-round: re-measure and FAIL (exit 1) on exponent regressions
    python tools/bench_scaling.py --factors 1,8 \
        --assert-against SCALING_PIN.json

``--assert-against`` compares each query's tail exponent to the pinned
value + ``--margin`` (default 0.25 — wider than the verdict's nominal
0.1 because the round-11 noise study measured interval-separated
same-code swings on this co-tenant host; exponents of minima are
steadier than raw times but not 0.1-steady) and ignores queries whose
top-factor time is under the 2 s real-work floor (fixed-cost-dominated
exponents are noise). A future quadratic regression (the q78/qx21
class) fails THIS gate instead of waiting for the next ad-hoc study;
tests/test_scaling_pin.py keeps the pin file itself honest.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_ROOT = "/tmp/scaling"
FLAG_ALPHA = 1.30  # super-linear threshold on the floor-adjusted exponent

# Representative band: one heavy query per operator family, plus the two
# by-design-quadratic/sub-linear controls (q90, q47).
DEFAULT_QUERIES = [
    "q01_pricing_summary",        # full-scan agg (TPC-H Q1)
    "q03_shipping_priority",      # 3-way join + agg + top-k
    "q09_product_profit",         # 6-way join
    "q18_large_orders",           # agg-filtered join
    "q26_distinct_counts",        # distinct shuffle
    "q29_trailing_hour_frame",    # range-frame window
    "q31_topk_orders_per_priority",  # per-group top-k
    "q34_event_gaps",             # lag window over events
    "q47_resample_ffill",         # fixed time grid control (alpha < 1)
    "q62_salted_heavy_hitters",   # skew-salted agg
    "q70_latest_event_per_user",  # CDC latest-per-key dedup
    "q73_pii_redaction",          # regex-heavy text scan
    "q78_doc_chunking",           # block chunker + explode
    "q82_token_counting",         # tokenizer scan
    "q85_exact_dedup",            # hash-group dedup
    "q86_minhash_lsh_pairs",      # banded LSH (caps must hold alpha ~ 1)
    "q90_cosine_topk_bruteforce", # quadratic-by-design control
    "q91_ann_lsh_topk",           # bucketed ANN (the scale path)
    "qx01_bm25_retrieval",        # term-stats retrieval
    "qx34_source_coduplication",  # capped pair stats
    "qx40_inverted_index",        # posting-list build
]

FACT_OFFSETS = {
    # table -> [(column, maxof_table)]; each replica i adds
    # i * (max(maxof_table_key) + 1) so cross-replica keys never collide
    # and referential integrity holds within a replica.
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [("l_orderkey", "orders"), ("l_partkey", "part"),
                 ("l_suppkey", "supplier")],
    # user_id is an FK into customer (qx12's enrichment join), so it
    # shifts by the CUSTOMER stride to stay referentially intact
    "events": [("event_id", "events"), ("user_id", "customer")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

KEY_MAX_SQL = {
    "customer": "SELECT max(c_custkey) FROM customer_src",
    "supplier": "SELECT max(s_suppkey) FROM supplier_src",
    "part": "SELECT max(p_partkey) FROM part_src",
    "orders": "SELECT max(o_orderkey) FROM orders_src",
    "events": "SELECT max(event_id) FROM events_src",
    "documents": "SELECT max(doc_id) FROM documents_src",
    "embeddings": "SELECT max(vec_id) FROM embeddings_src",
}


def build_scaled(src: str, dst: str, factor: int) -> str:
    """Replicate every fact table `factor` x with shifted keys; the fixed
    dims (region/nation) copy through. Deterministic."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t}_src AS "
            f"SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {t}_src) TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    strides = {
        k: con.execute(sql).fetchone()[0] + 1 for k, sql in KEY_MAX_SQL.items()
    }
    for t, offs in FACT_OFFSETS.items():
        repl = ", ".join(
            f"CAST({col} + i * {strides[ref]} AS BIGINT) AS {col}"
            for col, ref in offs
        )
        con.execute(f"""
        COPY (
          SELECT t.* REPLACE ({repl})
          FROM {t}_src t CROSS JOIN range({factor}) r(i)
        ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument("--factors", default="1,8,64")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/root/repo/SCALING.json")
    ap.add_argument("--write-pin", action="store_true",
                    help="write per-query exponent pins to --pin-file")
    ap.add_argument("--assert-against", metavar="PIN_JSON", default=None,
                    help="fail (exit 1) if any query's tail exponent "
                         "exceeds its pinned value + --margin")
    ap.add_argument("--pin-file", default="/root/repo/SCALING_PIN.json")
    ap.add_argument("--margin", type=float, default=0.25)
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    names = args.queries or DEFAULT_QUERIES

    from kafka2delta_spark.queryset import QUERIES, load_all_querysets
    from kafka2delta_spark.session import build_session

    load_all_querysets()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    dirs = {}
    for k in factors:
        d = os.path.join(DEFAULT_ROOT, f"x{k}")
        marker = os.path.join(d, ".built_from")
        if not (os.path.exists(marker)
                and open(marker).read().strip() == args.src):
            print(f"building x{k} from {args.src} ...", flush=True)
            build_scaled(args.src, d, k)
            with open(marker, "w") as f:
                f.write(args.src)
        dirs[k] = d

    spark = build_session("bench_scaling")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def run(name: str, sf_dir: str) -> None:
        # full materialization through the noop sink (same as bench.py):
        # .count() would let Catalyst prune the expensive projections
        # and measure a different, much cheaper plan
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # warm the JVM/session once on the smallest factor
    run(names[0], dirs[factors[0]])

    times: dict[str, dict[int, list[float]]] = {
        n: {k: [] for k in factors} for n in names
    }
    # interleave reps outermost and factors innermost so co-tenant noise
    # decorrelates from both the query and the factor
    for rep in range(args.reps):
        for n in names:
            for k in factors:
                t0 = time.monotonic()
                run(n, dirs[k])
                dt = time.monotonic() - t0
                times[n][k].append(dt)
                print(f"rep{rep} {n} x{k}: {dt:.2f}s", flush=True)

    lo, hi = min(factors), max(factors)
    mid = sorted(factors)[1] if len(factors) > 2 else lo
    report = {}
    for n in names:
        best = {k: min(times[n][k]) for k in factors}
        alpha = math.log(best[hi] / best[lo]) / math.log(hi / lo)
        # tail exponent over the top segment (mid -> hi): at the largest
        # factors the per-query fixed cost (planning, session overhead)
        # matters least, so this is the exponent that predicts the 100x
        # scale-up. A floor-subtraction estimate was tried first and is
        # numerically fragile when noise makes t(mid) <= t(lo).
        alpha_tail = math.log(best[hi] / best[mid]) / math.log(hi / mid)
        # only flag when the top point carries real work — a sub-2 s
        # t(hi) is fixed-cost-dominated and its exponent is noise
        flagged = alpha_tail > FLAG_ALPHA and best[hi] > 2.0
        report[n] = {
            "best_sec": {str(k): round(best[k], 3) for k in factors},
            "all_sec": {
                str(k): [round(x, 3) for x in times[n][k]] for k in factors
            },
            "alpha": round(alpha, 3),
            "alpha_tail": round(alpha_tail, 3),
            "flag_superlinear": flagged,
        }
        mark = " **SUPER-LINEAR**" if flagged else ""
        print(f"{n}: t{lo}={best[lo]:.2f}s t{hi}={best[hi]:.2f}s "
              f"alpha={alpha:.2f} tail={alpha_tail:.2f}{mark}", flush=True)

    payload = {
        "src": args.src,
        "factors": factors,
        "reps": args.reps,
        "flag_alpha": FLAG_ALPHA,
        "queries": report,
        "superlinear": sorted(
            n for n, r in report.items() if r["flag_superlinear"]
        ),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")

    if args.write_pin:
        pin = {
            "src": args.src,
            "factors": factors,
            "margin": args.margin,
            "real_work_floor_sec": 2.0,
            "exponents": {
                n: report[n]["alpha_tail"] for n in names
            },
            "top_sec": {
                n: report[n]["best_sec"][str(hi)] for n in names
            },
        }
        with open(args.pin_file, "w") as f:
            json.dump(pin, f, indent=1)
        print(f"wrote pin {args.pin_file}")

    if args.assert_against:
        with open(args.assert_against) as f:
            pin = json.load(f)
        pinned = pin["exponents"]
        regressions = []
        for n in names:
            if n not in pinned:
                continue  # new query: no ratchet yet, pin it next run
            got = report[n]["alpha_tail"]
            if got > pinned[n] + args.margin and best_hi_real(report, n):
                regressions.append(
                    f"{n}: tail exponent {got:.3f} > pinned "
                    f"{pinned[n]:.3f} + {args.margin}"
                )
        if regressions:
            print("SCALING RATCHET FAILED:")
            for r in regressions:
                print("  " + r)
            return 1
        print(
            f"scaling ratchet OK: {len([n for n in names if n in pinned])} "
            f"queries within pinned exponent + {args.margin}"
        )
    return 0


def best_hi_real(report: dict, name: str, floor: float = 2.0) -> bool:
    """Real-work guard: exponents of fixed-cost-dominated cells (top
    factor under ``floor`` seconds) are noise, not signal."""
    best = report[name]["best_sec"]
    hi = max(best, key=lambda k: int(k))
    return best[hi] > floor


if __name__ == "__main__":
    raise SystemExit(main())
