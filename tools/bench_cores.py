#!/usr/bin/env python
"""Core-scaling study at a larger SF (round-12 verdict item 7): time the
top-cost queries on a scale-up fixture under two core counts and report
the low/high-core wall ratio per query.

A ratio ~cores_hi/cores_lo means the query genuinely parallelizes; ~1
means overhead/serial-bound; <1 means it ANTI-scales with cores (the r12
streaming-family smell — per-trigger fixed cost growing with cluster
width). Each core count runs in its own subprocess so master/parallelism
are per-session, exactly like the driver's own low-core bench leg.

Usage:
    python tools/bench_cores.py --sf <dir> [--cores 8,32] [--runs 3]
        [--out SCALING_CORES.json] query [query ...]

The inner timing loop mirrors bench.py: noop sink, median of N runs,
one warm-up query per session.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

INNER = r"""
import json, os, statistics, sys, time
sys.path.insert(0, "/root/repo")
from kafka2delta_spark.queryset import QUERIES, load_all_querysets
from kafka2delta_spark.session import build_session

sf_dir = sys.argv[1]
runs = int(sys.argv[2])
names = sys.argv[3:]
load_all_querysets()
spark = build_session("bench_cores")
QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
    "overwrite").save()
out = {}
for name in names:
    ts = []
    try:
        for _ in range(runs):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            ts.append(time.time() - t0)
        out[name] = [round(statistics.median(ts), 3),
                     round(min(ts), 3), round(max(ts), 3)]
    except Exception as exc:  # noqa: BLE001
        out[name] = None
        print(f"error {name}: {exc}", file=sys.stderr)
print("CORES_JSON:" + json.dumps(out))
"""


def run_at(cores: int, sf_dir: str, runs: int, names: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    p = subprocess.run(
        [sys.executable, "-c", INNER, sf_dir, str(runs), *names],
        env=env, capture_output=True, text=True, check=False,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CORES_JSON:"):
            return json.loads(line[len("CORES_JSON:"):])
    raise RuntimeError(f"no result at {cores} cores: {p.stderr[-2000:]}")


def main() -> None:
    args = sys.argv[1:]
    sf_dir, cores, runs, out_path = None, "8,32", 3, "SCALING_CORES.json"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--cores":
            cores = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--out":
            out_path = args[i + 1]; i += 2
        else:
            names.append(a); i += 1
    lo, hi = (int(c) for c in cores.split(","))
    res = {c: run_at(c, sf_dir, runs, names) for c in (lo, hi)}
    payload = {
        "sf_dir": sf_dir, "cores_lo": lo, "cores_hi": hi, "runs": runs,
        "per_query": {},
    }
    for n in names:
        a, b = res[lo].get(n), res[hi].get(n)
        payload["per_query"][n] = {
            "lo_sec": a, "hi_sec": b,
            "speedup_hi_over_lo": round(a[0] / b[0], 2) if a and b else None,
        }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    for n, v in payload["per_query"].items():
        print(f"{v['speedup_hi_over_lo']}x  lo={v['lo_sec']}  hi={v['hi_sec']}  {n}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
