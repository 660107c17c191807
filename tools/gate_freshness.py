#!/usr/bin/env python
"""Compute per-query driver-row freshness from CORRECTNESS_r*.json.

The driver gate records 50 rows per round; once the union of driver-green
rows closed (round 8), the budget cycles oldest-first. This tool
mechanizes the rotation: it maps every registered query to the newest
round in which it had a driver-green row (rows+schema+hash where hashed)
and prints the staleness buckets, so the next round's alias block is a
copy-paste instead of an ad-hoc computation. Usage:

    python tools/gate_freshness.py [--keys N]   # N = suggest oldest N keys
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")


def newest_green_rounds(repo: str = "/root/repo") -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            key = re.sub(r"^a\d+_", "", name).split("_")[0]
            # "driver-green" = rows + schema + hash where hashed; a
            # rows-only row (hash_match None) whose schema drifted is NOT
            # green and must not defer the query from the next block
            ok = (
                row.get("rows_match")
                and row.get("schema_match") in (True, None)
                and row.get("hash_match") in (True, None)
            )
            if ok:
                newest[key] = max(newest.get(key, 0), rnd)
    return newest


def main() -> int:
    n_suggest = 0
    args = sys.argv[1:]
    if "--keys" in args:
        n_suggest = int(args[args.index("--keys") + 1])

    from kafka2delta_spark.queryset import QUERIES, load_all_querysets

    load_all_querysets()
    newest = newest_green_rounds()
    by_round: dict[int, list[str]] = {}
    for name in sorted(QUERIES):
        key = name.split("_")[0]
        by_round.setdefault(newest.get(key, 0), []).append(key)
    for rnd in sorted(by_round):
        keys = sorted(set(by_round[rnd]))
        print(f"r{rnd:02d}: {len(keys):3d}  {' '.join(keys)}")
    if n_suggest:
        ordered = [
            k
            for rnd in sorted(by_round)
            for k in sorted(set(by_round[rnd]))
        ]
        pick = ordered[:n_suggest]
        print(f"\noldest {n_suggest} keys for the next alias block:")
        print("{" + ", ".join(f'"{k}"' for k in pick) + "}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
