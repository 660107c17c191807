#!/usr/bin/env python
"""Duplicated-subtree audit: count parquet scans per source table in every
batch query's physical plan (guide §7.2 — "duplicated subtrees"). A query
that scans the same parquet location N times usually re-plans a shared
intermediate N times; each extra scan is a full pass over the fact table
at 100 TB. Prints queries with any location scanned more than once, plus
RDD-scan counts (checkpoint consumers, cheap) for context.

Usage: python tools/audit_scan_dups.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from kafka2delta_spark.queryset import QUERIES, load_all_querysets
from kafka2delta_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])

_STREAM_MODULES = ("streaming.drain", "streaming.stream", "streaming.incremental",
                   "streaming.stateful", "streaming.lifetime")


def main() -> None:
    load_all_querysets()
    spark = build_session("scan_audit", master="local[4]", shuffle_partitions=4)
    for name in sorted(QUERIES):
        if ONLY and name not in ONLY:
            continue
        fn = QUERIES[name]
        mod = getattr(fn, "__module__", "") or ""
        if any(m in mod for m in _STREAM_MODULES):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        locs = Counter(
            m.group(1).rsplit("/", 1)[-1]
            for m in re.finditer(r"Location: InMemoryFileIndex \[file:([^\]]+)\]", plan)
        )
        rdd = len(re.findall(r"Scan ExistingRDD", plan))
        dups = {t: c for t, c in locs.items() if c > 1}
        if dups:
            print(f"{name}: DUP {dups} rdd={rdd}")
    spark.stop()


if __name__ == "__main__":
    main()
