#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query (default: the top of the last bench): run the plan to
the noop sink N times (median + spread), count the Spark jobs/stages it
launches (scheduler overhead is a first-class cost at bench scale), and
write ``.explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python tools/profile_queries.py [--runs N] [--tag r12] [--suffix before]
                                    [--sf SF_DIR] query [query ...]

Prints one line per query:  <median>s  [min, max]  jobs=<n>  <name>
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from kafka2delta_spark.queryset import QUERIES, load_all_querysets
from kafka2delta_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    runs, tag, suffix, sf_dir = 3, "r12", "before", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    load_all_querysets()
    spark = build_session("profile")
    sc = spark.sparkContext
    plan_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(plan_dir, exist_ok=True)

    # warm the JVM + parquet footers (same as bench.py)
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        if name not in QUERIES:
            print(f"SKIP unknown {name}", flush=True)
            continue
        df = QUERIES[name](spark, sf_dir)
        if suffix != "none":
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        ts: list[float] = []
        jobs = 0
        for r in range(runs):
            group = f"prof_{name}_{r}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        med = statistics.median(ts)
        print(
            f"{med:7.2f}s  [{min(ts):6.2f}, {max(ts):6.2f}]  jobs={jobs:3d}  {name}",
            flush=True,
        )


if __name__ == "__main__":
    main()
