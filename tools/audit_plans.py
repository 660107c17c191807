#!/usr/bin/env python
"""Physical-plan audit over the registered batch queries.

For each query, renders the formatted plan and flags scale smells:

  * parquet scans with no pushed filters where the query filters a base
    column (pushdown lost);
  * sort-merge joins where one side is a dimension table (missed
    broadcast);
  * cartesian products;
  * scans reading every column of a wide table (pruning lost);
  * row-at-a-time PythonUDF nodes (should be Arrow/Pandas or native);
  * unpartitioned Window nodes (global sort into one task — top-k must
    be orderBy+limit, global ranks the two-pass q33 shape).

Streaming queries (q53+) execute on call, so they are skipped — their
plans are fixed by the streaming engine anyway. Usage:

    python tools/audit_plans.py [sf_dir] [query ...]

Known-justified flags (not bugs):
  * q13 smj-over-dim:nation — FULL OUTER join: broadcast-hash doesn't
    support full outer, so SMJ is the correct physical choice; the dim
    side is 25 rows, the sort is free.
  * q70 full-width-scan:events — latest-state-per-key intentionally
    returns the entire row (CDC semantics), so every column is live.
  * q28 smj-over-dim:supplier — heuristic misfire: the SMJ is the
    fact-fact join late⋈n_supp on l_orderkey (both derived from
    lineitem); the supplier scan the regex window catches belongs to a
    BroadcastHashJoin two nodes up. Verified by reading the plan.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

# queries that start a real streaming query (side effects) — plan at call time
STREAMING = {
    "q53_stream_tumbling_counts",
    "q54_stream_latest_state",
    "q55_stream_dedup_within_watermark",
    "q56_stream_stream_interval_join",
    "q57_stateful_sessionize",
}

WIDE_TABLES = {"lineitem": 11, "orders": 6, "events": 6}


def audit(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    if "SortMergeJoin" in plan:
        # SMJ is correct for fact-fact joins; flag only when a known dim
        # table feeds it directly (those should broadcast)
        for dim in ("region", "nation", "supplier", "part.parquet", "customer"):
            if re.search(rf"SortMergeJoin[\s\S]{{0,2000}}{dim}", plan):
                flags.append(f"smj-over-dim:{dim.split('.')[0]}")
                break
    for m in re.finditer(r"Location:.*?/(\w+)\.parquet", plan):
        table = m.group(1)
        if table in WIDE_TABLES:
            seg = plan[m.start() : m.start() + 600]
            rs = re.search(r"ReadSchema: struct<([^>]*)>", seg)
            if rs and rs.group(1).count(",") + 1 >= WIDE_TABLES[table]:
                flags.append(f"full-width-scan:{table}")
    if "BatchEvalPython" in plan:
        flags.append("row-python-udf")
    if _has_unbounded_single_partition_window(plan):
        flags.append("global-window")
    return flags


_BOUNDING = {"TakeOrderedAndProject", "CollectLimit", "GlobalLimit", "LocalLimit"}


def _has_unbounded_single_partition_window(plan: str) -> bool:
    """True when a Window node's subtree funnels through an
    Exchange-SinglePartition with no Limit/TakeOrdered bounding the rows
    first — i.e. the whole input sorts and ranks in ONE task. (A
    constant partitionBy folds away, so this is structural, not
    syntactic: detect via the tree + the numbered Arguments details.)"""
    lines = plan.splitlines()
    # numbered-detail section: node id -> first Arguments line
    args: dict[str, str] = {}
    cur = None
    for ln in lines:
        m = re.match(r"\((\d+)\) (\w+)", ln.strip())
        if m:
            cur = m.group(1)
        elif cur and ln.strip().startswith("Arguments:") and cur not in args:
            args[cur] = ln.strip()
    # tree section: ordered (name, id, depth)
    nodes = []
    for ln in lines:
        m = re.search(r"(\w[\w]*) \((\d+)\)\s*$", ln)
        if not m:
            continue
        nodes.append((m.group(1), m.group(2), ln.index(m.group(1))))
    for i, (name, _nid, depth) in enumerate(nodes):
        if name != "Window":
            continue
        # Walk ONLY the windowed-data input spine (pre-order: a node's
        # first child is the next line with greater depth). Side branches
        # — broadcast build sides, scalar-aggregate subqueries — funnel
        # through their own SinglePartition exchanges legitimately (a
        # 1-row count agg IS single-partition) and must not be charged
        # to the window; only the window's own input sorting in one task
        # is the smell.
        bounded, single = False, False
        cur = i
        while cur + 1 < len(nodes) and nodes[cur + 1][2] > nodes[cur][2]:
            cname, cid, _cd = nodes[cur + 1]
            if cname in _BOUNDING:
                bounded = True
            if cname == "Exchange":
                single = "SinglePartition" in args.get(cid, "")
                break  # first exchange on the spine decides partitioning
            cur += 1
        if single and not bounded:
            return True
    return False


def main() -> int:
    from kafka2delta_spark.queryset import QUERIES, load_all_querysets
    from kafka2delta_spark.session import build_session

    load_all_querysets()
    spark = build_session("audit_plans")
    n_flagged = 0
    for name, fn in sorted(QUERIES.items()):
        if ONLY and name not in ONLY:
            continue
        if name in STREAMING and not ONLY:
            print(f"SKIP  {name} (streaming)")
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_flagged += 1
            continue
        flags = audit(name, plan)
        if flags:
            n_flagged += 1
            print(f"FLAG  {name}: {', '.join(flags)}")
            if ONLY:
                print(plan)
        else:
            print(f"OK    {name}")
    print(f"\n{n_flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
