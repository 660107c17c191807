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
    # tree section: ordered (name, id, depth). The node NAME is the first
    # word after the tree-drawing prefix (a join line reads
    # "+- * BroadcastHashJoin Inner BuildLeft (5)" — taking the last word
    # would misname the node AND misplace its depth at the last word's
    # column, breaking every subtree walk under a binary node); depth is
    # the structural prefix length, which steps uniformly per level.
    nodes = []
    for ln in lines:
        m = re.match(
            r"^([ :+\-|]*)(\* )?(\w+)([^()]*)\((\d+)\)\s*$", ln
        )
        if not m:
            continue
        nodes.append((m.group(3), m.group(5), len(m.group(1))))
    def subtree_end(i: int) -> int:
        d = nodes[i][2]
        j = i + 1
        while j < len(nodes) and nodes[j][2] > d:
            j += 1
        return j

    def direct_children(i: int) -> list[int]:
        end = subtree_end(i)
        if i + 1 >= end:
            return []
        child_depth = min(nodes[j][2] for j in range(i + 1, end))
        return [j for j in range(i + 1, end) if nodes[j][2] == child_depth]

    def branch_feeds_single(i: int) -> bool:
        """Does the window-input branch rooted at nodes[i] funnel
        unbounded rows through a SinglePartition exchange?

        Walks EVERY data branch (a join's streamed AND build-probe
        sides, every union input) rather than only the first-printed
        child — a BuildLeft BroadcastHashJoin prints the build side
        first, so a first-child-only spine walk can descend the wrong
        branch and miss the smell. BroadcastExchange terminates a
        branch (build sides legitimately single-partition); the first
        shuffle Exchange on a branch decides that branch's
        partitioning; Limit/TakeOrdered bounds the branch."""
        name, nid, _d = nodes[i]
        if name in _BOUNDING:
            return False
        if name == "BroadcastExchange":
            return False
        if name in ("Exchange", "ReusedExchange"):
            return "SinglePartition" in args.get(nid, "")
        return any(branch_feeds_single(c) for c in direct_children(i))

    for i, (name, _nid, _depth) in enumerate(nodes):
        if name != "Window":
            continue
        if any(branch_feeds_single(c) for c in direct_children(i)):
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
