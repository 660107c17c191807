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
    be orderBy+limit, global ranks the two-pass q33 shape);
  * FORCED broadcasts of fact-derived sides (analyzed logical plan): a
    ResolvedHint(broadcast) whose subtree scans a fact table (the wide
    tables plus documents/embeddings) with no cardinality reduction —
    bounded-key aggregation, semi-join, limit, or an id-range cap —
    between the scan and the hint. AQE auto-broadcasts genuinely small
    sides at runtime; a HINT is a promise the side stays under 8 GB at
    ANY scale, which a corpus-proportional side cannot keep (Spark
    hard-fails oversized broadcasts, so these die rather than degrade).

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


# ---------------------------------------------------------------------------
# Forced-broadcast detector — runs on the ANALYZED logical plan, where
# broadcast hints are still explicit ResolvedHint nodes and base relations
# carry their full column list (which identifies the table: the physical
# tree shows file paths, the logical tree shows schemas).
# ---------------------------------------------------------------------------

# marker column -> fact table (tables whose row count grows with the data;
# region/nation/supplier/part/customer follow the repo's dim convention)
FACT_MARKERS = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

# grouping keys that do NOT bound an aggregate's output cardinality:
# per-row ids, graph endpoints, fingerprints/shingles/terms (vocabulary
# grows with the corpus), and the SF-scaled TPC-H keys
UNBOUNDED_KEYS = {
    "doc_id", "doc_a", "doc_b", "vec_id", "event_id", "user_id",
    "node", "a", "b", "aid", "nid", "qid",
    "fp", "simhash", "fa", "fb", "shingle", "term", "token", "wd",
    "l_orderkey", "o_orderkey", "l_partkey", "p_partkey", "ps_partkey",
    "c_custkey", "o_custkey", "s_suppkey", "l_suppkey",
}

# Filter conditions that DO bound cardinality: an id-range cap against an
# integer literal (the q90 "vec_id < N_QUERIES" query-set idiom — at most
# N rows when the id is unique). A modulo sample (id % k = 0) does NOT
# qualify: it stays proportional to the corpus.
_ID_RANGE_CAP = re.compile(
    r"\b(?:doc_id|vec_id|user_id|event_id)#\d+L? <=? (?:\d+|cast\(\d+ as \w+\))"
)

_HINT_RE = re.compile(r"ResolvedHint \(strategy=broadcast")


def _tree_nodes(plan: str):
    """(indent, name, content) per line of a logical treeString."""
    out = []
    for ln in plan.splitlines():
        i = 0
        while i < len(ln) and ln[i] in " :+-":
            i += 1
        if i >= len(ln):
            continue
        content = ln[i:]
        name = content.split(" ", 1)[0].split("[", 1)[0].rstrip(",")
        out.append((i, name, content))
    return out


def _agg_keys_bounded(content: str) -> bool:
    """True when an ``Aggregate [keys], [aggs]`` groups only by
    bounded-cardinality keys (or by nothing — a scalar aggregate)."""
    m = re.match(r"Aggregate \[(.*?)\], \[", content)
    if not m:
        # single-bracket form = global aggregate (no grouping keys)
        return True
    keys = m.group(1)
    return not any(
        base in UNBOUNDED_KEYS for base in re.findall(r"(\w+)#\d+", keys)
    )


def _is_reduction(name: str, content: str) -> bool:
    if name == "Aggregate":
        return _agg_keys_bounded(content)
    if name == "Join" and ("LeftSemi" in content or "LeftAnti" in content):
        return True
    if name in ("GlobalLimit", "LocalLimit"):
        return True
    if name == "Filter" and _ID_RANGE_CAP.search(content):
        return True
    return False


def audit_forced_broadcast(analyzed: str) -> list[str]:
    """Flags ``forced-broadcast:<table>`` for every broadcast HINT whose
    subtree scans a fact table with no cardinality reduction between the
    scan and the hint. Session-checkpointed artifacts (LogicalRDD scans)
    terminate lineage, so hints over checkpointed pair/edge lists pass."""
    nodes = _tree_nodes(analyzed)
    flags: list[str] = []
    for hi, (hindent, hname, hcontent) in enumerate(nodes):
        if not (hname == "ResolvedHint" and _HINT_RE.search(hcontent)):
            continue
        # subtree = following lines with strictly greater indent
        j = hi + 1
        stack: list[tuple[int, str, str]] = []
        while j < len(nodes) and nodes[j][0] > hindent:
            ind, name, content = nodes[j]
            while stack and stack[-1][0] >= ind:
                stack.pop()
            if name == "Relation":
                cols = set(re.findall(r"(\w+)#\d+", content))
                for marker, table in FACT_MARKERS.items():
                    if marker in cols:
                        reduced = any(
                            _is_reduction(n, c) for _i, n, c in stack
                        )
                        if not reduced:
                            flag = f"forced-broadcast:{table}"
                            if flag not in flags:
                                flags.append(flag)
            stack.append((ind, name, content))
            j += 1
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
            analyzed = df._jdf.queryExecution().analyzed().treeString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_flagged += 1
            continue
        flags = audit(name, plan) + audit_forced_broadcast(analyzed)
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
