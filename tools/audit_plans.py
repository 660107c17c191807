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

# Queries implemented in the streaming modules execute on call (they
# drain a real streaming query or drive a multi-batch state-store apply,
# with side effects); the DataFrame they RETURN is a memory-sink or
# state-store read whose plan says nothing about the streaming plan the
# engine fixed. Skipping by implementing module (not a hand-kept name
# list — the round-8 sweep found the old 5-name list had drifted 13
# queries behind the registry). Explicitly-named queries still audit.
_STREAM_DRIVER_NAMES = {
    "readStream", "drain_to_memory", "_open_stream", "ParquetStateStore",
    "processAllAvailable", "awaitTermination",
}


def _executes_on_call(fn) -> bool:
    if ".streaming." not in getattr(fn, "__module__", ""):
        return False
    # batch-shaped queries also live in the streaming modules (q50..q52
    # window aggregations return lazy DataFrames) — only skip functions
    # that actually reference a stream opener/drainer or the state store.
    # AST identifiers only (Name/Attribute nodes), NOT a regex over the
    # source: docstrings and decorator oracle SQL are string constants in
    # the AST, so a lazy query whose prose merely mentions readStream can
    # no longer be silently dropped from the audit (round-9 ADVICE).
    import ast
    import inspect
    import textwrap

    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except OSError:
        return True  # can't prove lazy -> don't execute it blind
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return True
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and node.attr in _STREAM_DRIVER_NAMES:
            return True
        if isinstance(node, ast.Name) and node.id in _STREAM_DRIVER_NAMES:
            return True
    return False

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

# marker column -> fact table (tables whose row count grows with the data).
# supplier/part/customer are NOT exempt by convention anymore: they also
# scale with SF, so every broadcast of them goes through the size-gated
# ``dim_broadcast`` helper (operators/hints.py), and
# tests/test_broadcast_policy.py structurally bans raw F.broadcast on any
# SF-scaled load_table frame. They are absent from this marker map only
# because at audit SF a dim_broadcast hint on them is legitimate (the
# helper verified the size), so flagging every such hint would be noise —
# the scale guarantee lives in the helper + the structural test, not here.
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
# N rows when the id is unique), or an IN over a literal list (the q76
# K_SEEDS idiom — at most |list| rows). A modulo sample (id % k = 0) does
# NOT qualify: it stays proportional to the corpus.
_ID_RANGE_CAP = re.compile(
    r"\b(?:doc_id|vec_id|user_id|event_id)#\d+L? <=? (?:\d+|cast\(\d+ as \w+\))"
)
_ID_IN_LIST = re.compile(
    r"(?:cast\()?\b(?:doc_id|vec_id|user_id|event_id)#\d+L?"
    r"(?: as \w+\))? IN(?:SET)? \("
)
_ANY_IN_LIST = re.compile(
    r"(?:cast\()?\b(\w+#\d+)L?(?: as \w+\))? IN(?:SET)? \("
)


def _list_is_literal(content: str, start: int) -> bool:
    """Paren-balanced scan of an IN list from ``start``: literal-only when
    no attribute ref (#) appears inside."""
    depth, body = 1, []
    for ch in content[start:]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        body.append(ch)
    return "#" not in "".join(body)


def _in_list_is_literal(content: str) -> bool:
    """True when a UNIQUE-id IN (...) predicate's list holds only
    literals — bounds the ROW count (the q76 K_SEEDS idiom)."""
    m = _ID_IN_LIST.search(content)
    return bool(m) and _list_is_literal(content, m.end())


def _in_literal_cols(content: str) -> set:
    """Tokens of ANY column constrained to a literal IN list — bounds
    that column's DISTINCT count (the qx01 ``term IN ('a','b')`` idiom),
    not the row count."""
    out = set()
    for m in _ANY_IN_LIST.finditer(content):
        if _list_is_literal(content, m.end()):
            out.add(m.group(1))
    return out

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


def _bracket_groups(content: str) -> list[str]:
    """Top-level [...] groups of a node line (nesting-aware)."""
    groups, depth, cur = [], 0, []
    for ch in content:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _split_top(s: str) -> list[str]:
    """Split on commas not nested in () or []."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


_TOKEN = re.compile(r"\w+#\d+")
_RANK_CAP = re.compile(r"\((\w+#\d+)L? (?:=|<=) (\d+)\)")
_BOUNDED_LEAVES = {"OneRowRelation", "LocalRelation", "Range", "LogicalRDD"}


class _Cardinality:
    """Recursive bounded-cardinality analysis over an analyzed logical
    tree. ``rows`` = output row count is corpus-independent; ``ids`` =
    attribute tokens (name#id) PROVEN bounded by provenance (e.g. ``qid``
    minted from an id-range-capped filter, or any token minted inside a
    rows-bounded subtree). A token is treated as bounded when it is
    proven, or when its base name is not in UNBOUNDED_KEYS (the
    source/lang/dim/cid alphabet heuristic). Whenever a node's rows are
    bounded, every token printed in its subtree is exported as proven —
    attribute ids are plan-unique, so a bounded branch's aliases stay
    bounded when a join carries them into corpus-sized frames (the
    qx51 "window over qid from a capped filter" shape).

    LogicalRDD leaves (localCheckpoint boundaries) count as bounded:
    hints over session-checkpointed pair/edge artifacts follow the
    repo's pairs-are-metadata convention, and a checkpointed CORPUS
    frame under a hint cannot false-negative a fact scan because the
    flag also requires a fact Relation in the hint subtree."""

    def __init__(self, nodes):
        self.nodes = nodes
        self.facts: set[str] = set()

    def _tok_bounded(self, ids: set, tok: str) -> bool:
        return tok in ids or tok.split("#")[0] not in UNBOUNDED_KEYS

    def _expr_bounded(self, ids: set, expr: str) -> bool:
        return all(self._tok_bounded(ids, t) for t in _TOKEN.findall(expr))

    def _subtree_end(self, i: int) -> int:
        d = self.nodes[i][0]
        end = i + 1
        while end < len(self.nodes) and self.nodes[end][0] > d:
            end += 1
        return end

    def _subtree_tokens(self, i: int) -> set:
        return {
            t
            for j in range(i, self._subtree_end(i))
            for t in _TOKEN.findall(self.nodes[j][2])
        }

    def _children(self, i: int) -> list[int]:
        end = self._subtree_end(i)
        if i + 1 >= end:
            return []
        cd = min(self.nodes[j][0] for j in range(i + 1, end))
        return [j for j in range(i + 1, end) if self.nodes[j][0] == cd]

    def analyze(self, i: int):
        """-> (rows_bounded, bounded_ids set, rank_info dict tok->bool)."""
        rows, ids, rank = self._analyze(i)
        if rows:
            ids = ids | self._subtree_tokens(i)
        return (rows, ids, rank)

    def _analyze(self, i: int):
        _ind, name, content = self.nodes[i]

        if name == "Relation":
            cols = {t.split("#")[0] for t in _TOKEN.findall(content)}
            for marker, table in FACT_MARKERS.items():
                if marker in cols:
                    self.facts.add(table)
                    return (False, set(), {})
            return (True, set(), {})
        if name in _BOUNDED_LEAVES:
            return (True, set(), {})

        kids = [self.analyze(c) for c in self._children(i)]
        if not kids:  # unknown leaf: assume corpus-scale
            return (False, set(), {})
        rows = all(k[0] for k in kids)
        ids = set().union(*(k[1] for k in kids))
        rank = {}
        for k in kids:
            rank.update(k[2])
        c_rows, c_ids = kids[0][0], kids[0][1]

        if name in ("GlobalLimit", "LocalLimit"):
            return (True, ids, rank)
        if name in ("Aggregate", "Deduplicate"):
            groups = _bracket_groups(content)
            if name == "Aggregate" and len(groups) < 2:
                keys = []  # single-bracket form = global aggregate
            else:
                keys = [k for k in _split_top(groups[0]) if k]
            agg_rows = c_rows or all(
                self._expr_bounded(c_ids, k) for k in keys
            )
            return (agg_rows, ids, rank)
        if name == "Filter":
            cond_rows = c_rows
            if _ID_RANGE_CAP.search(content) or _in_list_is_literal(content):
                cond_rows = True
            for tok, _k in _RANK_CAP.findall(content):
                if rank.get(tok):
                    cond_rows = True
            # literal IN on any column bounds that column's DISTINCT count
            return (cond_rows, ids | _in_literal_cols(content), rank)
        if name == "Window":
            groups = _bracket_groups(content)
            part_ok = True
            if len(groups) >= 2:
                part_ok = all(
                    self._expr_bounded(c_ids, p)
                    for p in _split_top(groups[1])
                    if p
                )
            for item in _split_top(groups[0]) if groups else []:
                m = re.search(r" AS (\w+#\d+)", item)
                if m and re.match(r"(row_number|rank|dense_rank)\(", item):
                    rank[m.group(1)] = part_ok
            return (c_rows, ids, rank)
        if name == "Join":
            jtype = content.split(" ", 2)[1].rstrip(",") if " " in content else ""
            if jtype in ("LeftSemi", "LeftAnti"):
                # output <= |left| AND <= matches of right's keys: bounded
                # when either side is (the dedup.py:1710 semi-reduction)
                return (kids[0][0] or kids[-1][0], ids, rank)
            return (rows, ids, rank)
        if name == "Project":
            if c_rows:
                return (True, ids, rank)
            out = set(c_ids)
            for item in _split_top(_bracket_groups(content)[0]):
                m = re.search(r" AS (\w+#\d+)L?$", item)
                if m and self._expr_bounded(c_ids, item[: m.start()]):
                    out.add(m.group(1))
            return (False, out, rank)
        # Sort / Repartition / ResolvedHint / Generate / Union /
        # SubqueryAlias / anything else: combined child state
        if len(kids) == 1:
            return (c_rows, c_ids, rank)
        return (rows, ids, rank)


def audit_forced_broadcast(analyzed: str) -> list[str]:
    """Flags ``forced-broadcast:<table>`` for every broadcast HINT whose
    subtree scans a fact table AND whose output row count is not provably
    corpus-independent — bounded aggregation, semi-join, limit, id-range
    or IN-literal cap, or a rank-capped window over bounded partitions
    all count as reductions; a hint lacking every one of them promises
    Spark a <8 GB side that a corpus-proportional input cannot keep."""
    nodes = _tree_nodes(analyzed)
    flags: list[str] = []
    for hi, (hindent, hname, hcontent) in enumerate(nodes):
        if not (hname == "ResolvedHint" and _HINT_RE.search(hcontent)):
            continue
        card = _Cardinality(nodes)
        kids = [c for c in card._children(hi)]
        if not kids:
            continue
        rows_bounded = card.analyze(kids[0])[0]
        if not rows_bounded:
            for table in sorted(card.facts):
                flag = f"forced-broadcast:{table}"
                if flag not in flags:
                    flags.append(flag)
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
        if _executes_on_call(fn) and not ONLY:
            print(f"SKIP  {name} (streaming module: executes on call)")
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
