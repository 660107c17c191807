"""The dim-broadcast policy, enforced structurally and behaviorally.

Policy (see ``kafka2delta_spark/operators/hints.py``): a raw
``F.broadcast`` hint is a promise the hinted side stays under Spark's
broadcast cap at ANY scale. SF-scaled tables (customer/supplier/part and
the facts) cannot keep that promise, so every broadcast of a frame
derived from one must go through the size-gated ``dim_broadcast`` helper.
Raw hints stay legal for literally-bounded sides: region/nation scans,
scalar/grouped aggregates over bounded key domains, hard-capped prefixes
(limit/head/take). Fraction-based ``sample`` is NOT bounded — its output
scales with SF — so it does not clear taint.

The structural test walks the AST of every engine module: inside each
function it taints variables bound (directly or through a
select/filter/alias chain in the same statement) from
``load_table(..., <SF-scaled table>)``, and fails on ``F.broadcast``
applied to a tainted name or to a ``load_table`` call inline. That is
exactly the shape the round-7 audit exempted by convention; the helper
plus this test replace the convention with enforcement.
"""

from __future__ import annotations

import ast
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Tables whose row count grows with the scale factor. region (5 rows) and
# nation (25 rows) are the only literally-bounded base tables.
SF_SCALED = {
    "customer",
    "supplier",
    "part",
    "partsupp",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}

ENGINE_MODULES = sorted(
    glob.glob(os.path.join(REPO, "kafka2delta_spark", "**", "*.py"), recursive=True)
)


def _load_table_target(node: ast.AST) -> str | None:
    """If ``node`` is (a chain ending in) ``load_table(_, _, "name")`` or
    ``load_embeddings(...)`` (the vector-operator loader — an SF-scaled
    embeddings scan with the NULL filter applied), return the table
    name."""
    while isinstance(node, ast.Call):
        fn = node.func
        if isinstance(fn, ast.Name) and fn.id == "load_embeddings":
            return "embeddings"
        if isinstance(fn, ast.Name) and fn.id == "load_table":
            for arg in node.args[2:3]:
                if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                    return arg.value
            return None
        # walk down a method chain: load_table(...).select(...).filter(...)
        if isinstance(fn, ast.Attribute):
            node = fn.value
            continue
        return None
    return None


# Chain methods that collapse an SF-scaled frame to a bounded one: the
# policy explicitly legalizes raw hints on grouped/scalar aggregates over
# bounded key domains and on hard-capped prefixes, so taint stops at
# these. NOT ``sample``: sample(fraction) is fraction-based — its output
# grows with SF, which is exactly the OOM shape the gate bans. Anything
# else (select/filter/alias/join/withColumn/...) preserves scale too.
_CARDINALITY_COLLAPSING = {
    "groupBy", "agg", "distinct", "dropDuplicates", "limit", "summary",
    "describe", "toLocalIterator", "head", "take",
}


def _chain_root(node: ast.AST) -> tuple[str | None, set[str]]:
    """Walk a ``name.method(...).method(...)`` chain to its root Name;
    return (root name, set of method names seen along the chain)."""
    attrs: set[str] = set()
    while True:
        if isinstance(node, ast.Call):
            node = node.func
        elif isinstance(node, ast.Attribute):
            attrs.add(node.attr)
            node = node.value
        elif isinstance(node, ast.Name):
            return node.id, attrs
        else:
            return None, attrs


def _tainted_chain_root(node: ast.AST, tainted: set[str]) -> str | None:
    """Root name if ``node`` is a method chain rooted at a tainted name
    that never passes through a cardinality-collapsing call."""
    root, attrs = _chain_root(node)
    if root in tainted and not (attrs & _CARDINALITY_COLLAPSING):
        return root
    return None


def _violations_in_function(fn: ast.FunctionDef) -> list[tuple[str, str]]:
    """Each violation is ``(root_variable, message)`` — the root keys the
    per-site allowlist, so an exemption never covers more than the one
    broadcast argument it was adjudicated for."""
    tainted: set[str] = set()
    out: list[tuple[str, str]] = []
    # Fixpoint taint pass: direct load_table binds, then propagation
    # through assignments whose RHS is a scale-preserving chain rooted at
    # a tainted name (cust2 = cust.select(...) — round-9 ADVICE).
    changed = True
    while changed:
        changed = False
        for node in ast.walk(fn):
            if not (isinstance(node, ast.Assign) and len(node.targets) == 1):
                continue
            tgt = node.targets[0]
            if not isinstance(tgt, ast.Name) or tgt.id in tainted:
                continue
            table = _load_table_target(node.value)
            if table in SF_SCALED or _tainted_chain_root(node.value, tainted):
                tainted.add(tgt.id)
                changed = True
    for node in ast.walk(fn):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        is_raw_broadcast = (
            isinstance(f, ast.Attribute)
            and f.attr == "broadcast"
            and isinstance(f.value, ast.Name)
            and f.value.id == "F"
        )
        if not is_raw_broadcast or not node.args:
            continue
        arg = node.args[0]
        if isinstance(arg, ast.Name) and arg.id in tainted:
            out.append((
                arg.id,
                f"{fn.name}:{node.lineno} F.broadcast({arg.id}) — "
                f"{arg.id} is loaded from an SF-scaled table; use dim_broadcast",
            ))
            continue
        inline = _load_table_target(arg)
        if inline in SF_SCALED:
            out.append((
                f"load_table:{inline}",
                f"{fn.name}:{node.lineno} F.broadcast(load_table(.., '{inline}')) "
                "— use dim_broadcast",
            ))
            continue
        chain_root = _tainted_chain_root(arg, tainted)
        if chain_root:
            out.append((
                chain_root,
                f"{fn.name}:{node.lineno} F.broadcast({chain_root}.…) — "
                f"scale-preserving chain rooted at SF-scaled {chain_root}; "
                "use dim_broadcast",
            ))
    return out


# Adjudicated allowlist (same contract as test_hash_split_policy): sites the
# propagated taint flags but the policy explicitly legalizes, each with a
# written reason. Keyed PER SITE — function name -> {broadcast-arg root
# variable: reason} — so an exemption covers exactly the one adjudicated
# argument: a NEW broadcast of a different frame added inside an allowlisted
# function still fails the gate. All eight are the bounded-PROBE broadcast
# shape: the hinted side is filtered to a compile-time-constant id range
# (vec_id < N_QUERIES / LOO_PROBES — 5 rows regardless of SF) or to a
# constant grid derived from one (probes ≤ N_QUERIES×N_PROBE rows, qtop ≤
# N_QUERIES×TOP_K rows). The detector cannot see that a filter predicate is
# a constant cap — a filter is scale-preserving in general — so these are
# exempted by name, with the cap constant in the reason.
ALLOWED_PROBE_BROADCASTS = {
    "q90_cosine_topk_bruteforce": {"q": "filter(vec_id < N_QUERIES=5)"},
    "q91_ann_lsh_topk": {"q": "filter(vec_id < N_QUERIES=5) hashed probes"},
    "q93_ann_ivf_topk": {
        "probes": "filter(vec_id < N_QUERIES & crk <= N_PROBE)"
    },
    "qx51_quantized_ann_recall": {
        "qq": "filter(vec_id < N_QUERIES)",
        "qtop": "rk <= TOP_K per probe",
    },
    "qy02_filtered_ann_topk": {"q": "filter(vec_id < N_QUERIES=5)"},
    "qy03_mmr_diversified_topk": {"q": "filter(vec_id < N_QUERIES=5)"},
    "qz04_loo_1nn_accuracy": {"q": "filter(vec_id < LOO_PROBES)"},
}


def test_no_raw_broadcast_of_sf_scaled_tables():
    violations: list[str] = []
    for path in ENGINE_MODULES:
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                allowed = ALLOWED_PROBE_BROADCASTS.get(node.name, {})
                for root, msg in _violations_in_function(node):
                    if root in allowed:
                        continue
                    violations.append(f"{os.path.relpath(path, REPO)}::{msg}")
    assert not violations, "raw F.broadcast on SF-scaled tables:\n" + "\n".join(
        violations
    )


def test_allowlist_entries_still_exist_and_still_flag():
    """Every allowlisted (function, root) site must still exist and still
    be flagged by the detector — EXACTLY: a stale entry is a hole the next
    refactor could silently widen, and an unlisted flagged root inside an
    allowlisted function means the per-site keying is being bypassed."""
    flagged_roots: dict[str, set[str]] = {}
    defined_names: set[str] = set()
    for path in ENGINE_MODULES:
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                defined_names.add(node.name)
                if node.name in ALLOWED_PROBE_BROADCASTS:
                    flagged_roots.setdefault(node.name, set()).update(
                        root for root, _ in _violations_in_function(node)
                    )
    missing = set(ALLOWED_PROBE_BROADCASTS) - defined_names
    assert not missing, f"allowlist names no longer defined: {sorted(missing)}"
    for name, allowed in ALLOWED_PROBE_BROADCASTS.items():
        assert flagged_roots.get(name) == set(allowed), (
            f"{name}: allowlisted roots {sorted(allowed)} != flagged roots "
            f"{sorted(flagged_roots.get(name, set()))} — drop stale entries "
            "or adjudicate the new site"
        )


def test_detector_catches_the_banned_shape():
    """The AST taint-walk actually flags the shape it bans (both the
    named-variable and the inline form), and ignores the legal ones."""
    src = '''
def bad_named(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return fact.join(F.broadcast(cust), "c_custkey")

def bad_inline(spark, sf_dir):
    return fact.join(F.broadcast(load_table(spark, sf_dir, "part")), "p")

def fine_bounded(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    return fact.join(F.broadcast(nation), "n_nationkey")

def fine_gated(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return fact.join(dim_broadcast(cust), "c_custkey")

def bad_derived_var(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    cust2 = cust.select("c_custkey").filter(cust.c_acctbal > 0)
    return fact.join(F.broadcast(cust2), "c_custkey")

def bad_inline_chain(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return fact.join(F.broadcast(cust.select("c_custkey")), "c_custkey")

def fine_bounded_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    return fact.join(F.broadcast(per_type), "event_type")

def bad_sampled(spark, sf_dir):
    big = load_table(spark, sf_dir, "lineitem").sample(0.1)
    return fact.join(F.broadcast(big), "l_orderkey")

def fine_capped_limit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    top = li.orderBy("l_extendedprice").limit(10)
    return fact.join(F.broadcast(top), "l_orderkey")
'''
    tree = ast.parse(src)
    flagged = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            flagged[node.name] = _violations_in_function(node)
    assert flagged["bad_named"], "named taint not caught"
    assert flagged["bad_inline"], "inline load_table not caught"
    assert flagged["bad_derived_var"], "derived-variable taint not caught"
    assert flagged["bad_inline_chain"], "inline tainted chain not caught"
    assert not flagged["fine_bounded"], "bounded nation wrongly flagged"
    assert not flagged["fine_gated"], "dim_broadcast wrongly flagged"
    assert not flagged["fine_bounded_agg"], (
        "bounded aggregate over an SF-scaled frame wrongly flagged — "
        "taint must stop at cardinality-collapsing ops"
    )
    assert flagged["bad_sampled"], (
        "fraction-based sample of an SF-scaled frame not caught — "
        "sample(fraction) output scales with SF and must stay tainted"
    )
    assert not flagged["fine_capped_limit"], (
        "hard-capped limit() prefix wrongly flagged — limit is bounded"
    )


# ---------------------------------------------------------------------------
# behavioral: the helper hints under the cap and declines over it
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    from kafka2delta_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )


def test_plan_size_estimate_is_positive(customer):
    from kafka2delta_spark.operators.hints import plan_size_estimate

    size = plan_size_estimate(customer)
    assert isinstance(size, int) and size > 0


def test_dim_broadcast_hints_under_cap(spark, sf_dir, customer):
    from kafka2delta_spark.operators.hints import dim_broadcast
    from kafka2delta_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    joined = ev.join(dim_broadcast(customer), ev.user_id == customer.c_custkey)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan, "hint missing for an under-cap dim"


def test_dim_broadcast_declines_over_cap(spark, sf_dir, customer):
    from kafka2delta_spark.operators.hints import dim_broadcast
    from kafka2delta_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    gated = dim_broadcast(customer, cap_bytes=1)  # everything is over 1 byte
    joined = ev.join(gated, ev.user_id == customer.c_custkey)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan, "hint forced past the size cap"
    # correctness is strategy-invariant: gated and hinted joins agree
    hinted = ev.join(dim_broadcast(customer), ev.user_id == customer.c_custkey)
    assert joined.count() == hinted.count()
