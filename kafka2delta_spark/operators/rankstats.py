"""Scale-safe EXACT order statistics via two-pass range-partitioned rank.

Spark's ``percentile`` aggregate is exact but holds the whole per-group
value multiset in one ObjectHashAggregate buffer — O(group size) state in
a single reducer, the one aggregate shape that does not survive a 100×
scale-up (a global percentile over 100 TB of events would funnel every
value through one task). This module computes the SAME type-7
(linearly-interpolated) quantiles from rank statistics instead, using the
q33 two-pass shape (``operators/analytic.py``):

  1. ``repartitionByRange`` on (group keys, value) → parallel local sorts;
     local positions come from ``monotonically_increasing_id`` over the
     sorted partitions (contiguous within a partition), NOT from a window —
     a window partitioned by the synthetic partition id would force a
     second full-data hash exchange.
  2. Per-(partition, group) counts + run-start ids → prefix offsets over
     that metadata-sized side (n_partitions × n_groups rows) → exact global
     0-indexed rank within each group, with no unpartitioned window and no
     per-group value buffer anywhere.
  3. For each requested quantile p = num/denom the interpolation touches
     only the values at ranks ⌊p·(n−1)⌋ and ⌊p·(n−1)⌋+1 — ≤ 2·|probs|
     rows per group survive the filter; one tiny conditional aggregate
     assembles ``v_lo + (v_hi − v_lo)·frac``, the same formula both
     Spark's ``percentile`` and DuckDB's ``quantile_cont`` use.

Exactness across engines: restricted (by construction of the callers) to
dyadic probabilities over integer-valued columns, every intermediate —
p·(n−1), the interpolation weight, the weighted sum — is an exactly
representable binary double, so results hash-match ``quantile_cont``
bit-for-bit (the qx30 dyadic argument).

Ties need no tiebreak column: ``row_number`` among equal values is
arbitrary, but the VALUE at any global rank is order-independent once
sorted by value, which is all the interpolation reads.

At 100 TB: ONE shuffle sized by the data (the range exchange — the
counts/offsets aggregate is map-side-combined to metadata size), joins
against broadcast metadata only. Group-key cardinality must be bounded
(offsets/totals are broadcast); for unbounded keys drop the broadcast
hints and the same plan degrades gracefully to shuffle joins keyed by
group. Determinism note: ids are assigned after the in-partition sort,
so tie rows may swap ids across retries — harmless, because group-run
boundaries and the VALUE at any rank are tie-order-independent.

CONTRACT RISK (load-bearing for qx30/qx50/qx52/qx56 exactness): the API
doc for ``monotonically_increasing_id`` only guarantees monotonically
increasing and unique ids, "not consecutive"; this module additionally
relies on the current implementation detail that ids ARE consecutive
within a partition (partition_id << 33 | row_number_in_partition). If a
Spark upgrade ever broke within-partition contiguity, local ranks would
silently drift. ``tests/test_rankstats.py::
test_mid_rank_reconstruction_is_contiguous`` pins the assumption
directly — it rebuilds global ranks from the mid-offset idiom on a
many-partition input and asserts they form exactly 0..n−1 with the
value at rank i equal to the i-th order statistic; any contiguity break
fails it immediately. Fallback if that ever fires: replace the id pass
with ``rdd.zipWithIndex``-style per-partition enumeration (one extra
pass, same plan shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _group_ranked(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    n_parts: int,
) -> DataFrame:
    """Shared rank pass: ``df`` plus ``__rk0`` (exact 0-indexed global
    rank of ``value_col`` within each ``keys`` group) and ``__n`` (group
    row count) — the range-exchange + mid-offset idiom documented in the
    module header. ``__pid``/``__mid``/``__off``/``__mid0`` remain as
    internal columns; callers select away what they don't need.

    Local rank WITHOUT a window: a window partitioned by (__pid, keys)
    would force a second full-data hash exchange right after the range
    exchange (Catalyst cannot know the data is already co-located by
    pid). Instead: sort within the range partitions, then exploit that
    monotonically_increasing_id is CONTIGUOUS within a partition and
    follows physical (= sorted) order — local rank = mid − min(mid of
    the (partition, group) run) + 1, where the per-run minima come from
    a map-side-combining hash-agg whose output is metadata-sized. One
    data-sized exchange per pass instead of two (measured 2x on qx50)."""
    ranked = (
        df.repartitionByRange(n_parts, *(keys + [value_col]))
        .sortWithinPartitions(*(keys + [value_col]))
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        # PIN the materialization: __mid/__pid are nondeterministic
        # expressions, so Catalyst does not canonically dedupe the two
        # consumers below (counts path and final join) into one reused
        # exchange — under load the range exchange can be planned twice
        # with INDEPENDENT boundary samples (reservoir order differs),
        # making the offsets disagree with the final partitioning and
        # the ranks collide. Observed once at factor-8 scale under
        # concurrent sweeps (qx95's deciles: 4158/4236/3906 instead of
        # exact 4000). localCheckpoint forces exactly one
        # materialization that every consumer reads.
        .localCheckpoint(eager=True)
    )
    counts = ranked.groupBy("__pid", *keys).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min("__mid").alias("__mid0"),
    )
    prior = counts.select(
        F.col("__pid").alias("__pid2"),
        F.col("__cnt").alias("__cnt2"),
        *[F.col(k).alias(f"__{k}2") for k in keys],
    )
    pair_cond = F.col("__pid2") < F.col("__pid")
    for k in keys:
        pair_cond = pair_cond & (F.col(f"__{k}2") == F.col(k))
    offsets = (
        counts.join(F.broadcast(prior), pair_cond, "left")
        .groupBy("__pid", *keys)
        .agg(
            F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__off"),
            F.min("__mid0").alias("__mid0"),
        )
    )
    if keys:
        totals = counts.groupBy(*keys).agg(
            F.sum("__cnt").cast("bigint").alias("__n")
        )
        joined = ranked.join(F.broadcast(offsets), ["__pid", *keys]).join(
            F.broadcast(totals), keys
        )
    else:
        totals = counts.agg(F.sum("__cnt").cast("bigint").alias("__n"))
        joined = ranked.join(F.broadcast(offsets), ["__pid"]).crossJoin(
            F.broadcast(totals)
        )
    return joined.withColumn(
        "__rk0", F.col("__off") + (F.col("__mid") - F.col("__mid0"))
    )


def exact_rank_bracket(
    df: DataFrame,
    value_col: str,
    num: int,
    denom: int,
    keys: Sequence[str] = (),
    n_parts: int = 32,
) -> DataFrame:
    """The type-7 bracket VALUES at p = num/denom per group, UNCAST: one
    row per group with ``keys + [__n, __lo, __hi]`` where ``__lo`` is the
    value at rank ⌊p·(n−1)⌋ and ``__hi`` the value at the next rank
    (NULL when the interpolation weight is zero). This is the integer-
    exact input for caller-side SCALED interpolation when p is not
    dyadic — q36's p90 computes 10·q = 10·lo + (t mod 10)·(hi−lo) in
    pure integer arithmetic instead of trusting float interpolation to
    round identically across engines. Same plan shape as
    ``exact_percentiles_by_rank``: no per-group multiset anywhere."""
    keys = list(keys)
    joined = _group_ranked(df, value_col, keys, n_parts)
    lo_rk = F.expr(f"({num} * (__n - 1)) div {denom}")
    frac = F.expr(f"({num} * (__n - 1)) % {denom}")
    needed = joined.where(
        (F.col("__rk0") == lo_rk)
        | ((F.col("__rk0") == lo_rk + 1) & (frac != 0))
    )
    aggs = [
        F.max("__n").alias("__n"),
        F.max(F.when(F.col("__rk0") == lo_rk, F.col(value_col))).alias("__lo"),
        F.max(
            F.when(F.col("__rk0") == lo_rk + 1, F.col(value_col))
        ).alias("__hi"),
    ]
    res = needed.groupBy(*keys).agg(*aggs) if keys else needed.groupBy().agg(*aggs)
    return res


def exact_percentiles_by_rank(
    df: DataFrame,
    value_col: str,
    numerators: Sequence[int],
    denom: int,
    keys: Sequence[str] = (),
    n_parts: int = 32,
    prefix: str = "p",
) -> DataFrame:
    """Exact type-7 quantiles of ``value_col`` at ``num/denom`` for each
    ``num`` in ``numerators``, grouped by ``keys`` (global if empty).

    Returns one row per group with columns ``keys + [__n] + [f"{prefix}{num}"
    for num in numerators]``; ``__n`` is the group row count (BIGINT) and
    each quantile column is DOUBLE. NULL values must be pre-filtered by the
    caller (``percentile``/``quantile_cont`` both ignore NULLs; this helper
    would rank them).
    """
    keys = list(keys)
    val = F.col(value_col).cast("double")
    joined = _group_ranked(df, value_col, keys, n_parts)
    rk0 = F.col("__rk0")  # 0-indexed global rank within the group
    n1 = F.col("__n") - 1

    def target(num: int):
        return F.lit(num) * n1  # p·(n−1) scaled by denom → integer t

    def lo(num: int):
        return F.expr(f"({num} * (__n - 1)) div {denom}")

    needed_cond = None
    for num in numerators:
        c = (rk0 == lo(num)) | (
            (rk0 == lo(num) + 1) & (target(num) % denom != 0)
        )
        needed_cond = c if needed_cond is None else (needed_cond | c)
    needed = joined.where(needed_cond)

    aggs = [F.max("__n").alias("__n")]
    for num in numerators:
        aggs.append(
            F.max(F.when(rk0 == lo(num), val)).alias(f"__lo{num}")
        )
        aggs.append(
            F.max(F.when(rk0 == lo(num) + 1, val)).alias(f"__hi{num}")
        )
    res = needed.groupBy(*keys).agg(*aggs) if keys else needed.groupBy().agg(*aggs)

    out_cols = [F.col(k) for k in keys] + [F.col("__n")]
    for num in numerators:
        frac = (target(num) % denom).cast("double") / F.lit(float(denom))
        lo_v = F.col(f"__lo{num}")
        hi_v = F.coalesce(F.col(f"__hi{num}"), lo_v)
        out_cols.append((lo_v + (hi_v - lo_v) * frac).alias(f"{prefix}{num}"))
    return res.select(*out_cols)


def midrank_histogram(df: DataFrame, col: str, extra_aggs: Sequence = ()):
    """Per-DISTINCT-value rank facts from a value histogram: returns
    ``(col, __cnt, __mn, *extra_aggs)`` where ``__mn`` is the 1-based
    minimum global rank of the value's tie group (= #smaller values + 1)
    under any total order that sorts by ``col`` first. The value-domain
    closed form of ``global_ranks`` + groupBy-midrank (the qx53/qx30
    rule): ONE map-side-combined histogram agg is the only data-sized
    op; the cumulative window runs over the value DOMAIN, not the rows.
    Right when distinct(col) << rows (quantized scores, bounded sizes);
    for near-unique domains use ``global_ranks``."""
    h = df.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"), *extra_aggs)
    wc = W.orderBy(col).rowsBetween(W.unboundedPreceding, W.currentRow)
    return h.withColumn(
        "__mn", F.sum("__cnt").over(wc) - F.col("__cnt") + 1
    )


def global_ranks(
    df: DataFrame,
    order_cols: Sequence[str],
    n_parts: int = 32,
    rank_col: str = "rk0",
    total_col: str = "__n",
) -> DataFrame:
    """Exact global 0-indexed ranks over a total order WITHOUT a global
    window: the module's range-partition + mid-offset idiom exposed as a
    reusable pass. Returns ``df`` plus ``rank_col`` (0-based rank in the
    total order of ``order_cols``) and ``total_col`` (row count). The
    caller must pass a TOTAL order (include a unique tiebreak column) if
    rank determinism matters. One data-sized shuffle (the range
    exchange); offsets/totals are metadata-sized broadcasts. Subject to
    the same id-contiguity contract pinned by
    test_mid_rank_reconstruction_is_contiguous."""
    order_cols = list(order_cols)
    ranked = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        # Same materialization pin as _group_ranked: nondeterministic
        # __mid defeats exchange reuse, and two independently-sampled
        # range exchanges make offsets disagree with the final
        # partitioning (flaky rank collisions at scale).
        .localCheckpoint(eager=True)
    )
    counts = ranked.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"), F.min("__mid").alias("__mid0")
    )
    prior = counts.select(
        F.col("__pid").alias("__pid2"), F.col("__cnt").alias("__cnt2")
    )
    offsets = (
        counts.join(
            F.broadcast(prior), F.col("__pid2") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(
            F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__off"),
            F.min("__mid0").alias("__mid0"),
        )
    )
    totals = counts.agg(F.sum("__cnt").cast("bigint").alias(total_col))
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            rank_col, F.col("__off") + (F.col("__mid") - F.col("__mid0"))
        )
        .drop("__mid", "__pid", "__off", "__mid0")
    )
