"""Latest-state-per-key reduction.

The reference keeps only the newest change event per primary key within a
micro-batch slice via ``row_number() OVER (PARTITION BY pk ORDER BY lsn
DESC) = 1`` (ref stream/stream.py:92-96) — a full sort of every PK
partition. Identical semantics, cheaper plan: ``groupBy(pk).agg(max_by(
struct(all_cols), lsn))`` is a hash aggregation with map-side partial
combine — one shuffle, no sort, and the map-side combine shrinks the
shuffle to ≤1 row per (mapper, key) before it hits the wire. At 100 TB the
sort-based form shuffles every event; this form shuffles roughly the number
of distinct keys.

Tie behavior: with duplicate (pk, lsn) pairs a bare ``max_by`` picks an
arbitrary winner, as does ``row_number`` — and "arbitrary" means
partition-layout-dependent, so a replayed batch could crown a DIFFERENT
winner and break replay idempotence. Duplicate LSNs are real: Debezium
emits them on snapshot boundaries (all snapshot READ events may share one
source LSN). The CDC path therefore orders by ``(lsn, xxhash64(payload))``
(``tie_break_hash=True``): the hash depends only on row CONTENT, so the
winner is a pure function of the batch's rows — stable across input
order, partitioning, and replays. Identical duplicate rows hash equal and
collapse to the same state either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    strategy: str = "max_by",
    tie_break_hash: bool = False,
) -> DataFrame:
    """Reduce to the single newest row per key (ordered by ``order_col`` —
    a column name or a list for lexicographic multi-column ordering, e.g.
    ``["ts", "event_id"]`` to tie-break deterministically).

    ``strategy='max_by'`` (default): hash-agg, scale path.
    ``strategy='window'``: the reference's ranking-window form, kept for
    plan comparison.
    ``tie_break_hash=True`` appends ``xxhash64(<all columns>)`` as the
    final order component, making the winner among duplicate order keys a
    deterministic function of row content (never of partition layout) —
    required on the CDC path, where Debezium snapshot boundaries emit
    duplicate LSNs and replay idempotence depends on re-picking the SAME
    winner.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    tie_exprs = (
        [F.xxhash64(*[F.col(c) for c in df.columns])] if tie_break_hash else []
    )
    if strategy == "window":
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.desc(c) for c in order_cols], *[e.desc() for e in tie_exprs]
        )
        return (
            df.withColumn("__row_number", F.row_number().over(w))
            .filter(F.col("__row_number") == 1)
            .drop("__row_number")
        )
    non_key = [c for c in df.columns if c not in key_cols]
    order_key = (
        F.col(order_cols[0])
        if len(order_cols) == 1 and not tie_exprs
        else F.struct(*[F.col(c) for c in order_cols], *tie_exprs)
    )
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in non_key]), order_key).alias("__latest")
    )
    return packed.select(*key_cols, "__latest.*").select(*df.columns)
