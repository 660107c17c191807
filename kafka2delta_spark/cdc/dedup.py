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

Tie behavior: with duplicate (pk, lsn) pairs ``max_by`` picks an arbitrary
winner, as does ``row_number``; CDC LSNs are unique per key in practice
(Postgres LSN monotonicity).
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
) -> DataFrame:
    """Reduce to the single newest row per key (ordered by ``order_col`` —
    a column name or a list for lexicographic multi-column ordering, e.g.
    ``["ts", "event_id"]`` to tie-break deterministically).

    ``strategy='max_by'`` (default): hash-agg, scale path.
    ``strategy='window'``: the reference's ranking-window form, kept for
    plan comparison.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if strategy == "window":
        w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
        return (
            df.withColumn("__row_number", F.row_number().over(w))
            .filter(F.col("__row_number") == 1)
            .drop("__row_number")
        )
    non_key = [c for c in df.columns if c not in key_cols]
    order_key = (
        F.col(order_cols[0])
        if len(order_cols) == 1
        else F.struct(*[F.col(c) for c in order_cols])
    )
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in non_key]), order_key).alias("__latest")
    )
    return packed.select(*key_cols, "__latest.*").select(*df.columns)
