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
source LSN). The CDC path therefore orders by ``(lsn, xxhash64(payload),
payload struct)`` (``tie_break_hash=True``): the hash depends only on row
CONTENT, so the winner is a pure function of the batch's rows — stable
across input order, partitioning, and replays — and the trailing row
struct resolves genuine 64-bit hash collisions (constructible: Spark's
xxhash64 skips NULL columns and its per-long step is invertible), keeping
the winner deterministic for EVERY input, not just collision-free ones.
Identical duplicate rows compare equal everywhere and collapse to the
same state either way.
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
    ``tie_break_hash=True`` appends ``xxhash64(<all columns>)`` and then
    the full row struct as the final order components, making the winner
    among duplicate order keys a deterministic TOTAL function of row
    content (never of partition layout) — required on the CDC path,
    where Debezium snapshot boundaries emit duplicate LSNs and replay
    idempotence depends on re-picking the SAME winner.

    Collision contract (round-12 campaign): xxhash64 collisions between
    DISTINCT rows are constructible, not just theoretical — Spark skips
    NULL columns when chaining (``xxhash64(5, NULL) == xxhash64(NULL,
    5)``), and the per-column XXH64 step on longs is invertible, so an
    adversary (or sheer 100 TB volume) can present tied hashes. The hash
    alone therefore CANNOT be the last word: the full row struct after
    it resolves any hash tie by lexicographic field comparison, so the
    winner is deterministic for every possible input. The hash stays as
    the first discriminator because it is one word to compare and
    almost always differs; the struct is only consulted on genuine
    collisions. Requires orderable column types — the CDC path's
    flattened Avro primitives always are. Pinned by
    tests/test_collision_rows.py with engineered colliding rows.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    tie_exprs = (
        [
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.struct(*[F.col(c) for c in df.columns]),
        ]
        if tie_break_hash
        else []
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
    if tie_exprs:
        # the final tie component IS the full row, so fold everything
        # into ONE ordered struct and take max() of it directly — the
        # agg buffer then carries a single (order, hash, row) struct
        # instead of max_by's value struct PLUS an order key that
        # duplicates the row (measured on the CDC bench: the duplicated
        # buffer cost real throughput). Lexicographic max over
        # (order_cols, xxhash64, row) is exactly the documented contract.
        hash_expr = F.xxhash64(*[F.col(c) for c in df.columns])
        packed = df.groupBy(*key_cols).agg(
            F.max(
                F.struct(
                    *[F.col(c) for c in order_cols],
                    hash_expr.alias("__tie_hash"),
                    F.struct(*[F.col(c) for c in df.columns]).alias("__row"),
                )
            ).alias("__m")
        )
        return packed.select("__m.__row.*").select(*df.columns)
    order_key = (
        F.col(order_cols[0])
        if len(order_cols) == 1
        else F.struct(*[F.col(c) for c in order_cols])
    )
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in non_key]), order_key).alias("__latest")
    )
    return packed.select(*key_cols, "__latest.*").select(*df.columns)
