"""The measurement-conversion contract: non-finite is not a measurement.

Every query that fixes ``events.value`` into milli-unit BIGINTs
(``floor(value * 1000)``) dies loudly on non-finite input — Spark's ANSI
cast overflows on ±Infinity and DuckDB refuses NaN -> INT64 — and a
single corrupt sensor reading killing a 100 TB job hours in is the worst
failure mode available. The contract here maps non-finite (NaN, ±Inf) to
NULL at the conversion, so the value flows into the engine's existing
NULL semantics (aggregates skip it, defined-measurement filters exclude
it) identically on both engines. NULL input stays NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite(col: str | Column = "value") -> Column:
    """True iff the measurement is present and finite — the filter form
    of the contract (use where a query's defined-measurement rule
    pre-filters rows, e.g. the order-statistics family)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(_INF))


def v1000(col: str | Column = "value") -> Column:
    """Milli fixed-point measurement: ``floor(col * 1000)`` as BIGINT,
    NULL when the input is NULL or non-finite. The guarded branch is the
    only one evaluated, so the ANSI cast can never see ±Inf/NaN."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(finite(c), F.floor(c * 1000).cast("bigint"))


#: DuckDB fragments mirroring the two forms above (``isfinite`` is
#: NULL-propagating in DuckDB, so the CASE yields NULL for NULL input).
FINITE_SQL = "(value IS NOT NULL AND isfinite(value))"
V1000_SQL = (
    "CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END"
)


# ---------------------------------------------------------------------------
# Portable case folding. Engine-native lower() is NOT cross-engine
# deterministic outside ASCII: Java (Spark) maps U+0130 'İ' to "i̇"
# (i + combining dot, TWO code points) where utf8proc (DuckDB) maps it
# to a bare "i" — so every token, shingle, minhash and simhash derived
# from lower() silently diverges on real multilingual text. Tokenization
# in a training-data pipeline must not change when the engine does, so
# case folding is ASCII-scoped by contract: A-Z fold, everything else
# passes through unchanged (identical on every engine; the byte-level
# BPE stance of modern tokenizers, which do not case-fold Unicode
# either).
# ---------------------------------------------------------------------------

_AZ_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: str | Column) -> Column:
    """ASCII-scoped case fold (see module comment): portable across
    engines where ``F.lower`` is not."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _AZ_UPPER, _AZ_LOWER)


def ascii_lower_sql(expr: str) -> str:
    """The identical fold as a DuckDB fragment."""
    return f"translate({expr}, '{_AZ_UPPER}', '{_AZ_LOWER}')"
