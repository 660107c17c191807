"""Query registry: named (Spark callable, DuckDB oracle SQL) pairs.

Every analytics operator this engine claims is registered here with a Spark
implementation and (where SQL-expressible) an equivalent ANSI-SQL oracle the
driver runs on DuckDB over the same parquet tables. Column names/aliases are
kept identical on both sides — the correctness gate sorts columns by name
and hashes values.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# For queries whose VALUES are not SQL-expressible (e.g. depend on
# watermark progression) but whose row COUNT is: SQL returning a single
# row/column with the expected output row count. check_correctness runs
# it and records a real rows_match true/false instead of a bare
# no_oracle error.
ROW_ORACLES: dict[str, str] = {}


def register(
    name: str,
    oracle: str | None = None,
    row_oracle: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle
    (full value oracle, or ``row_oracle`` for a count-only invariant)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if row_oracle is not None:
            ROW_ORACLES[name] = row_oracle
        return fn

    return deco


def load_all_querysets() -> None:
    """Import every module that registers queries (idempotent)."""
    from kafka2delta_spark.operators import relational  # noqa: F401
    from kafka2delta_spark.operators import tpch_like  # noqa: F401
    from kafka2delta_spark.operators import analytic  # noqa: F401
    from kafka2delta_spark.operators import asof  # noqa: F401
    from kafka2delta_spark.functions import text  # noqa: F401
    from kafka2delta_spark.functions import dedup  # noqa: F401
    from kafka2delta_spark.functions import similarity  # noqa: F401
    from kafka2delta_spark.functions import multimodal  # noqa: F401
    from kafka2delta_spark.functions import pipeline  # noqa: F401
    from kafka2delta_spark.functions import curation  # noqa: F401
    from kafka2delta_spark.functions import clustering  # noqa: F401
    from kafka2delta_spark.functions import retrieval  # noqa: F401
    from kafka2delta_spark.operators import advanced  # noqa: F401
    from kafka2delta_spark.operators import mining  # noqa: F401
    from kafka2delta_spark.operators import behavior  # noqa: F401
    from kafka2delta_spark.functions import winnow  # noqa: F401
    from kafka2delta_spark.functions import evalops  # noqa: F401
    from kafka2delta_spark.functions import corpuseval  # noqa: F401
    from kafka2delta_spark.functions import robustats  # noqa: F401
    from kafka2delta_spark.operators import cdc_queries  # noqa: F401
    from kafka2delta_spark.streaming import windows  # noqa: F401
    from kafka2delta_spark.streaming import stateful  # noqa: F401
    from kafka2delta_spark.streaming import incremental  # noqa: F401
