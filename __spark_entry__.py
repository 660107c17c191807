"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY §2 (and the harness extensions);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each SQL-expressible
query. Implementations live in the ``kafka2delta_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session confs the engine relies on (the driver owns the
    session, so set them on the existing one)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable on some builds; events loader copes
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _configure(spark)
    load_all_querysets()
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all_querysets()

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {name: wrap(fn) for name, fn in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    load_all_querysets()
    return dict(sorted(ORACLES.items()))
