"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2 inventory + extensions) to
(spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` carries the DuckDB
oracle for each. Implementations live in ``wallaroo_spark``; this module just
wires them to the testdata tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wallaroo_spark.queries import QUERIES, ORACLES
from wallaroo_spark.session import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-user tumbling-window aggregation over the events stream
    table (the reference's alerts_windowed semantics, batch mode)."""
    return QUERIES["tumbling_window_sum"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
