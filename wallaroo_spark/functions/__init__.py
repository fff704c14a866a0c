"""Scalar-function layer.

The reference has **no** built-in scalar functions (SURVEY §2.3) — all scalar
logic is user Python. Our engine's stdlib is pyspark.sql.functions itself;
this package adds the deterministic, engine-portable primitives (hashing,
tokenization) that the dedup/similarity/text operators share, defined once so
the Spark implementation and the DuckDB oracle are generated from the same
constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Fractional epoch seconds from any timestamp flavor.

    Spark 4.1 forbids CAST(TIMESTAMP_NTZ AS DOUBLE); route through TIMESTAMP
    (session tz is pinned to UTC in session.get_spark, so NTZ -> LTZ is
    value-preserving) where the double cast still means epoch seconds.
    Matches DuckDB's epoch(ts) on the oracle side.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")
