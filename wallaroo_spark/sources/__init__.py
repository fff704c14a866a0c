"""Source layer (reference §2.4): normalized batch readers + streaming sources.

The reference's sources (TCP-framed, Kafka, GenSource, connectors —
`core/source/*`) decode bytes into typed events at the edge. Our engine makes
that the *read layer's* job: every source yields a typed DataFrame with a
proper event-time column, so everything downstream is schema-first.

``read_table`` also normalizes physical quirks at the scan: parquet
TIMESTAMP(NANOS) columns (unsupported by Spark's vectorized reader) are read
as long via ``spark.sql.legacy.parquet.nanosAsLong`` and converted to
microsecond timestamps in the projection — stays inside whole-stage codegen,
no data pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pyarrow is baked in; guard anyway for portability
    import pyarrow.parquet as _pq
except Exception:  # pragma: no cover
    _pq = None

_NANOS_CACHE: dict[str, tuple[str, ...]] = {}


def _nanos_cols(path: str) -> tuple[str, ...]:
    """Footer-only check (no data read) for timestamp[ns] columns."""
    if path in _NANOS_CACHE:
        return _NANOS_CACHE[path]
    cols: tuple[str, ...] = ()
    if _pq is not None:
        try:
            schema = _pq.read_schema(path)
            cols = tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")
        except Exception:
            cols = ()
    _NANOS_CACHE[path] = cols
    return cols


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with nanosecond-timestamp normalization.

    Truncates ns → µs (same as DuckDB's TIMESTAMP_NS → TIMESTAMP view), so
    Spark results hash-match the oracle.
    """
    # timestamps in results are compared against a (naive-UTC) DuckDB oracle;
    # pin the session TZ so a non-UTC driver session can't shift them
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ncols = _nanos_cols(path)
    if ncols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ncols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")
