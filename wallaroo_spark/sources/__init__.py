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


_STREAM_DIRS: dict[str, str] = {}


def _stream_dir(path: str) -> str:
    """Directory view of a single parquet file (symlink in a temp dir) —
    the shape Spark's file-stream source requires. Cached per path."""
    import os
    import tempfile

    if not os.path.isfile(path):
        return path
    if path not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="ws_streamdir_")
        # absolute target: a relative one would resolve against the temp
        # dir and dangle
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        _STREAM_DIRS[path] = d
    return _STREAM_DIRS[path]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming scan of a testdata table with the same nanosecond
    normalization as `read_table` (the file-stream source needs an explicit
    schema, taken footer-only from the batch reader)."""
    path = f"{sf_dir}/{name}.parquet"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ncols = _nanos_cols(path)
    if ncols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the file-stream source requires a DIRECTORY; testdata tables are
    # single files, so expose each through a cached symlink directory
    sdf = spark.readStream.schema(schema).parquet(_stream_dir(path))
    for c in ncols:
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # TIMESTAMP_NTZ columns can't carry a watermark — cast to TIMESTAMP
    # (session TZ pinned UTC above, so the wall-clock values are unchanged
    # and match the batch reader's type)
    from pyspark.sql.types import TimestampNTZType

    for f in schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            sdf = sdf.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return sdf
