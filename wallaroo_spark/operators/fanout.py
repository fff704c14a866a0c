"""Scan-width floor for row-group-bound inputs (optimization guide §2/§6).

A parquet scan can never split finer than one ROW GROUP: ``maxPartitionBytes``
carves files into byte ranges, but every row group is assigned to exactly one
task, so a table written as a single row group runs every stage before the
first exchange — explodes, per-row scoring, map-side partial aggregation —
as ONE task no matter how many cores the cluster has. The harness testdata
is exactly that shape (each table = one file, one row group), which left the
scan stage of every heavy query single-threaded on ``local[32]``.

``fan_out`` inserts a deterministic hash repartition on the table's key
ONLY when the scan's row-group-bounded width is below half the cluster's
default parallelism. The width check is metadata-only (``df.inputFiles()``
+ parquet footers, cached) — no job, no data read. At production scale the
same call is a structural no-op: many files / many row groups make the scan
already wide, so no query ever pays a gratuitous payload shuffle. Keyed
(not round-robin) repartition keeps the row placement deterministic under
task retry (guide §2.5) and skips the sort-before-repartition pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pyarrow is baked into the harness; guard for portability
    import pyarrow.parquet as _pq
except Exception:  # pragma: no cover
    _pq = None

_RG_CACHE: dict[str, int] = {}


def _row_groups(uri: str) -> int | None:
    """Row-group count from the parquet footer (metadata-only, cached)."""
    if uri in _RG_CACHE:
        return _RG_CACHE[uri]
    if _pq is None:
        return None
    path = uri
    if path.startswith("file:"):
        path = path[5:]
        while path.startswith("//"):
            path = path[1:]
    try:
        n = _pq.ParquetFile(path).metadata.num_row_groups
    except Exception:
        return None
    _RG_CACHE[uri] = n
    return n


def scan_width(df: DataFrame) -> int | None:
    """Upper bound on the scan's task parallelism, or None if unknowable
    (non-file source, unreadable footer) — callers treat None as 'wide'."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    cores = df.sparkSession.sparkContext.defaultParallelism
    if len(files) >= cores:
        return len(files)  # enough files to fill the cluster; skip footers
    total = 0
    for uri in files:
        n = _row_groups(uri)
        if n is None:
            return None
        total += n
    return total


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a narrow scan across the cluster; no-op when already wide.

    ``keys`` must be a deterministic high-cardinality column set (a table's
    id column) so the hash assignment is stable under retry and unskewed.
    Only the narrow-scan case adds an Exchange — the (tiny) input crosses
    the wire once so that everything downstream of the scan parallelizes.
    """
    if not keys:
        raise ValueError("fan_out requires at least one partitioning key")
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    w = scan_width(df)
    if w is None or w * 2 > cores:
        return df
    return df.repartition(cores, *[F.col(k) for k in keys])
