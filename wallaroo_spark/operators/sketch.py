"""Fixed-size sketches for unbounded-cardinality aggregation.

At 100 TB an exact per-token groupBy is a vocabulary-sized shuffle; a
count-min sketch bounds state at depth x width cells regardless of
cardinality, with a one-sided (overestimate-only) error of at most
``e/width * total`` per query. Not in the reference (its state is opaque
user Python); this is the training-pipeline scale path for frequency
estimation, and the shape Structured Streaming needs for windowed heavy
hitters with bounded state.

Deterministic by construction: the d row-hashes come from the shared
md5-based permutation family (``functions/hashing.py``), so the DuckDB
oracle rebuilds the identical sketch cell-for-cell — an *approximate*
operator with an *exact* correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wallaroo_spark.functions import hashing as H

DEPTH = 4
WIDTH = 1024


def _cell_col(item: Column, row: int, width: int) -> Column:
    return H.perm_col(H.hmod_col(item), row) % F.lit(width)


def _cell_sql(expr: str, row: int, width: int) -> str:
    return f"({H.perm_sql(H.hmod_sql(expr), row)} % {width})"


def countmin_build(
    items: DataFrame, item_col: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """items (one row per occurrence) -> sketch cells (row, col, cnt).

    One explode to (row, col) per occurrence + one groupBy: the shuffle key
    space is depth*width cells, CONSTANT in data size — the whole point.
    """
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell_col(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    ).select(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame, queries: DataFrame, item_col: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Estimate each query item's count: min over its depth cells.

    The sketch is depth*width rows — broadcast it; estimation is then a
    map-side join however large the query set is.
    """
    probes = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell_col(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(item_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def countmin_sql_cells(item_expr: str, source_sql: str, depth: int = DEPTH, width: int = WIDTH) -> str:
    """DuckDB CTE body rebuilding the identical sketch (UNION ALL per row)."""
    selects = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cell_sql(item_expr, r, width)} AS col FROM {source_sql}"
        for r in range(depth)
    )
    return f"SELECT row, col, count(*) AS cnt FROM ({selects}) GROUP BY row, col"
