"""Stateless computation operators (reference S2: `.to(computation)`).

Wallaroo's stateless computation returns ``out | [out, ...] | None``
(`lib/wallaroo/core/topology/computations.pony:30-46`): single value = map,
None = filter-out, list = flatMap. Spark-first mapping:

- map with **Column expressions** (JVM, whole-stage codegen) — the preferred
  path; user supplies ``dict[name, Column]``;
- filter-by-None → ``df.filter`` on a Column predicate;
- flatMap → ``explode`` of an array-producing expression;
- arbitrary Python logic (the escape hatch) → Arrow-batched ``mapInPandas``,
  never row-at-a-time UDFs.

Chains of these stay in one whole-stage-codegen span — Spark's equivalent of
the reference's operator fusion (`application_distributor.pony:158-200`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compute(df: DataFrame, exprs: dict[str, Column], keep: bool = True) -> DataFrame:
    """Map stage: add/replace columns from native expressions.

    ``keep=False`` projects to only the supplied columns (pure map).
    """
    if keep:
        out = df
        for name, col in exprs.items():
            out = out.withColumn(name, col)
        return out
    return df.select(*[col.alias(name) for name, col in exprs.items()])


def compute_filter(df: DataFrame, predicate: Column) -> DataFrame:
    """Filter stage — reference's "return None to drop" expressed as a pushed-
    down predicate (reaches the parquet scan when referencing scan columns)."""
    return df.filter(predicate)


def compute_multi(df: DataFrame, array_expr: Column, out_name: str, keep: list[str] | None = None) -> DataFrame:
    """flatMap stage (reference `@computation_multi`): one row → N rows via an
    array-producing native expression + explode. Stays JVM-side."""
    cols = keep if keep is not None else df.columns
    return df.select(*cols, F.explode(array_expr).alias(out_name))


def compute_pandas(
    df: DataFrame,
    fn: Callable[[Iterator], Iterator],
    schema,
) -> DataFrame:
    """Escape hatch for genuinely imperative logic: Arrow-batched mapInPandas.
    ~10-100x faster than row UDFs; still the slow path vs Column exprs."""
    return df.mapInPandas(fn, schema=schema)
