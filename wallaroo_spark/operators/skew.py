"""Skew-handling joins: salting (+ AQE as the first line of defense).

At 100 TB a handful of hot keys (one viral user, one null-ish default) can
pin a join or aggregation to one straggler task. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin`) handles sort-merge joins automatically; this
module provides the explicit **salted join** for the cases AQE can't touch
(hash aggregations over hot keys, broadcast-ineligible dimension joins) and
for deterministic plans.

Salted join: fact side gets a random-ish salt in [0, n); the (small) other
side is exploded n ways; join on (key, salt). Salt derives from a stable
row attribute (xxhash64), keeping the plan deterministic and replayable —
no RNG in the data path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, cols: Sequence[str]) -> DataFrame:
    """Deterministic salt in [0, n) from a stable column set."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n: int,
    salt_src: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on a skewed key, spreading each hot key across n tasks.

    dim rows are replicated n× (explode) — keep dim small relative to n.
    Result is identical to the plain join; only the shuffle layout changes.
    """
    f = with_salt(fact, n, salt_src)
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n)])))
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n: int,
    salt_src: Sequence[str],
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: aggregate per (key, salt)
    first (n-way spread), then combine per key. partial_aggs run on raw rows;
    final_aggs see the partial columns (sum→sum, count→sum, max→max...)."""
    salted = with_salt(df, n, salt_src)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
