"""As-of join — the engine's version of Wallaroo's keyed stream enrichment.

Reference: market_spread (`examples/python/market_spread/market_spread.py:58-103`)
merges two streams, keys by symbol, and keeps "latest market state per key" in
a state computation; each order is enriched with the most recent market row at
or before its event time. Relationally that is an **as-of join**:

    left L asof-join right R on L.key = R.key and R.ts <= L.ts  (take latest R)

Implementation (scalable, single shuffle): tag both sides, union, hash-shuffle
on key, sort within partition by (ts, side-tiebreak), then
``last(value, ignorenulls=True)`` over an unbounded-preceding running frame
carries the latest right-side values forward; finally filter back to left
rows. No cross/range join, no per-key driver loops — at 100 TB this is one
sort-merge-shape pass, and skewed keys are handled by AQE.

The right-before-left tiebreak (side ordinal) makes a right row with
ts == left.ts visible to that left row, matching "state updated before the
order is processed" when market data arrives first at equal timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right-side values for the same
    key — ``direction="backward"`` (default) takes the latest right row with
    right.ts <= left.ts, ``"forward"`` the earliest with right.ts >=
    left.ts (pandas merge_asof's axis). Right values are null when no
    qualifying right row exists (left-outer as-of), or when it is farther
    than ``tolerance_s`` seconds away (max-staleness bound).

    Forward is the same single-shuffle carry pass with the sort reversed;
    tolerance adds no extra join — the matched right timestamp rides the
    same window and a Column predicate nulls stale enrichments.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    keep_left = [c for c in left.columns]
    val_out = [v + suffix for v in right_values]

    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_rv_{v}") for v in right_values],
        F.lit(None).cast("double").alias("_rv_ts"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(v).alias(f"_rv_{v}") for v in right_values],
        F.col(right_ts).cast("timestamp").cast("double").alias("_rv_ts"),
    )

    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    matched_ts = F.last(F.col("_rv_ts"), ignorenulls=True).over(w)
    if tolerance_s is None:
        fresh = F.lit(True)
    else:
        lep = F.col("_ts").cast("timestamp").cast("double")
        gap = (lep - matched_ts) if direction == "backward" else (matched_ts - lep)
        fresh = gap <= tolerance_s
    filled = unioned.select(
        "*",
        *[
            F.when(fresh, F.last(F.col(f"_rv_{v}"), ignorenulls=True).over(w)).alias(o)
            for v, o in zip(right_values, val_out)
        ],
    )
    return filled.filter(F.col("_side") == 1).select(*keep_left, *val_out)
