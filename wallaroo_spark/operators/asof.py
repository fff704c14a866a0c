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

    The matched right row is carried ATOMICALLY as one struct (timestamp +
    all value columns together): a right row whose value column is NULL
    still advances the match, and the tolerance gap is always measured
    against the timestamp of the very row that supplied the values — never
    a newer row's timestamp paired with an older row's value.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    from pyspark.sql import types as T

    on = list(on)
    keep_left = [c for c in left.columns]
    val_out = [v + suffix for v in right_values]

    rv_type = T.StructType(
        [T.StructField("ts", T.DoubleType())]
        + [T.StructField(v, right.schema[v].dataType) for v in right_values]
    )
    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in on],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        F.struct(
            F.col(right_ts).cast("timestamp").cast("double").alias("ts"),
            *[F.col(v).alias(v) for v in right_values],
        ).alias("_rv"),
    )

    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    # One atomic carry: the struct is NULL on left rows and non-null on
    # every right row, so ignorenulls skips exactly the left rows — value
    # and matched-timestamp always come from the same right row.
    carried = F.last(F.col("_rv"), ignorenulls=True).over(w)
    if tolerance_s is None:
        fresh = F.lit(True)
    else:
        lep = F.col("_ts").cast("timestamp").cast("double")
        gap = (lep - carried["ts"]) if direction == "backward" else (carried["ts"] - lep)
        fresh = gap <= tolerance_s
    filled = unioned.select(
        "*",
        *[F.when(fresh, carried[v]).alias(o) for v, o in zip(right_values, val_out)],
    )
    return filled.filter(F.col("_side") == 1).select(*keep_left, *val_out)
