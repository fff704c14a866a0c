"""Late-data policies for event-time windows (reference S8).

Reference (`late_data_policy.pony:1-5`; dispatch `panes_range_windows.pony:146-167`;
docs `windows.md:104-139`): a message is *late* when its event_ts belongs to a
window the watermark has already closed. Policies:

- ``drop`` (default): discard;
- ``fire_per_message``: the late message becomes its own 1-element window
  whose end_ts is the message's event_ts;
- ``place_in_oldest_window``: the late message joins the oldest window still
  open in state.

Batch reference semantics (what the oracle checks — defined precisely here
because the reference's trigger-time behavior is racy by design):

- arrival order = ``arrival_col`` (monotone ingest id; the testdata's
  event_id);
- per-key watermark at arrival i = max(event_ts) over arrivals ≤ i, minus
  ``delay``. (The reference's watermark is per-source global; per-key is the
  parallelizable batch analog — one hash shuffle, no global sort. Divergence
  documented.)
- a row is late iff its tumbling window [w, w+size) has closed:
  ``w + size <= watermark``;
- oldest open window at arrival i = window containing the watermark
  (``floor(wm / size)``), the earliest window not yet closed.

All three policies are one window-function pass + one aggregation — no state
op needed in batch; the streaming path reuses the keyed-state operator with
EventTimeTimeout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wallaroo_spark.functions import epoch_seconds

DROP = "drop"
FIRE_PER_MESSAGE = "fire_per_message"
PLACE_IN_OLDEST_WINDOW = "place_in_oldest_window"


def _with_lateness(
    df: DataFrame, ts: str, keys: Sequence[str], arrival_col: str, size_s: int, delay_s: int
) -> DataFrame:
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(arrival_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ep = epoch_seconds(ts)
    wm = F.max(ep).over(w) - F.lit(delay_s)
    own_win = F.floor(ep / size_s) * size_s
    return (
        df.withColumn("_ep", ep)
        .withColumn("_wm", wm)
        .withColumn("_own_win", own_win)
        .withColumn("_late", own_win + size_s <= F.col("_wm"))
    )


def windowed_with_late_policy(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    size: int,
    delay: int,
    policy: str,
    arrival_col: str,
) -> DataFrame:
    """Tumbling windows (size/delay in seconds) under a late-data policy.

    Output: keys, window_start, window_end (epoch seconds, bigint), aggs,
    plus is_late_fire flag for fire_per_message singleton windows.
    """
    d = _with_lateness(df, ts, keys, arrival_col, size, delay)
    keys = list(keys)

    if policy == DROP:
        assigned = d.filter(~F.col("_late")).withColumn("_win", F.col("_own_win"))
        fired = None
    elif policy == PLACE_IN_OLDEST_WINDOW:
        oldest = F.floor(F.col("_wm") / size) * size
        assigned = d.withColumn(
            "_win", F.when(F.col("_late"), oldest).otherwise(F.col("_own_win"))
        )
        fired = None
    elif policy == FIRE_PER_MESSAGE:
        assigned = d.filter(~F.col("_late")).withColumn("_win", F.col("_own_win"))
        # Group by the arrival id too: every late MESSAGE fires its own
        # singleton window (reference emits one per message), so two late
        # rows sharing (key, event_ts) must not collapse into one group.
        fired = (
            d.filter(F.col("_late"))
            .groupBy(*keys, arrival_col, F.col("_ep").alias("_fire_ts"))
            .agg(*aggs)
            .select(
                *keys,
                F.col("_fire_ts").cast("long").alias("window_start"),
                F.col("_fire_ts").cast("long").alias("window_end"),
                *[c for c in _names(aggs)],
                F.lit(True).alias("is_late_fire"),
            )
        )
    else:
        raise ValueError(f"unknown late-data policy: {policy}")

    regular = (
        assigned.groupBy(*keys, "_win")
        .agg(*aggs)
        .select(
            *keys,
            F.col("_win").cast("long").alias("window_start"),
            (F.col("_win") + size).cast("long").alias("window_end"),
            *_names(aggs),
            F.lit(False).alias("is_late_fire"),
        )
    )
    return regular if fired is None else regular.unionByName(fired)


def _names(aggs: Sequence[Column]) -> list[str]:
    out = []
    for c in aggs:
        s = str(c)
        if " AS " not in s:
            raise ValueError(f"aggregate must be aliased: {s}")
        out.append(s.rsplit(" AS ", 1)[1].rstrip("'>").strip("`"))
    return out
