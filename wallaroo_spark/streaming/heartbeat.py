"""Idle-upstream watermark mitigation for the NATIVE-window path.

Reference behavior (`lib/wallaroo/core/windows/watermarks.pony:73-123`):
an upstream that hasn't been heard from within ``last_heard_threshold`` is
EVICTED from the min-watermark calculation, so downstream windows keep
firing while a source idles. Spark's global watermark has no native
analog: it only advances when new rows flow through the
EventTimeWatermark operator, so one idle source freezes every downstream
window (`spark.sql.streaming.multipleWatermarkPolicy=max` helps only
across *multiple* watermarked branches, not a single idle source).

Our custom state operators already sidestep this with event-time timers
clamped to the query watermark; this module closes the gap for native
``groupBy(window(...))`` aggregations: union a **heartbeat stream** whose
event time tracks the wall clock into the source before the watermark, so
the watermark keeps moving while the real upstream idles. Heartbeat rows
are tagged and filtered back out immediately after the watermark is
attached — the EventTimeWatermark operator has already seen their
timestamps, so closed windows fire, and no heartbeat row ever reaches the
aggregation.

Same trade-off the reference makes: once the idle mitigation advances the
watermark, a revived upstream's backlog is late data (handled by the S8
policies). That divergence is inherent to eviction, not to Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_idle_heartbeat(
    sdf: DataFrame,
    ts_col: str,
    delay: str,
    heartbeats: DataFrame | None = None,
    tick_s: float = 1.0,
) -> DataFrame:
    """Watermark ``sdf`` so it keeps advancing while the source idles.

    Returns ``sdf`` with ``withWatermark(ts_col, delay)`` applied, where
    the watermark is ALSO advanced by a heartbeat stream (default: the
    rate source ticking every ``tick_s`` seconds at wall-clock event time
    — pass ``heartbeats`` with a ``ts_col`` column to control ticks in
    tests or to heartbeat from an external liveness signal). The result
    contains only real rows; aggregate it directly.
    """
    spark = sdf.sparkSession
    if heartbeats is None:
        # the rate source parses rowsPerSecond with Long.parseLong — a
        # float string crashes at stream start. Sub-second ticks round up
        # to >=1 row/s (extra heartbeats are harmless: they only advance
        # the watermark); slower ticks become 1 row/s + numPartitions=1.
        rows_per_sec = max(1, round(1.0 / tick_s))
        heartbeats = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(int(rows_per_sec)))
            .option("numPartitions", "1")
            .load()
            .select(F.col("timestamp").alias(ts_col))
        )
    hb = heartbeats.select(
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in sdf.schema.fields
            if f.name != ts_col
        ],
        F.col(ts_col).cast(sdf.schema[ts_col].dataType).alias(ts_col),
        F.lit(True).alias("_hb"),
    )
    real = sdf.withColumn("_hb", F.lit(False))
    merged = real.unionByName(hb.select(real.columns)).withWatermark(ts_col, delay)
    # The filter MUST stay above the EventTimeWatermark node, or the
    # heartbeat rows are removed before they advance the watermark —
    # Catalyst pushes any predicate that doesn't reference the watermark
    # column below it (PushPredicateThroughNonJoin), so the predicate
    # references ts_col (vacuously: heartbeat timestamps are never null)
    # to pin itself above the watermark.
    keep = (~F.col("_hb")) | F.col(ts_col).isNull()
    return merged.filter(keep).drop("_hb")
