"""Bounded-state streaming heavy hitters (Misra-Gries / space-saving).

A streaming exact per-token count is unbounded state; the Misra-Gries
summary keeps at most ``capacity`` counters and still guarantees:

- every item with true count > N/capacity is present (no false negatives
  above that support), and
- ``true - N/capacity <= est <= true`` for every tracked item.

This is the stream-side complement of ``operators/sketch.countmin_*``
(which streams natively as a running cell count but cannot enumerate
items). Implemented as the engine's standard keyed state op
(``applyInPandasWithState``); one state row per key holds the counter map —
state size is capacity-bounded regardless of vocabulary, the property that
matters at 100 TB. The global (un-keyed) variant funnels through one state
key per partition-group and merges summaries downstream (MG summaries merge
by counter addition + decrement — associative), mirroring the reference's
collect() funnel (`application.pony:250-256`).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def misra_gries_update(counters: dict, item, capacity: int) -> None:
    """One MG step: increment if tracked or room; else decrement all."""
    if item in counters:
        counters[item] += 1
    elif len(counters) < capacity:
        counters[item] = 1
    else:
        for k in list(counters):
            counters[k] -= 1
            if counters[k] == 0:
                del counters[k]


def heavy_hitters_stream(
    sdf: DataFrame,
    keys: list[str],
    item_col: str,
    capacity: int = 64,
) -> DataFrame:
    """Per-key Misra-Gries summary, emitted (full summary) each micro-batch.

    Output: keys, item, est_count, n_seen — downstream filters
    ``est_count >= support * n_seen`` for the guarantee-backed heavy set.

    The counter state lives in a ``map<string, bigint>`` cell, so the item
    column is canonicalized to string up front (and emitted as string):
    otherwise counter keys restored from the state store come back as
    strings while live items keep their native type, silently splitting
    counts for non-string item columns.
    """
    sdf = sdf.withColumn(item_col, F.col(item_col).cast("string"))
    key_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + f", {item_col} string, est_count bigint, n_seen bigint"
    )
    state_schema = "n_seen bigint, counters map<string, bigint>"
    cols = [c.split()[0] for c in out_schema.split(",")]

    def run(key: tuple, pdf_iter: Iterable[pd.DataFrame], gs: GroupState) -> Iterator[pd.DataFrame]:
        if gs.exists:
            n_seen, counters = gs.get
            counters = dict(counters or {})
        else:
            n_seen, counters = 0, {}
        for pdf in pdf_iter:
            for item in pdf[item_col]:
                misra_gries_update(counters, item, capacity)
                n_seen += 1
        gs.update((n_seen, counters))
        if counters:
            yield pd.DataFrame(
                [(*key, item, cnt, n_seen) for item, cnt in sorted(counters.items())],
                columns=cols,
            )

    return sdf.groupBy(*keys).applyInPandasWithState(
        run, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
