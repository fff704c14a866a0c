"""Keyed stateful computation — the engine's core custom operator family.

Reference semantics (`@state_computation`, `machida/lib/wallaroo/__init__.py:465-470`;
runner `topology/runner.pony:314-684`): one mutable state instance per key,
created lazily on first message; user fn ``f(msg, state) -> out | [out] | None``
runs per message in event order; state may be dropped (``retain_state=False``).

Spark mapping:

- **streaming**: ``groupBy(keys).applyInPandasWithState`` — state lives in the
  state store (RocksDB/HDFS-backed, incremental checkpoints), messages arrive
  as Arrow batches per key per micro-batch; we sort each batch by event time
  and replay the per-message contract inside the batch. Update-mode emission:
  outputs appended every micro-batch.
- **batch** (the oracle-checkable mode): ``groupBy(keys).applyInPandas`` —
  same user fn, whole key history in one sorted pass. Identical results to
  streaming when the stream is drained (availableNow), because both orders
  are (key, event-time) sorted.

Scale: state is partitioned by key hash across executors (same as the
reference's MD5 ring, `routing/hash_partitions.pony:23-29`); no driver-side
state, no collect. Python fn cost is Arrow-batched; for SQL-expressible
state logic prefer the native operators in ``wallaroo_spark.operators``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

# user contract: fn(row: dict, state: dict) -> list[dict] outputs; mutates state
StateFn = Callable[[dict, dict], list[dict]]


def _make_apply_rows():
    """Build the per-batch row-replay helper as a LOCAL function so
    cloudpickle serializes it by value — executors need no wallaroo_spark
    import (the engine must work under any driver session / cwd, and on a
    cluster without shipping the package)."""

    def apply_rows(pdf_iter, fn, state, ts_col, out_cols):
        import pandas as _pd

        outs = []
        for pdf in pdf_iter:
            if ts_col:
                pdf = pdf.sort_values(ts_col, kind="mergesort")
            for row in pdf.to_dict("records"):
                res = fn(row, state)
                if res:
                    outs.extend(res)
        if outs:
            yield _pd.DataFrame(outs, columns=out_cols)

    return apply_rows


def keyed_state_batch(
    df: DataFrame,
    keys: list[str],
    fn: StateFn,
    initial_state: Callable[[], dict],
    output_schema: StructType | str,
    ts_col: str = "",
) -> DataFrame:
    """Batch execution of a Wallaroo state computation (per-key, event-order)."""
    if isinstance(output_schema, StructType):
        out_cols = [f.name for f in output_schema.fields]
    else:
        out_cols = [c.split()[0].strip() for c in str(output_schema).split(",")]

    apply_rows = _make_apply_rows()

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        state = initial_state()
        frames = list(apply_rows([pdf], fn, state, ts_col, out_cols))
        return frames[0] if frames else _pd.DataFrame(columns=out_cols)

    return df.groupBy(*keys).applyInPandas(run, schema=output_schema)


def keyed_state_stream(
    sdf: DataFrame,
    keys: list[str],
    fn: StateFn,
    initial_state: Callable[[], dict],
    output_schema: StructType | str,
    state_schema: StructType | str,
    pack: Callable[[dict], tuple],
    unpack: Callable[[tuple], dict],
    ts_col: str = "",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming execution of the same state computation.

    ``pack``/``unpack`` convert the user's dict state to/from the typed tuple
    Spark persists in the state store. ``timeout`` in {"NoTimeout",
    "ProcessingTimeTimeout", "EventTimeTimeout"} — event-time timeout is the
    engine's replacement for the reference's step-timeout window flush
    (`runner.pony:465-501`).
    """
    if isinstance(output_schema, StructType):
        out_cols = [f.name for f in output_schema.fields]
    else:
        out_cols = [c.split()[0].strip() for c in str(output_schema).split(",")]

    apply_rows = _make_apply_rows()

    def run(key: tuple, pdf_iter: Iterable[pd.DataFrame], gs: GroupState) -> Iterator[pd.DataFrame]:
        state = unpack(gs.get) if gs.exists else initial_state()
        yield from apply_rows(pdf_iter, fn, state, ts_col, out_cols)
        gs.update(pack(state))

    conf = getattr(GroupStateTimeout, timeout)
    return sdf.groupBy(*keys).applyInPandasWithState(
        run, output_schema, state_schema, "update", conf
    )


def count_window_stream(
    sdf: DataFrame,
    keys: list[str],
    value_col: str,
    n: int,
    ts_col: str = "",
) -> DataFrame:
    """Streaming tumbling count window (reference S9, `windows.pony:106-115`):
    per key, every n messages emit (window_id, n_events, total_value) and
    reset. Carry-over state (partial count/sum) persists across micro-batches
    in the state store.
    """
    key_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + ", window_id bigint, n_events bigint, total_value double"
    )
    state_schema = "window_id bigint, cnt bigint, acc double"

    def run(key: tuple, pdf_iter: Iterable[pd.DataFrame], gs: GroupState) -> Iterator[pd.DataFrame]:
        win_id, cnt, acc = gs.get if gs.exists else (0, 0, 0.0)
        outs = []
        for pdf in pdf_iter:
            if ts_col:
                pdf = pdf.sort_values(ts_col, kind="mergesort")
            for v in pdf[value_col]:
                cnt += 1
                acc += float(v)
                if cnt == n:
                    outs.append((*key, win_id, cnt, acc))
                    win_id, cnt, acc = win_id + 1, 0, 0.0
        gs.update((win_id, cnt, acc))
        if outs:
            yield pd.DataFrame(outs, columns=[*keys, "window_id", "n_events", "total_value"])

    return sdf.groupBy(*keys).applyInPandasWithState(
        run, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
