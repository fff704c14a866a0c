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

from wallaroo_spark.streaming.epochs import epoch_fn

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
    flush_timeout_s: float | None = None,
) -> DataFrame:
    """Streaming tumbling count window (reference S9, `windows.pony:106-115`):
    per key, every n messages emit (window_id, n_events, total_value) and
    reset. Carry-over state (partial count/sum) persists across micro-batches
    in the state store.

    ``flush_timeout_s`` adds the reference's idle-timeout partial flush
    (`windows.pony:483-487` timeout_interval = 5 s; on_timeout at :495-504
    emits the partial window and resets the accumulator): when the
    EVENT-TIME watermark passes ``last_event_ts + flush_timeout_s`` with a
    non-empty partial window, the partial is emitted with its current
    window_id (n_events < n identifies it as partial) and a FRESH window
    opens (window_id advances) — the reference's wall-clock timer made
    deterministic via event time, the same discipline as the ephemeral /
    late-policy operators. Requires ``ts_col`` and an upstream
    ``withWatermark``. Default None keeps the exact r11 behavior AND state
    schema (existing query checkpoints stay compatible)."""
    key_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + ", window_id bigint, n_events bigint, total_value double"
    )
    if flush_timeout_s is None:
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

    if not ts_col:
        raise ValueError(
            "count_window_stream: flush_timeout_s needs ts_col (the idle "
            "deadline is event-time: last event ts + timeout) and an "
            "upstream withWatermark"
        )
    state_schema = "window_id bigint, cnt bigint, acc double, last_ts double"
    cols = [*keys, "window_id", "n_events", "total_value"]
    # tz-safe: delivered timestamps are naive in the SESSION timezone,
    # but the idle deadline is compared against real-epoch watermark ms
    # (ADVICE r12) — localize before taking the epoch
    to_ep = epoch_fn(sdf)

    def run_t(key: tuple, pdf_iter: Iterable[pd.DataFrame], gs: GroupState) -> Iterator[pd.DataFrame]:
        if gs.hasTimedOut:
            win_id, cnt, acc, last_ts = gs.get
            outs = []
            if cnt > 0:  # partial flush: emit and open a fresh window
                outs.append((*key, win_id, cnt, acc))
                win_id, cnt, acc = win_id + 1, 0, 0.0
            # empty window needs no timer; next data re-arms it
            gs.update((win_id, cnt, acc, last_ts))
            if outs:
                yield pd.DataFrame(outs, columns=cols)
            return
        win_id, cnt, acc, last_ts = gs.get if gs.exists else (0, 0, 0.0, 0.0)
        outs = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                ep = to_ep(ts)
                # inline gap flush: a key with NEW data in a batch never
                # gets its hasTimedOut call (Spark fires timers only for
                # data-less keys), so an event arriving after an idle gap
                # must flush the stale partial itself — event-time gap >
                # timeout, the deterministic replay of the reference's
                # wall-clock timer
                if cnt > 0 and ep > last_ts + flush_timeout_s:
                    outs.append((*key, win_id, cnt, acc))
                    win_id, cnt, acc = win_id + 1, 0, 0.0
                last_ts = max(last_ts, ep)
                cnt += 1
                acc += float(v)
                if cnt == n:
                    outs.append((*key, win_id, cnt, acc))
                    win_id, cnt, acc = win_id + 1, 0, 0.0
        gs.update((win_id, cnt, acc, last_ts))
        if cnt > 0:
            # idle deadline: watermark STRICTLY past last event + timeout
            # (+1ms), clamped above the current watermark (Spark rejects
            # timers at-or-below it — the ephemeral/late discipline)
            deadline_ms = int((last_ts + flush_timeout_s) * 1000) + 1
            gs.setTimeoutTimestamp(max(deadline_ms, gs.getCurrentWatermarkMs() + 1))
        if outs:
            yield pd.DataFrame(outs, columns=cols)

    return sdf.groupBy(*keys).applyInPandasWithState(
        run_t, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )
