"""User-defined ``Aggregation`` class — the reference's core UDAF contract.

Reference (`machida/lib/wallaroo/__init__.py:198-214` `_validate_aggregation`;
`lib/wallaroo/core/aggregations/aggregations.pony:24-39`): a windowed
aggregation is a class with

- ``initial_accumulator()`` — identity element for ``combine``;
- ``update(input, acc)`` — fold one input into the accumulator (mutates);
- ``combine(acc1, acc2)`` — merge two partials; MUST be associative and must
  not mutate either argument;
- ``output(key, acc)`` — produce the window's result, or ``None`` to emit
  nothing. (Pony's signature is ``output(key, window_end_ts, acc)`` —
  `aggregations.pony:38`; declare a 3-arg ``output`` to receive the window
  end, Python-API 2-arg form is the default.)

Spark mapping: this is exactly the ``Aggregator``/pandas-UDAF shape. Batch
windows run it inside ``applyInPandas`` per (key, window) group, folding
``update`` over time-ordered chunks and ``combine`` over the chunk partials —
the same partial-then-merge structure the reference's pane combine uses
(`panes_range_windows.pony:276-299`), so a contract violation (non-associative
combine, mutating combine) produces visibly wrong results instead of silently
passing. Streaming tumbling windows run it in ``applyInPandasWithState`` with
the pickled accumulator in the state store and an event-time timeout flush.

Inputs arrive as plain dicts (one per row); for column-expressible
aggregations prefer native ``pyspark.sql.functions`` aggs (10-100× faster) —
this class is the *user-extension* surface, like the reference's Python API.
"""

from __future__ import annotations

import inspect
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wallaroo_spark.functions import epoch_seconds
from wallaroo_spark.streaming.epochs import epoch_fn

# Executors do NOT have wallaroo_spark on their path (the engine ships no
# code to workers — closures travel by value, see streaming/state.py). A user
# Aggregation subclass would drag this module in by reference through its
# base class, so register the module for pickle-by-value: the base class and
# fold helpers serialize INTO the closure. Subclasses defined at module level
# of the user's own (worker-unimportable) module still need to be local to a
# function or registered the same way — documented in the class docstring.
import sys as _sys

try:  # pragma: no cover - vendored cloudpickle always present in pyspark>=3.3
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_CHUNK_ROWS = 1024  # partial-aggregation granularity inside a window group


class Aggregation:
    """Base class for user aggregations (subclass and implement the four
    methods; ``name`` defaults to the class name)."""

    def name(self) -> str:
        return type(self).__name__

    def initial_accumulator(self):
        raise NotImplementedError

    def update(self, data, acc) -> None:
        raise NotImplementedError

    def combine(self, acc1, acc2):
        raise NotImplementedError

    def output(self, key, acc):
        raise NotImplementedError


def validate_aggregation(agg) -> None:
    """Parity with the reference's `_validate_aggregation`
    (`machida/lib/wallaroo/__init__.py:198-214`), plus arity checks it TODOs."""
    for meth, arity in (
        ("name", 0),
        ("initial_accumulator", 0),
        ("update", 2),
        ("combine", 2),
        ("output", (2, 3)),
    ):
        fn = getattr(agg, meth, None)
        if fn is None or not callable(fn):
            raise TypeError(f"Aggregation must have method {meth!r}")
        n = len(
            [
                p
                for p in inspect.signature(fn).parameters.values()
                if p.kind
                in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            ]
        )
        ok = n in arity if isinstance(arity, tuple) else n == arity
        if not ok:
            raise TypeError(
                f"Aggregation.{meth} must take {arity} parameter(s), has {n}"
            )


def _output_arity(agg) -> int:
    params = [
        p
        for p in inspect.signature(agg.output).parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    return len(params)


def _fold_window(agg, records):
    """update over time-ordered chunks, then combine partials in order —
    the pane-combine execution shape; returns the final accumulator."""
    partials = []
    for i in range(0, len(records), _CHUNK_ROWS):
        acc = agg.initial_accumulator()
        for rec in records[i : i + _CHUNK_ROWS]:
            agg.update(rec, acc)
        partials.append(acc)
    acc = agg.initial_accumulator()
    for p in partials:
        acc = agg.combine(acc, p)
    return acc


def _emit(agg, key, window_end, acc, arity):
    if arity == 3:
        return agg.output(key, window_end, acc)
    return agg.output(key, acc)


def _out_cols(keys: list[str], out_schema: str) -> list[str]:
    return [*keys, "window_start", "window_end"] + [
        c.strip().split()[0] for c in out_schema.split(",")
    ]


def _full_schema(df: DataFrame, keys: list[str], out_schema: str) -> str:
    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + ", window_start bigint, window_end bigint, "
        + out_schema
    )


def windowed_agg_batch(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    agg: Aggregation,
    out_schema: str,
    size_s: int,
    slide_s: int | None = None,
    n_salts: int = 1,
) -> DataFrame:
    """Batch tumbling/sliding windows over a user Aggregation.

    Window assignment is native Column math (one explode for sliding), so
    only the per-window fold runs in Python; the groupBy shuffles once on
    (keys, window_start) — the same partitioning a native window agg uses.
    Output: keys, window_start/window_end (epoch seconds), out_schema fields.
    ``output`` returning None suppresses that window.

    ``n_salts > 1`` enables the salted two-phase fold for hot keys: each
    window is cut into ``n_salts`` time-contiguous PANES (salt = pane index,
    the reference's pane shape — `panes_range_windows.pony:276-299`), stage 1
    folds each (key, pane) partial in parallel, stage 2 combines pane
    partials per key in pane order. Because panes are time-contiguous and
    ``combine`` is contractually associative, the result is identical to the
    sequential fold — but one hot key's window now runs as ``n_salts``
    CPU-bound tasks instead of one. Default 1 keeps the single-stage path
    (right when keys >> cores; salting adds a shuffle + pickling).
    """
    validate_aggregation(agg)
    slide = slide_s or size_s
    n_wins = size_s // slide if size_s % slide == 0 else None
    if n_wins is None:
        raise ValueError("window size must be a multiple of slide")
    ep = epoch_seconds(ts_col)
    base = F.floor(ep / slide).cast("long") * slide
    starts = F.array(*[base - F.lit(i * slide) for i in range(n_wins)])
    assigned = df.withColumn(
        "_ws", F.explode(F.filter(starts, lambda s: ep < s + size_s))
    )

    schema = _full_schema(df, keys, out_schema)
    cols = _out_cols(keys, out_schema)
    fields = _out_fields(out_schema)
    arity = _output_arity(agg)
    single_key = len(keys) == 1

    if n_salts > 1:
        return _windowed_agg_batch_salted(
            assigned, keys, ts_col, agg, size_s, n_salts,
            schema, cols, fields, arity, single_key,
        )

    # Group by KEY ONLY and walk that key's windows inside one pandas call:
    # grouping by (keys, window) would mean one Arrow/JVM round-trip per
    # window — with ~1 row per window that is pure per-group overhead
    # (measured 60x slower at sf0.1). Per-key group sizes stay bounded by
    # rows_per_key * windows_per_row, the same memory bound the reference's
    # per-key pane state had.
    def run(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        key = key_tuple[0] if single_key else tuple(key_tuple)
        pdf = pdf.sort_values(["_ws", ts_col], kind="mergesort")
        ws_arr = pdf["_ws"].to_numpy()
        recs = pdf.drop(columns=["_ws"]).to_dict("records")
        rows = []

        def flush(ws, buf):
            acc = _fold_window(agg, buf)
            out = _emit(agg, key, int(ws) + size_s, acc, arity)
            if out is not None:
                rows.append((*key_tuple, int(ws), int(ws) + size_s, *_row_vals(out, fields)))

        # single sequential pass over (window, ts)-sorted rows: a pandas
        # groupby per window costs ~1ms of framework overhead per group,
        # which at ~1 row/window dominates everything
        cur_ws, buf = None, []
        for ws, rec in zip(ws_arr, recs):
            if cur_ws is not None and ws != cur_ws:
                flush(cur_ws, buf)
                buf = []
            cur_ws = ws
            buf.append(rec)
        if cur_ws is not None:
            flush(cur_ws, buf)
        return _pd.DataFrame(rows, columns=cols)

    # explicit repartition on the grouping keys: AQE coalesces by BYTES, and
    # this stage is CPU-bound Python — a few MB of rows can be hours of
    # kernel time, so keep the key-hash spread at full parallelism (the
    # explicit numbered repartition is exempt from AQE coalescing)
    n_parts = assigned.sparkSession.sparkContext.defaultParallelism
    return assigned.repartition(n_parts, *keys).groupBy(*keys).applyInPandas(run, schema=schema)


def _windowed_agg_batch_salted(
    assigned: DataFrame,
    keys: list[str],
    ts_col: str,
    agg: Aggregation,
    size_s: int,
    n_salts: int,
    schema: str,
    cols: list[str],
    fields: list[str],
    arity: int,
    single_key: bool,
):
    """Salted two-phase fold (see windowed_agg_batch): stage 1 partial-folds
    each time-contiguous PANE of a window per (key, pane) in parallel, stage
    2 combines a window's pane partials in pane order. Time-contiguous panes
    + associative combine => identical result to the sequential fold, with a
    hot key's heavy update work spread over n_salts tasks."""
    pane_len = size_s / n_salts
    assigned = assigned.withColumn(
        "_salt",
        F.least(
            F.lit(n_salts - 1),
            F.floor((epoch_seconds(ts_col) - F.col("_ws")) / F.lit(pane_len)),
        ).cast("int"),
    )
    key_types = {f.name: f.dataType.simpleString() for f in assigned.schema.fields}
    mid_schema = (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + ", _salt int, _ws bigint, _acc binary"
    )

    def fold_panes(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd
        import pickle as _pickle

        pdf = pdf.sort_values(["_ws", ts_col], kind="mergesort")
        ws_arr = pdf["_ws"].to_numpy()
        recs = pdf.drop(columns=["_ws", "_salt"]).to_dict("records")
        rows = []
        cur_ws, buf = None, []
        for ws, rec in zip(ws_arr, recs):
            if cur_ws is not None and ws != cur_ws:
                rows.append((*key_tuple, int(cur_ws), _pickle.dumps(_fold_window(agg, buf))))
                buf = []
            cur_ws = ws
            buf.append(rec)
        if cur_ws is not None:
            rows.append((*key_tuple, int(cur_ws), _pickle.dumps(_fold_window(agg, buf))))
        return _pd.DataFrame(rows, columns=[*keys, "_salt", "_ws", "_acc"])

    def combine_panes(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd
        import pickle as _pickle

        key = key_tuple[0] if single_key else tuple(key_tuple)
        pdf = pdf.sort_values(["_ws", "_salt"], kind="mergesort")
        rows = []

        def flush(ws, panes):
            acc = agg.initial_accumulator()
            for p in panes:
                acc = agg.combine(acc, p)
            out = _emit(agg, key, int(ws) + size_s, acc, arity)
            if out is not None:
                rows.append((*key_tuple, int(ws), int(ws) + size_s, *_row_vals(out, fields)))

        cur_ws, panes = None, []
        for ws, blob in zip(pdf["_ws"].to_numpy(), pdf["_acc"]):
            if cur_ws is not None and ws != cur_ws:
                flush(cur_ws, panes)
                panes = []
            cur_ws = ws
            panes.append(_pickle.loads(blob))
        if cur_ws is not None:
            flush(cur_ws, panes)
        return _pd.DataFrame(rows, columns=cols)

    n_parts = assigned.sparkSession.sparkContext.defaultParallelism
    partials = (
        assigned.repartition(n_parts, *keys, "_salt")
        .groupBy(*keys, "_salt")
        .applyInPandas(fold_panes, schema=mid_schema)
    )
    # stage 2 moves only O(keys x windows x salts) pickled partials — the
    # per-key serial section is the cheap combine, not the row fold
    return (
        partials.repartition(n_parts, *keys)
        .groupBy(*keys)
        .applyInPandas(combine_panes, schema=schema)
    )


def _out_fields(out_schema: str) -> list[str]:
    return [c.strip().split()[0] for c in out_schema.split(",")]


def _row_vals(out, fields: list[str]) -> tuple:
    # dict outputs are mapped by out_schema field NAME, not insertion order:
    # a dict built in a different order would otherwise silently write values
    # into the wrong columns (types may even coincide, so no error surfaces)
    if isinstance(out, dict):
        if set(out) != set(fields):
            raise KeyError(
                f"Aggregation.output() dict keys {sorted(out)} do not match "
                f"out_schema fields {sorted(fields)}"
            )
        return tuple(out[f] for f in fields)
    if isinstance(out, (tuple, list)):
        return tuple(out)
    return (out,)


def windowed_agg_stream(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str,
    agg: Aggregation,
    out_schema: str,
    size_s: int,
    delay_s: int = 0,
    slide_s: int | None = None,
) -> DataFrame:
    """Streaming tumbling/sliding windows over a user Aggregation.

    State per key: running max event-ts, the per-key emitted watermark, and
    {window_start: pickled acc}. A window emits when the per-key watermark
    (max_ts - delay) passes its end; an event-time timeout flushes only the
    windows whose end the GLOBAL watermark has passed, keeping the rest in
    state with a re-registered timeout — the reference's step-timeout flush
    (`runner.pony:465-501`). ``emit_wm`` records the highest watermark any
    emission used: an event that is late for this key while still ahead of
    the global watermark (so not dropped by Spark) must NOT re-create an
    already-emitted window with a fresh accumulator — that would emit a
    second, partial row for the same (key, window_start). Such events are
    dropped (the drop late-data policy); route them elsewhere upstream if
    another policy is wanted. Sliding: each event updates its
    size_s/slide_s overlapping windows (bounded per-key state:
    windows-in-flight x acc). Requires ``withWatermark`` upstream.
    """
    validate_aggregation(agg)
    slide = slide_s or size_s
    if size_s % slide != 0:
        raise ValueError("window size must be a multiple of slide")
    n_wins = size_s // slide
    schema = _full_schema(sdf, keys, out_schema)
    cols = _out_cols(keys, out_schema)
    fields = _out_fields(out_schema)
    state_schema = "max_ts double, emit_wm double, wins map<bigint, binary>"
    arity = _output_arity(agg)
    single_key = len(keys) == 1
    # tz-safe: window starts/deadlines are compared to real-epoch watermark
    to_ep = epoch_fn(sdf)

    def emit_rows(key, wins, ws_list):
        import pickle as _pickle

        rows = []
        k = key[0] if single_key else tuple(key)
        for ws in ws_list:
            acc = _pickle.loads(wins.pop(ws))
            out = _emit(agg, k, ws + size_s, acc, arity)
            if out is not None:
                rows.append((*key, int(ws), int(ws) + size_s, *_row_vals(out, fields)))
        return rows

    def run(key: tuple, pdf_iter: Iterable[pd.DataFrame], gs: GroupState) -> Iterator[pd.DataFrame]:
        import pickle as _pickle

        if gs.hasTimedOut:  # pragma: no cover - live-stream idle flush
            max_ts, emit_wm, wins = gs.get
            wins = dict(wins or {})
            wm_g = gs.getCurrentWatermarkMs() / 1000.0
            # flush only watermark-passed windows; an idle gap must not force
            # out partials that a later event could legitimately still update
            ripe = [w for w in sorted(wins) if w + size_s <= wm_g]
            rows = emit_rows(key, wins, ripe)
            if wins:
                emit_wm = max(emit_wm, wm_g)
                gs.update((max_ts, emit_wm, wins))
                deadline_ms = int((min(wins) + size_s) * 1000)
                gs.setTimeoutTimestamp(max(deadline_ms, gs.getCurrentWatermarkMs() + 1))
            else:
                gs.remove()
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            return

        if gs.exists:
            max_ts, emit_wm, wins = gs.get
            wins = dict(wins or {})
        else:
            max_ts, emit_wm, wins = float("-inf"), float("-inf"), {}
        outs = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for rec in pdf.to_dict("records"):
                ep = to_ep(rec[ts_col])
                max_ts = max(max_ts, ep)
                base = int(ep // slide) * slide
                for i in range(n_wins):
                    ws = base - i * slide
                    if ws + size_s <= emit_wm:
                        continue  # window already emitted — drop, don't re-open
                    acc = (
                        _pickle.loads(wins[ws])
                        if ws in wins
                        else agg.initial_accumulator()
                    )
                    agg.update(rec, acc)
                    wins[ws] = _pickle.dumps(acc)
            wm = max_ts - delay_s
            outs.extend(emit_rows(key, wins, [w for w in sorted(wins) if w + size_s <= wm]))
            emit_wm = max(emit_wm, wm)
        gs.update((max_ts, emit_wm, wins))
        # always register a timeout: with open windows it drives the idle
        # flush; with none it clears the (max_ts, emit_wm) tombstone once
        # the global watermark passes — events that could re-open an
        # emitted window are globally late by then and Spark drops them,
        # so removing the guard state is safe and the per-key state stays
        # bounded even for keys that go quiet forever
        deadline_ms = int((max_ts + delay_s + size_s) * 1000)
        gs.setTimeoutTimestamp(max(deadline_ms, gs.getCurrentWatermarkMs() + 1))
        if outs:
            yield pd.DataFrame(outs, columns=cols)

    return sdf.groupBy(*keys).applyInPandasWithState(
        run, schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )
