"""Ephemeral windows — exact reference semantics (S11).

Reference (`application.pony:57-60`; `windows.pony:81-104`;
`ephemeral_window.pony:65-166`): a one-shot per-key window

- opens at the key's first message (window start = first event_ts);
- triggers (emits) when watermark >= start + trigger_range;
- keeps accepting late messages until start + trigger_range +
  post_trigger_range (emitting per late policy);
- then the key's state is DELETED; a later message opens a fresh window.

Native ``session_window`` approximates this (gap-based, merges sessions);
this module implements the exact one-shot contract as a keyed state op.

Streaming: ``applyInPandasWithState`` with ``EventTimeTimeout`` — the timer
replaces the reference's step timeout flush (`runner.pony:465-501`).
Batch: one sorted pass per key (same code path as keyed_state_batch),
emitting at simulated watermark = max event_ts seen (arrival order).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _out_schema(keys: list[str], key_types: dict[str, str]) -> str:
    return (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + ", window_start double, n_events bigint, total_value double, closed boolean"
    )


def ephemeral_windows_batch(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    trigger_range_s: float,
    post_trigger_range_s: float,
) -> DataFrame:
    """Batch-mode exact ephemeral windows over arrival order = event order.

    Emits one row per completed window per key: (window_start epoch-secs,
    n_events, total_value, closed). Rows after the post-trigger deadline open
    a fresh window; a final unclosed window (stream tail) is emitted with
    closed=false.
    """
    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = _out_schema(keys, key_types)
    cols = [c.split()[0] for c in schema.split(",")]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        kvals = [pdf.iloc[0][k] for k in keys]
        outs = []
        start = None
        cnt, acc = 0, 0.0
        for ts, v in zip(pdf[ts_col], pdf[value_col]):
            ep = ts.timestamp()
            if start is not None and ep > start + trigger_range_s + post_trigger_range_s:
                outs.append((*kvals, start, cnt, acc, True))  # close + delete state
                start = None
            if start is None:
                start, cnt, acc = ep, 0, 0.0
            cnt += 1
            acc += float(v)
        if start is not None:
            outs.append((*kvals, start, cnt, acc, False))
        return pd.DataFrame(outs, columns=cols)

    return df.groupBy(*keys).applyInPandas(run, schema=schema)


def ephemeral_windows_stream(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    trigger_range_s: float,
    post_trigger_range_s: float,
) -> DataFrame:
    """Streaming exact ephemeral windows with event-time timers.

    Requires ``withWatermark(ts_col, ...)`` upstream. The window closes via
    GroupState timeout when the watermark passes start + trigger + post —
    exactly the reference's idle-flush, minus its actor races.
    """
    key_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    schema = _out_schema(keys, key_types)
    cols = [c.split()[0] for c in schema.split(",")]
    state_schema = "start double, cnt bigint, acc double"

    def run(key: tuple, pdf_iter: Iterable[pd.DataFrame], gs: GroupState) -> Iterator[pd.DataFrame]:
        if gs.hasTimedOut:
            start, cnt, acc = gs.get
            gs.remove()
            yield pd.DataFrame([(*key, start, cnt, acc, True)], columns=cols)
            return
        start, cnt, acc = gs.get if gs.exists else (None, 0, 0.0)
        outs = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                ep = ts.timestamp()
                if start is not None and ep > start + trigger_range_s + post_trigger_range_s:
                    outs.append((*key, start, cnt, acc, True))
                    start = None
                if start is None:
                    start, cnt, acc = ep, 0, 0.0
                cnt += 1
                acc += float(v)
        if start is None:
            gs.remove()
        else:
            gs.update((start, cnt, acc))
            deadline_ms = int((start + trigger_range_s + post_trigger_range_s) * 1000)
            # Clamp to the global watermark: a lagging key's deadline can sit
            # below it, and Spark rejects timeouts <= watermark.
            gs.setTimeoutTimestamp(max(deadline_ms, gs.getCurrentWatermarkMs() + 1))
        if outs:
            yield pd.DataFrame(outs, columns=cols)

    return sdf.groupBy(*keys).applyInPandasWithState(
        run, schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )
