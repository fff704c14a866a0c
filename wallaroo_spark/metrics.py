"""Metrics surface — parity with the reference's Metrics UI contract.

The reference reports two metrics per (category, name, pipeline, worker):

- **Latency**: a fixed 65-bin power-of-2 histogram
  (`lib/wallaroo/core/metrics/histogram.pony:21-67`): a duration v (ns)
  counts into bin index ``64 - clz(v)``, i.e. the bin whose upper limit is
  the next power of two; min/max/total ride alongside. The UI reads off
  the 50th/90th/95th/99th/99.9th *percentile bins* — the upper limit of
  the bin that percentage of events falls within
  (`documentation/content/operators-manual/metrics-ui.md:46-57`).
  (The Pony class docstring says ``4 -> bin:4`` but ``get_idx`` computes
  ``64 - clz(4) = 3`` -> bin 8; we replicate the code, not the comment.)
- **Throughput**: events/second samples over the last **5 minutes**, with
  min/median/max reported (`metrics-ui.md:58-60`).

Wire format parity (`lib/wallaroo_labs/hub/hub_protocol.pony:99-125`):
``u32 size | u32-len str name | u32-len str category | u32-len str worker
| u32-len str pipeline | u16 id | 65 x u64 bins | u64 min | u64 max |
u64 period | u64 period_ends_at`` — all big-endian. (The reference
declares ``size`` with a ``64*11`` constant that overstates the actual
520+32 payload bytes; we encode the true byte count.)

Categories (`metrics.pony:34-48`): ``computation``, ``start-to-end``,
``node-ingress-egress``, ``pipeline-ingestion``.

Spark wiring: a ``StreamingQueryListener`` feeds per-micro-batch progress
into reporters — batch trigger latency into the start-to-end histogram,
input rows into the 5-minute throughput ring. Collection is driver-side
listener callbacks only (no data-path cost), mirroring the reference's
out-of-band metrics channel.
"""

from __future__ import annotations

import json
import struct
import threading
from collections import deque

N_BINS = 65
CATEGORIES = ("computation", "start-to-end", "node-ingress-egress", "pipeline-ingestion")
PERCENTILES = (50.0, 90.0, 95.0, 99.0, 99.9)
THROUGHPUT_WINDOW_S = 300  # "last 5 minutes of processing"


def bin_idx(v: int) -> int:
    """Reference ``Histogram.get_idx``: ``64 - clz(v)`` for u64 v — the
    index whose bin upper limit is ``2**idx`` (0 for v == 0)."""
    if v <= 0:
        return 0
    return min(v.bit_length(), N_BINS - 1)


def bin_upper(idx: int) -> int:
    return 1 << idx


class Histogram:
    """Fixed 65-bin power-of-2 latency histogram + min/max/total."""

    def __init__(self) -> None:
        self.counts = [0] * N_BINS
        self.min = None
        self.max = None

    def apply(self, v: int) -> None:
        self.counts[bin_idx(int(v))] += 1
        self.min = v if self.min is None else min(self.min, v)
        self.max = v if self.max is None else max(self.max, v)

    def size(self) -> int:
        return sum(self.counts)

    def merge(self, other: "Histogram") -> "Histogram":
        out = Histogram()
        out.counts = [a + b for a, b in zip(self.counts, other.counts)]
        mins = [m for m in (self.min, other.min) if m is not None]
        maxs = [m for m in (self.max, other.max) if m is not None]
        out.min = min(mins) if mins else None
        out.max = max(maxs) if maxs else None
        return out

    def percentile_bin(self, pct: float) -> int | None:
        """Upper limit of the bin that ``pct`` percent of events fall
        within (the UI's 'x Percentile Bin' stat)."""
        total = self.size()
        if total == 0:
            return None
        need = total * pct / 100.0
        cum = 0
        for i, c in enumerate(self.counts):
            cum += c
            if cum >= need:
                return bin_upper(i)
        return bin_upper(N_BINS - 1)


class ThroughputHistory:
    """Per-second event counts over a sliding 5-minute window."""

    def __init__(self, window_s: int = THROUGHPUT_WINDOW_S) -> None:
        self.window_s = window_s
        self._by_sec: deque[tuple[int, float]] = deque()

    def record(self, at_s: float, n_events: float) -> None:
        sec = int(at_s)
        if self._by_sec and self._by_sec[-1][0] == sec:
            s, n = self._by_sec[-1]
            self._by_sec[-1] = (s, n + n_events)
        else:
            self._by_sec.append((sec, float(n_events)))
        floor = sec - self.window_s
        while self._by_sec and self._by_sec[0][0] <= floor:
            self._by_sec.popleft()

    def stats(self) -> dict:
        """min/median/max events-per-second over the window."""
        vals = sorted(n for _, n in self._by_sec)
        if not vals:
            return {"min": 0.0, "median": 0.0, "max": 0.0}
        mid = len(vals) // 2
        median = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2.0
        return {"min": vals[0], "median": median, "max": vals[-1]}

    def series(self) -> list[tuple[int, float]]:
        return list(self._by_sec)


def encode_metric(
    name: str,
    category: str,
    pipeline: str,
    worker: str,
    id_: int,
    histogram: Histogram,
    period: int,
    period_ends_at: int,
) -> bytes:
    """HubProtocol.metrics wire frame (big-endian, true byte count)."""
    if category not in CATEGORIES:
        raise ValueError(f"unknown category {category!r}")

    def s(x: str) -> bytes:
        b = x.encode("utf-8")
        return struct.pack(">I", len(b)) + b

    body = (
        s(name)
        + s(category)
        + s(worker)
        + s(pipeline)
        + struct.pack(">H", id_)
        + struct.pack(f">{N_BINS}Q", *histogram.counts)
        + struct.pack(
            ">QQQQ",
            histogram.min or 0,
            histogram.max or 0,
            period,
            period_ends_at,
        )
    )
    return struct.pack(">I", len(body)) + body


def decode_metric(frame: bytes) -> dict:
    """Inverse of ``encode_metric`` (test/monitoring-client helper)."""
    (size,) = struct.unpack(">I", frame[:4])
    if size != len(frame) - 4:
        raise ValueError("frame size mismatch")
    off = 4
    out = {}
    for field in ("name", "category", "worker", "pipeline"):
        (n,) = struct.unpack(">I", frame[off : off + 4])
        off += 4
        out[field] = frame[off : off + n].decode("utf-8")
        off += n
    (out["id"],) = struct.unpack(">H", frame[off : off + 2])
    off += 2
    counts = list(struct.unpack(f">{N_BINS}Q", frame[off : off + N_BINS * 8]))
    off += N_BINS * 8
    out["min"], out["max"], out["period"], out["period_ends_at"] = struct.unpack(
        ">QQQQ", frame[off : off + 32]
    )
    out["counts"] = counts
    return out


def stats_line(histogram: Histogram, throughput: ThroughputHistory) -> dict:
    """One UI stats line: percentile bins + 5-min throughput stats
    (`metrics-ui.md:46-60`, the application-dashboard row)."""
    return {
        "latency_bins": {
            str(p): histogram.percentile_bin(p) for p in PERCENTILES
        },
        "throughput": throughput.stats(),
    }


class MetricsCollector:
    """Driver-side registry of (category, name) -> histogram + throughput,
    fed by the streaming listener (or directly in tests/batch callers)."""

    def __init__(self, app_name: str, worker: str = "initializer") -> None:
        self.app_name = app_name
        self.worker = worker
        self._lock = threading.Lock()
        self._hist: dict[tuple[str, str, str], Histogram] = {}
        self._tput: dict[tuple[str, str, str], ThroughputHistory] = {}

    def _slot(self, category: str, name: str, pipeline: str):
        key = (category, name, pipeline)
        with self._lock:
            h = self._hist.setdefault(key, Histogram())
            t = self._tput.setdefault(key, ThroughputHistory())
        return h, t

    def report(
        self,
        category: str,
        name: str,
        pipeline: str,
        duration_ns: int | None = None,
        events: float | None = None,
        at_s: float | None = None,
    ) -> None:
        h, t = self._slot(category, name, pipeline)
        with self._lock:
            if duration_ns is not None:
                h.apply(int(duration_ns))
            if events is not None and at_s is not None:
                t.record(at_s, events)

    def dashboard_json(self) -> str:
        """The application-dashboard shape: a stats line per reported
        (category, name), all stats over the last 5 minutes."""
        with self._lock:
            out: dict = {"app": self.app_name, "categories": {}}
            for (cat, name, pipeline), h in self._hist.items():
                line = stats_line(h, self._tput[(cat, name, pipeline)])
                line["pipeline"] = pipeline
                out["categories"].setdefault(cat, {})[name] = line
        return json.dumps(out, sort_keys=True)

    def encode_all(self, period_s: int, period_ends_at_s: int) -> list[bytes]:
        """Every reporter's wire frame for one reporting period."""
        with self._lock:
            return [
                encode_metric(
                    name,
                    cat,
                    pipeline,
                    self.worker,
                    i,
                    h,
                    period_s * 1_000_000_000,
                    period_ends_at_s * 1_000_000_000,
                )
                for i, ((cat, name, pipeline), h) in enumerate(sorted(self._hist.items()))
            ]


def streaming_listener(collector: MetricsCollector):
    """A StreamingQueryListener feeding the collector: each micro-batch's
    trigger latency lands in the pipeline's start-to-end histogram (ms ->
    ns, the reference's unit) and its input rows in the pipeline-ingestion
    5-minute throughput window. Attach with ``spark.streams.addListener``."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802 (Spark API)
            pass

        def onQueryProgress(self, event):  # noqa: N802
            import datetime as dt

            p = event.progress
            name = p.name or str(p.id)
            dur_ms = (p.durationMs or {}).get("triggerExecution")
            at = dt.datetime.fromisoformat(
                p.timestamp.replace("Z", "+00:00")
            ).timestamp()
            if dur_ms is not None:
                collector.report(
                    "start-to-end", name, name, duration_ns=int(dur_ms) * 1_000_000
                )
            collector.report(
                "pipeline-ingestion", name, name, events=p.numInputRows, at_s=at
            )

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    return _Listener()
