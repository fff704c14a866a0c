"""Timezone-safe epoch conversion for Arrow-delivered timestamps.

applyInPandas / applyInPandasWithState hand Python TZ-NAIVE pandas
Timestamps rendered in ``spark.sql.session.timeZone``, but pandas'
``Timestamp.timestamp()`` treats a naive value as UTC — so under any
non-UTC session timezone every derived epoch is offset from the true
epoch while ``GroupState.getCurrentWatermarkMs()`` (and the query's
watermark) stay real epoch milliseconds: idle timers and event-time gap
checks would fire hours early or late (ADVICE r12, medium). Every
stateful operator that turns a delivered timestamp into epoch seconds
must therefore localize to the session timezone first.

``epoch_fn(df)`` captures the session timezone ON THE DRIVER at plan
time (the executors' Python workers never see the JVM conf) and returns
a picklable converter closure for the pandas loop. Under a UTC session
(every test/oracle run) the conversion is the identity of the old naive
``.timestamp()`` call, so committed hashes are unchanged; under any
other session timezone it is the fix.
"""

from __future__ import annotations

__all__ = ["epoch_fn", "from_epoch_fn"]


def epoch_fn(df):
    """Picklable ``Timestamp -> float`` true-epoch-seconds converter,
    pinned to ``df``'s session timezone at plan time."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")

    def to_epoch(ts) -> float:
        if getattr(ts, "tzinfo", None) is None:
            # DST edges: the repeated hour resolves to the DST instant,
            # the skipped hour shifts forward — deterministic either way
            return ts.tz_localize(
                tz, ambiguous=True, nonexistent="shift_forward"
            ).timestamp()
        return ts.timestamp()

    return to_epoch


def from_epoch_fn(df):
    """The inverse: true epoch seconds -> the NAIVE session-timezone
    Timestamp that Arrow hands back to Spark as that same instant. An
    operator that emits a timestamp column reconstructed from an epoch it
    derived via `epoch_fn` must round-trip through this, or the emitted
    instant shifts by the session offset under any non-UTC timezone."""
    import pandas as pd

    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")

    def from_epoch(ep: float):
        return pd.Timestamp(ep, unit="s", tz="UTC").tz_convert(tz).tz_localize(None)

    return from_epoch
