"""Port of the reference's multi_partition_detector correctness app
(`testing/correctness/apps/multi_partition_detector/multi_partition_detector.py`,
`_validate.py:30-60`, `inline_validation/__init__.py`) as facade invariants.

The app feeds round-robin per-key sequence numbers through `depth` rounds of
(key_by -> stateless trace -> key_by -> stateful ring-of-4 window) and
validates that every key's observed sequence builds monotonically: each
emitted window is [v-3, v-2, v-1, v] (with leading zeros while warming up)
and the flattened last-values increment by exactly 1 per key — i.e. per-key
order survives repartitioning and nothing is lost or duplicated. Here the
same topology runs on the Pipeline facade with an adversarial repartition
between stages."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline

T0 = dt.datetime(2024, 1, 1)
PARTITIONS = 8
N_PER_KEY = 50
RING = 4


def _gen_messages():
    """MultiPartitionGenerator shape: keys cycle 0..P-1; the value bumps by
    one each time the key wraps — every key sees 1,2,3,... in order."""
    rows, value = [], 1
    for i in range(PARTITIONS * N_PER_KEY):
        key = i % PARTITIONS
        rows.append(
            Row(key=str(key), ts=T0 + dt.timedelta(milliseconds=i), value=value)
        )
        if key == PARTITIONS - 1:
            value += 1
    return rows


def increments_test(values):
    """inline_validation.increments_test: +1 steps, leading zeros allowed."""
    if len(values) < 1:
        return False
    prev = values[0]
    for cur in values[1:]:
        diff = cur - prev
        if diff == 0 and prev != 0:
            return False
        if diff not in (0, 1):
            return False
        prev = cur
    return True


def validate_stream(stream):
    """_validate.validate_stream: (contiguous segments, rollbacks)."""
    if not stream:
        return (0, 0)
    a, segments, rollbacks = stream[0], 1, 0
    for v in stream[1:]:
        diff = v - a
        if diff > 1:
            segments += 1
        elif diff < 1:
            rollbacks += 1
        a = v
    return (segments, rollbacks)


def test_multi_partition_detector_invariants(spark):
    ring_n = RING

    def _ring_window(row, state):
        """trace_window: push into a fixed ring of 4, emit the snapshot.
        (local fn => cloudpickle by value; executors can't import tests)"""
        ring = state.setdefault("ring", [0] * ring_n)
        ring.append(int(row["value"]))
        ring.pop(0)
        return [{"key": row["key"], "window": ",".join(map(str, ring))}]

    df = spark.createDataFrame(_gen_messages())
    # adversarial physical layout: scatter rows across partitions so only
    # the engine's key_by ordering (not input layout) can give per-key order
    df = df.repartition(16, F.col("value"))

    p = Pipeline.source_df(df, ts_col="ts")
    for _ in range(2):  # --depth 2
        p = (
            p.key_by("key")
            .to({"key": F.col("key"), "ts": F.col("ts"),
                 "value": F.col("value")})  # trace_id: stateless passthrough
            .key_by("key")
            .to_state(_ring_window, dict, "key string, window string", )
        )
        p = Pipeline.source_df(
            p.df.withColumn("value", F.split("window", ",").getItem(RING - 1).cast("long"))
            .withColumn("ts", F.lit(None).cast("timestamp")),
            ts_col="",
        )
        # re-derive event order per key for the next round: ring last value
        # is the sequence number itself
        p = Pipeline.source_df(
            p.df.withColumn(
                "ts", (F.lit(T0) + F.make_interval(secs=F.col("value"))).cast("timestamp")
            ),
            ts_col="ts",
        )

    out = p.df.collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append([int(x) for x in r.window.split(",")])

    assert set(by_key) == {str(k) for k in range(PARTITIONS)}
    for key, windows in by_key.items():
        # one key = one applyInPandas group = one contiguous, ordered run in
        # its output partition, so collect() preserves per-key emission order
        lasts = [w[-1] for w in windows]
        assert increments_test(lasts), (key, lasts[:10])
        assert validate_stream(lasts) == (1, 0), key  # one segment, no rollback
        assert lasts == list(range(1, N_PER_KEY + 1)), key  # lossless, no dups
        # every window is the contiguous tail [v-3..v] with warm-up zeros
        for w in windows:
            v = w[-1]
            expect = [max(0, v - (RING - 1 - i)) if v - (RING - 1 - i) > 0 else 0 for i in range(RING)]
            assert w == expect, (key, w, expect)
