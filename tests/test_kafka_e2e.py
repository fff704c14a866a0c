"""Kafka edge e2e over the embedded protocol mock (no broker/connector JAR
in this container — `kafka_mock` preserves the topic/partition/offset log
contract and reuses the real `kafka.normalize_stream` column mapping, so
these tests drive the production edge code minus the wire client).

Covers the twice-deferred round-3 candidate: framed messages -> broker ->
kafka-shaped source -> decode -> event-time windows (asserted against a
batch oracle), kafka_sink delivery (key partitioning, dense per-partition
offsets, exactly the expected payloads), and the maxOffsetsPerTrigger
backpressure analog.
"""

from pyspark.sql import functions as F

from wallaroo_spark.sources.codec import decode_frames, encode_frame
from wallaroo_spark.sources.kafka_mock import (
    MockBroker,
    mock_kafka_sink,
    mock_kafka_source,
)

BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z


def _produce_framed_events(broker, topic, n=120, keys=6, step_ms=10_000, flushes=3):
    """n framed messages, keys u0..u{keys-1}, event time stepping step_ms,
    landed in `flushes` segments (incremental-discovery units)."""
    per = n // flushes
    for i in range(n):
        key = f"u{i % keys}"
        ts_ms = BASE_MS + i * step_ms
        payload = str(float(i)).encode()  # castable, no UDF needed downstream
        broker.produce(topic, key, encode_frame(ts_ms, key.encode(), payload), timestamp_ms=ts_ms)
        if (i + 1) % per == 0:
            broker.flush()
    broker.flush()


def test_kafka_mock_source_windows_and_sink_delivery(spark, tmp_path):
    broker = MockBroker(tmp_path / "broker")
    broker.create_topic("orders", partitions=3)
    broker.create_topic("out", partitions=2)
    _produce_framed_events(broker, "orders")

    # ---- source leg: connector surface + framed decode + tumbling window
    src = mock_kafka_source(spark, broker, "orders", value_format="binary")
    assert src.isStreaming
    assert src.columns == ["key", "value", "event_ts", "topic", "partition", "offset"]

    decoded = decode_frames(src.select(F.col("value").alias("frame")))
    windowed = (
        decoded.withWatermark("event_ts", "5 seconds")
        .groupBy(F.window("event_ts", "60 seconds"), "key")
        .agg(F.round(F.sum(F.col("payload").cast("string").cast("double")), 2).alias("total"))
        .select(
            F.col("key"),
            F.col("window.start").alias("window_start"),
            F.col("total"),
        )
    )
    sink_df = windowed.select(
        F.col("key"),
        F.concat_ws(
            "|", F.col("window_start").cast("string"), F.col("total").cast("string")
        ).alias("value"),
    )
    q = mock_kafka_sink(sink_df, broker, "out", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # ---- batch oracle over the broker's own log, restricted to windows the
    # final watermark (max event_ts - 5s) finalized — append mode never
    # emits the trailing unfinalized window(s)
    import datetime as dt

    max_ts = BASE_MS / 1000.0 + 119 * 10
    cutoff = dt.datetime.utcfromtimestamp(max_ts - 5)
    oracle_all = {
        (r.key, str(r.window_start)): r.total
        for r in (
            decode_frames(broker.log(spark, "orders").select(F.col("value").alias("frame")))
            .groupBy(F.window("event_ts", "60 seconds"), "key")
            .agg(F.round(F.sum(F.col("payload").cast("string").cast("double")), 2).alias("total"))
            .select(
                "key", F.col("window.start").alias("window_start"), "total"
            )
            .collect()
        )
    }
    oracle = {
        (k, ws): v
        for (k, ws), v in oracle_all.items()
        if dt.datetime.fromisoformat(ws) + dt.timedelta(seconds=60) <= cutoff
    }
    assert len(oracle) > 10  # non-vacuous: many (window, key) groups
    # only the trailing window per key may be withheld
    assert len(oracle_all) - len(oracle) <= 6

    out_rows = broker.log(spark, "out").collect()
    got = {}
    for r in out_rows:
        ws, total = bytes(r.value).decode().split("|")
        got[(bytes(r.key).decode(), ws)] = float(total)
    assert got == oracle  # every finalized window delivered, correct sums

    # ---- delivery contract: same key -> one partition, offsets dense from 0
    by_part = {}
    key_parts = {}
    for r in out_rows:
        by_part.setdefault(r.partition, []).append(r.offset)
        key_parts.setdefault(bytes(r.key).decode(), set()).add(r.partition)
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), f"partition {p} offsets not dense"
    assert all(len(ps) == 1 for ps in key_parts.values()), "key split across partitions"
    assert broker.end_offsets("out") == [
        len(by_part.get(p, [])) for p in range(broker.num_partitions("out"))
    ]


def test_kafka_mock_backpressure_and_replay(spark, tmp_path):
    """max_segments_per_trigger=1 (the maxOffsetsPerTrigger analog) must
    split consumption into one micro-batch per segment, and a fresh query
    from earliest must replay the full log (offset-based replay, the
    property the real connector gives checkpoint recovery)."""
    broker = MockBroker(tmp_path / "broker")
    broker.create_topic("orders", partitions=2)
    _produce_framed_events(broker, "orders", n=60, flushes=3)

    batches = []

    def record(bdf, _epoch):
        batches.append(bdf.count())

    src = mock_kafka_source(
        spark, broker, "orders", value_format="binary", max_segments_per_trigger=1
    )
    q = (
        src.writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(batches) == 60
    assert len([b for b in batches if b]) == 3  # one micro-batch per segment

    # replay from earliest: a NEW query (fresh checkpoint) sees all 60 again
    seen = []
    q2 = (
        mock_kafka_source(spark, broker, "orders", value_format="binary")
        .writeStream.foreachBatch(lambda bdf, e: seen.append(bdf.count()))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sum(seen) == 60
