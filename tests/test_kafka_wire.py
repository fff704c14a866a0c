"""Wire-level Kafka edge (r16): real binary protocol over real sockets.

Pins (a) the published byte layout itself (golden bytes for a v1
message — any drift from the spec is a test failure, not an opinion),
(b) broker semantics over the wire (dense offsets, CRC rejection,
earliest/latest, chained fetch), and (c) the Spark e2e: executor-side
producer sink -> MiniKafkaBroker -> consumer-per-partition receivers ->
parquet spool -> `kafka.normalize_stream` -> streaming aggregation.
"""

import shutil
import struct
import tempfile
import zlib

import pytest

from wallaroo_spark.sources.kafka_wire import (
    ERR_CORRUPT_MESSAGE,
    KafkaWireClient,
    KafkaWireReceiver,
    MiniKafkaBroker,
    decode_message_set,
    encode_message,
    encode_message_set,
    kafka_wire_sink,
    partition_for,
    wire_batch,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_kwire_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def broker():
    b = MiniKafkaBroker().start()
    yield b
    b.stop()


def test_golden_bytes_v1_message():
    """The published v1 message layout, byte for byte: crc INT32 |
    magic=1 | attributes=0 | timestamp INT64 | key BYTES | value BYTES,
    with crc32 over magic..value."""
    msg = encode_message(b"k", b"val", 1234567890123)
    body = (
        b"\x01"                                  # magic = 1
        + b"\x00"                                # attributes
        + struct.pack(">q", 1234567890123)       # timestamp ms
        + struct.pack(">i", 1) + b"k"            # key BYTES
        + struct.pack(">i", 3) + b"val"          # value BYTES
    )
    assert msg == struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
    # null key/value encode as length -1 per the spec
    nmsg = encode_message(None, None, 0)
    assert struct.pack(">i", -1) * 2 == nmsg[-8:]
    # message-set framing: offset INT64 | size INT32 | message
    mset = encode_message_set([(7, b"k", b"val", 1234567890123)])
    assert mset[:12] == struct.pack(">qi", 7, len(msg))
    assert decode_message_set(mset) == [(7, b"k", b"val", 1234567890123)]


def test_wire_produce_fetch_roundtrip_and_offsets(broker):
    broker.create_topic("t", partitions=3)
    c = KafkaWireClient(broker.host, broker.port)
    try:
        assert c.metadata("t") == {"t": 3}
        base = c.produce("t", 1, [(b"a", b"v0", 10), (b"b", b"v1", 11)])
        assert base == 0
        assert c.produce("t", 1, [(b"c", b"v2", 12)]) == 2  # dense offsets
        assert c.list_offset("t", 1, earliest=True) == 0
        assert c.list_offset("t", 1, earliest=False) == 3
        hw, recs = c.fetch("t", 1, 0)
        assert hw == 3
        assert [(o, k, v, t) for o, k, v, t in recs] == [
            (0, b"a", b"v0", 10), (1, b"b", b"v1", 11), (2, b"c", b"v2", 12)
        ]
        # chained fetch from a mid offset
        _, tail = c.fetch("t", 1, 2)
        assert [r[0] for r in tail] == [2]
        # other partitions untouched
        assert c.fetch("t", 0, 0)[0] == 0
    finally:
        c.close()


def test_broker_rejects_corrupt_crc(broker):
    broker.create_topic("t", partitions=1)
    c = KafkaWireClient(broker.host, broker.port)
    try:
        good = encode_message_set([(0, b"k", b"value", 5)])
        bad = good[:-1] + bytes([good[-1] ^ 0xFF])  # flip one payload byte
        with pytest.raises(ValueError, match=f"produce error {ERR_CORRUPT_MESSAGE}"):
            c.produce("t", 0, [], _raw_message_set=bad)
        # nothing was stored; a good produce still lands at offset 0
        assert c.produce("t", 0, [(b"k", b"value", 5)]) == 0
    finally:
        c.close()


def test_spark_e2e_executor_sink_to_streaming_agg(spark, broker, tmpdir):
    """200 keyed rows -> executor-side wire sink -> broker -> one
    receiver per partition -> spool -> normalize_stream column contract
    -> exactly-once counts per key."""
    from pyspark.sql import functions as F

    from wallaroo_spark.sources.kafka import normalize_stream
    from wallaroo_spark.sources.kafka_wire import wire_stream

    broker.create_topic("events", partitions=2)
    rows = [(f"user-{i % 10}", f"payload-{i}") for i in range(200)]
    src = tmpdir + "/src"
    spark.createDataFrame(rows, "key string, value string").repartition(
        8
    ).write.parquet(src)

    sdf = spark.readStream.schema("key string, value string").parquet(src)
    q = (
        sdf.writeStream.foreachBatch(
            kafka_wire_sink(broker.host, broker.port, "events")
        )
        .option("checkpointLocation", tmpdir + "/chk_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rxs = [
        KafkaWireReceiver(
            tmpdir + "/spool", broker.host, broker.port, "events", p
        ).start()
        for p in range(2)
    ]
    try:
        total = 0
        import time as _time
        deadline = _time.monotonic() + 30
        while total < 200 and _time.monotonic() < deadline:
            total = sum(r.records_received for r in rxs)
            _time.sleep(0.05)
        assert total == 200
    finally:
        for r in rxs:
            r.stop()

    batch = wire_batch(spark, tmpdir + "/spool")
    norm = normalize_stream(batch)
    assert norm.columns == ["key", "value", "event_ts", "topic", "partition", "offset"]
    got = {r.key: r.n for r in norm.groupBy("key").agg(F.count("*").alias("n")).collect()}
    assert got == {f"user-{i}": 20 for i in range(10)}
    # keyed routing held end-to-end: each key lives in exactly one partition
    one_part = norm.groupBy("key").agg(F.countDistinct("partition").alias("np"))
    assert all(r.np == 1 for r in one_part.collect())
    # and the client-side router agrees with where records landed
    for r in norm.select("key", "partition").distinct().collect():
        assert partition_for(r.key.encode(), 2) == r.partition

    # streaming path over the same spool compiles and drains
    s = normalize_stream(wire_stream(spark, tmpdir + "/spool"))
    qq = (
        s.groupBy("key").agg(F.count("*").alias("n"))
        .writeStream.format("memory").queryName("kw_counts")
        .outputMode("complete")
        .option("checkpointLocation", tmpdir + "/chk_read")
        .trigger(availableNow=True)
        .start()
    )
    qq.awaitTermination(120)
    mem = {r.key: r.n for r in spark.sql("SELECT * FROM kw_counts").collect()}
    assert mem == got


def test_concurrent_producers_and_live_consumer(broker):
    """Hardening: two producer threads interleave produces to the same
    partition while a consumer chains fetches live — every record lands
    exactly once, offsets stay dense, and no fetch observes a torn
    message (CRC validates on every decode)."""
    import threading

    broker.create_topic("t", partitions=1)

    def produce(tag: str, n: int):
        c = KafkaWireClient(broker.host, broker.port)
        try:
            for i in range(n):
                c.produce("t", 0, [(f"{tag}".encode(), f"{tag}-{i}".encode(), i)])
        finally:
            c.close()

    threads = [
        threading.Thread(target=produce, args=(tag, 150)) for tag in ("a", "b")
    ]
    seen = []
    consumer = KafkaWireClient(broker.host, broker.port)
    for t in threads:
        t.start()
    try:
        import time

        off = 0
        deadline = time.monotonic() + 30
        while len(seen) < 300 and time.monotonic() < deadline:
            _hw, recs = consumer.fetch("t", 0, off)
            if recs:
                seen += recs
                off = recs[-1][0] + 1
            else:
                time.sleep(0.01)
    finally:
        consumer.close()
        for t in threads:
            t.join(timeout=10)
    assert [o for o, *_ in seen] == list(range(300))  # dense, no gaps/dups
    by_tag = {}
    for _o, k, v, _t in seen:
        by_tag.setdefault(k.decode(), []).append(v.decode())
    # per-producer order preserved (single partition, sequential produces)
    assert by_tag["a"] == [f"a-{i}" for i in range(150)]
    assert by_tag["b"] == [f"b-{i}" for i in range(150)]
