"""Live Redis-protocol end-to-end: RESP sockets on both edges.

Mirrors the reference's Redis connector pair
(`connectors/redis_subscriber_source` — SUBSCRIBE a channel, each
published message becomes one pipeline input;
`connectors/redis_hash_sink` — HSET one field per pipeline value into a
fixed hash). No redis server or client library ships in this container,
so `MiniRedis` implements the RESP command subset on a real socket — the
kafka_mock posture, at wire level.
"""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from wallaroo_spark.sources.redis import (
    MiniRedis,
    RedisSubscriberReceiver,
    RespClient,
    message_batch,
    message_stream,
    publish,
    redis_hash_sink,
)

KEYS = ["key_0", "key_1", "key_2"]
N_PER_KEY = 40


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_redis_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def server():
    srv = MiniRedis().start()
    yield srv
    srv.stop()


def test_resp_protocol_hash_and_pubsub(server):
    """Wire-level contract: PING, HSET create/overwrite counts, HGETALL,
    HLEN, DEL, and pub/sub delivery incl. the no-subscriber=0 reply."""
    c = RespClient(server.host, server.port)
    try:
        assert c.command("PING") == "PONG"
        assert c.command("HSET", "h", "f1", "v1") == 1  # created
        assert c.command("HSET", "h", "f1", "v2") == 0  # overwrote
        assert c.command("HSET", "h", "f2", "x") == 1
        got = c.command("HGETALL", "h")
        pairs = dict(zip(got[::2], got[1::2]))
        assert pairs == {b"f1": b"v2", b"f2": b"x"}
        assert c.command("HLEN", "h") == 2
        # fire-and-forget: publishing with no subscriber reaches nobody
        assert c.command("PUBLISH", "ch", "lost") == 0

        sub = RespClient(server.host, server.port)
        try:
            reply = sub.command("SUBSCRIBE", "ch")
            assert [bytes(reply[0]), bytes(reply[1]), reply[2]] == [
                b"subscribe", b"ch", 1,
            ]
            assert c.command("PUBLISH", "ch", b"hello") == 1
            push = sub.read_push()
            assert [bytes(push[0]), bytes(push[1]), bytes(push[2])] == [
                b"message", b"ch", b"hello",
            ]
        finally:
            sub.close()
        assert c.command("DEL", "h") == 1
        assert c.command("HLEN", "h") == 0
    finally:
        c.close()


def test_resp_publish_on_subscribed_connection_does_not_deadlock(server):
    """Lock-ordering regression (r15 review): a connection that is both
    subscriber and publisher of the same channel self-pushes during its
    own PUBLISH dispatch. Holding the connection's write lock across the
    whole dispatch (the original code) self-deadlocks here — and two
    cross-subscribed connections AB-BA-deadlock the same way. The server
    must survive protocol-abusing clients (real Redis forbids PUBLISH in
    subscribe mode; this mock stays robust instead). The client reads the
    self-push and the :1 reply in server-send order."""
    c = RespClient(server.host, server.port)
    try:
        sub = c.command("SUBSCRIBE", "loop")
        assert bytes(sub[0]) == b"subscribe"
        c._sock.settimeout(10)  # a deadlock must fail the test, not hang it
        got = [c.command("PUBLISH", "loop", b"self"), c.read_push()]
        push = next(g for g in got if isinstance(g, list))
        count = next(g for g in got if isinstance(g, int))
        assert [bytes(push[0]), bytes(push[2])] == [b"message", b"self"]
        assert count == 1
    finally:
        c.close()


def test_redis_subscribe_spool_roundtrip(spark, server, tmpdir):
    """Publisher -> SUBSCRIBE spool -> batch read reproduces every
    published payload (order not guaranteed across flushes; content is)."""
    payloads = [
        json.dumps({"key": k, "i": i}).encode()
        for i in range(N_PER_KEY)
        for k in KEYS
    ]
    rx = RedisSubscriberReceiver(
        tmpdir + "/spool", server.host, server.port, "events", flush_every=64
    ).start()
    try:
        delivered = publish(server.host, server.port, "events", payloads)
        assert delivered == len(payloads)
        assert rx.wait_for(len(payloads)) == len(payloads)
    finally:
        rx.stop()
    rows = message_batch(spark, tmpdir + "/spool").collect()
    assert sorted(bytes(r.message) for r in rows) == sorted(payloads)


def test_redis_to_redis_hash_sink_pipeline(spark, server, tmpdir):
    """The full connector pair around a streaming query: published JSON
    events -> subscriber spool -> per-key aggregation -> HSET per key ->
    HGETALL validation. HSET idempotence makes micro-batch replays
    converge (the reference sink's natural exactly-once shape)."""
    payloads = [
        json.dumps({"key": k, "i": i}).encode()
        for i in range(N_PER_KEY)
        for k in KEYS
    ]
    rx = RedisSubscriberReceiver(
        tmpdir + "/spool", server.host, server.port, "events", flush_every=64
    ).start()
    try:
        publish(server.host, server.port, "events", payloads)
        assert rx.wait_for(len(payloads)) == len(payloads)

        agg = (
            message_stream(spark, tmpdir + "/spool")
            .select(
                F.from_json(
                    F.decode("message", "utf-8"), "key string, i bigint"
                ).alias("m")
            )
            .groupBy(F.col("m.key").alias("key"))
            .agg(F.sum("m.i").alias("total"), F.count("*").alias("n"))
            .select(
                "key",
                F.to_json(F.struct("total", "n")).alias("stats"),
            )
        )
        q = (
            agg.writeStream.foreachBatch(
                redis_hash_sink(
                    server.host, server.port, "per_key_stats", "key", "stats"
                )
            )
            .outputMode("complete")
            .option("checkpointLocation", tmpdir + "/chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        rx.stop()
    h = server.hgetall("per_key_stats")
    assert set(h) == {k.encode() for k in KEYS}
    want_total = sum(range(N_PER_KEY))
    for k in KEYS:
        stats = json.loads(h[k.encode()].decode())
        assert stats == {"total": want_total, "n": N_PER_KEY}, (k, stats)


def test_receiver_stop_before_start_is_clean(tmpdir):
    """r16 (ADVICE r15): _pending/_flusher live in __init__, so stop() on a
    constructed-but-never-started receiver is a clean no-op instead of an
    AttributeError from _drain / RuntimeError from joining an unstarted
    thread."""
    srv = MiniRedis().start()
    try:
        rx = RedisSubscriberReceiver(
            tmpdir + "/spool", srv.host, srv.port, "chan"
        )
        rx.stop()  # no exception; nothing spooled
        assert rx.messages_received == 0
    finally:
        srv.stop()
