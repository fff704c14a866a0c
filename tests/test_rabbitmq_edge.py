"""AMQP-semantics connector edge: queue/exchange contract + both delivery
classes demonstrated through crash windows.

Reference: `connectors/rabbitmq_source` acks every delivery BEFORE
writing it into the pipeline (pika on_message), so the reference ingress
is at-most-once — reproduced here as the receiver's default, with the
loss window demonstrated. ``ack_after_commit=True`` is this engine's
upgrade: at-least-once into the spool, duplicates on redelivery, exact
dedup downstream = effectively-once — the full chain pinned.
"""

import json
import shutil
import tempfile

import pytest

from wallaroo_spark.sources.rabbitmq import (
    AMQPQueueReceiver,
    MockAMQPBroker,
    message_batch,
)

N = 40


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_amqp_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _payloads(n=N):
    return [json.dumps({"id": i, "v": i * 10}).encode() for i in range(n)]


def test_broker_queue_exchange_contract():
    b = MockAMQPBroker()
    b.queue_declare("q1")
    # direct publish to a queue
    assert b.publish(b"m1", queue="q1") == 1
    assert b.publish(b"x", queue="missing") == 0  # unroutable: dropped
    # direct exchange routes by key; fanout routes to every binding
    b.exchange_declare("ex", "direct")
    b.queue_bind("q1", "ex", "red")
    b.queue_bind("q2", "ex", "blue")
    assert b.publish(b"m2", exchange="ex", routing_key="red") == 1
    assert b.publish(b"m3", exchange="ex", routing_key="blue") == 1
    assert b.publish(b"m4", exchange="ex", routing_key="green") == 0
    b.exchange_declare("fan", "fanout")
    b.queue_bind("q1", "fan")
    b.queue_bind("q2", "fan")
    assert b.publish(b"m5", exchange="fan") == 2
    assert b.queue_len("q1") == 3 and b.queue_len("q2") == 2
    # get moves to unacked; ack settles; requeue puts it BACK IN FRONT
    tag, body = b.basic_get("q1")
    assert body == b"m1" and b.unacked_count() == 1
    assert b.requeue_unacked([tag]) == 1
    assert b.unacked_count() == 0
    tag2, body2 = b.basic_get("q1")
    assert body2 == b"m1"  # redelivered first
    assert b.basic_ack(tag2) and not b.basic_ack(tag2)  # double-ack is a no-op


def test_reference_parity_ack_first_is_at_most_once(spark, tmpdir):
    """The reference's ack-then-write ordering loses a message when the
    consumer dies between the two — exactly one delivery vanishes: acked
    at the broker (never redelivered) yet absent from the spool."""
    b = MockAMQPBroker()
    b.queue_declare("q")
    for p in _payloads():
        b.publish(p, queue="q")

    rx = AMQPQueueReceiver(tmpdir + "/spool", b, "q", crash_after_ack=True).start()
    assert rx.wait_crashed()
    rx.stop()
    assert b.unacked_count() == 0  # the lost message WAS acked

    rx2 = AMQPQueueReceiver(tmpdir + "/spool", b, "q").start()
    assert rx2.wait_for(N - 1) == N - 1
    rx2.stop()
    assert b.queue_len("q") == 0

    rows = message_batch(spark, tmpdir + "/spool").collect()
    ids = sorted(json.loads(bytes(r.message).decode())["id"] for r in rows)
    assert len(ids) == N - 1
    assert ids == [i for i in range(N) if i != 0]  # delivery #1 is gone


def test_ack_after_commit_is_at_least_once_and_dedup_makes_it_exact(spark, tmpdir):
    """The upgraded ordering: spool first, ack after. A crash between
    flush and ack redelivers the whole flushed batch — duplicates land in
    the spool (at-least-once), and exact dedup on the message id restores
    effectively-once downstream."""
    b = MockAMQPBroker()
    b.queue_declare("q")
    for p in _payloads():
        b.publish(p, queue="q")

    rx = AMQPQueueReceiver(
        tmpdir + "/spool", b, "q",
        ack_after_commit=True, flush_every=8, crash_before_ack=True,
    ).start()
    assert rx.wait_crashed()
    rx.stop()
    assert rx.messages_received == 8  # first flush landed...
    assert b.unacked_count() == 8     # ...but was never acked
    assert b.requeue_unacked() == 8   # consumer death: broker redelivers

    rx2 = AMQPQueueReceiver(
        tmpdir + "/spool", b, "q", ack_after_commit=True, flush_every=8
    ).start()
    # rx2 drains the full requeued stream: all N originals' remainder plus
    # the 8 redelivered (the spool-total duplicate check rides the batch
    # read below — each receiver counts only its own flushes)
    assert rx2.wait_for(N) == N
    rx2.stop()
    assert b.queue_len("q") == 0 and b.unacked_count() == 0

    from pyspark.sql import functions as F

    msgs = message_batch(spark, tmpdir + "/spool").select(
        F.from_json(F.decode("message", "utf-8"), "id bigint, v bigint").alias("m")
    ).select("m.id", "m.v")
    assert msgs.count() == N + 8  # duplicates present: at-least-once
    deduped = msgs.dropDuplicates(["id"])
    assert deduped.count() == N   # exact dedup -> effectively-once
    assert deduped.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(N))
