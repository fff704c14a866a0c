"""RabbitMQ connector edge: AMQP queue semantics without a broker.

Reference: `connectors/rabbitmq_source` — a pika AsyncConsumer that
declares/binds a queue (optionally behind an exchange), consumes, and for
every delivery ACKS FIRST, then writes the body into the pipeline
(`on_message`: ``acknowledge_message(delivery_tag)`` before
``_handle_message(body)``). That ordering makes the reference's ingress
AT-MOST-ONCE: a crash between ack and write loses the message.

No AMQP broker or pika ships in this container, so this module is the
semantic test double — the `kafka_mock.MockBroker` posture for AMQP's
delivery contract (named queues, direct/fanout exchanges with bindings,
delivery tags, explicit acks, redelivery of unacked messages when a
consumer dies). What it preserves is exactly what the connector code
depends on; wire-level AMQP 0-9-1 framing is out of scope (unlike RESP,
the handshake/frame state machine is a protocol stack, not a loop).

- ``MockAMQPBroker`` — queues + exchanges + unacked tracking.
- ``AMQPQueueReceiver`` — the source: consume -> parquet spool (binary
  ``message`` column, the TCP/UDP/Redis spool discipline). Two ack
  modes:

  * ``ack_after_commit=False`` (default, REFERENCE PARITY): ack on
    receipt, before the spool write — at-most-once, the reference's
    loss window reproduced faithfully (pytest demonstrates it).
  * ``ack_after_commit=True`` (the engine's upgrade): delivery tags are
    held until the batch lands in the spool, then acked — AT-LEAST-ONCE
    into the spool; a crash between flush and ack redelivers, so the
    spool may hold duplicates, and downstream exact dedup on a message
    id makes the pipeline effectively-once (pytest replays the crash
    window and pins the dedup).

``message_stream`` / ``message_batch`` read the spool.
"""

from __future__ import annotations

import itertools
import threading
import time
import uuid
from collections import deque
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class MockAMQPBroker:
    """Queues, exchanges, bindings, delivery tags, acks, redelivery."""

    def __init__(self):
        self._lock = threading.Lock()
        self._queues: dict[str, deque[bytes]] = {}
        self._exchanges: dict[str, str] = {}  # name -> type (direct|fanout)
        self._bindings: dict[str, list[tuple[str, str]]] = {}  # x -> [(q, rk)]
        self._unacked: dict[int, tuple[str, bytes]] = {}
        self._tags = itertools.count(1)

    def queue_declare(self, queue: str) -> None:
        with self._lock:
            self._queues.setdefault(queue, deque())

    def exchange_declare(self, exchange: str, ex_type: str = "direct") -> None:
        if ex_type not in ("direct", "fanout"):
            raise ValueError(f"unsupported exchange type {ex_type!r}")
        with self._lock:
            self._exchanges[exchange] = ex_type
            self._bindings.setdefault(exchange, [])

    def queue_bind(self, queue: str, exchange: str, routing_key: str = "") -> None:
        with self._lock:
            if exchange not in self._exchanges:
                raise KeyError(f"exchange {exchange!r} not declared")
            self._queues.setdefault(queue, deque())
            self._bindings[exchange].append((queue, routing_key))

    def publish(
        self,
        body: bytes,
        queue: str | None = None,
        exchange: str | None = None,
        routing_key: str = "",
    ) -> int:
        """Publish to a queue directly (the default-exchange shape) or
        through a declared exchange; returns the number of queues the
        message landed in (0 = unroutable, silently dropped — AMQP's
        non-mandatory publish)."""
        with self._lock:
            if queue is not None:
                if queue not in self._queues:
                    return 0
                self._queues[queue].append(body)
                return 1
            ex_type = self._exchanges.get(exchange)
            if ex_type is None:
                raise KeyError(f"exchange {exchange!r} not declared")
            n = 0
            for q, rk in self._bindings.get(exchange, []):
                if ex_type == "fanout" or rk == routing_key:
                    self._queues[q].append(body)
                    n += 1
            return n

    def basic_get(self, queue: str) -> tuple[int, bytes] | None:
        """Pop one ready message; it moves to unacked under a fresh
        delivery tag until basic_ack or requeue."""
        with self._lock:
            dq = self._queues.get(queue)
            if not dq:
                return None
            body = dq.popleft()
            tag = next(self._tags)
            self._unacked[tag] = (queue, body)
            return tag, body

    def basic_ack(self, tag: int) -> bool:
        with self._lock:
            return self._unacked.pop(tag, None) is not None

    def requeue_unacked(self, tags: list[int] | None = None) -> int:
        """Return unacked messages to the FRONT of their queues — what a
        real broker does when a consumer dies with deliveries in flight.
        ``tags=None`` requeues everything (whole-connection death)."""
        with self._lock:
            sel = list(self._unacked) if tags is None else tags
            n = 0
            for t in sel:
                entry = self._unacked.pop(t, None)
                if entry is not None:
                    q, body = entry
                    self._queues.setdefault(q, deque()).appendleft(body)
                    n += 1
            return n

    def queue_len(self, queue: str) -> int:
        with self._lock:
            return len(self._queues.get(queue, ()))

    def unacked_count(self) -> int:
        with self._lock:
            return len(self._unacked)


class AMQPQueueReceiver:
    """Consume a queue into a parquet spool. See module docstring for the
    two ack modes. ``crash_after_ack`` / ``crash_before_ack`` are test
    hooks that simulate the consumer dying inside each mode's window —
    after_ack: on the first delivery, acked but never spooled (the
    at-most-once LOSS); before_ack: right after the first flush, spooled
    but never acked (the at-least-once DUPLICATE on redelivery). The
    pytest uses them to DEMONSTRATE each delivery class, not change it."""

    def __init__(
        self,
        spool_dir: str,
        broker: MockAMQPBroker,
        queue: str,
        ack_after_commit: bool = False,
        flush_every: int = 64,
        idle_flush_s: float = 0.05,
        crash_before_ack: bool = False,
        crash_after_ack: bool = False,
    ):
        self.spool = Path(spool_dir)
        self.spool.mkdir(parents=True, exist_ok=True)
        self.broker = broker
        self.queue = queue
        self.ack_after_commit = ack_after_commit
        self.flush_every = flush_every
        self.idle_flush_s = idle_flush_s
        self._crash_before_ack = crash_before_ack
        self._crash_after_ack = crash_after_ack
        self.messages_received = 0
        self.crashed = False
        # per-instance unique prefix: a second receiver (or a restart
        # after a crash) sharing this spool must never overwrite an
        # earlier instance's files by reusing index 0 (r15 fix)
        self._uniq = uuid.uuid4().hex[:8]
        self._file_idx = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._consume, daemon=True)

    def start(self) -> "AMQPQueueReceiver":
        self.broker.queue_declare(self.queue)
        self._thread.start()
        return self

    def _consume(self) -> None:
        pending: list[bytes] = []
        tags: list[int] = []
        while not self._stop.is_set():
            got = self.broker.basic_get(self.queue)
            if got is None:
                if pending:
                    self._commit(pending, tags)
                    if self.crashed:
                        return
                    pending, tags = [], []
                self._stop.wait(self.idle_flush_s)
                continue
            tag, body = got
            if not self.ack_after_commit:
                # REFERENCE PARITY: ack precedes the write
                # (`connectors/rabbitmq_source` on_message) — the
                # at-most-once loss window lives right here
                self.broker.basic_ack(tag)
                if self._crash_after_ack:
                    self.crashed = True  # acked, never spooled: message LOST
                    return
            else:
                tags.append(tag)
            pending.append(body)
            if len(pending) >= self.flush_every:
                self._commit(pending, tags)
                if self.crashed:
                    return
                pending, tags = [], []
        if pending:
            self._commit(pending, tags)

    def _commit(self, pending: list[bytes], tags: list[int]) -> None:
        self._flush(pending)
        if self.ack_after_commit:
            if self._crash_before_ack:
                # flushed but NOT acked: the broker will redeliver —
                # the duplicate-in-spool window of at-least-once
                self.crashed = True
                return
            for t in tags:
                self.broker.basic_ack(t)

    def _flush(self, messages: list[bytes]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            idx = self._file_idx
            self._file_idx += 1
        table = pa.table({"message": pa.array(messages, type=pa.binary())})
        tmp = self.spool / f"_tmp_{self._uniq}_{idx}.parquet"
        pq.write_table(table, tmp)
        tmp.rename(self.spool / f"messages_{self._uniq}_{idx}.parquet")  # atomic publish
        with self._lock:
            self.messages_received += len(messages)

    def wait_for(self, n: int, timeout_s: float = 30.0) -> int:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self.messages_received >= n or self.crashed:
                return self.messages_received
            time.sleep(0.02)
        return self.messages_received

    def wait_crashed(self, timeout_s: float = 30.0) -> bool:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self.crashed:
                return True
            time.sleep(0.02)
        return False

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)


def message_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Streaming view of the spool (binary `message` column)."""
    return spark.readStream.schema("message binary").parquet(spool_dir)


def message_batch(spark: SparkSession, spool_dir: str) -> DataFrame:
    return spark.read.schema("message binary").parquet(spool_dir)
