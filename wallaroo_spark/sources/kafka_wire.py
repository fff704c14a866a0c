"""Wire-level Kafka: the real binary protocol over real sockets.

Reference: the Kafka connector pair (`core/source/kafka_source/
kafka_source_config.pony:31` — topic + brokers + per-message
value/key/partition; `core/sink/kafka_sink/`) binds librdkafka. This
container has neither a broker nor the spark-sql-kafka JAR, so
`kafka_mock.MockBroker` reproduced the SEMANTICS (topics, partitions,
dense offsets, key routing) without any wire. r16 upgrades the edge to
the MiniRedis discipline: ``MiniKafkaBroker`` is a TCP server speaking a
subset of the PUBLISHED Kafka protocol (KIP-less legacy encodings —
https://kafka.apache.org/protocol), and ``KafkaWireClient`` is a minimal
client for it, so the produce/consume path crosses a genuine socket in
the genuine byte layout:

- framing: INT32 size | INT16 api_key | INT16 api_version |
  INT32 correlation_id | STRING client_id | body (request);
  INT32 size | INT32 correlation_id | body (response)
- Metadata (api 3 v0), Produce (api 0 v0), Fetch (api 1 v0),
  ListOffsets (api 2 v0)
- MessageSet with v1 messages: offset INT64 | size INT32 | crc INT32 |
  magic=1 INT8 | attributes INT8 | timestamp INT64 | key BYTES |
  value BYTES — CRC32 computed over magic..value and VALIDATED on both
  produce (broker) and fetch (client); a corrupt record is refused with
  error code 2 (CORRUPT_MESSAGE_*), not silently stored.

Honest caveats (documented, not hidden): both endpoints are ours — a
real broker would also exercise version negotiation, compression, and
the murmur2 default partitioner (we route with the engine's portable
md5 family, exactly like `kafka_mock`); record batches (magic 2) are
not implemented. The byte layout itself is pinned by a golden-bytes
test against the published spec.

Scale posture: the producer sink writes from EXECUTOR partitions (one
connection per partition task, like the UDP/Redis/Kinesis-wire sinks);
the consumer is one receiver per partition (the reference's
consumer-per-partition shape) spooling to parquet for Structured
Streaming — no driver-side collect anywhere in the data path.
"""

from __future__ import annotations

import hashlib
import struct
import threading
import time
import uuid
import zlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_CORRUPT_MESSAGE = 2
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3


# ---------------------------------------------------------------------------
# primitive codecs (the protocol's classic, non-flexible encodings)
# ---------------------------------------------------------------------------

def _enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise ValueError("short buffer")
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self.take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self.take(n).decode()

    def nbytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self.take(n)


def encode_message(key: bytes | None, value: bytes | None, timestamp_ms: int) -> bytes:
    """One v1 message (magic 1): crc | magic | attributes | timestamp |
    key | value, crc32 over magic..value — the published layout."""
    body = (
        struct.pack(">bbq", 1, 0, timestamp_ms)
        + _enc_bytes(key)
        + _enc_bytes(value)
    )
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def decode_message(buf: bytes) -> tuple[bytes | None, bytes | None, int]:
    """Validate CRC and decode one v1 message -> (key, value, ts_ms)."""
    crc = struct.unpack(">I", buf[:4])[0]
    body = buf[4:]
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError("CRC mismatch")
    r = _Reader(body)
    magic = r.i8()
    r.i8()  # attributes (no compression support)
    ts = r.i64() if magic == 1 else -1
    key = r.nbytes()
    value = r.nbytes()
    return key, value, ts


def encode_message_set(records: list[tuple[int, bytes | None, bytes | None, int]]) -> bytes:
    """records: (offset, key, value, ts_ms) -> wire MessageSet."""
    out = b""
    for offset, key, value, ts in records:
        msg = encode_message(key, value, ts)
        out += struct.pack(">qi", offset, len(msg)) + msg
    return out


def decode_message_set(buf: bytes) -> list[tuple[int, bytes | None, bytes | None, int]]:
    out = []
    pos = 0
    while pos + 12 <= len(buf):
        offset, size = struct.unpack(">qi", buf[pos : pos + 12])
        pos += 12
        if pos + size > len(buf):
            break  # partial trailing message (the protocol allows it)
        key, value, ts = decode_message(buf[pos : pos + size])
        out.append((offset, key, value, ts))
        pos += size
    return out


def partition_for(key: bytes | None, n: int) -> int:
    """Keyed routing in the engine's portable md5 family (the real
    client's default is murmur2 — same contract, different hash)."""
    if key is None:
        return 0
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big") % n


# ---------------------------------------------------------------------------
# broker
# ---------------------------------------------------------------------------

class MiniKafkaBroker:
    """In-process broker speaking Metadata/Produce/Fetch/ListOffsets v0
    over real sockets. Topic logs are in-memory lists per partition;
    offsets are dense from 0; produce validates every record's CRC."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import socket as _socket

        self._logs: dict[str, list[list[tuple[bytes | None, bytes | None, int]]]] = {}
        self._lock = threading.Lock()
        self._srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        self._srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(32)
        self.host, self.port = self._srv.getsockname()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._accept = threading.Thread(target=self._serve, daemon=True)

    # --- admin ---
    def create_topic(self, topic: str, partitions: int = 2) -> None:
        with self._lock:
            if topic not in self._logs:
                self._logs[topic] = [[] for _ in range(partitions)]

    def start(self) -> "MiniKafkaBroker":
        self._accept.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        if self._accept.ident is not None:
            self._accept.join(timeout=2)
        for t in self._threads:
            t.join(timeout=2)

    # --- socket plumbing ---
    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                break
            t = threading.Thread(target=self._handle, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _handle(self, conn) -> None:
        try:
            while True:
                hdr = _read_exact(conn, 4)
                if hdr is None:
                    break
                size = struct.unpack(">i", hdr)[0]
                payload = _read_exact(conn, size)
                if payload is None:
                    break
                r = _Reader(payload)
                api_key = r.i16()
                r.i16()  # api_version (v0 assumed)
                corr = r.i32()
                r.string()  # client_id
                body = self._dispatch(api_key, r)
                resp = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (OSError, ValueError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    # --- request handlers ---
    def _dispatch(self, api_key: int, r: _Reader) -> bytes:
        if api_key == API_METADATA:
            return self._metadata(r)
        if api_key == API_PRODUCE:
            return self._produce(r)
        if api_key == API_FETCH:
            return self._fetch(r)
        if api_key == API_LIST_OFFSETS:
            return self._list_offsets(r)
        raise ValueError(f"unsupported api_key {api_key}")

    def _metadata(self, r: _Reader) -> bytes:
        n = r.i32()
        names = [r.string() for _ in range(n)]
        with self._lock:
            if not names:
                names = sorted(self._logs)
            out = struct.pack(">i", 1)  # one broker
            out += struct.pack(">i", 0) + _enc_str(self.host) + struct.pack(
                ">i", self.port
            )
            out += struct.pack(">i", len(names))
            for t in names:
                known = t in self._logs
                out += struct.pack(
                    ">h", ERR_NONE if known else ERR_UNKNOWN_TOPIC_OR_PARTITION
                )
                out += _enc_str(t)
                parts = self._logs.get(t, [])
                out += struct.pack(">i", len(parts))
                for p in range(len(parts)):
                    out += struct.pack(">hii", ERR_NONE, p, 0)  # err, id, leader
                    out += struct.pack(">ii", 1, 0)  # replicas [0]
                    out += struct.pack(">ii", 1, 0)  # isr [0]
        return out

    def _produce(self, r: _Reader) -> bytes:
        r.i16()  # acks (always acked here)
        r.i32()  # timeout
        n_topics = r.i32()
        resp_topics = []
        for _ in range(n_topics):
            topic = r.string()
            n_parts = r.i32()
            resp_parts = []
            for _ in range(n_parts):
                part = r.i32()
                mset = r.take(r.i32())
                err, base = ERR_NONE, -1
                try:
                    recs = decode_message_set(mset)
                except ValueError:
                    recs, err = [], ERR_CORRUPT_MESSAGE
                with self._lock:
                    log = self._logs.get(topic)
                    if log is None or not 0 <= part < len(log):
                        err = ERR_UNKNOWN_TOPIC_OR_PARTITION
                    elif err == ERR_NONE:
                        base = len(log[part])
                        for _off, key, value, ts in recs:
                            log[part].append(
                                (key, value,
                                 ts if ts >= 0 else int(time.time() * 1000))
                            )
                resp_parts.append((part, err, base))
            resp_topics.append((topic, resp_parts))
        out = struct.pack(">i", len(resp_topics))
        for topic, parts in resp_topics:
            out += _enc_str(topic) + struct.pack(">i", len(parts))
            for part, err, base in parts:
                out += struct.pack(">ihq", part, err, base)
        return out

    def _fetch(self, r: _Reader) -> bytes:
        r.i32()  # replica_id
        r.i32()  # max_wait_ms (no long-poll; an empty set returns at once)
        r.i32()  # min_bytes
        n_topics = r.i32()
        out_topics = []
        for _ in range(n_topics):
            topic = r.string()
            n_parts = r.i32()
            parts = []
            for _ in range(n_parts):
                part, off = r.i32(), r.i64()
                max_bytes = r.i32()
                with self._lock:
                    log = self._logs.get(topic)
                    if log is None or not 0 <= part < len(log):
                        parts.append((part, ERR_UNKNOWN_TOPIC_OR_PARTITION, 0, b""))
                        continue
                    hw = len(log[part])
                    if off > hw:
                        parts.append((part, ERR_OFFSET_OUT_OF_RANGE, hw, b""))
                        continue
                    recs, size = [], 0
                    for o in range(off, hw):
                        key, value, ts = log[part][o]
                        recs.append((o, key, value, ts))
                        # exact per-record wire cost: offset(8) + size(4)
                        # + crc(4) + magic(1) + attr(1) + ts(8) +
                        # keylen(4) + vallen(4) = 34 bytes + payloads
                        # (r16 review: 26 undercounted by the offset
                        # field, overrunning the client's max_bytes)
                        size += 34 + len(key or b"") + len(value or b"")
                        if size >= max_bytes:
                            break
                parts.append((part, ERR_NONE, hw, encode_message_set(recs)))
            out_topics.append((topic, parts))
        out = struct.pack(">i", len(out_topics))
        for topic, parts in out_topics:
            out += _enc_str(topic) + struct.pack(">i", len(parts))
            for part, err, hw, mset in parts:
                out += struct.pack(">ihq", part, err, hw)
                out += struct.pack(">i", len(mset)) + mset
        return out

    def _list_offsets(self, r: _Reader) -> bytes:
        r.i32()  # replica_id
        n_topics = r.i32()
        out_topics = []
        for _ in range(n_topics):
            topic = r.string()
            n_parts = r.i32()
            parts = []
            for _ in range(n_parts):
                part, ts = r.i32(), r.i64()
                r.i32()  # max_offsets
                with self._lock:
                    log = self._logs.get(topic)
                    if log is None or not 0 <= part < len(log):
                        parts.append((part, ERR_UNKNOWN_TOPIC_OR_PARTITION, []))
                        continue
                    # -1 = LATEST, -2 = EARLIEST (the protocol's sentinels)
                    offs = [len(log[part])] if ts == -1 else [0]
                parts.append((part, ERR_NONE, offs))
            out_topics.append((topic, parts))
        out = struct.pack(">i", len(out_topics))
        for topic, parts in out_topics:
            out += _enc_str(topic) + struct.pack(">i", len(parts))
            for part, err, offs in parts:
                out += struct.pack(">ih", part, err)
                out += struct.pack(">i", len(offs))
                for o in offs:
                    out += struct.pack(">q", o)
        return out


def _read_exact(conn, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class KafkaWireClient:
    """Minimal protocol client: one connection, correlation-id matched
    request/response, CRC-validated fetch decode."""

    def __init__(self, host: str, port: int, client_id: str = "wallaroo-spark"):
        import socket as _socket

        self._sock = _socket.create_connection((host, port), timeout=30)
        self._corr = 0
        self.client_id = client_id

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def _call(self, api_key: int, body: bytes) -> _Reader:
        self._corr += 1
        req = (
            struct.pack(">hhi", api_key, 0, self._corr)
            + _enc_str(self.client_id)
            + body
        )
        self._sock.sendall(struct.pack(">i", len(req)) + req)
        hdr = _read_exact(self._sock, 4)
        if hdr is None:
            raise ConnectionError("broker closed")
        payload = _read_exact(self._sock, struct.unpack(">i", hdr)[0])
        if payload is None:
            raise ConnectionError("broker closed mid-response")
        r = _Reader(payload)
        corr = r.i32()
        if corr != self._corr:
            raise ValueError(f"correlation mismatch {corr} != {self._corr}")
        return r

    def metadata(self, *topics: str) -> dict[str, int]:
        """topic -> partition count (errors surface as absence)."""
        body = struct.pack(">i", len(topics))
        for t in topics:
            body += _enc_str(t)
        r = self._call(API_METADATA, body)
        n_brokers = r.i32()
        for _ in range(n_brokers):
            r.i32(), r.string(), r.i32()
        out = {}
        for _ in range(r.i32()):
            err, name = r.i16(), r.string()
            n_parts = r.i32()
            for _ in range(n_parts):
                r.i16(), r.i32(), r.i32()
                for _ in range(r.i32()):
                    r.i32()
                for _ in range(r.i32()):
                    r.i32()
            if err == ERR_NONE:
                out[name] = n_parts
        return out

    def produce(
        self,
        topic: str,
        part: int,
        records: list[tuple[bytes | None, bytes | None, int]],
        _raw_message_set: bytes | None = None,
    ) -> int:
        """Produce (key, value, ts_ms) records to one partition; returns
        the assigned base offset. ``_raw_message_set`` lets tests send
        deliberately corrupt bytes."""
        mset = (
            _raw_message_set
            if _raw_message_set is not None
            else encode_message_set([(0, k, v, ts) for k, v, ts in records])
        )
        body = struct.pack(">hi", 1, 10000)  # acks=1, timeout
        body += struct.pack(">i", 1) + _enc_str(topic)
        body += struct.pack(">ii", 1, part)
        body += struct.pack(">i", len(mset)) + mset
        r = self._call(API_PRODUCE, body)
        r.i32(), r.string(), r.i32()  # 1 topic, name, 1 partition
        _part, err, base = r.i32(), r.i16(), r.i64()
        if err != ERR_NONE:
            raise ValueError(f"produce error {err}")
        return base

    def fetch(
        self, topic: str, part: int, offset: int, max_bytes: int = 1 << 20
    ) -> tuple[int, list[tuple[int, bytes | None, bytes | None, int]]]:
        """-> (high_watermark, [(offset, key, value, ts_ms)...])."""
        body = struct.pack(">iii", -1, 100, 1)
        body += struct.pack(">i", 1) + _enc_str(topic)
        body += struct.pack(">ii", 1, part) + struct.pack(">qi", offset, max_bytes)
        r = self._call(API_FETCH, body)
        r.i32(), r.string(), r.i32()
        _part, err, hw = r.i32(), r.i16(), r.i64()
        mset = r.take(r.i32())
        if err == ERR_OFFSET_OUT_OF_RANGE:
            raise ValueError("offset out of range")
        if err != ERR_NONE:
            raise ValueError(f"fetch error {err}")
        return hw, decode_message_set(mset)

    def list_offset(self, topic: str, part: int, earliest: bool = True) -> int:
        body = struct.pack(">i", -1)
        body += struct.pack(">i", 1) + _enc_str(topic)
        body += struct.pack(">ii", 1, part)
        body += struct.pack(">qi", -2 if earliest else -1, 1)
        r = self._call(API_LIST_OFFSETS, body)
        r.i32(), r.string(), r.i32()
        _part, err = r.i32(), r.i16()
        offs = [r.i64() for _ in range(r.i32())]
        if err != ERR_NONE:
            raise ValueError(f"list_offsets error {err}")
        return offs[0]


# ---------------------------------------------------------------------------
# Spark edges: receiver (consumer -> spool) and executor-side producer sink
# ---------------------------------------------------------------------------

class KafkaWireReceiver:
    """Consume ONE partition over the wire into a parquet spool — the
    reference's consumer-per-partition shape, landing the connector
    column set (key, value, ts_ms, topic, partition, offset)."""

    def __init__(
        self,
        spool_dir: str,
        host: str,
        port: int,
        topic: str,
        partition: int,
        poll_s: float = 0.05,
        from_earliest: bool = True,
    ):
        self.spool = Path(spool_dir)
        self.spool.mkdir(parents=True, exist_ok=True)
        self.topic, self.partition = topic, partition
        self._client = KafkaWireClient(host, port)
        self._offset = self._client.list_offset(
            topic, partition, earliest=from_earliest
        )
        self.poll_s = poll_s
        self.records_received = 0
        self._uniq = uuid.uuid4().hex[:8]
        self._file_idx = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._poll, daemon=True)

    def start(self) -> "KafkaWireReceiver":
        self._thread.start()
        return self

    def _poll(self) -> None:
        while not self._stop.is_set():
            try:
                _hw, recs = self._client.fetch(
                    self.topic, self.partition, self._offset
                )
            except (ConnectionError, ValueError, OSError):
                break
            if recs:
                self._flush(recs)
                self._offset = recs[-1][0] + 1
            else:
                time.sleep(self.poll_s)

    def _flush(self, recs) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "key": pa.array([k for _, k, _v, _t in recs], type=pa.binary()),
                "value": pa.array([v for _, _k, v, _t in recs], type=pa.binary()),
                "ts_ms": pa.array([t for *_x, t in recs], type=pa.int64()),
                "topic": pa.array([self.topic] * len(recs)),
                "partition": pa.array([self.partition] * len(recs), type=pa.int32()),
                "offset": pa.array([o for o, *_x in recs], type=pa.int64()),
            }
        )
        tmp = self.spool / f"_tmp_{self._uniq}_{self._file_idx}.parquet"
        pq.write_table(table, tmp)
        tmp.rename(self.spool / f"records_{self._uniq}_{self._file_idx}.parquet")
        self._file_idx += 1
        self.records_received += len(recs)

    def wait_for(self, n: int, timeout_s: float = 30.0) -> int:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self.records_received >= n:
                return self.records_received
            time.sleep(0.02)
        return self.records_received

    def stop(self) -> None:
        self._stop.set()
        if self._thread.ident is not None:
            self._thread.join(timeout=2)
        self._client.close()


_SPOOL_SCHEMA = (
    "key binary, value binary, ts_ms long, topic string, "
    "partition int, offset long"
)


def wire_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Streaming view of a wire spool in the connector's column set
    (feeds `kafka.normalize_stream` after the ts_ms -> timestamp map)."""
    from pyspark.sql import functions as F

    df = spark.readStream.schema(_SPOOL_SCHEMA).parquet(spool_dir)
    return df.withColumn(
        "timestamp", F.timestamp_millis(F.col("ts_ms"))
    ).drop("ts_ms")


def wire_batch(spark: SparkSession, spool_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    df = spark.read.schema(_SPOOL_SCHEMA).parquet(spool_dir)
    return df.withColumn(
        "timestamp", F.timestamp_millis(F.col("ts_ms"))
    ).drop("ts_ms")


def kafka_wire_sink(host: str, port: int, topic: str,
                    key_col: str = "key", value_col: str = "value"):
    """foreachBatch fn: produce each micro-batch over the wire FROM THE
    EXECUTORS — one connection per partition task, records routed to
    broker partitions by md5(key) client-side (the real client's
    partitioner contract, engine-portable hash family)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        def send_partition(rows) -> None:
            client = None
            try:
                groups: dict[int, list] = {}
                n_parts = None
                now = int(time.time() * 1000)
                for row in rows:
                    if client is None:
                        client = KafkaWireClient(host, port)
                        n_parts = client.metadata(topic)[topic]
                    k = row[key_col]
                    key = (
                        bytes(k) if isinstance(k, (bytes, bytearray))
                        else None if k is None else str(k).encode()
                    )
                    v = row[value_col]
                    value = (
                        bytes(v) if isinstance(v, (bytes, bytearray))
                        else None if v is None else str(v).encode()
                    )
                    groups.setdefault(partition_for(key, n_parts), []).append(
                        (key, value, now)
                    )
                for part, recs in groups.items():
                    client.produce(topic, part, recs)
            finally:
                if client is not None:
                    client.close()

        batch_df.select(key_col, value_col).foreachPartition(send_partition)

    return sink
