"""Live UDP end-to-end: real datagram sockets on both edges.

Mirrors the reference's UDP connector pair (`connectors/udp_source` — a
UDPServer handler writing each datagram into the pipeline;
`connectors/udp_sink` — one sendto per value): feeder -> receiver spool ->
streaming pipeline -> UDP sink -> collector. Datagram == message (no
framing), so payloads roundtrip verbatim; ``strip_whitespace`` reproduces
the reference handler's ``data.strip()``.
"""

import datetime as dt
import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from wallaroo_spark.sources.udp import (
    DatagramCollector,
    UDPDatagramReceiver,
    datagram_batch,
    datagram_stream,
    send_datagrams,
    udp_datagram_sink,
)

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
KEYS = ["key_0", "key_1", "key_2", "key_3"]
N_PER_KEY = 50


def _payloads():
    return [
        json.dumps({"key": k, "i": i}).encode()
        for i in range(N_PER_KEY)
        for k in KEYS
    ]


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_udp_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_udp_datagram_roundtrip(spark, tmpdir):
    """Feeder -> socket -> spool -> batch read reproduces every datagram
    verbatim (UDP preserves message boundaries; no frame header)."""
    payloads = _payloads()
    rx = UDPDatagramReceiver(tmpdir + "/spool", flush_every=64).start()
    try:
        sent = send_datagrams(payloads, rx.host, rx.port)
        assert sent == len(payloads)
        assert rx.wait_for(len(payloads)) == len(payloads)
    finally:
        rx.stop()
    rows = datagram_batch(spark, tmpdir + "/spool").collect()
    assert sorted(bytes(r.datagram) for r in rows) == sorted(payloads)


def test_udp_boundary_datagrams(spark, tmpdir):
    """Edge payloads the protocol allows: a zero-length datagram (valid
    UDP, lands as an empty binary cell) and a payload at a size loopback
    reliably carries — boundaries must survive the spool verbatim."""
    big = bytes(range(256)) * 128  # 32 KiB binary, all byte values
    payloads = [b"", b"x", big]
    rx = UDPDatagramReceiver(tmpdir + "/spool").start()
    try:
        send_datagrams(payloads, rx.host, rx.port)
        assert rx.wait_for(len(payloads)) == len(payloads)
    finally:
        rx.stop()
    got = sorted(
        bytes(r.datagram) for r in datagram_batch(spark, tmpdir + "/spool").collect()
    )
    assert got == sorted(payloads)


def test_udp_strip_whitespace_reference_parity(spark, tmpdir):
    """The reference handler trims each datagram (`connectors/udp_source`:
    ``data = self.request[0].strip()``) — opt-in here, verbatim default."""
    rx = UDPDatagramReceiver(tmpdir + "/spool", strip_whitespace=True).start()
    try:
        send_datagrams([b"  hello \n", b"world\t"], rx.host, rx.port)
        assert rx.wait_for(2) == 2
    finally:
        rx.stop()
    got = sorted(
        bytes(r.datagram) for r in datagram_batch(spark, tmpdir + "/spool").collect()
    )
    assert got == [b"hello", b"world"]


def test_udp_to_udp_windowed_pipeline(spark, tmpdir):
    """Socket in -> streaming window agg -> socket out: the full connector
    pair around a real streaming query, collector-validated per key."""
    payloads = _payloads()
    rx = UDPDatagramReceiver(tmpdir + "/spool", flush_every=64).start()
    collector = DatagramCollector().start()
    try:
        send_datagrams(payloads, rx.host, rx.port)
        assert rx.wait_for(len(payloads)) == len(payloads)

        parsed = (
            datagram_stream(spark, tmpdir + "/spool")
            .select(
                F.from_json(
                    F.decode("datagram", "utf-8"), "key string, i bigint"
                ).alias("m")
            )
            .select(
                F.col("m.key").alias("key"),
                (F.lit(int(T0.timestamp())) + F.col("m.i"))
                .cast("timestamp")
                .alias("event_ts"),
                F.col("m.i").alias("v"),
            )
        )
        windowed = (
            parsed.withWatermark("event_ts", "0 seconds")
            .groupBy("key", F.window("event_ts", "10 seconds").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .select(
                F.encode(
                    F.to_json(
                        F.struct(
                            "key",
                            F.col("w.start").cast("long").alias("ts"),
                            "n",
                            "s",
                        )
                    ),
                    "utf-8",
                ).alias("datagram")
            )
        )
        q = (
            windowed.writeStream.foreachBatch(
                udp_datagram_sink(collector.host, collector.port)
            )
            .outputMode("append")
            .option("checkpointLocation", tmpdir + "/chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # 50 events/key over 1 event/s -> 4 closed 10s windows per key (the
        # 5th window [40,50) holds the watermark tail and stays open)
        n_expected = len(KEYS) * 4
        assert collector.wait_for(n_expected) == n_expected
        got = [json.loads(d.decode()) for d in collector.datagrams]
        per_key = {}
        for g in got:
            per_key.setdefault(g["key"], []).append(g)
        for k in KEYS:
            ws = sorted(per_key[k], key=lambda g: g["ts"])
            assert [g["n"] for g in ws] == [10] * 4, (k, ws)
            # window [10w, 10w+10) sums i in that range
            for w, g in enumerate(ws):
                assert g["s"] == sum(range(10 * w, 10 * w + 10)), (k, g)
    finally:
        collector.stop()
        rx.stop()


def test_receiver_stop_is_prompt_under_sustained_traffic(tmpdir):
    """r16 (ADVICE r15): stop() must not wait out the 2 s join under
    sustained traffic — the serve loop checks _stop every iteration and a
    loopback sentinel wakes a blocked recvfrom deterministically."""
    import socket
    import threading
    import time

    from wallaroo_spark.sources.udp import UDPDatagramReceiver

    rx = UDPDatagramReceiver(tmpdir + "/spool", idle_flush_s=5.0).start()
    stop_flood = threading.Event()

    def flood():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        while not stop_flood.is_set():
            s.sendto(b"x" * 100, (rx.host, rx.port))
        s.close()

    t = threading.Thread(target=flood, daemon=True)
    t.start()
    time.sleep(0.3)  # sustain traffic so recvfrom never idles out
    t0 = time.monotonic()
    rx.stop()
    elapsed = time.monotonic() - t0
    stop_flood.set()
    t.join(timeout=2)
    assert not rx._thread.is_alive()
    # the old loop only noticed _stop after an idle timeout (5 s here) and
    # stop() burned its full 2 s join; the fixed loop exits immediately
    assert elapsed < 1.5, f"stop took {elapsed:.2f}s under sustained traffic"


def test_receiver_stop_before_start_is_clean(tmpdir):
    from wallaroo_spark.sources.udp import UDPDatagramReceiver

    rx = UDPDatagramReceiver(tmpdir + "/spool")
    rx.stop()  # never started: clean no-op, no RuntimeError
