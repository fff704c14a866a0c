"""Live framed-TCP end-to-end: real sockets on both edges.

Mirrors the reference's integration harness (`testing/tools/integration/`):
a giles-sender-style feeder streams length-prefixed frames over TCP into the
engine's receiver spool, the pipeline (decode -> key_by -> tumbling windows
collecting per-key sequences) runs as a streaming query, and a framed TCP
sink sends results to a collector. Validation is the window_detector
invariant set (`testing/correctness/apps/window_detector/_validate.py:30-60`):
per-window ordering, and per-key gap-freedom of the flattened sequences.
"""

import datetime as dt
import json
import shutil
import struct
import tempfile

import pytest
from pyspark.sql import functions as F

from wallaroo_spark.sources import codec
from wallaroo_spark.sources.tcp import (
    FrameCollector,
    FramedTCPReceiver,
    framed_batch,
    framed_stream,
    send_framed_file,
    send_frames,
    tcp_frame_sink,
)

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
N_PER_KEY = 100
KEYS = ["key_0", "key_1", "key_2", "key_3"]


def _make_frames():
    """window_detector feed: per key, the natural sequence 1..N, one event
    per second, interleaved across keys (arrival order != key order)."""
    frames = []
    for i in range(N_PER_KEY):
        for k in KEYS:
            ts_ms = int((T0 + dt.timedelta(seconds=i)).timestamp() * 1000)
            payload = struct.pack(">q", i + 1)
            frames.append(codec.encode_frame(ts_ms, k.encode(), payload))
    return frames


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_tcp_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_framed_file_replay_roundtrip(spark, tmpdir):
    """giles-sender file replay: framed file -> socket -> spool -> decode
    reproduces the original messages exactly."""
    frames = _make_frames()
    framed_file = tmpdir + "/feed.msg"
    with open(framed_file, "wb") as f:
        for fr in frames:
            f.write(fr)

    rx = FramedTCPReceiver(tmpdir + "/spool").start()
    try:
        sent = send_framed_file(framed_file, rx.host, rx.port)
        assert sent == len(frames)
        assert rx.wait_for(len(frames)) == len(frames)
    finally:
        rx.stop()

    decoded = codec.decode_frames(framed_batch(spark, tmpdir + "/spool"))
    rows = decoded.collect()
    assert len(rows) == len(frames)
    got = {(r.key, r.event_ts, bytes(r.payload)) for r in rows}
    want = {
        (k, (T0 + dt.timedelta(seconds=i)).replace(tzinfo=None), struct.pack(">q", i + 1))
        for i in range(N_PER_KEY)
        for k in KEYS
    }
    assert got == want


def test_tcp_to_tcp_windowed_pipeline_invariants(spark, tmpdir):
    """Socket in -> windows -> socket out, with window_detector validation."""
    frames = _make_frames()
    rx = FramedTCPReceiver(tmpdir + "/spool", flush_every=64).start()
    collector = FrameCollector().start()
    try:
        # feed over two connections (the reference runs multiple senders)
        half = len(frames) // 2
        send_frames(frames[:half], rx.host, rx.port)
        send_frames(frames[half:], rx.host, rx.port)
        assert rx.wait_for(len(frames)) == len(frames)

        decoded = codec.decode_frames(framed_stream(spark, tmpdir + "/spool"))
        events = decoded.select(
            "event_ts",
            "key",
            F.expr("cast(conv(hex(payload), 16, 10) as bigint)").alias("v"),
        )
        windowed = (
            events.withWatermark("event_ts", "0 seconds")
            .groupBy("key", F.window("event_ts", "30 seconds").alias("w"))
            .agg(F.sort_array(F.collect_list("v")).alias("values"))
            .select(
                F.col("w.end").alias("event_ts"),
                "key",
                F.encode(
                    F.to_json(F.struct("key", F.col("w.start").cast("long").alias("ts"), "values")),
                    "utf-8",
                ).alias("payload"),
            )
        )
        out_frames = codec.encode_frames(windowed)
        q = (
            out_frames.writeStream.foreachBatch(tcp_frame_sink(collector.host, collector.port))
            .outputMode("append")
            .option("checkpointLocation", tmpdir + "/chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # append mode emits watermark-closed windows: 3 full windows per key
        # (the 90s..99s tail window stays open in state)
        collector.wait_for(len(KEYS) * 3)
    finally:
        rx.stop()
        collector.stop()

    # ---- window_detector-style validation (_validate.py:30-60) ----
    windows: dict[str, dict[int, list[int]]] = {}
    for fr in collector.frames:
        (total,) = struct.unpack(">I", fr[:4])
        _, klen = struct.unpack(">qI", fr[4:16])
        payload = fr[16 + klen : 4 + total]
        obj = json.loads(payload.decode())
        windows.setdefault(obj["key"], {}).setdefault(obj["ts"], []).extend(obj["values"])

    assert set(windows) == set(KEYS)
    for k in KEYS:
        sequence = []
        for w_key in sorted(windows[k]):
            win = windows[k][w_key]
            # in-window ordering
            assert win == sorted(win), f"out of order for {k} window {w_key}: {win}"
            sequence.extend(win)
        # tumbling: no duplicates across windows
        assert len(sequence) == len(set(sequence)), f"duplicates for {k}"
        # gap-freedom: flattened = contiguous prefix of the natural sequence
        assert sequence == list(range(1, len(sequence) + 1)), f"gap for {k}"
        # closed windows cover everything except the open tail window
        assert len(sequence) >= N_PER_KEY - 30, f"lost data for {k}"


def test_receiver_idle_flush_on_quiet_connection(tmpdir):
    """ADVICE r2: a long-lived connection that goes quiet with fewer than
    flush_every buffered frames must still land them in the spool via the
    time-based idle flush — otherwise streaming consumers stall until the
    connection closes."""
    import socket
    import time

    rcv = FramedTCPReceiver(tmpdir + "/spool", flush_every=10_000,
                            idle_flush_s=0.1).start()
    try:
        frames = _make_frames()[:3]
        with socket.create_connection((rcv.host, rcv.port)) as s:
            for f in frames:
                s.sendall(f)
            # connection stays OPEN and quiet; idle flush must fire
            got = rcv.wait_for(3, timeout_s=5.0)
            assert got == 3
    finally:
        rcv.stop()


def test_ping_pong_closed_tcp_circle(spark, tmpdir):
    """Port of the reference's ping_pong app
    (`testing/correctness/apps/ping_pong/ping_pong.pony`): two pipelines
    connected sink-to-source in a CLOSED TCP circle — Ping increments a
    byte and sends it to Pong's source, Pong increments and sends it back.
    A single seeded frame must keep circulating: the observed payloads form
    the strictly increasing chain 0,1,2,... split alternately between the
    two receivers, proving live sink->source composition (frames cross real
    sockets every hop, exactly once)."""
    import struct as _struct

    rx_a = FramedTCPReceiver(tmpdir + "/spool_a", flush_every=1).start()
    rx_b = FramedTCPReceiver(tmpdir + "/spool_b", flush_every=1).start()

    bump = (
        F.concat(
            F.lit(_struct.pack(">I", 1)),
            F.expr(
                "unhex(lpad(hex(pmod(cast(conv(hex(substring(frame, 5, 1)), 16, 10)"
                " as int) + 1, 256)), 2, '0'))"
            ),
        ).alias("frame")
    )

    def hop(spool_in, host, port, chk):
        return (
            framed_stream(spark, spool_in)
            .select(bump)
            .writeStream.foreachBatch(tcp_frame_sink(host, port))
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(processingTime="250 milliseconds")
            .start()
        )

    q_ping = q_pong = None
    try:
        q_ping = hop(tmpdir + "/spool_a", rx_b.host, rx_b.port, tmpdir + "/chk_ping")
        q_pong = hop(tmpdir + "/spool_b", rx_a.host, rx_a.port, tmpdir + "/chk_pong")

        # seed one frame (payload byte 0) into Ping's source
        send_frames([_struct.pack(">I", 1) + b"\x00"], rx_a.host, rx_a.port)
        hops = 6
        deadline = 120
        import time as _time

        t0 = _time.monotonic()
        while (
            rx_a.frames_received + rx_b.frames_received < hops + 1
            and _time.monotonic() - t0 < deadline
        ):
            _time.sleep(0.2)
    finally:
        for q in (q_ping, q_pong):
            if q is not None:
                q.stop()
        rx_a.stop()
        rx_b.stop()

    a_vals = sorted(
        r.v
        for r in framed_batch(spark, tmpdir + "/spool_a")
        .select(F.expr("cast(conv(hex(substring(frame, 5, 1)), 16, 10) as int)").alias("v"))
        .collect()
    )
    b_vals = sorted(
        r.v
        for r in framed_batch(spark, tmpdir + "/spool_b")
        .select(F.expr("cast(conv(hex(substring(frame, 5, 1)), 16, 10) as int)").alias("v"))
        .collect()
    )
    total = len(a_vals) + len(b_vals)
    assert total >= hops + 1, (a_vals, b_vals)
    # the circle increments by one per hop: evens land on A (incl. the
    # seed 0), odds on B — a strict alternating chain with no loss/dup
    assert a_vals == list(range(0, 2 * len(a_vals), 2)), a_vals
    assert b_vals == list(range(1, 2 * len(b_vals), 2)), b_vals


def test_decoder_filter_drops_malformed_frames(spark):
    """Port of the reference's decoder_filter app semantics: frames the
    decoder can't parse (truncated, inconsistent lengths, bad utf-8 keys)
    are FILTERED, not fatal — the live-edge contract when peers send
    garbage or keepalives."""
    good = [
        codec.encode_frame(1000 * (i + 1), f"k{i}".encode(), struct.pack(">q", i))
        for i in range(5)
    ]
    bad = [
        b"\x00\x01",                                 # truncated header
        struct.pack(">I", 100) + b"\x00" * 12,       # total past the buffer
        struct.pack(">IqI", 20, 0, 99) + b"\x00" * 8,  # key length past body
        struct.pack(">IqI", 14, 0, 2) + b"\xff\xfe",   # invalid utf-8 key
    ]
    frames = [f for pair in zip(good, bad + [b"\x00"]) for f in pair]
    df = spark.createDataFrame([(bytearray(f),) for f in frames], "frame binary")

    out = codec.decode_frames(df, drop_malformed=True).collect()
    assert sorted(r.key for r in out) == [f"k{i}" for i in range(5)]

    import pytest as _pytest

    with _pytest.raises(Exception):
        codec.decode_frames(df).collect()  # strict mode still surfaces it
