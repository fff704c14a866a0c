"""Framed binary decode/encode — the reference's source/sink edges.

Reference framing (`machida/lib/wallaroo/__init__.py:432-454`): connector
frames are ``>I q I`` — u32 payload length, i64 event_time_ms, u32 key
length, then key bytes and payload bytes. `@decoder`/`@encoder`
(`__init__.py:496-509`) convert frames <-> user objects.

Our engine keeps the same edge contract but lands on typed columns:
``decode_frames`` turns a binary column of frames into (event_ts, key,
payload) columns; ``encode_frames`` packs rows back. Implemented with
Arrow-batched mapInPandas (binary struct unpack is genuinely imperative) —
the decode cost is one pass at the edge, everything downstream is columnar.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame


FRAME_HEADER = ">IqI"  # u32 total payload len, i64 event_time_ms, u32 key_len


def encode_frame(event_time_ms: int, key: bytes, payload: bytes) -> bytes:
    """Pack one message into the connector wire format (driver-side helper
    for tests/senders — mirrors the reference's ArrayMessageEncoder)."""
    body = struct.pack(">qI", event_time_ms, len(key)) + key + payload
    return struct.pack(">I", len(body)) + body


def decode_frames(
    df: DataFrame, frame_col: str = "frame", drop_malformed: bool = False
) -> DataFrame:
    """binary frames -> (event_ts timestamp, key string, payload binary).

    ``drop_malformed=True`` gives the reference's decoder-filter semantics
    (`testing/correctness/apps/decoder_filter`): a frame the decoder cannot
    parse (truncated header, key length past the buffer, invalid utf-8) is
    silently filtered instead of failing the job — the behavior a live
    socket edge needs when peers send garbage or keepalives."""

    def run(batches):
        import struct as _struct

        import pandas as _pd

        for pdf in batches:
            out = {"event_ts": [], "key": [], "payload": []}
            for raw in pdf[frame_col]:
                raw = bytes(raw)
                try:
                    (total,) = _struct.unpack(">I", raw[:4])
                    ts_ms, klen = _struct.unpack(">qI", raw[4:16])
                    if 12 + klen > total or 4 + total > len(raw):
                        raise ValueError("frame lengths inconsistent")
                    key = raw[16 : 16 + klen].decode("utf-8")
                    payload = raw[16 + klen : 4 + total]
                except Exception:
                    if drop_malformed:
                        continue
                    raise
                out["event_ts"].append(_pd.Timestamp(ts_ms, unit="ms"))
                out["key"].append(key)
                out["payload"].append(payload)
            yield _pd.DataFrame(out)

    return df.mapInPandas(run, schema="event_ts timestamp, key string, payload binary")


def encode_frames(
    df: DataFrame, ts_col: str = "event_ts", key_col: str = "key", payload_col: str = "payload"
) -> DataFrame:
    """(event_ts, key, payload) -> single binary frame column (sink edge)."""

    def run(batches):
        import struct as _struct

        import pandas as _pd

        for pdf in batches:
            frames = []
            for ts, key, payload in zip(pdf[ts_col], pdf[key_col], pdf[payload_col]):
                kb = str(key).encode("utf-8")
                pb = bytes(payload)
                ts_ms = int(_pd.Timestamp(ts).value // 1_000_000)
                body = _struct.pack(">qI", ts_ms, len(kb)) + kb + pb
                frames.append(_struct.pack(">I", len(body)) + body)
            yield _pd.DataFrame({"frame": frames})

    return df.mapInPandas(run, schema="frame binary")
