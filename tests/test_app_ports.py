"""Ports of the reference correctness apps `ping_pong` and
`local_sequence_detector` (testing/correctness/apps/).

- ping_pong (`ping_pong.pony:20-117`): two apps connected sink-to-source in
  a closed loop; Ping turns a pong (0) into a ping (1), Pong turns a ping
  into a pong. Here each app is a Structured Streaming query over a
  parquet-dir handoff with its own checkpoint, restarted every round — the
  file source's offset tracking plays the role of the connector protocol's
  point-of-reference replay: each round processes exactly the new frames,
  no loss, no dup.
- local_sequence_detector (`local_sequence_detector.pony:49-147`): a
  GenSource emits per-key (a..d) even sequences round-robin; a keyed state
  computation asserts every message keeps its key's parity (Fail() in the
  reference) and passes the message through. The validator here also
  checks the stronger window_detector-style invariant: per-key gap-free
  +2 increments, and passthrough conservation.
"""

import os

from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline
from wallaroo_spark.sources.gen import gen_batch


def test_local_sequence_detector_invariants(spark):
    n = 400  # 100 values per key
    df = gen_batch(
        spark,
        n,
        {
            "key": F.char(F.lit(97) + (F.col("id") % 4).cast("int")),
            "value": (F.floor(F.col("id") / 4) * 2).cast("long"),
            "ts": F.col("id").cast("long"),
        },
    )

    def check_sequence(row, state):
        # reference CheckSequence: first message pins the key's parity; any
        # parity flip is a hard failure
        if state.get("mod") is None:
            state["mod"] = row["value"] % 2
        assert row["value"] % 2 == state["mod"], f"parity flip at {row}"
        state["last"] = row["value"]
        return [{"key": row["key"], "value": row["value"]}]

    p = (
        Pipeline.source_df(df, ts_col="ts")
        .key_by("key")
        .to_state(check_sequence, dict, "key string, value long")
    )
    rows = p.df.collect()
    # passthrough conservation: every generated message exactly once
    assert len(rows) == n
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.key, r.value)):
        by_key.setdefault(r.key, []).append(r.value)
    assert sorted(by_key) == ["a", "b", "c", "d"]
    for vals in by_key.values():
        # gap-free +2 even sequence from the offset (0)
        assert vals == list(range(0, 2 * len(vals), 2))


def test_local_sequence_detector_detects_corruption(spark):
    df = spark.createDataFrame(
        [("a", 0, 0), ("a", 2, 1), ("a", 5, 2)], "key string, value long, ts long"
    )

    def check_sequence(row, state):
        if state.get("mod") is None:
            state["mod"] = row["value"] % 2
        assert row["value"] % 2 == state["mod"], "parity flip"
        return [{"key": row["key"], "value": row["value"]}]

    p = (
        Pipeline.source_df(df, ts_col="ts")
        .key_by("key")
        .to_state(check_sequence, dict, "key string, value long")
    )
    try:
        p.df.collect()
        assert False, "expected the parity Fail() to surface"
    except Exception as e:  # Spark wraps the executor-side AssertionError
        assert "parity flip" in str(e)


def _run_hop(spark, in_dir, out_dir, checkpoint, fn):
    """One ping_pong app for one round: stream NEW frames from in_dir,
    apply the stateless computation, append to out_dir. Fresh query each
    round; the checkpoint carries the source offsets across restarts."""
    sdf = spark.readStream.schema("payload int, hop long").parquet(in_dir)
    out = fn(sdf)

    def write(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_ping_pong_closed_loop(spark, tmp_path):
    ping_in = str(tmp_path / "ping_in")  # pongs waiting for Ping
    pong_in = str(tmp_path / "pong_in")  # pings waiting for Pong
    ck_ping = str(tmp_path / "ck_ping")
    ck_pong = str(tmp_path / "ck_pong")
    os.makedirs(pong_in, exist_ok=True)

    # seed: one pong frame (payload 0), as giles sender does with -m 1
    spark.createDataFrame([(0, 0)], "payload int, hop long").write.parquet(ping_in)

    def pingify(sdf):  # Pingify: expects pongs, emits 1
        return sdf.select(
            F.lit(1).cast("int").alias("payload"), (F.col("hop") + 1).alias("hop")
        )

    def pongify(sdf):  # Pongify: expects pings, emits 0
        return sdf.select(
            F.lit(0).cast("int").alias("payload"), (F.col("hop") + 1).alias("hop")
        )

    rounds = 3
    for _ in range(rounds):
        _run_hop(spark, ping_in, pong_in, ck_ping, pingify)
        _run_hop(spark, pong_in, ping_in, ck_pong, pongify)

    pings = spark.read.parquet(pong_in).collect()
    pongs = spark.read.parquet(ping_in).collect()
    # conservation: one message circulates; each round adds exactly one
    # frame per direction — no loss, no dup across query restarts
    assert sorted(r.hop for r in pings) == [1, 3, 5]
    assert all(r.payload == 1 for r in pings)
    assert sorted(r.hop for r in pongs) == [0, 2, 4, 6]
    assert all(r.payload == 0 for r in pongs)
