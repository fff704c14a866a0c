"""Streaming parity tests: the same pipeline on a drained stream
(availableNow) must produce the batch answer — the engine's substitute for
the reference's integration harness (SURVEY §5: window_detector invariants,
exactly-once scripts)."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark.operators import windows as W
from wallaroo_spark.streaming import state as S
from wallaroo_spark.sinks import idempotent_parquet_sink

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, n=60, keys=("a", "b", "c")):
    rows = [
        Row(key=k, ts=T0 + dt.timedelta(seconds=3 * i + j), v=float(i + 1))
        for j, k in enumerate(keys)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _stream_from(spark, df, path):
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def test_stream_tumbling_matches_batch(spark, tmpdir):
    df = _events(spark)
    sdf = _stream_from(spark, df, tmpdir + "/in")
    windowed = (
        sdf.withWatermark("ts", "10 seconds")
        .groupBy("key", F.window("ts", "30 seconds").alias("w"))
        .agg(F.sum("v").alias("s"))
        .select("key", F.col("w.start").alias("ws"), "s")
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("t_tumb")
        .outputMode("append")
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.ws): r.s for r in spark.sql("SELECT * FROM t_tumb").collect()
    }
    want = {
        (r.key, r.window_start): r.s
        for r in W.tumbling(df, "ts", ["key"], [F.sum("v").alias("s")], "30 seconds").collect()
    }
    # append mode emits only watermark-closed windows; all closed ones must match
    assert got
    for k, v in got.items():
        assert want[k] == v
    # and the open tail is the only difference
    assert len(want) - len(got) <= len({r[0] for r in want})


def test_stream_count_windows_match_batch(spark, tmpdir):
    df = _events(spark, n=23)
    sdf = _stream_from(spark, df, tmpdir + "/in")
    out = S.count_window_stream(sdf, ["key"], value_col="v", n=5, ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("t_cw")
        .outputMode("update")
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.window_id): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_cw").collect()
    }
    want = {
        (r.key, r.window_id): (r.c, r.s)
        for r in W.count_windows(
            df, "ts", ["key"], [F.count("*").alias("c"), F.sum("v").alias("s")], n=5
        ).collect()
        if r.c == 5  # stream emits only complete windows; partial tail stays in state
    }
    assert got == want


def test_stream_keyed_state_running_total(spark, tmpdir):
    df = _events(spark, n=10, keys=("a", "b"))
    sdf = _stream_from(spark, df, tmpdir + "/in")

    def run_total(row, state):
        state["t"] = state.get("t", 0.0) + row["v"]
        return [{"key": row["key"], "ts": row["ts"], "t": state["t"]}]

    out = S.keyed_state_stream(
        sdf,
        ["key"],
        run_total,
        dict,
        "key string, ts timestamp, t double",
        "t double",
        pack=lambda st: (st.get("t", 0.0),),
        unpack=lambda tup: {"t": tup[0]},
        ts_col="ts",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_state ORDER BY key, ts").collect()
    a = [r.t for r in rows if r.key == "a"]
    assert a == [1.0, 3.0, 6.0, 10.0, 15.0, 21.0, 28.0, 36.0, 45.0, 55.0]


def test_stream_state_survives_restart(spark, tmpdir):
    """Checkpoint recovery: second half of the data arrives after a restart;
    running totals continue from state (reference: rollback/recovery tests)."""
    df = _events(spark, n=10, keys=("a",))
    first, second = df.filter(F.col("v") <= 5), df.filter(F.col("v") > 5)

    def run_total(row, state):
        state["t"] = state.get("t", 0.0) + row["v"]
        return [{"key": row["key"], "t": state["t"]}]

    sink = idempotent_parquet_sink(tmpdir + "/out")

    def start(path):
        sdf = spark.readStream.schema(df.schema).parquet(path)
        out = S.keyed_state_stream(
            sdf, ["key"], run_total, dict,
            "key string, t double", "t double",
            pack=lambda st: (st.get("t", 0.0),),
            unpack=lambda tup: {"t": tup[0]},
            ts_col="ts",
        )
        return (
            out.writeStream.foreachBatch(sink)
            .outputMode("update").option("checkpointLocation", tmpdir + "/chk")
            .trigger(availableNow=True).start()
        )

    first.write.mode("overwrite").parquet(tmpdir + "/in")
    q = start(tmpdir + "/in")
    q.awaitTermination(120)
    second.write.mode("append").parquet(tmpdir + "/in")
    q2 = start(tmpdir + "/in")
    q2.awaitTermination(120)
    totals = sorted(
        r.t for r in spark.read.option("recursiveFileLookup", "true").parquet(tmpdir + "/out").collect()
    )
    assert totals == [1.0, 3.0, 6.0, 10.0, 15.0, 21.0, 28.0, 36.0, 45.0, 55.0]


def test_foreach_batch_sink_idempotent(spark, tmpdir):
    """Exactly-once contract: re-writing the same batchId overwrites, never
    duplicates (reference 2PC semantics, `connector_sink_twopc.pony:36-72`)."""
    df = _events(spark, n=5, keys=("a",))
    sink = idempotent_parquet_sink(tmpdir + "/out")
    sink(df, 0)
    sink(df, 0)  # redelivery of the same batch
    got = spark.read.parquet(tmpdir + "/out").count()
    assert got == 5


def test_pipeline_streaming_tumbling_window(spark, tmpdir):
    """Windows through the facade on a streaming source."""
    from wallaroo_spark.api import Pipeline

    df = _events(spark, n=40, keys=("a", "b"))
    sdf = _stream_from(spark, df, tmpdir + "/in")
    p = (
        Pipeline.source_df(sdf, ts_col="ts")
        .with_watermark("10 seconds")
        .key_by("key")
        .to_tumbling("30 seconds", [F.sum("v").alias("s")])
    )
    q = (
        p.df.writeStream.format("memory")
        .queryName("t_fac_tumb")
        .outputMode("append")
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.window_start): r.s
        for r in spark.sql("SELECT * FROM t_fac_tumb").collect()
    }
    want = {
        (r.key, r.window_start): r.s
        for r in W.tumbling(df, "ts", ["key"], [F.sum("v").alias("s")], "30 seconds").collect()
    }
    assert got and all(want[k] == v for k, v in got.items())


def test_streaming_word_count_example(spark, tmpdir):
    from examples.word_count_streaming import run as wc_run

    q = wc_run(spark, "/root/testdata/sf0.001", tmpdir + "/out", tmpdir + "/chk")
    q.awaitTermination(180)
    res = spark.read.option("recursiveFileLookup", "true").parquet(tmpdir + "/out")
    # final per-word max(count) equals the batch word count
    got = {
        r.word: r.total
        for r in res.groupBy("word").agg(F.max("count").alias("total")).collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        r.w: r["count"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    }
    assert got == want


def _jittered(spark, n=120, keys=("a", "b")):
    """Deterministically out-of-order events: every 7th message is delivered
    2.5 windows late. arrival = row order."""
    rows = []
    arr = 0
    for k in keys:
        for i in range(n):
            base = 3 * i
            ts = base - 75 if i % 7 == 3 and base >= 75 else base
            rows.append(
                Row(key=k, arr=arr, ts=T0 + dt.timedelta(seconds=ts), v=float(i))
            )
            arr += 1
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("policy", ["drop", "fire_per_message", "place_in_oldest_window"])
def test_stream_late_policy_matches_batch(spark, tmpdir, policy):
    from wallaroo_spark.operators import late_data as L
    from wallaroo_spark.streaming.late import windowed_late_policy_stream

    df = _jittered(spark)
    sdf = _stream_from(spark, df, tmpdir + "/in_" + policy)
    out = windowed_late_policy_stream(
        sdf.withWatermark("ts", "0 seconds"),
        ["key"], "ts", "v", "arr", size_s=30, delay_s=10, policy=policy,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_late_" + policy)
        .outputMode("update")
        .option("checkpointLocation", tmpdir + "/chk_" + policy)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.window_start, r.is_late_fire): (r.n_events, r.total_value)
        for r in spark.sql(f"SELECT * FROM t_late_{policy}").collect()
    }

    batch = L.windowed_with_late_policy(
        df, "ts", ["key"],
        [F.count("*").alias("n_events"), F.sum("v").alias("total_value")],
        size=30, delay=10, policy=policy, arrival_col="arr",
    ).collect()
    # stream emits fires + windows closed by the final per-key watermark;
    # batch additionally reports the open tail
    final_wm = {}
    for r in df.collect():
        ep = r.ts.timestamp()
        final_wm[r.key] = max(final_wm.get(r.key, ep), ep) - 10
    want = {
        (r.key, r.window_start, r.is_late_fire): (r.n_events, r.total_value)
        for r in batch
        if r.is_late_fire or r.window_start + 30 <= final_wm[r.key]
    }
    assert got == want
    if policy == "fire_per_message":
        assert any(k[2] for k in got)  # late fires actually occurred


def test_stream_merge_two_sources(spark, tmpdir):
    """S13 merge on streams: two file streams unioned into one query."""
    a = _events(spark, n=10, keys=("a",))
    b = _events(spark, n=10, keys=("b",))
    a.write.mode("overwrite").parquet(tmpdir + "/a")
    b.write.mode("overwrite").parquet(tmpdir + "/b")
    sa = spark.readStream.schema(a.schema).parquet(tmpdir + "/a")
    sb = spark.readStream.schema(b.schema).parquet(tmpdir + "/b")
    from wallaroo_spark.api import Pipeline

    p = Pipeline.source_df(sa, ts_col="ts").merge(Pipeline.source_df(sb, ts_col="ts"))
    agg = p.df.groupBy("key").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("t_merge")
        .outputMode("complete")
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: r["count"] for r in spark.sql("SELECT * FROM t_merge").collect()}
    assert got == {"a": 10, "b": 10}
