"""Exact ephemeral-window semantics (S11) + reference-example ports."""

import datetime as dt
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark.streaming import ephemeral as E

T0 = dt.datetime(2024, 1, 1)


def _df(spark, secs, key="k"):
    return spark.createDataFrame(
        [Row(key=key, ts=T0 + dt.timedelta(seconds=s), v=1.0) for s in secs]
    )


def test_ephemeral_batch_one_shot_and_restart(spark):
    # trigger=10s, post=5s: window [0, 15] accepts 0..15; 20 reopens fresh
    df = _df(spark, [0, 4, 12, 15, 20, 22, 60])
    out = E.ephemeral_windows_batch(df, ["key"], "ts", "v", 10, 5).orderBy("window_start").collect()
    assert [(r.n_events, r.closed) for r in out] == [(4, True), (2, True), (1, False)]
    assert [r.window_start for r in out] == [
        T0.timestamp(),
        (T0 + dt.timedelta(seconds=20)).timestamp(),
        (T0 + dt.timedelta(seconds=60)).timestamp(),
    ]


def test_ephemeral_stream_matches_batch(spark, tmp_path):
    secs = [0, 4, 12, 15, 20, 22, 60, 61, 100]
    df = _df(spark, secs)
    df.write.mode("overwrite").parquet(str(tmp_path / "in"))
    sdf = spark.readStream.schema(df.schema).parquet(str(tmp_path / "in"))
    out = E.ephemeral_windows_stream(
        sdf.withWatermark("ts", "0 seconds"), ["key"], "ts", "v", 10, 5
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_eph")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.window_start, r.n_events, r.closed)
        for r in spark.sql("SELECT * FROM t_eph ORDER BY window_start").collect()
    ]
    batch = [
        (r.window_start, r.n_events, r.closed)
        for r in E.ephemeral_windows_batch(df, ["key"], "ts", "v", 10, 5)
        .orderBy("window_start")
        .collect()
    ]
    # stream emits the closed windows; the open tail stays in state (timer
    # pending) — batch's unclosed tail is the only allowed difference
    closed_batch = [b for b in batch if b[2]]
    assert [g for g in got if g[2]] == closed_batch


def test_ephemeral_late_policy_batch_semantics(spark):
    """Reference-exact S8xS11 composition (`ephemeral_window.pony:104-166`):
    update-then-trigger (triggering row included), post-trigger rows get
    the policy, state deleted at remove_point, a post-removal row opens a
    fresh window. place_in_oldest_window is the reference's Fail()."""
    import pytest

    # trigger=10, post=5; key watermark = event ts:
    #   0,4: accumulate; 12: included THEN triggers (n=3, closed)
    #   13: late (policy); 15: late AND wm reaches remove_point -> state gone
    #   20: fresh window; 26: accumulates (26 <= 20+10: no trigger yet);
    #   40: included, triggers (n=3) and instantly passes remove_point
    df = _df(spark, [0, 4, 12, 13, 15, 20, 26, 40])
    drop = (
        E.ephemeral_windows_batch(df, ["key"], "ts", "v", 10, 5, late_policy="drop")
        .orderBy("window_start")
        .collect()
    )
    assert [(r.n_events, r.closed, r.is_late_fire) for r in drop] == [
        (3, True, False),
        (3, True, False),
    ]
    assert [r.window_start for r in drop] == [
        T0.timestamp(),
        (T0 + dt.timedelta(seconds=20)).timestamp(),
    ]

    fire = (
        E.ephemeral_windows_batch(
            df, ["key"], "ts", "v", 10, 5, late_policy="fire_per_message"
        )
        .orderBy("window_start")
        .collect()
    )
    # late rows 13, 15 become singletons at their own event_ts
    assert [(r.window_start - T0.timestamp(), r.n_events, r.is_late_fire) for r in fire] == [
        (0.0, 3, False),
        (13.0, 1, True),
        (15.0, 1, True),
        (20.0, 3, False),
    ]

    with pytest.raises(ValueError, match="place_in_oldest_window|late_policy"):
        E.ephemeral_windows_batch(
            df, ["key"], "ts", "v", 10, 5, late_policy="place_in_oldest_window"
        )


@pytest.mark.slow
def test_ephemeral_late_policy_stream_matches_batch(spark, tmp_path):
    """S8xS11 stream-vs-batch parity, patterned on the late.py tests:
    multi-key, multi-batch (state round-trips), both policies."""
    secs_by_key = {
        "a": [0, 4, 12, 13, 15, 20, 26, 40, 90],
        "b": [0, 11, 14, 30, 41, 44, 46, 100],
    }
    rows = [
        Row(key=k, ts=T0 + dt.timedelta(seconds=s), v=float(s + 1))
        for k, secs in secs_by_key.items()
        for s in secs
    ]
    df = spark.createDataFrame(rows)
    # three SINGLE-FILE parquet segments -> exactly three micro-batches
    # under maxFilesPerTrigger=1 (multi-file segments would shred arrival
    # order), forcing state to round-trip twice (VERDICT r14 #5: >= 3
    # micro-batches)
    segs = [
        F.col("ts") < T0 + dt.timedelta(seconds=30),
        (F.col("ts") >= T0 + dt.timedelta(seconds=30))
        & (F.col("ts") < T0 + dt.timedelta(seconds=45)),
        F.col("ts") >= T0 + dt.timedelta(seconds=45),
    ]
    for i, cond in enumerate(segs, 1):
        df.filter(cond).coalesce(1).write.parquet(str(tmp_path / "in" / f"seg{i}"))

    for policy in ("drop", "fire_per_message"):
        sdf = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / "in" / "seg*"))
        )
        out = E.ephemeral_windows_stream(
            sdf.withWatermark("ts", "0 seconds"),
            ["key"], "ts", "v", 10, 5, late_policy=policy,
        )
        name = f"t_eph_{policy}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"chk_{policy}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            (r.key, r.window_start, r.n_events, r.total_value, r.closed, r.is_late_fire)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        batch = sorted(
            (r.key, r.window_start, r.n_events, r.total_value, r.closed, r.is_late_fire)
            for r in E.ephemeral_windows_batch(
                df, ["key"], "ts", "v", 10, 5, late_policy=policy
            ).collect()
        )
        # stream never emits batch's unclosed tails (state/timer pending)
        closed_batch = [b for b in batch if b[4]]
        assert [g for g in got if g[4]] == closed_batch, policy
        assert got == [g for g in got if g[4]], policy  # stream emits closed only


@pytest.mark.slow
def test_ephemeral_timer_trigger_policy_path(spark, tmp_path):
    """VERDICT r14 #5: the TIMER-driven trigger path (hasTimedOut) under
    both late policies, across six time-ordered micro-batches (the r14
    calibrated-slices technique). The row-driven parity test cannot reach
    this branch — a key's own rows always trigger first there. Here the
    GLOBAL watermark (advanced by a driver key "w") passes key "a"'s
    trigger point while "a" is silent, so the window must fire from the
    timer (reference: the idle-flush `runner.pony:465-501`; watermark
    advance triggers regardless of which source moved it). A later "a"
    row lands between trigger and remove_point and gets the policy; the
    remove_point then passes silently (state deleted, no emission).

    Timer-vs-message triggering legitimately DIVERGES from the batch
    simulator (batch judges per-key watermark = the key's own max ts, so
    it would fold the post-trigger row into the window via
    update-then-trigger) — both orders are reference-legal; the stream
    replays the reference's global clock. Hence hand-computed expected
    output, not batch equality."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from wallaroo_spark.streaming import ephemeral as E2

    with pytest.raises(ValueError, match="place_in_oldest_window|late_policy"):
        E2.ephemeral_windows_stream(
            spark.readStream.format("rate").load()
            .select(F.col("timestamp").alias("ts"), F.lit("k").alias("key"),
                    F.lit(1.0).alias("v"))
            .withWatermark("ts", "0 seconds"),
            ["key"], "ts", "v", 10, 5, late_policy="place_in_oldest_window",
        )

    base = int(T0.timestamp())
    # trigger=10, post=5. Batch k sees the watermark from batch k-1's end:
    #   b1: a:0 a:4 w:0   -> a open (n=2, acc=1+5), wm after = 4
    #   b2: w:12          -> wm 4 < 10.001: no timer; wm after = 12
    #   b3: w:13          -> TIMER for a (wm 12 > 10.001): emit closed
    #                        (n=2), keep triggered state, timer -> 15.001
    #   b4: a:14 w:14     -> row path, triggered: policy on a:14
    #                        (14 < remove 15); wm after = 14
    #   b5: w:40          -> wm 14 < 15.001: no timer; wm after = 40
    #   b6: w:41          -> TIMER for a (40 >= 15): silent state delete
    slices = [
        [("a", 0), ("a", 4), ("w", 0)],
        [("w", 12)],
        [("w", 13)],
        [("a", 14), ("w", 14)],
        [("w", 40)],
        [("w", 41)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, sl in enumerate(slices):
        tbl = pa.table({
            "key": pa.array([k for k, _ in sl], pa.string()),
            "ts": pa.array([(base + s) * 1_000_000 for _, s in sl],
                           pa.timestamp("us")),
            "v": pa.array([float(s + 1) for _, s in sl], pa.float64()),
        })
        p = src / f"slice_{i:02d}.parquet"
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i * 100,) * 2)

    for policy, want in {
        "drop": [("a", float(base), 2, 6.0, True, False)],
        "fire_per_message": [
            ("a", float(base), 2, 6.0, True, False),
            ("a", float(base + 14), 1, 15.0, True, True),
        ],
    }.items():
        sdf = (
            spark.readStream.schema("key string, ts timestamp, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        out = E2.ephemeral_windows_stream(
            sdf.withWatermark("ts", "0 seconds"),
            ["key"], "ts", "v", 10, 5, late_policy=policy,
        )
        name = f"t_eph_timer_{policy}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"chk_t_{policy}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            (r.key, r.window_start, r.n_events, r.total_value, r.closed,
             r.is_late_fire)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r.key == "a"  # w is only the watermark driver
        )
        assert got == want, (policy, got)


def test_example_word_count(spark, sf_dir):
    from examples.word_count import totals

    out = {r.word: r["count"] for r in totals(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
    )
    assert out == {r.w: r["count"] for r in want.collect()}


def test_example_market_spread(spark, sf_dir):
    from examples.market_spread import build

    out = build(spark, sf_dir).collect()
    assert out  # orders exist
    # spread is fixed at 2% of mid (bid=0.99v, offer=1.01v) -> always < 5% => never rejected
    assert all(not r.rejected for r in out if r.bid is not None)
    # orders before any market data carry null market state
    assert all((r.bid is None) == (r.offer is None) for r in out)


def test_example_celsius(spark, sf_dir):
    from examples.celsius import build

    out = build(spark, sf_dir).collect()
    for r in out:
        assert abs(r.fahrenheit - round(r.celsius * 9.0 / 5.0 + 32.0, 4)) < 1e-9


@pytest.mark.slow
def test_training_data_pipeline_example(spark, tmp_path):
    """End-to-end corpus build: quality gates (incl. the reference-LM
    perplexity stage) -> stratified sample -> near-dup + semantic dedup ->
    budget -> split -> ONE atomic MultiManifestTable commit of corpus +
    sequence manifests; the committed snapshot has no non-canonical
    duplicates, carries split tags, and both tables share the txn."""
    from examples.training_data_pipeline import build_corpus
    from wallaroo_spark.operators import dedup

    out = str(tmp_path / "corpus")
    table = build_corpus(spark, "/root/testdata/sf0.001", out)
    final = table.read(spark, "corpus")
    rows = final.collect()
    assert rows and set(r.split for r in rows) <= {"train", "val", "test"}

    # round-5 stages held: no PII tokens survive, no benchmark doc ids,
    # no doc sharing a 5-gram with the benchmark set
    assert not any(" customer " in f" {r.text} " for r in rows)
    assert all(r.doc_id % 50 != 0 for r in rows)

    # no surviving doc is a non-canonical member of a duplicate cluster
    clusters = dedup.duplicate_clusters(
        spark.createDataFrame([(r.doc_id, r.text) for r in rows], "doc_id long, text string"),
        threshold=0.5,
    )
    non_canon = clusters.filter("component_id <> doc_id").count()
    assert non_canon == 0

    # round-6 stages held: per-source token budget is a hard cap
    from wallaroo_spark.operators.text import tokens as _toks

    budgets = (
        spark.createDataFrame([(r.source, r.text) for r in rows], "source string, text string")
        .select("source", F.size(_toks(F.col("text"))).alias("nt"))
        .groupBy("source")
        .sum("nt")
        .collect()
    )
    assert budgets and all(b["sum(nt)"] <= 1000 for b in budgets)

    # round-6b stage held: the committed sequence manifests cover exactly
    # the train split's tokens, every sequence but the last exactly full
    from wallaroo_spark.operators.text import tokens as _tk

    man = table.read(spark, "sequences").collect()
    last = max(r.seq_id for r in man)
    assert all(r.n_tokens_filled == 256 for r in man if r.seq_id != last)
    train_tokens = (
        final.filter(F.col("split") == "train")
        .agg(F.sum(F.size(_tk(F.col("text")))))
        .first()[0]
    )
    assert sum(r.n_tokens_filled for r in man) == train_tokens

    # round-10 stage held: BOTH post-deploy monitors landed in the SAME
    # transaction as the snapshot they certify — per-window classifier
    # ECE (in [0,1], nonempty, window totals = scored corpus) and the
    # kept-vs-full embedding-drift report (valid counts, TV in [0,1])
    cal = table.read(spark, "monitor_calibration", version=0).collect()
    assert cal and all(0.0 <= r.ece <= 1.0 for r in cal)
    assert all(r.n_scored > 0 for r in cal)
    dr = table.read(spark, "monitor_drift", version=0).collect()
    assert len(dr) == 1
    assert 0 < dr[0].n_cur <= dr[0].n_ref
    assert 0.0 <= dr[0].norm_tv <= 1.0 and dr[0].mean_shift_l2 >= 0.0

    # round-7 stage held: corpus + sequence manifests landed in ONE
    # transaction (single log version covers both tables), so a later
    # commit to one table leaves the published pair travel-consistent
    assert table.versions() == [0]
    table.append_multi({"corpus": final.limit(1)})
    assert table.read(spark, "sequences", version=0).count() == len(man)
    assert table.read(spark, "corpus", version=0).count() == len(rows)


def test_example_celsius_kafka_full_loop(spark, tmpdir):
    """r16: the reference's celsius-kafka app end-to-end over the wire
    broker — produce C readings to the input topic, convert through the
    Pipeline facade, produce F strings to the output topic, and verify
    every reading came back as %.6f of C*1.8+32 under the same key."""
    from examples.celsius_kafka import (
        IN_TOPIC,
        OUT_TOPIC,
        PARTITIONS,
        run,
    )
    from wallaroo_spark.sources.kafka_wire import KafkaWireClient, MiniKafkaBroker

    broker = MiniKafkaBroker().start()
    try:
        run(spark, broker, str(tmpdir) + "/spool", str(tmpdir) + "/chk", n=60)
        client = KafkaWireClient(broker.host, broker.port)
        try:
            inp, out = [], []
            for p in range(PARTITIONS):
                inp += client.fetch(IN_TOPIC, p, 0)[1]
                out += client.fetch(OUT_TOPIC, p, 0)[1]
        finally:
            client.close()
        assert len(inp) == 60 and len(out) == 60
        want = sorted(
            (k.decode(), "%.6f" % (float(v.decode()) * 1.8 + 32))
            for _o, k, v, _t in inp
        )
        got = sorted((k.decode(), v.decode()) for _o, k, v, _t in out)
        assert got == want
    finally:
        broker.stop()
