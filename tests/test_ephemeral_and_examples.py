"""Exact ephemeral-window semantics (S11) + reference-example ports."""

import datetime as dt

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


def test_training_data_pipeline_example(spark, tmp_path):
    """End-to-end corpus build: quality gate -> stratified sample -> near-dup
    dedup -> split -> 2PC commit; the committed snapshot has no non-canonical
    duplicates, carries split tags, and a replayed commit is a no-op."""
    from examples.training_data_pipeline import build_corpus
    from wallaroo_spark.operators import dedup

    out = str(tmp_path / "corpus")
    sink = build_corpus(spark, "/root/testdata/sf0.001", out)
    final = sink.read(spark)
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

    # replayed commit (same batch id) changes nothing
    n_before = len(rows)
    sink(final.limit(3), 0)
    assert sink.read(spark).count() == n_before
