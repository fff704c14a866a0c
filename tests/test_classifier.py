"""Trained quality classifier (inference.linear_classifier_fit/score):
learnability on separable vocabularies, determinism, gradient-step
hand-check, and stream parity of the in-row scorer."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from wallaroo_spark.operators import inference as I


def _corpus(spark, n=40, seed=5):
    """Two disjoint vocabularies -> linearly separable labels."""
    r = np.random.default_rng(seed)
    pos_words = ["alpha", "beta", "gamma", "delta"]
    neg_words = ["omega", "sigma", "kappa", "theta"]
    rows = []
    for i in range(n):
        y = i % 2
        words = r.choice(pos_words if y else neg_words, size=6)
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


def test_separable_corpus_reaches_full_accuracy(spark):
    docs = _corpus(spark)
    model = I.linear_classifier_fit(docs, "y", n_hash=64, iters=4, lr=1.0)
    scored = I.linear_classifier_score(docs, model, n_hash=64)
    acc = scored.agg(
        F.avg((F.col("clf_pred") == F.col("y")).cast("double"))
    ).first()[0]
    assert acc == 1.0


def test_fit_is_deterministic_across_runs(spark):
    docs = _corpus(spark)
    w1 = I.linear_classifier_fit(docs, "y", n_hash=64, iters=3).collect()[0]
    w2 = I.linear_classifier_fit(docs, "y", n_hash=64, iters=3).collect()[0]
    assert w1["clf_w"] == w2["clf_w"] and w1["clf_b"] == w2["clf_b"]


def test_single_gradient_step_hand_checked(spark):
    """One iteration from zero weights: every doc scores sigmoid(0)=0.5,
    so err = 0.5 - y and the update is exactly -lr * sum(err * x) / N per
    bucket (verified against a local replica, collisions included)."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "aa aa", 1), (2, "aa bb", 1), (3, "zz zz", 0), (4, "zz yy", 0)],
        "doc_id bigint, text string, y int",
    )
    row = I.linear_classifier_fit(docs, "y", n_hash=16, iters=1, lr=1.0).collect()[0]

    def bk(t):
        return int(hashlib.md5((t + ":clf").encode()).hexdigest()[:15], 16) % 16

    grad = [0.0] * 16
    gbias = 0.0
    for toks, y in [({"aa"}, 1), ({"aa", "bb"}, 1), ({"zz"}, 0), ({"zz", "yy"}, 0)]:
        err = 0.5 - y
        gbias += err
        for t in toks:
            grad[bk(t)] += err
    expect_w = [round(-g / 4.0, 6) for g in grad]
    assert list(row["clf_w"]) == expect_w
    assert row["clf_b"] == round(-gbias / 4.0, 6)


def test_scoring_stream_matches_batch(spark, tmp_path):
    docs = _corpus(spark)
    model = I.linear_classifier_fit(docs, "y", n_hash=64, iters=4)
    want = {
        (r.doc_id, float(r.clf_prob), r.clf_pred)
        for r in I.linear_classifier_score(docs, model, n_hash=64)
        .select("doc_id", "clf_prob", "clf_pred")
        .collect()
    }
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path) + "/in")
    sdocs = spark.readStream.schema(docs.schema).parquet(str(tmp_path) + "/in")
    q = (
        I.linear_classifier_score(sdocs, model, n_hash=64)
        .select("doc_id", "clf_prob", "clf_pred")
        .writeStream.format("memory")
        .queryName("t_clf_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path) + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, float(r.clf_prob), r.clf_pred)
        for r in spark.sql("SELECT * FROM t_clf_stream").collect()
    }
    assert got == want and want


def test_char_ngram_features_generalize_to_unseen_words(spark):
    """fastText-style subword features: labels follow a word PREFIX; the
    eval set uses words never seen in training. Word-only features can
    only fall back to the bias (unseen buckets are zero-weight), while
    char-3-gram features share the prefix units and classify the unseen
    words correctly."""
    train_rows, eval_rows = [], []
    for i in range(30):
        y = i % 2
        stem = f"{'goodish' if y else 'badword'}{i:02d}"
        train_rows.append((i, f"{stem}a {stem}b {stem}c", y))
    for i in range(10):
        y = i % 2
        stem = f"{'goodish' if y else 'badword'}zz{i}"  # unseen words
        eval_rows.append((100 + i, f"{stem}x {stem}y", y))
    train = spark.createDataFrame(train_rows, "doc_id bigint, text string, y int")
    ev = spark.createDataFrame(eval_rows, "doc_id bigint, text string, y int")

    def acc(char_ngrams):
        m = I.linear_classifier_fit(
            train, "y", n_hash=256, iters=5, lr=1.0, char_ngrams=char_ngrams
        )
        s = I.linear_classifier_score(ev, m, n_hash=256, char_ngrams=char_ngrams)
        return s.agg(F.avg((F.col("clf_pred") == F.col("y")).cast("double"))).first()[0]

    word_only = acc(None)
    subword = acc(3)
    assert subword == 1.0
    assert subword > word_only


def test_sgd_reaches_full_batch_accuracy(spark):
    """The mini-batch SGD fit must match full-batch GD's accuracy on the
    separable corpus (both 1.0) — 4 updates for one corpus pass vs the
    full-batch 4 updates for 4 passes."""
    docs = _corpus(spark)
    sgd = I.linear_classifier_fit_sgd(
        docs, "y", n_hash=64, epochs=1, n_batches=4, lr=1.0
    )
    acc = (
        I.linear_classifier_score(docs, sgd, n_hash=64)
        .agg(F.avg((F.col("clf_pred") == F.col("y")).cast("double")))
        .first()[0]
    )
    assert acc == 1.0


@pytest.mark.slow
def test_sgd_deterministic_and_empty_batch_safe(spark):
    """Batch assignment is salted-hash -> identical models across runs;
    and a batch count larger than the corpus (guaranteeing empty batches)
    must yield no-op steps, never a NULL-poisoned model."""
    docs = _corpus(spark, n=10)
    m1 = I.linear_classifier_fit_sgd(docs, "y", n_hash=64, n_batches=4).collect()[0]
    m2 = I.linear_classifier_fit_sgd(docs, "y", n_hash=64, n_batches=4).collect()[0]
    assert m1["clf_w"] == m2["clf_w"] and m1["clf_b"] == m2["clf_b"]

    sparse = I.linear_classifier_fit_sgd(
        docs, "y", n_hash=64, epochs=1, n_batches=64
    ).collect()[0]
    assert sparse["clf_b"] is not None
    assert len(sparse["clf_w"]) == 64
    assert all(w is not None for w in sparse["clf_w"])


def test_windowed_calibration_stream_matches_batch_exactly(spark, tmpdir):
    """CalibrationAggregation drained over a stream reproduces the batch
    windowed_calibration numbers EXACTLY — probs are 4dp-rounded so the
    ECE is integer math until one final division (no float-fold drift
    between the streaming accumulator and Spark's partial agg)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from wallaroo_spark.api import aggregation as A
    from wallaroo_spark.operators import inference as I
    from wallaroo_spark.operators.text import tokens as tk
    from wallaroo_spark.sources import read_table

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    train = docs.withColumn(
        "y", F.array_contains(tk(F.col("text")), "vector").cast("int")
    )
    model = I.linear_classifier_fit(train, "y")
    scored = I.linear_classifier_score(train, model).select(
        "doc_id", "clf_prob", "y",
        (F.lit(T0) + F.make_interval(secs=F.col("doc_id") * 50)).alias("ts"),
    ).localCheckpoint()

    want = {
        int(r.window_start.timestamp()): (r.n_scored, r.ece)
        for r in I.windowed_calibration(scored).collect()
    }

    agg = I.CalibrationAggregation()
    sealed = scored.select(
        F.lit("g").alias("k"), "clf_prob", "y", "ts"
    ).unionByName(
        spark.createDataFrame(
            [("g", None, None, T0 + dt.timedelta(days=30))],
            "k string, clf_prob double, y int, ts timestamp",
        )
    )
    sealed.coalesce(1).write.mode("overwrite").parquet(str(tmpdir) + "/in")
    sdf = spark.readStream.schema(sealed.schema).parquet(str(tmpdir) + "/in")
    out = A.windowed_agg_stream(
        sdf.withWatermark("ts", "0 seconds"), ["k"], "ts", agg,
        "n_scored bigint, ece double", 3600,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_calib_win")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir) + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        int(r.window_start): (r.n_scored, r.ece)
        for r in spark.sql("SELECT * FROM t_calib_win").collect()
        if r.n_scored > 0
    }
    assert got == want and len(got) >= 3


def test_windowed_calibration_per_key_slices(spark, tmpdir):
    """Per-slice streaming calibration for free: CalibrationAggregation
    under the facade's key columns gives per-(lang, window) ECE — each
    slice's bins accumulate independently and match the batch twin
    computed on that slice alone."""
    import datetime as dt

    from pyspark.sql import functions as F

    from wallaroo_spark.api import aggregation as A
    from wallaroo_spark.operators import inference as I
    from wallaroo_spark.operators.text import tokens as tk
    from wallaroo_spark.sources import read_table

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    train = docs.withColumn(
        "y", F.array_contains(tk(F.col("text")), "vector").cast("int")
    )
    model = I.linear_classifier_fit(train, "y")
    scored = I.linear_classifier_score(train, model).select(
        "doc_id", "lang", "clf_prob", "y",
        (F.lit(T0) + F.make_interval(secs=F.col("doc_id") * 50)).alias("ts"),
    ).localCheckpoint()

    want = {}
    for lang in [r.lang for r in scored.select("lang").distinct().collect()]:
        for r in I.windowed_calibration(scored.filter(F.col("lang") == lang)).collect():
            want[(lang, int(r.window_start.timestamp()))] = (r.n_scored, r.ece)

    sealed = scored.select("lang", "clf_prob", "y", "ts").unionByName(
        spark.createDataFrame(
            [("en", None, None, T0 + dt.timedelta(days=30))],
            "lang string, clf_prob double, y int, ts timestamp",
        )
    )
    sealed.coalesce(1).write.mode("overwrite").parquet(str(tmpdir) + "/in")
    sdf = spark.readStream.schema(sealed.schema).parquet(str(tmpdir) + "/in")
    out = A.windowed_agg_stream(
        sdf.withWatermark("ts", "0 seconds"), ["lang"], "ts",
        I.CalibrationAggregation(), "n_scored bigint, ece double", 3600,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_calib_slice")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir) + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.lang, int(r.window_start)): (r.n_scored, r.ece)
        for r in spark.sql("SELECT * FROM t_calib_slice").collect()
        if r.n_scored > 0
    }
    assert got == want and len({k[0] for k in got}) >= 2


def test_calibration_overflow_posture():
    """r10 VERDICT #3 — the TV-numerator discipline applied to ECE: the
    streaming twin's integer identity must stay EXACT at magnitudes far
    past BIGINT comfort (Python ints are arbitrary-precision; this pins
    that the identity itself, not a float fold, is what runs)."""
    import math

    agg = I.CalibrationAggregation()
    acc = agg.initial_accumulator()
    # adversarial magnitudes: ~1e15 rows in one bin, 10^4-scaled sums
    # ~1e19 — past int64 for the products a naive fold would form
    acc["n"][0] = 10 ** 15
    acc["sp"][0] = 9_999 * 10 ** 15
    acc["np"][0] = 10 ** 14
    acc["n"][3] = 7
    acc["sp"][3] = 23_456
    acc["np"][3] = 3
    out = agg.output("k", acc)
    num = abs(9_999 * 10 ** 15 - 10_000 * 10 ** 14) + abs(23_456 - 10_000 * 3)
    n = 10 ** 15 + 7
    want = math.floor(num / (10000.0 * n) * 10 ** 4 + 0.5) / 10 ** 4
    assert out["n_scored"] == n
    assert out["ece"] == want


def test_windowed_calibration_plan_is_decimal_exact(spark):
    """The batch twin's numerator runs in DECIMAL(38,0) (non-ANSI Spark
    wraps BIGINT sums silently): the optimized plan must carry the
    decimal cast, and the result must equal the integer identity."""
    rows = [(i, 0.1234, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "i long, clf_prob double, y int").select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("i"))).alias("ts"),
        "clf_prob", "y",
    )
    out = I.windowed_calibration(df, ts_col="ts", size="1 hour", label_col="y")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(38,0)" in plan
    r = out.collect()[0]
    # one bin: sp = 40*1234, np = 20 -> |49360 - 200000| / (1e4 * 40)
    assert r["n_scored"] == 40
    assert r["ece"] == round(abs(40 * 1234 - 10000 * 20) / (10000.0 * 40), 4)


def test_fused_gd_empty_corpus_is_noop_not_null(spark):
    """r17 review: a corpus whose every doc filters out (no features) must
    yield the untouched zero model, not NULL-poisoned weights (lit(0.0)
    divisor under non-ANSI divide-by-zero)."""
    from wallaroo_spark.operators.inference import linear_classifier_fit

    empty = spark.createDataFrame([("", 1)], "text string, label int")
    row = linear_classifier_fit(empty, text="text", label_col="label").collect()[0]
    assert row["clf_b"] == 0.0
    assert row["clf_w"] is not None and all(w == 0.0 for w in row["clf_w"])
