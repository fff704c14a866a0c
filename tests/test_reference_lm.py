"""Reference-LM perplexity filter (text.reference_lm_cross_entropy /
perplexity_filter): hand-computed probabilities, unseen-context backoff,
filter semantics, and the size-aware model-join degradation."""

import math

from pyspark.sql import functions as F

from wallaroo_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_add_one_bigram_model_hand_computed(spark):
    # ref bigrams: "a b" x2, "b a" x1, "a c" x1 -> c1: a=3, b=1; V = |{b,a,c}| = 3
    ref = _docs(spark, [(1, "a b a b"), (2, "a c")])
    corpus = _docs(spark, [(10, "a b c")])
    got = T.reference_lm_cross_entropy(corpus, ref).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_bigrams"] == 2
    p_ab = (2 + 1) / (3 + 3 + 1)  # seen bigram, seen context
    p_bc = (0 + 1) / (1 + 3 + 1)  # unseen bigram, seen context
    expect = round((-math.log2(p_ab) - math.log2(p_bc)) / 2, 4)
    assert float(r["avg_bits"]) == expect


def test_unseen_context_backoff_and_single_token_drop(spark):
    ref = _docs(spark, [(1, "a b a b"), (2, "a c")])  # V = 3
    corpus = _docs(spark, [(10, "x y"), (11, "solo")])
    got = {r["doc_id"]: r for r in T.reference_lm_cross_entropy(corpus, ref).collect()}
    # fully unseen context: p = 1/(0 + V + 1) = 1/4
    assert float(got[10]["avg_bits"]) == round(-math.log2(1 / 4), 4)
    assert 11 not in got  # no bigrams -> drops out


def test_perplexity_filter_keeps_low_bits_docs(spark):
    ref = _docs(spark, [(1, "a b a b a b"), (2, "a b c")])
    corpus = _docs(
        spark,
        [(10, "a b a b"), (11, "q r s t u v"), (12, "a b c a b")],
    )
    scores = {
        r["doc_id"]: float(r["avg_bits"])
        for r in T.reference_lm_cross_entropy(corpus, ref).collect()
    }
    cut = (min(scores.values()) + max(scores.values())) / 2
    kept = T.perplexity_filter(corpus, ref, max_avg_bits=cut)
    assert set(kept.columns) == {"doc_id", "text"}  # schema preserved
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        d for d, s in scores.items() if s <= cut
    )


def test_model_join_broadcast_auto_degrades_with_parity(spark):
    """Below the cap the model joins broadcast; above it they degrade to
    shuffle joins — identical scores either way (the ngram_jaccard size-
    aware pattern applied to the LM model tables)."""
    from wallaroo_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    ref = docs.filter(F.col("lang") == "en")

    def plan(cap):
        out = T.reference_lm_cross_entropy(docs, ref, model_broadcast_max=cap)
        return out, out._jdf.queryExecution().executedPlan().toString()

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out_b, plan_b = plan(None)  # always broadcast
        out_s, plan_s = plan(1)  # tiny cap: forced shuffle fallback
        assert plan_b.count("BroadcastHashJoin") > plan_s.count("BroadcastHashJoin")
        assert "SortMergeJoin" in plan_s or "ShuffledHashJoin" in plan_s
        rows_b = sorted(map(tuple, out_b.collect()))
        rows_s = sorted(map(tuple, out_s.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert rows_b == rows_s


def test_streamable_perplexity_filter_stream_matches_batch(spark, tmpdir):
    """Streamable LM gate: the SAME perplexity_filter_streamable call on a
    streaming probe (stream-static broadcast join, append mode) keeps
    exactly the batch-kept docs with identical bits — in-row scoring has
    no state to diverge."""
    from wallaroo_spark.operators.text import lm_score_map, perplexity_filter_streamable
    from wallaroo_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents")
    ref = docs.filter(F.col("lang") == "en")
    model = lm_score_map(ref)

    batch = perplexity_filter_streamable(docs, model, max_avg_bits=4.9).select(
        "doc_id", "n_bigrams", "avg_bits"
    )
    want = {(r.doc_id, r.n_bigrams, float(r.avg_bits)) for r in batch.collect()}
    assert want  # non-vacuous

    docs.coalesce(1).write.mode("overwrite").parquet(str(tmpdir) + "/in")
    sdocs = spark.readStream.schema(docs.schema).parquet(str(tmpdir) + "/in")
    out = perplexity_filter_streamable(sdocs, model, max_avg_bits=4.9).select(
        "doc_id", "n_bigrams", "avg_bits"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_ppl_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir) + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_bigrams, float(r.avg_bits))
        for r in spark.sql("SELECT * FROM t_ppl_stream").collect()
    }
    assert got == want


def test_interp_trigram_lm_hand_computed(spark):
    """Order-3 interpolated model on a tiny vocab small enough that no
    md5 buckets collide: probabilities verified against a hand-rolled
    python replica of the same definition."""
    import hashlib

    from wallaroo_spark.operators.text import interp_lm_score, lm_score_map_interp

    ref = _docs(spark, [(1, "a b c a b c"), (2, "b c d")])
    probe = _docs(spark, [(10, "a b c d")])
    model = lm_score_map_interp(ref, n_hash=4096)
    got = interp_lm_score(probe, model, n_hash=4096).collect()[0]

    def bk(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 4096

    uni, bi, tri = {}, {}, {}
    toks_ref = [["a","b","c","a","b","c"], ["b","c","d"]]
    for ts in toks_ref:
        for w in ts:
            uni[bk(w)] = uni.get(bk(w), 0) + 1
        for x, y in zip(ts, ts[1:]):
            bi[bk(f"{x} {y}")] = bi.get(bk(f"{x} {y}"), 0) + 1
        for x, y, z in zip(ts, ts[1:], ts[2:]):
            tri[bk(f"{x} {y} {z}")] = tri.get(bk(f"{x} {y} {z}"), 0) + 1
    V = 4
    T = 9
    bits = []
    ts = ["a", "b", "c", "d"]
    for x, y, z in zip(ts, ts[1:], ts[2:]):
        p3 = (tri.get(bk(f"{x} {y} {z}"), 0) + 1) / (bi.get(bk(f"{x} {y}"), 0) + V + 1)
        p2 = (bi.get(bk(f"{y} {z}"), 0) + 1) / (uni.get(bk(y), 0) + V + 1)
        p1 = (uni.get(bk(z), 0) + 1) / (T + V)
        bits.append(-math.log2(0.5 * p3 + 0.3 * p2 + 0.2 * p1))
    assert got["n_trigrams"] == 2
    assert float(got["avg_bits"]) == round(sum(bits) / len(bits), 4)


def test_interp_trigram_lm_stream_matches_batch(spark, tmpdir):
    from wallaroo_spark.operators.text import interp_lm_score, lm_score_map_interp
    from wallaroo_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents")
    model = lm_score_map_interp(docs.filter(F.col("lang") == "en"))
    want = {
        (r.doc_id, r.n_trigrams, float(r.avg_bits))
        for r in interp_lm_score(docs, model)
        .select("doc_id", "n_trigrams", "avg_bits")
        .collect()
    }
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmpdir) + "/in")
    sdocs = spark.readStream.schema(docs.schema).parquet(str(tmpdir) + "/in")
    q = (
        interp_lm_score(sdocs, model)
        .select("doc_id", "n_trigrams", "avg_bits")
        .writeStream.format("memory")
        .queryName("t_interp_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir) + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_trigrams, float(r.avg_bits))
        for r in spark.sql("SELECT * FROM t_interp_stream").collect()
    }
    assert got == want and want
