"""chunk_documents / split_paragraphs / paragraph_dedup invariants."""

from pyspark.sql import functions as F

from wallaroo_spark.operators import text as T


def test_chunk_windows_cover_every_token(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(23))), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    ch = T.chunk_documents(docs, window=8, stride=4).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 23 tokens, starts 1,5,9,13,17 (last start covers 17..23)
    starts = sorted(r.chunk_id for r in by_doc[1])
    assert starts == [0, 1, 2, 3, 4]
    covered = set()
    for r in by_doc[1]:
        toks = r.chunk.split(" ")
        assert len(toks) == r.n_chunk_tokens <= 8
        covered.update(toks)
    assert covered == {f"w{i}" for i in range(23)}  # no token lost
    # short docs: one partial chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk == "a b"
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 1


def test_chunk_overlap_is_window_minus_stride(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(20)))], "doc_id long, text string"
    )
    ch = sorted(
        T.chunk_documents(docs, window=8, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    for a, b in zip(ch, ch[1:]):
        ta, tb = a.chunk.split(" "), b.chunk.split(" ")
        assert ta[4:] == tb[: len(ta) - 4]  # 4-token overlap, in order


def test_split_paragraphs_newline_mode(spark):
    docs = spark.createDataFrame(
        [(1, "first para\nsecond para\n\n\nthird")], "doc_id long, text string"
    )
    ps = sorted(
        T.split_paragraphs(docs).collect(), key=lambda r: r.para_idx
    )
    assert [p.para for p in ps] == ["first para", "second para", "third"]


def test_paragraph_dedup_first_occurrence_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared banner\nunique one"),
            (2, "shared banner\nunique two"),
            (3, "shared banner"),  # nothing unique -> comes back empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.paragraph_dedup(docs).collect()}
    assert out[1].text_dedup == "shared banner unique one"
    assert out[2].text_dedup == "unique two" and out[2].n_dropped == 1
    assert out[3].text_dedup == "" and out[3].n_paras == 0 and out[3].n_dropped == 1
    assert set(out) == {1, 2, 3}  # the all-dup doc did not vanish


def test_paragraph_dedup_no_udfs(spark):
    """Scan-speed claim: the whole chain is Column math — no BatchEvalPython
    in the plan."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = T.paragraph_dedup(docs, block_tokens=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_paragraph_dedup_stream_parity_with_batch(spark, tmp_path):
    """Ordered arrival -> the streaming twin's surviving paragraph set
    equals the batch operator's (first (doc, position) occurrence)."""
    import datetime as dt

    from pyspark.sql import Row

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(doc_id=1, text="shared banner\nunique one", ts=t0),
        Row(doc_id=2, text="shared banner\nunique two", ts=t0 + dt.timedelta(seconds=5)),
        Row(doc_id=3, text="unique two\nfresh", ts=t0 + dt.timedelta(seconds=9)),
    ]
    df = spark.createDataFrame(rows)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "in"))
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in"))
    )
    out = T.paragraph_dedup_stream(sdf, "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("t_para_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_kept = {
        (r.doc_id, r.para_idx, r.para)
        for r in spark.sql("SELECT * FROM t_para_dedup").collect()
    }
    # batch twin's surviving (doc, para_idx, para) set
    from wallaroo_spark.functions import hashing as H
    from pyspark.sql import functions as SF

    paras = T.split_paragraphs(df).withColumn("_ph", H.md5int_col(SF.col("para")))
    first = paras.groupBy("_ph").agg(
        SF.min(SF.struct(SF.col("doc_id").alias("d"), SF.col("para_idx").alias("p"))).alias("f")
    )
    batch_kept = {
        (r.doc_id, r.para_idx, r.para)
        for r in paras.join(first, "_ph")
        .filter((SF.col("doc_id") == SF.col("f.d")) & (SF.col("para_idx") == SF.col("f.p")))
        .collect()
    }
    assert stream_kept == batch_kept and len(stream_kept) == 4
