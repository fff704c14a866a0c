"""Edge tests for the round-6 corpus operators: semantic dedup (SemDeDup),
chunk-level dedup, snapshot novelty, token-budget fill, bigram surprisal."""

from pyspark.sql import Row
import pytest
from pyspark.sql import functions as F

from wallaroo_spark.operators import dedup, similarity, text


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_doc_chunks_alignment_and_edges(spark):
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(25))), (2, "a b"), (3, "")])
    out = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", dedup.doc_chunks(F.col("text"), 10).alias("c")
        ).collect()
    }
    assert len(out[1]) == 3  # 10 + 10 + 5
    assert out[1][0].split(" ") == [f"w{i}" for i in range(10)]
    assert out[1][2].split(" ") == [f"w{i}" for i in range(20, 25)]
    assert out[2] == ["a b"]
    assert out[3] == []


def test_chunk_dedup_keeps_first_occurrence(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, shared + " " + uniq("a")),  # owns the shared chunk (min doc_id)
            (2, shared + " " + uniq("b")),  # loses it
            (3, uniq("c")),
        ],
    )
    out = {r.doc_id: r for r in dedup.chunk_dedup(df, width=10).collect()}
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[2].n_chunks == 2 and out[2].n_kept == 1
    assert abs(out[2].dup_ratio - 0.5) < 1e-9
    assert out[3].n_chunks == 1 and out[3].n_kept == 1


def test_chunk_dedup_intra_doc_repeat(spark):
    block = " ".join(f"r{i}" for i in range(10))
    df = _docs(spark, [(7, block + " " + block)])
    out = dedup.chunk_dedup(df, width=10).collect()[0]
    assert out.n_chunks == 2 and out.n_kept == 1  # second copy loses to idx 0


def test_snapshot_novelty_bounds_and_no_false_negatives(spark):
    old_block = " ".join(f"o{i}" for i in range(10))
    new_block = " ".join(f"n{i}" for i in range(10))
    old = _docs(spark, [(1, old_block)])
    new = _docs(spark, [(4, old_block + " " + new_block)])
    out = dedup.snapshot_novelty(old, new, width=10).collect()[0]
    # the chunk copied from the old corpus can NEVER count as novel
    assert out.n_chunks == 2 and out.n_novel <= 1
    assert 0.0 <= out.novelty_ratio <= 0.5


def test_token_budget_fill_respects_budget(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 2}", text=" ".join(["w"] * 30)) for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    out = {r.source: r for r in text.token_budget_fill(df, budget=300).collect()}
    for src, r in out.items():
        assert r.tokens_kept <= 300
        assert r.n_docs_kept >= 1
        assert r.tokens_kept == r.n_docs_kept * 30


def test_bigram_surprisal_orders_quality(spark):
    repetitive = "a b " * 40  # one dominant bigram -> low surprisal
    diverse = " ".join(f"w{i}" for i in range(80))  # all-unique bigrams -> high
    df = _docs(spark, [(1, repetitive.strip()), (2, diverse), (3, "solo")])
    out = {r.doc_id: r for r in text.bigram_surprisal(df).collect()}
    assert out[1].avg_bits < out[2].avg_bits
    assert out[1].n_bigrams == 79 and out[2].n_bigrams == 79
    assert 3 not in out  # single-token doc has no bigrams


def test_semdedup_marks_only_clustered_neighbors(spark):
    # two tight groups + one isolate; k=2 clusters must keep one rep per group
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.02]),
        Row(vec_id=1, embedding=[1.0, 0.01, 0.0, 0.0]),  # near-dup of 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.01]),
        Row(vec_id=3, embedding=[0.01, 1.0, 0.0, 0.0]),  # near-dup of 2
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    out = {r.vec_id: r for r in similarity.semdedup(df, k=2, iters=2, tau=0.95).collect()}
    assert len(out) == 5
    assert out[0].kept == 1 and out[1].kept == 0  # min-id survives
    assert out[2].kept == 1 and out[3].kept == 0
    assert out[4].kept == 1  # isolate always survives
    kept_total = sum(r.kept for r in out.values())
    assert kept_total == 3


def test_semdedup_semi_verify_matches_all_pairs(spark):
    """r17: the pair-verify is a LEFT SEMI join (early exit at the first
    qualifying neighbor). Pin that the removed set equals the literal
    all-pairs + distinct computation on an input where rows have MANY
    qualifying neighbors (the early-exit case) and ties in cosine."""
    import itertools
    import math

    # one dense clique (ids 10..19, pairwise-similar), one sparse cluster
    rows = [
        Row(vec_id=10 + i, embedding=[1.0, 0.001 * i, 0.0, 0.0]) for i in range(10)
    ] + [
        Row(vec_id=i, embedding=[0.0, 0.0, 1.0, 0.3 * i]) for i in range(3)
    ]
    df = spark.createDataFrame(rows)
    tau = 0.9
    out = {r.vec_id: r for r in similarity.semdedup(df, k=2, iters=2, tau=tau).collect()}

    # reference: same cluster assignment, naive all-pairs + distinct
    cents = similarity.kmeans_fit(df, k=2, iters=2)
    assigned = {
        r.vec_id: (r.cent_id, r.embedding)
        for r in similarity.assign_nearest(df, cents).collect()
    }
    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return round(d / (math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v))), 4)
    removed = {
        b
        for a, b in itertools.combinations(sorted(assigned), 2)
        if assigned[a][0] == assigned[b][0] and cos(assigned[a][1], assigned[b][1]) >= tau
    }
    assert len(out) == len(rows)
    for vid, r in out.items():
        assert r.kept == (0 if vid in removed else 1), (vid, r)


def test_snapshot_novelty_stream_batch_parity(spark, tmp_path):
    """The probe side is a pure map (in-row array math), so the SAME
    operator runs on a streaming snapshot feed via a stream-static
    broadcast join — no state, no watermark. Stream output must equal the
    batch output row-for-row."""
    import os

    old = _docs(spark, [(1, " ".join(f"o{i}" for i in range(30)))])
    new_rows = [
        (10, " ".join(f"o{i}" for i in range(10)) + " " + " ".join(f"x{i}" for i in range(10))),
        (11, " ".join(f"y{i}" for i in range(25))),
    ]
    new = _docs(spark, new_rows)
    batch = {r.doc_id: r for r in dedup.snapshot_novelty(old, new, width=10).collect()}

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    new.write.parquet(src)
    sdf = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = dedup.snapshot_novelty(old, sdf, width=10)
    q = (
        out.writeStream.format("memory")
        .queryName("novelty_stream")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {r.doc_id: r for r in spark.sql("SELECT * FROM novelty_stream").collect()}
    assert set(stream) == set(batch)
    for k in batch:
        assert (stream[k].n_chunks, stream[k].n_novel, stream[k].novelty_ratio) == (
            batch[k].n_chunks, batch[k].n_novel, batch[k].novelty_ratio
        )


def test_range_join_boundaries_and_bucket_straddle(spark):
    from wallaroo_spark.operators import relational

    pts = spark.createDataFrame(
        [(1, 0.0), (2, 4.999), (3, 5.0), (4, 19.999), (5, 20.0), (6, 31.5)],
        "pid long, v double",
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 5.0), ("b", 5.0, 20.0), ("c", 19.0, 32.0)],  # c overlaps b
        "band string, lo double, hi double",
    )
    out = relational.range_join(pts, ivs, "v", "lo", "hi", bucket=7.0)
    got = sorted((r.pid, r.band) for r in out.collect())
    # start inclusive, end exclusive; overlapping intervals both match
    assert got == [
        (1, "a"), (2, "a"), (3, "b"), (4, "b"), (4, "c"), (5, "c"), (6, "c"),
    ]


def test_range_join_plan_is_equi_join(spark):
    from wallaroo_spark.operators import relational
    from wallaroo_spark.plans import audit

    pts = spark.range(100).select(F.col("id").cast("double").alias("v"))
    ivs = spark.createDataFrame(
        [(i, float(i * 10), float(i * 10 + 10)) for i in range(10)],
        "band long, lo double, hi double",
    )
    a = audit(relational.range_join(pts, ivs, "v", "lo", "hi", bucket=8.0))
    assert a.nested_loop_joins == 0
    assert a.python_ops == 0


def test_bpe_train_matches_sequential_reference(spark):
    """bpe_train == the classic sequential BPE loop on a tiny corpus where
    merged symbols must win later rounds ('l'+'o' -> 'lo', then 'lo'+'w')."""
    df = _docs(spark, [(1, "low low low low lower lower newest newest")])
    out = [(r.step, r.left, r.right, r.pair_count) for r in
           text.bpe_train(df, iters=3).collect()]

    def seq_bpe(words, iters):
        import collections
        seqs = {w: list(w) for w in words}
        cnt = collections.Counter(words)
        merges = []
        for step in range(iters):
            pc = collections.Counter()
            for w, c in cnt.items():
                s = seqs[w]
                for a, b in zip(s, s[1:]):
                    pc[(a, b)] += c
            (x, y), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((step, x, y, c))
            for w in seqs:
                s, ns, i = seqs[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == (x, y):
                        ns.append(x + y); i += 2
                    else:
                        ns.append(s[i]); i += 1
                seqs[w] = ns
        return merges

    want = seq_bpe("low low low low lower lower newest newest".split(), 3)
    assert out == want


def test_bpe_encode_compresses_and_respects_word_boundaries(spark):
    df = _docs(spark, [(1, "low low lower"), (2, "w o")])
    merges = [("l", "o"), ("lo", "w")]
    out = {r.doc_id: r for r in text.bpe_encode(df, merges).collect()}
    # 'low' -> ['low'] (two merges chain), 'lower' -> ['low','e','r']
    assert out[1].n_ws_tokens == 3 and out[1].n_bpe_tokens == 1 + 1 + 3
    # 'w o' must NOT merge across the word boundary into 'wo' (nor 'lo')
    assert out[2].n_ws_tokens == 2 and out[2].n_bpe_tokens == 2


def test_round6_query_plans_stay_scale_shaped(spark):
    """Plan facts for the round-6 headline queries: no nested-loop joins
    anywhere, no Python in any hot path, and the broadcast structures
    (Bloom row, centroids, candidate sets, term stats) actually broadcast."""
    from wallaroo_spark.plans import audit
    from wallaroo_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in (
        "semdedup_embeddings",
        "similarity_topk_int8_rerank",
        "snapshot_novelty",
        "bm25_retrieval_topk",
        "chunk_dedup_stats",
        "bigram_surprisal_quality",
    ):
        a = audit(QUERIES[name](spark, sf))
        # tiny-side broadcast crossJoins (centroids / Bloom row / corpus
        # stats) legitimately plan as BroadcastNestedLoopJoin; the scale
        # hazard is a NON-broadcast cartesian — forbid exactly that
        assert "CartesianProduct" not in a.text, name
        for line in a.text.splitlines():
            if "NestedLoopJoin" in line:
                assert "Broadcast" in line, (name, line)
        assert a.python_ops == 0, name
        assert a.partitionless_windows == 0, name
    # snapshot_novelty's new side must be shuffle-free APART from the
    # scan-width floor: the bitmap arrives via a broadcast cross (1 row),
    # and beyond the (tiny) Bloom-build side's exchanges the only other
    # shuffle allowed is fan_out's keyed repartition of the narrow
    # single-row-group scan (r16, operators/fanout.py — a structural no-op
    # on wide production inputs, so the production plan keeps <= 3)
    a = audit(QUERIES["snapshot_novelty"](spark, sf))
    assert "BroadcastNestedLoopJoin" in a.text
    from wallaroo_spark.operators.fanout import scan_width

    cores = spark.sparkContext.defaultParallelism
    w = scan_width(QUERIES["snapshot_novelty"].__globals__["_t"](spark, sf, "documents"))
    fanned = w is not None and w * 2 <= cores
    assert a.exchanges <= (5 if fanned else 3), (a.exchanges, fanned)


def test_streaming_chunk_dedup_across_batches(spark, tmp_path):
    """Chunk-level dedup composes with streaming: exploded chunk hashes
    through streaming dropDuplicates carry state ACROSS micro-batches — a
    chunk first seen in batch 1 is suppressed when batch 2 repeats it."""
    import os
    from wallaroo_spark.functions import hashing as H

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    block_a = " ".join(f"a{i}" for i in range(10))
    block_b = " ".join(f"b{i}" for i in range(10))

    out_dir = str(tmp_path / "out")

    def run_round():
        sdf = spark.readStream.schema("doc_id long, text string").parquet(src)
        chunks = sdf.select(
            F.explode(dedup.doc_chunks(F.col("text"), 10)).alias("_c")
        ).select(H.md5int_col(F.col("_c")).alias("_h"))
        q = (
            chunks.dropDuplicates(["_h"])
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _docs(spark, [(1, block_a)]).write.mode("append").parquet(src)
    run_round()
    # batch 2 repeats block_a (must dedup against batch-1 state) + new block_b
    _docs(spark, [(2, block_a + " " + block_b)]).write.mode("append").parquet(src)
    run_round()
    survivors = spark.read.parquet(out_dir).count()
    assert survivors == 2  # block_a once (from batch 1) + block_b once


def test_semdedup_probe_stream_batch_parity(spark, tmp_path):
    """Online semantic-dup probe: per-row centroid argmax + stream-static
    cluster join — identical results on a stream and in batch."""
    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=3, embedding=[0.9, 0.1, 0.0]),
        ]
    )
    cents = spark.createDataFrame(
        [Row(cent_id=0, embedding=[1.0, 0.0, 0.0]), Row(cent_id=1, embedding=[0.0, 1.0, 0.0])]
    )
    incoming = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[0.95, 0.05, 0.0]),  # dups of 1 and 3
            Row(vec_id=11, embedding=[0.0, 0.0, 1.0]),    # no dup anywhere
        ]
    )
    batch = sorted(
        (r.in_id, r.dup_of, r.cosine)
        for r in similarity.semdedup_probe(corpus, incoming, cents, tau=0.9).collect()
    )
    assert [(i, d) for i, d, _ in batch] == [(10, 1), (10, 3)]

    src = str(tmp_path / "src"); ck = str(tmp_path / "ck")
    incoming.write.parquet(src)
    sdf = spark.readStream.schema("vec_id long, embedding array<double>").parquet(src)
    out = similarity.semdedup_probe(corpus, sdf, cents, tau=0.9)
    q = (
        out.writeStream.format("memory").queryName("sem_probe")
        .option("checkpointLocation", ck).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream = sorted(
        (r.in_id, r.dup_of, r.cosine)
        for r in spark.sql("SELECT * FROM sem_probe").collect()
    )
    assert stream == batch


@pytest.mark.slow
def test_ann_index_build_persist_query_refresh(spark, tmp_path):
    """Persisted IVF index lifecycle: the probe over the LOADED index must
    equal the direct ivf_topk over the same centroids (assignment skipped,
    not changed); a refresh appends under frozen centroids atomically."""
    from examples.ann_index import (
        build_index, load_assignments, load_centroids, query_index, refresh_index,
    )
    from wallaroo_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    emb = read_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 10)

    t = build_index(spark, corpus, str(tmp_path / "idx"))
    got = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in query_index(spark, t, queries).collect()
    )
    direct = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_topk(
            corpus=corpus,
            queries=queries,
            centroids=load_centroids(spark, t).withColumnRenamed("cent_id", "vec_id"),
            k=3,
            nprobe=2,
        ).collect()
    )
    assert got == direct and len(got) == 30

    n0 = load_assignments(spark, t).count()
    v0 = t.versions()[-1]
    extra = spark.createDataFrame(
        [Row(vec_id=9000, embedding=[0.1] * 64)],
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    refresh_index(spark, t, extra)
    assert load_assignments(spark, t).count() == n0 + 1
    assert t.versions()[-1] == v0 + 1  # one atomic version per refresh
    assert load_centroids(spark, t).count() == 6  # centroids frozen

    # drift-gated refit: same-k refit on stable postings stays below the
    # gate (kmeans is deterministic, drift ~0) -> index untouched
    from examples.ann_index import drift_stats, refit_index

    assert refit_index(spark, t, k=6, iters=2, max_drift_frac=0.5) is None
    assert t.versions()[-1] == v0 + 1
    # forced refit (gate at -1 trips on any drift >= 0): atomic swap of
    # BOTH tables in one version; the probe still works on the new index
    v = refit_index(spark, t, k=5, iters=2, max_drift_frac=-1.0)
    assert v == v0 + 2
    assert load_centroids(spark, t).count() == 5
    assert load_assignments(spark, t).count() == n0 + 1  # postings preserved
    assert query_index(spark, t, queries).count() == 30
    # drift of the index against its OWN centroids is zero everywhere
    st = drift_stats(spark, t, load_centroids(spark, t))
    assert st.agg(F.sum("n_drifted")).first()[0] == 0
    # and the pre-refit pair is still travel-consistent
    assert t.read(spark, "centroids", version=v - 1).count() == 6
    assert t.read(spark, "assignments", version=v - 1).count() == n0 + 1


def test_model_rerank_swappable_kernel_and_candidate_scope(spark):
    """model_rerank only scores CANDIDATE texts (never the corpus), and a
    real model_fn drops in unchanged (here: length-as-score)."""
    from wallaroo_spark.operators import inference

    docs = _docs(spark, [(i, "w " * (i + 1)) for i in range(20)])
    cand = spark.createDataFrame(
        [(3, 1.0), (7, 0.9), (15, 0.8)], "doc_id long, retrieval_score double"
    )
    def length_model(texts):
        return [float(len(t)) for t in texts]

    out = inference.model_rerank(cand, docs, k=2, model_fn=length_model).collect()
    # longest candidate text wins; corpus docs outside the candidate set
    # were never scored
    assert [r.doc_id for r in out] == [15, 7]
    assert [r.rank for r in out] == [1, 2]


def test_token_budget_fill_overflow_domain_is_visible_not_dropped(spark):
    """A domain whose first bucket alone exceeds the budget must emit an
    explicit zero-kept marker (cutoff -1), not silently vanish; the filter
    form then drops its docs — visibly accounted for."""
    rows = [Row(doc_id=i, source="big", text=" ".join(["w"] * 500)) for i in range(50)]
    rows += [Row(doc_id=100 + i, source="small", text="w w w") for i in range(3)]
    df = spark.createDataFrame(rows)
    out = {r.source: r for r in text.token_budget_fill(df, budget=100).collect()}
    assert out["big"].cutoff_bucket == -1
    assert out["big"].n_docs_kept == 0 and out["big"].tokens_kept == 0
    assert out["small"].tokens_kept <= 100 and out["small"].n_docs_kept >= 1
    kept = text.token_budget_filter(df, budget=100).collect()
    assert all(r.source == "small" for r in kept)


def test_range_join_boundary_epsilon_and_inverted_intervals(spark):
    from wallaroo_spark.operators import relational

    pts = spark.createDataFrame(
        [(1, 10.0000000002), (2, 9.999999999)], "pid long, v double"
    )
    ivs = spark.createDataFrame(
        [("x", 9.0, 10.0000000005), ("bad", 1e9, 0.0), ("empty", 5.0, 5.0)],
        "band string, lo double, hi double",
    )
    out = relational.range_join(pts, ivs, "v", "lo", "hi", bucket=5.0)
    got = sorted((r.pid, r.band) for r in out.collect())
    # a point within 1e-9 of the interval end must still match; inverted
    # and empty intervals are dropped without exploding bucket sequences
    assert got == [(1, "x"), (2, "x")]


def test_bpe_train_self_pair_run_semantics_pinned(spark):
    """Self-pair runs merge every OTHER occurrence per pass (delimiter-
    consumed single-pass replace) — the documented divergence from classic
    BPE. 'aaaa aaaa': (a,a) counts 6 (= Sennrich get_stats); merge 1
    leaves 'aa a a' per word (classic BPE: 'aa aa'); round 2 still sees
    (a,a) with count 2 and, winning the lexicographic tiebreak over
    (aa,a), completes the run to 'aa aa' — convergent, one round later."""
    df = _docs(spark, [(1, "aaaa aaaa")])
    out = [(r.step, r.left, r.right, r.pair_count) for r in
           text.bpe_train(df, iters=3).collect()]
    assert out[0] == (0, "a", "a", 6)
    assert out[1] == (1, "a", "a", 2)
    assert out[2][:3] == (2, "aa", "aa")  # runs fully merged by round 3


def test_prefix_scan_input_guards(spark):
    """token_budget_admit rejects negative budgets and pack_sequences
    rejects non-positive context lengths with clear errors (not silent
    empty/garbage layouts)."""
    import pytest as _pytest

    from wallaroo_spark.operators.text import pack_sequences, token_budget_admit
    from wallaroo_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    with _pytest.raises(ValueError, match="budget"):
        token_budget_admit(docs, budget=-1)
    with _pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, seq_len=0)
    # budget=0 is legal and admits nothing (vacuous but well-defined)
    assert token_budget_admit(docs, budget=0).count() == 0


def test_ivf_exclude_label_with_persisted_assignments(spark):
    """ivf_topk's label-exclusion mode must work identically through the
    persisted-index path (corpus_assigned carries the label column) as
    through the build-side assignment — the production shape: index built
    once, hard negatives mined from it many times."""
    from wallaroo_spark.operators import similarity
    from wallaroo_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 10)
    cents = similarity.kmeans_fit(corpus, k=6, iters=2).withColumnRenamed(
        "cent_id", "vec_id"
    )
    live = similarity.ivf_topk(
        corpus=corpus, queries=queries, centroids=cents, k=5, nprobe=2,
        exclude_label="label",
    )
    # persisted assignments: the shared nearest-centroid rule, stored with
    # the ORIGINAL embedding + label columns (the ann_index build shape)
    asg = similarity.assign_nearest(
        corpus, cents.withColumnRenamed("vec_id", "cent_id")
    ).select("vec_id", "cent_id")
    assignments = corpus.select("vec_id", "embedding", "label").join(asg, "vec_id")
    persisted = similarity.ivf_topk(
        corpus=None, queries=queries, centroids=cents, k=5, nprobe=2,
        exclude_label="label", corpus_assigned=assignments,
    )
    a = sorted(map(tuple, live.collect()))
    b = sorted(map(tuple, persisted.collect()))
    assert a == b and a


def test_c4_gopher_filter_battery_flags(spark):
    """Each rule fires on a crafted offender and the clean doc keeps."""
    from wallaroo_spark.operators.text import c4_gopher_filters

    docs = spark.createDataFrame(
        [
            (1, "this corpus line looks perfectly ordinary and keeps fine"),
            (2, "Lorem ipsum dolor sit amet something something"),
            (3, "function foo() { return 42; }"),
            (4, "PLEASE STOP SHOUTING AT EVERYONE HERE okay"),
            (5, "x " * 30),                        # mean word length 1 -> too short
            (6, "### ### ### one two three"),      # symbol ratio
            (7, "enable javascript and accept our cookie banner to continue"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_gopher_filters(docs).collect()}
    assert out[1].keep
    assert not out[2].flag_no_lorem and not out[2].keep
    assert not out[3].flag_no_brace and not out[3].keep
    assert not out[4].flag_caps and not out[4].keep
    assert not out[5].flag_word_len and not out[5].keep
    assert not out[6].flag_symbol and not out[6].keep
    assert not out[7].flag_no_boiler and not out[7].keep


def test_bpe_train_iters_ceiling_guard(spark):
    """One Spark job per merge step: vocab-scale iters must fail fast with
    the driver-local recipe, before any job launches."""
    import pytest

    from wallaroo_spark.operators import text as T

    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="driver-local"):
        T.bpe_train(df, iters=T.BPE_MAX_ITERS + 1)


def test_ivf_assignments_cell_partitioned_query_prunes_files(spark, tmp_path):
    """Round 12: the IVF assignments table is cent_id-bucketed at rest and
    query_index plans a file-pruned scan of only the probed centroids'
    postings — file-list-asserted (inputFiles == pruned subset), rows
    identical to the forced full scan, and the pruned probe still equals
    the direct ivf_topk."""
    import os

    from examples.ann_index import build_index, query_index
    from wallaroo_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    emb = read_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 3)
    nprobe = 2

    t = build_index(spark, corpus, str(tmp_path / "pidx"))
    all_files = t.table_files("assignments")
    assert all_files and all(f"{os.sep}_wsp_cent_id=" in f for f in all_files)
    all_cells = {
        int(f.split("_wsp_cent_id=")[1].split(os.sep)[0]) for f in all_files
    }
    assert len(all_cells) > nprobe

    probed = {
        int(r["cent_id"])
        for r in similarity.ivf_probed_cells(
            queries,
            t.read(spark, "centroids").withColumnRenamed("cent_id", "vec_id"),
            nprobe=nprobe,
        ).collect()
    }
    assert probed and probed < all_cells

    def scan_set(df):
        out = set()
        for f in df.inputFiles():
            if f.startswith("file:"):
                f = "/" + f[len("file:"):].lstrip("/")
            if f"{os.sep}assignments{os.sep}" in f:
                out.add(f)
        return out

    got = query_index(spark, t, queries, nprobe=nprobe)
    pruned = set(t.table_files("assignments", parts={"cent_id": probed}))
    assert scan_set(got) == pruned and pruned < set(all_files)

    full = query_index(spark, t, queries, nprobe=nprobe, prune=False)
    assert scan_set(full) == set(all_files)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))


def test_ivf_assignments_bucketed_budget_and_compaction(spark, tmp_path):
    """VERDICT r13 #4: the IVF assignments table adopts the pq_codes
    bounded-layout discipline. Build with partition_buckets=B stages at
    most B assignment files regardless of centroid count (file-count
    asserted); repeated refreshes with files_per_cell_budget trip
    partition-scoped auto-compaction back under budget; and the
    file-pruned probe stays row-identical to the full scan THROUGH the
    compaction trip."""
    import os

    from examples.ann_index import (
        build_index, load_assignments, query_index, refresh_index,
    )
    from wallaroo_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    emb = read_table(spark, sf, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 3)
    B = 4

    t = build_index(spark, corpus, str(tmp_path / "bidx"), partition_buckets=B)
    files0 = t.table_files("assignments")
    # bounded append: <= B files even though k=6 centroids exist, and the
    # path carries the bucketed-layout grammar
    assert 0 < len(files0) <= B
    assert all(f"{os.sep}_wspb_{B}_cent_id=" in f for f in files0)

    def per_dir_counts():
        # group by the partition SEGMENT (each append nests its files
        # under a fresh uuid dir, so the physical dirname differs even
        # for the same logical partition)
        from collections import Counter

        return Counter(
            f.rsplit(os.sep, 1)[0].split(os.sep)[-1]
            for f in t.table_files("assignments")
        )

    # two refreshes without a budget: hot buckets accumulate one file per
    # refresh (the erosion the budget exists to stop)
    for i in range(2):
        extra = spark.createDataFrame(
            [Row(vec_id=9000 + i, embedding=[0.1 * (i + 1)] * 64)]
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        refresh_index(spark, t, extra)
    assert max(per_dir_counts().values()) >= 2

    n_before = load_assignments(spark, t).count()
    want = sorted(
        map(tuple, query_index(spark, t, queries, nprobe=2).collect())
    )

    # a budgeted refresh trips partition-scoped compaction: every dir
    # folds back under budget, rows and probe results are unchanged
    extra = spark.createDataFrame(
        [Row(vec_id=9500, embedding=[0.7] * 64)]
    ).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    refresh_index(spark, t, extra, files_per_cell_budget=1)
    counts = per_dir_counts()
    assert counts and max(counts.values()) <= 1
    # compaction preserved the committed bucketed layout
    assert all(seg.startswith(f"_wspb_{B}_cent_id=") for seg in counts)
    assert load_assignments(spark, t).count() == n_before + 1

    got = sorted(map(tuple, query_index(spark, t, queries, nprobe=2).collect()))
    full = sorted(
        map(tuple, query_index(spark, t, queries, nprobe=2, prune=False).collect())
    )
    assert got == full == want


def test_index_partition_buckets_zero_rejected(spark, tmp_path):
    """Review r14: partition_buckets=0 must raise, not silently fall back
    to the unbounded per-cell layout (the falsy-value trap — the
    manifest's own >= 1 guard never sees a falsy spec)."""
    import pytest

    from examples.ann_index import _ivf_partition_spec, _pq_partition_spec

    for fn in (_ivf_partition_spec, _pq_partition_spec):
        assert fn(None) and fn(4)  # valid forms unchanged
        with pytest.raises(ValueError, match=">= 1"):
            fn(0)
        with pytest.raises(ValueError, match=">= 1"):
            fn(-3)
