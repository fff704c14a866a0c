"""Edge tests for the round-5 corpus-assembly operators: decontamination,
repetition signals, PII redaction, target-mixture resampling."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark.operators import dedup, text


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_kgrams_short_docs(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "a"), (4, "")])
    out = {
        r.doc_id: r.g
        for r in df.select("doc_id", text.kgrams(F.col("text"), 3).alias("g")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == [] and out[3] == [] and out[4] == []


def test_repetition_signals_flags_looped_text(spark):
    df = _docs(
        spark,
        [
            (1, "spam ham " * 30),  # one bigram dominates -> repetitive
            (2, " ".join(f"w{i}" for i in range(60))),  # all distinct -> clean
            (3, "x"),  # too short for any gram -> zeros, clean
        ],
    )
    out = {r.doc_id: r for r in text.repetition_signals(df).collect()}
    assert out[1].repetitive and out[1].top_bigram_frac > 0.4
    assert not out[2].repetitive and out[2].dup_trigram_frac == 0.0
    assert not out[3].repetitive
    assert out[3].top_bigram_frac == 0.0 and out[3].dup_trigram_frac == 0.0


def test_decontaminate_hits_exact_overlap_only(spark):
    corpus = _docs(
        spark,
        [
            (1, "one two three four five six"),  # shares the 5-gram
            (2, "totally different words here entirely now"),
            (3, "two three four five six seven"),  # shifted window still shares
        ],
    )
    test_set = _docs(spark, [(100, "one two three four five six")])
    hits = {
        r.doc_id: r.n_hit_shingles
        for r in dedup.decontaminate_hits(corpus, test_set, k=5).collect()
    }
    assert 1 in hits and 3 in hits and 2 not in hits


def test_decontaminate_empty_test_set(spark):
    corpus = _docs(spark, [(1, "a b c d e f")])
    empty = _docs(spark, [(9, "")]).filter(F.col("doc_id") < 0)
    assert dedup.decontaminate_hits(corpus, empty, k=5).count() == 0


def test_pii_redact_counts_and_scrubs(spark):
    df = _docs(spark, [(1, "customer key monkeys value"), (2, "nothing here")])
    out = {r.doc_id: r for r in text.pii_redact(df, r"\b(customer|key|value)\b").collect()}
    # 'monkeys' must NOT match despite containing 'key' (word boundary)
    assert out[1].n_redactions == 3
    assert out[2].n_redactions == 0


def test_target_mixture_sample_caps_and_determinism(spark):
    rows = [(i, f"d{i}", "big" if i < 80 else "rare") for i in range(100)]
    df = spark.createDataFrame([Row(doc_id=i, text=t, src=s) for i, t, s in rows])
    # rare stratum: weight pushes its keep-rate past 100% -> capped at 100
    out = text.target_mixture_sample(
        df, "src", {"big": 1.0, "rare": 9.0}, budget_frac=0.5, id_col="doc_id"
    )
    rates = {r.src: r._pct for r in out.select("src", "_pct").distinct().collect()}
    assert rates.get("rare") == 100  # 50*0.9/20 -> capped
    assert 0 < rates["big"] < 100
    # deterministic: same call returns identical ids
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in text.target_mixture_sample(
            df, "src", {"big": 1.0, "rare": 9.0}, budget_frac=0.5, id_col="doc_id"
        ).collect()
    )
    assert ids1 == ids2
    # unlisted strata drop out
    out2 = text.target_mixture_sample(df, "src", {"big": 1.0}, budget_frac=0.5)
    assert out2.filter(F.col("src") == "rare").count() == 0


def test_duplicate_spans_merges_and_excludes_self_repeats(spark):
    shared = " ".join(f"s{i}" for i in range(12))  # the duplicated 12-gram run
    corpus = _docs(
        spark,
        [
            (1, "a b c " + shared + " x y z"),
            (2, "p q " + shared + " r"),
            (3, "self " + " ".join(["rep"] * 30)),  # intra-doc repeats only
            (4, "no duplicates anywhere in this one at all"),
        ],
    )
    out = {r.doc_id: r for r in dedup.duplicate_spans(corpus, k=12).collect()}
    # docs 1 and 2 each carry exactly one merged span covering the shared run
    assert out[1].span_start == 3 and out[1].span_len == 12
    assert out[2].span_start == 2 and out[2].span_len == 12
    # doc 3's repeats never leave the doc -> not cross-document duplicates
    assert 3 not in out and 4 not in out


def test_duplicate_spans_adjacent_windows_merge(spark):
    # 14 shared tokens -> three overlapping 12-gram windows -> ONE span of 14
    shared = " ".join(f"t{i}" for i in range(14))
    corpus = _docs(spark, [(1, shared + " tail1"), (2, "head2 " + shared)])
    from wallaroo_spark.operators.dedup import duplicate_spans

    rows = duplicate_spans(corpus, k=12).collect()
    spans = {r.doc_id: (r.span_start, r.span_end, r.span_len) for r in rows}
    assert spans[1] == (0, 13, 14)
    assert spans[2] == (1, 14, 14)


def test_bloom_decontamination_superset_of_exact(spark):
    """Bloom membership can false-positive but never false-negative: every
    doc the exact overlap finds must appear in the bloom result with at
    least as many hits."""
    shared = " ".join(f"s{i}" for i in range(7))
    corpus = _docs(
        spark,
        [
            (1, "a b " + shared),
            (2, "unrelated words only here nothing shared at all"),
            (3, shared + " trailing bits"),
        ],
    )
    test_set = _docs(spark, [(100, shared + " more tail")])
    exact = {
        r.doc_id: r.n_hit_shingles
        for r in dedup.decontaminate_hits(corpus, test_set, k=5).collect()
    }
    bloom = {
        r.doc_id: r.n_bloom_hits
        for r in dedup.decontaminate_bloom(corpus, test_set, k=5).collect()
    }
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from wallaroo_spark.operators.similarity import embedding_covariance

    rng = [[float(((i * 7 + j * 3) % 11) - 5) / 3.0 for j in range(5)] for i in range(40)]
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in enumerate(rng)])
    got = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    want = np.cov(np.array(rng), rowvar=False, bias=True)  # population covariance
    for i in range(5):
        for j in range(5):
            assert abs(got[(i, j)] - round(float(want[i][j]), 4)) < 2e-4, (i, j)
    # symmetric by construction
    for (i, j), v in got.items():
        assert got[(j, i)] == v
    # static-dim fast path (row-index explode + stacked product columns)
    # is cell-for-cell identical to the generic outer-product path
    fast = {(r.i, r.j): r.cov for r in embedding_covariance(df, dim=5).collect()}
    assert fast == got


def test_jl_projection_preserves_relative_distance(spark):
    """JL sanity: identical vectors project identically; orthogonal-ish far
    vectors stay farther apart than near-duplicates (distance ordering, the
    JL lemma's practical content at this dimension)."""
    import math

    from wallaroo_spark.operators.similarity import jl_project

    base = [1.0 if i % 3 == 0 else -0.5 for i in range(64)]
    near = list(base)
    near[0] += 0.01
    far = [(-1.0) ** i * (1.0 + i / 64.0) for i in range(64)]
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=base), Row(vec_id=1, embedding=near),
         Row(vec_id=2, embedding=list(base)), Row(vec_id=3, embedding=far)]
    )
    ys = {r.vec_id: [r[f"y{j}"] for j in range(8)] for r in jl_project(df).collect()}
    assert ys[0] == ys[2]  # deterministic: same input -> same projection

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    assert d(ys[0], ys[1]) < d(ys[0], ys[3])


def test_decontaminate_filter_stream_batch_parity(spark, tmp_path):
    """decontaminate_filter is a pure per-row expression against a broadcast
    bitmap, so the SAME call works on a file stream in append mode and must
    keep exactly the docs the batch call keeps."""
    shared = " ".join(f"s{i}" for i in range(6))
    rows = [
        Row(doc_id=1, text="clean words nothing shared one two"),
        Row(doc_id=2, text="prefix " + shared + " suffix"),
        Row(doc_id=3, text="another clean doc entirely different tokens"),
        Row(doc_id=4, text=shared),
    ]
    corpus = spark.createDataFrame(rows)
    test_set = _docs(spark, [(100, shared + " etc")])

    batch_kept = sorted(
        r.doc_id for r in dedup.decontaminate_filter(corpus, test_set, k=5).collect()
    )
    assert batch_kept == [1, 3]

    src = str(tmp_path / "docs")
    corpus.write.parquet(src)
    sdf = spark.readStream.schema(corpus.schema).parquet(src)
    out = dedup.decontaminate_filter(sdf, test_set, k=5)
    q = (
        out.writeStream.format("memory")
        .queryName("decontam_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        stream_kept = sorted(
            r.doc_id for r in spark.sql("SELECT doc_id FROM decontam_stream").collect()
        )
    finally:
        q.stop()
    assert stream_kept == batch_kept


def test_interval_join_boundaries_and_buckets(spark):
    """interval_join: (ts, ts+window] semantics — simultaneous events
    excluded, exact window-end included, cross-bucket matches found, other
    keys never matched."""
    import datetime as dt

    from wallaroo_spark.operators import relational

    T0 = dt.datetime(2024, 1, 1)

    def ev(i, key, secs):
        return Row(event_id=i, user_id=key, ts=T0 + dt.timedelta(seconds=secs))

    left = spark.createDataFrame([ev(1, 7, 100.0)])
    right = spark.createDataFrame(
        [
            ev(10, 7, 100.0),   # simultaneous -> excluded (strict >)
            ev(11, 7, 100.5),   # same bucket -> in
            ev(12, 7, 159.9),   # next bucket -> in (cross-bucket)
            ev(13, 7, 160.0),   # exactly ts+60 -> in (inclusive end)
            ev(14, 7, 160.1),   # just past -> out
            ev(15, 8, 101.0),   # other key -> out
        ]
    )
    out = relational.interval_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts", window_s=60
    )
    got = sorted(r.r_event_id for r in out.collect())
    assert got == [11, 12, 13]
    # No internal helper columns leak into the result surface.
    assert not [c for c in out.columns if c.startswith("_")]

    # Non-divisor bucket_s: window 60s with 45s buckets means a window can
    # straddle ceil(60/45)+1 = 3 buckets. Floor coverage would explode only
    # 2 and silently drop a match landing in the last partial bucket:
    # anchor 88s is bucket 1, window (88, 148] ends in bucket 3.
    nd = relational.interval_join(
        spark.createDataFrame([ev(2, 7, 88.0)]),
        spark.createDataFrame([ev(20, 7, 144.0), ev(21, 7, 148.0), ev(22, 7, 149.0)]),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        window_s=60,
        bucket_s=45,
    )
    assert sorted(r.r_event_id for r in nd.collect()) == [20, 21]


def test_stream_stream_interval_join_parity(spark, tmp_path):
    """The streaming counterpart of relational.interval_join is Spark's
    native time-bounded stream-stream join (both sides watermarked, range
    condition bounds the buffered state). A drained two-stream run must
    produce exactly the batch operator's pairs."""
    import datetime as dt

    from wallaroo_spark.operators import relational

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, user_id=i % 3, ts=T0 + dt.timedelta(seconds=7 * i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    batch = sorted(
        (r.event_id, r.r_event_id)
        for r in relational.interval_join(
            df, df, key="user_id", left_ts="ts", right_ts="ts", window_s=60
        ).collect()
    )
    assert batch  # non-vacuous

    src = str(tmp_path / "ev")
    df.write.parquet(src)
    a = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("a_id"),
            F.col("user_id").alias("a_key"),
            F.col("ts").alias("a_ts"),
        )
    )
    b = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("b_id"),
            F.col("user_id").alias("b_key"),
            F.col("ts").alias("b_ts"),
        )
    )
    joined = a.join(
        b,
        F.expr(
            "a_key = b_key AND b_ts > a_ts AND b_ts <= a_ts + interval 60 seconds"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_interval")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        stream = sorted(
            (r.a_id, r.b_id)
            for r in spark.sql("SELECT a_id, b_id FROM ss_interval").collect()
        )
    finally:
        q.stop()
    assert stream == batch


def test_histogram_quantiles_approximates_exact(spark):
    """Histogram p50/p95 must land within one bin width of the exact
    quantiles, and clamp out-of-range values instead of dropping them."""
    import numpy as np

    from wallaroo_spark.operators import sketch

    vals = [float(v) for v in np.linspace(1, 400, 300)] + [999.0, -5.0]
    df = spark.createDataFrame([Row(g="a", value=v) for v in vals])
    out = {r.q: r.est for r in sketch.histogram_quantiles(
        df, "value", "g", quantiles=(0.5, 0.95), bins=128, lo=0.0, hi=512.0
    ).collect()}
    exact50 = float(np.quantile(np.array(vals), 0.5))
    exact95 = float(np.quantile(np.array(vals), 0.95))
    assert abs(out[0.5] - exact50) <= 4.0
    assert abs(out[0.95] - exact95) <= 4.0


def test_linear_count_saturation_matches_duckdb(spark):
    """A fully occupied bitmap (occupied == m) must give the same FINITE
    clamped estimate in both engines — Spark's log(0) is NULL while
    DuckDB's ln(0) is -inf, so without the m-1 clamp a saturated hot group
    hash-mismatches the oracle."""
    import math

    import duckdb

    from wallaroo_spark.operators import sketch as SK
    from wallaroo_spark.functions import hashing as H

    m = 16
    df = spark.createDataFrame([Row(item=f"u{i}", g="hot") for i in range(400)])
    row = SK.linear_count_distinct(df, "item", m=m).collect()[0]
    assert row.occupied == m
    expect = round(-m * math.log(1.0 / m), 2)
    assert row.est_distinct == expect

    grouped = SK.linear_count_distinct_by(df, "item", "g", m=m).collect()[0]
    assert grouped.est_distinct == expect

    con = duckdb.connect()
    (d_est,) = con.execute(
        f"""
        WITH cells AS (
            SELECT DISTINCT ({H.hmod_sql("item")} % {m}) AS cell
            FROM (SELECT 'u' || CAST(range AS VARCHAR) AS item FROM range(400))
        ), occ AS (SELECT count(*) AS occupied FROM cells)
        SELECT round(-{m}.0 * ln(({m}.0 - least(occupied, {m-1})) / {m}.0), 2)
        FROM occ
        """
    ).fetchone()
    assert d_est == row.est_distinct


def test_asof_forward_and_tolerance(spark):
    import datetime as dt

    from wallaroo_spark.operators import asof

    T0 = dt.datetime(2024, 1, 1)

    def r(i, key, secs, **kw):
        return Row(id=i, k=key, ts=T0 + dt.timedelta(seconds=secs), **kw)

    left = spark.createDataFrame(
        [r(1, "a", 100.0, x=0), r(2, "a", 300.0, x=0), r(3, "b", 100.0, x=0)]
    )
    right = spark.createDataFrame(
        [r(10, "a", 100.0, v=1.0), r(11, "a", 150.0, v=2.0), r(12, "b", 500.0, v=9.0)]
    )
    out = {
        row.id: row.v_n
        for row in asof.asof_join(
            left.drop("x"), right.drop("id"), on=["k"], left_ts="ts", right_ts="ts",
            right_values=["v"], suffix="_n", direction="forward", tolerance_s=60,
        ).collect()
    }
    assert out[1] == 1.0  # equal ts matches forward (inclusive)
    assert out[2] is None  # no later right row for key a
    assert out[3] is None  # right row exists but 400s away > tolerance

    # backward with tolerance: stale enrichment nulls out
    out_b = {
        row.id: row.v_n
        for row in asof.asof_join(
            left.drop("x"), right.drop("id"), on=["k"], left_ts="ts", right_ts="ts",
            right_values=["v"], suffix="_n", direction="backward", tolerance_s=60,
        ).collect()
    }
    assert out_b[1] == 1.0
    assert out_b[2] is None  # latest right (150s) is 150s stale > 60
    assert out_b[3] is None


def test_asof_tolerance_null_right_value_is_atomic(spark):
    """A right row with a NULL value column still IS the match: the carried
    (ts, value) pair is atomic, so a fresh NULL-valued row yields NULL (not
    a resurrected stale value), and the tolerance gap is measured against
    the matched row's own timestamp."""
    import datetime as dt

    from wallaroo_spark.operators import asof

    T0 = dt.datetime(2024, 1, 1)

    def r(i, key, secs, **kw):
        return Row(id=i, k=key, ts=T0 + dt.timedelta(seconds=secs), **kw)

    left = spark.createDataFrame([r(1, "a", 200.0), r(2, "a", 130.0)])
    right = spark.createDataFrame(
        [r(10, "a", 100.0, v=1.0), r(11, "a", 190.0, v=None)]
    ).select("k", "ts", F.col("v").cast("double").alias("v"))
    out = {
        row.id: row.v_n
        for row in asof.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_values=["v"], suffix="_n", direction="backward", tolerance_s=60,
        ).collect()
    }
    # left@200: latest right is the NULL-valued row @190 (fresh, gap 10s) —
    # the value is NULL; the stale 1.0 @100 must NOT leak through, and the
    # NULL row's freshness must not validate the older value.
    assert out[1] is None
    # left@130: latest right is 1.0 @100 (gap 30s <= 60) — still matched.
    assert out[2] == 1.0


def test_embedding_covariance_dim_mismatch_raises(spark):
    """The static-dim fast path must fail loudly on a dim that disagrees
    with the data (review finding: it silently truncated / null-padded)."""
    import pytest as _pytest

    from wallaroo_spark.operators.similarity import embedding_covariance

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0, 2.0]) for i in range(5)]
    )
    with _pytest.raises(Exception, match="width"):
        embedding_covariance(df, dim=4).collect()


def test_corpus_drift_identical_and_disjoint(spark):
    """Drift invariants: identical snapshots -> KL == 0 and TV == 0 (up to
    smoothing rounding); disjoint vocabularies -> large drift; KL is
    always finite (add-one smoothing)."""
    from wallaroo_spark.operators.text import corpus_drift

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(20)],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(i, "omega sigma kappa theta " * 3) for i in range(20)],
        "doc_id bigint, text string",
    )
    same = corpus_drift(a, a).collect()[0]
    assert float(same["kl_bits"]) == 0.0 and float(same["tv_distance"]) == 0.0
    far = corpus_drift(a, b).collect()[0]
    assert float(far["kl_bits"]) > 1.0
    # with a 4-word vocabulary most probability mass sits in the add-one
    # smoothing floor (1024 buckets), which caps TV well below 1; the
    # invariant is a clear separation from the identical-snapshot 0.0
    assert float(far["tv_distance"]) > 0.15
    assert far["n_tokens_old"] == 20 * 12 and far["n_tokens_new"] == 20 * 12


def test_corpus_drift_by_slices_are_independent(spark):
    """Per-slice drift: a slice that changed scores high while an
    unchanged slice scores ~0 in the SAME call; a one-side-only slice
    still yields a finite row."""
    from wallaroo_spark.operators.text import corpus_drift_by

    old = spark.createDataFrame(
        [(1, "alpha beta alpha beta", "a"), (2, "mu nu mu nu", "b")],
        "doc_id bigint, text string, grp string",
    )
    new = spark.createDataFrame(
        [(3, "alpha beta alpha beta", "a"), (4, "xx yy zz ww", "b"),
         (5, "fresh words only here", "c")],
        "doc_id bigint, text string, grp string",
    )
    got = {r["grp"]: r for r in corpus_drift_by(old, new, by="grp").collect()}
    assert set(got) == {"a", "b", "c"}
    assert float(got["a"]["kl_bits"]) == 0.0  # unchanged slice
    assert float(got["b"]["kl_bits"]) > float(got["a"]["kl_bits"])
    assert got["c"]["n_tokens_old"] == 0  # one-sided slice, finite KL
    assert float(got["c"]["kl_bits"]) >= 0.0


def test_readability_signals_hand_computed(spark):
    from wallaroo_spark.operators.text import readability_signals

    docs = spark.createDataFrame(
        [(1, "the cat sat. the dog ran! done?"), (2, "word")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in readability_signals(docs).collect()}
    r1 = got[1]
    # sentences: "the cat sat" / " the dog ran" / " done" -> 3
    assert (r1["n_words"], r1["n_sentences"]) == (7, 3)
    # vowel groups: e,a,a,e,o,a,o,e -> the(1) cat(1) sat(1) the(1) dog(1) ran(1) done(2) = 8
    assert r1["n_syllables"] == 8
    import math
    wps, spw = 7 / 3, 8 / 7
    assert abs(float(r1["flesch"]) - round(206.835 - 1.015 * wps - 84.6 * spw, 4)) < 1e-9
    r2 = got[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 1)


def test_rollup_avg_is_half_boundary_deterministic(spark):
    """r16 (VERDICT r15 #2): a rollup cell whose true mean sits EXACTLY on
    a .xx5 boundary (here 1/8 = 0.125) must round identically on Spark and
    any DuckDB build. The emitted average is exact-sum/count rounded
    through DECIMAL(38,12) — HALF_UP on the exact value — so 0.125 -> 0.13
    by construction, never 0.12 via a half-even or multiply-based libm
    path."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1,)] + [(0,)] * 7, "n int"
    )  # sum=1, count=8 -> mean exactly 0.125
    got = (
        df.agg(F.count("*").alias("n_docs"), F.sum("n").alias("_s"))
        .select(
            F.round(
                (F.col("_s").cast("double") / F.col("n_docs")).cast("decimal(38,12)"),
                2,
            )
            .cast("double")
            .alias("avg"),
        )
        .collect()[0][0]
    )
    assert got == 0.13

    import duckdb

    oracle = duckdb.sql(
        "SELECT CAST(round(CAST(CAST(sum(n) AS DOUBLE) / count(*) "
        "AS DECIMAL(38,12)), 2) AS DOUBLE) AS avg "
        "FROM (SELECT unnest([1,0,0,0,0,0,0,0]) AS n)"
    ).fetchone()[0]
    assert oracle == 0.13


def test_embedding_covariance_is_association_order_free(spark):
    """r16: the quantized-decimal covariance must not vary with partition
    layout — repartitioning the input (different double-sum association
    order under the raw-double path) yields bit-identical output."""
    from wallaroo_spark.operators.similarity import embedding_covariance

    rng = [
        [float(((i * 13 + j * 7) % 23) - 11) / 7.0 for j in range(6)]
        for i in range(64)
    ]
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in enumerate(rng)])
    a = {(r.i, r.j): r.cov for r in embedding_covariance(df, dim=6).collect()}
    b = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df.repartition(17), dim=6).collect()
    }
    assert a == b


def test_det_round_ratio_exact_half_boundaries(spark):
    """r17 (VERDICT r16 #1 generalization): integer ratios landing EXACTLY
    on a half boundary must round half-away-from-zero identically on Spark
    and every DuckDB build. det_round's DECIMAL cast of the raw double is
    build-sensitive precisely there (corpus_stats_rollup's 24806/80 =
    310.075 driver flip); det_round_ratio computes the round on exact
    integers, so no double ever crosses a decimal cast."""
    from pyspark.sql import functions as F

    from wallaroo_spark.functions import hashing as H

    cases = [  # (num, den, d, expected)
        (24806, 80, 2, 310.08),  # the r15/r16 driver flip cell
        (3, 40, 2, 0.08),  # 0.075 -> up
        (-3, 40, 2, -0.08),  # half AWAY from zero, not toward +inf
        (3, 8, 2, 0.38),  # dyadic boundary agrees too
        (7, 3, 4, 2.3333),  # ordinary value: plain half-up
        (-604875, 100000, 4, -6.0488),  # readability's flagged -6.04875
    ]
    rows = spark.createDataFrame(
        [(n, d) for n, d, _, _ in cases], "num long, den long"
    ).collect()
    for (num, den, dp, want), _ in zip(cases, rows):
        got = (
            spark.range(1)
            .select(
                H.det_round_ratio_col(F.lit(num).cast("long"), F.lit(den).cast("long"), dp).alias("v")
            )
            .collect()[0][0]
        )
        assert got == want, (num, den, dp, got, want)

        import duckdb

        o = duckdb.sql(
            f"SELECT {H.det_round_ratio_sql(str(num), str(den), dp)}"
        ).fetchone()[0]
        assert o == want, (num, den, dp, o, want)


def test_ngram_hashed_verify_matches_string_verify(spark):
    """r17: the verify join keys on xxhash64(sh) when the in-query guard
    proves the hash collision-free on this input; vocab_broadcast_max=None
    skips the guard action and keeps string keys. Both paths must return
    identical pairs (the hashed path is lossless by verification)."""
    from wallaroo_spark.operators.dedup import ngram_jaccard_pairs
    from wallaroo_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    hashed = sorted(map(tuple, ngram_jaccard_pairs(docs, threshold=0.5).collect()))
    stringy = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, threshold=0.5, vocab_broadcast_max=None
            ).collect(),
        )
    )
    assert hashed == stringy and hashed
