"""Salted join/agg equivalence + the remaining reference-example ports."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark.operators import skew


def _skewed(spark, n_hot=2000, n_rest=50):
    rows = [Row(k="hot", v=float(i)) for i in range(n_hot)] + [
        Row(k=f"k{i}", v=float(i)) for i in range(n_rest)
    ]
    return spark.createDataFrame(rows)


def test_salted_join_equivalent_to_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"k{i}", label=f"L{i}") for i in range(50)]
    )
    plain = fact.join(dim, "k").groupBy("k", "label").agg(F.sum("v").alias("s"))
    salted = (
        skew.salted_join(fact, dim, on="k", n=8, salt_src=["v"])
        .groupBy("k", "label")
        .agg(F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_equivalent_to_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("c"), F.max("v").alias("m")
    )
    salted = skew.salted_agg(
        df,
        keys=["k"],
        partial_aggs=[F.sum("v").alias("ps"), F.count("*").alias("pc"), F.max("v").alias("pm")],
        final_aggs=[
            F.sum("ps").alias("s"),
            F.sum("pc").alias("c"),
            F.max("pm").alias("m"),
        ],
        n=8,
        salt_src=["v"],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    fact = _skewed(spark)
    salted = skew.with_salt(fact, 8, ["v"])
    hot = salted.filter(F.col("k") == "hot").groupBy("_salt").count().collect()
    assert len(hot) == 8  # the hot key occupies all salt buckets


def test_interval_join_hot_key_power_law(spark):
    """Skew contract for interval_join/funnel: one user carrying 20% of all
    events must not degenerate — the (key, time-bucket) equi-join spreads a
    hot key across its time buckets (bucketing IS the salt), so the plan
    stays a hash join (never a nested loop) and completes in bounded time.
    Pair counts are verified against an independent two-pointer reference."""
    import bisect
    import datetime as dt
    import time

    from wallaroo_spark.operators import relational
    from wallaroo_spark.plans import audit

    T0 = dt.datetime(2024, 1, 1)
    rows = []
    # hot user: 10_000 events at 1s spacing = 20% of the corpus, spanning
    # ~167 one-minute buckets (the power-law head)
    for i in range(10_000):
        rows.append(Row(user_id="hot", ts=T0 + dt.timedelta(seconds=i), event_id=i))
    # long tail: 40_000 events over 2_000 users
    for i in range(40_000):
        rows.append(
            Row(
                user_id=f"u{i % 2000}",
                ts=T0 + dt.timedelta(seconds=(i * 7) % 10_000),
                event_id=100_000 + i,
            )
        )
    df = spark.createDataFrame(rows)

    t0 = time.perf_counter()
    joined = relational.interval_join(
        df, df, key="user_id", left_ts="ts", right_ts="ts", window_s=60
    )
    n_pairs = joined.count()
    elapsed = time.perf_counter() - t0
    assert audit(joined).nested_loop_joins == 0
    # degenerate per-key nested loop over the hot key would be 1e8 pair
    # tests; the bucketized join does ~60 per event. Generous bound for a
    # throttled shared host:
    assert elapsed < 120, f"hot-key interval join took {elapsed:.1f}s"

    # independent reference: per-key two-pointer count of (ts, ts+60] pairs
    by_key: dict[str, list[float]] = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r.ts.timestamp())
    expected = 0
    for ts_list in by_key.values():
        ts_list.sort()
        for t in ts_list:
            lo = bisect.bisect_right(ts_list, t)
            hi = bisect.bisect_right(ts_list, t + 60)
            expected += hi - lo
    assert n_pairs == expected


def test_example_alerts(spark, sf_dir):
    from examples.alerts import stateless, stateful_running, windowed
    from wallaroo_spark.sources import read_table

    n_over = stateless(spark, sf_dir).count()

    want = read_table(spark, sf_dir, "events").filter(F.col("value") > 300.0).count()
    assert n_over == want > 0
    w = windowed(spark, sf_dir)
    from wallaroo_spark.operators import windows as W

    want_w = (
        W.tumbling(
            read_table(spark, sf_dir, "events"), "ts", ["user_id"],
            [F.sum("value").alias("total")], "1 hour",
        )
        .filter(F.col("total") > 150.0)
        .count()
    )
    assert w.count() == want_w > 0
    assert stateful_running(spark, sf_dir).count() > 0


def test_example_alphabet_final_totals(spark, sf_dir):
    from examples.alphabet import build
    from wallaroo_spark.sources import read_table

    out = build(spark, sf_dir)
    finals = {
        r.letter: r.final
        for r in out.groupBy("letter").agg(F.max("total_votes").alias("final")).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    want = {
        r.letter: r["count"]
        for r in ev.select(F.substring("event_type", 1, 1).alias("letter"))
        .groupBy("letter")
        .count()
        .collect()
    }
    assert finals == want


def test_hll_accuracy_and_mergeability(spark):
    """HLL estimate within the sketch's error envelope (~3.2% std at
    p=10; assert 10%), and register tables are max-mergeable: sketching
    two halves and merging equals sketching the whole — the property that
    lets per-day/per-partition sketches combine without rescans."""
    from pyspark.sql import functions as F

    from wallaroo_spark.operators import sketch as SK

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("item"), F.col("id")).alias("x"))
    est = SK.hll_estimate(SK.hll_registers(df, "x")).first()
    assert abs(est.est_distinct - n) / n < 0.10, est.est_distinct

    a = df.filter(F.col("x") < "item3")   # lexicographic split, overlapping none
    b = df.filter(F.col("x") >= "item3")
    merged = (
        SK.hll_registers(a, "x")
        .unionByName(SK.hll_registers(b, "x"))
        .groupBy("reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = SK.hll_registers(df, "x")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    m_est = SK.hll_estimate(merged).first().est_distinct
    w_est = SK.hll_estimate(whole).first().est_distinct
    assert m_est == w_est


def test_skew_report_flags_hot_key(spark):
    """A corpus with one hot key must surface it at rank 1 with the right
    share and an imbalance ratio well above 1; a uniform corpus sits at
    imbalance ~1."""
    from pyspark.sql import functions as F

    from wallaroo_spark.operators.relational import skew_report

    hot = spark.range(1000).select(
        F.when(F.col("id") < 600, F.lit("whale")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k")
    )
    rep = skew_report(hot, "k", top_n=3).collect()
    assert rep[0].rank == 1 and rep[0].key == "whale" and rep[0].cnt == 600
    assert abs(rep[0].share - 0.6) < 1e-9
    assert rep[0].imbalance > 100  # 600 / ~2.5 mean

    uniform = spark.range(1000).select(F.concat(F.lit("k"), F.col("id") % 100).alias("k"))
    u = skew_report(uniform, "k", top_n=1).collect()
    assert abs(u[0].imbalance - 1.0) < 1e-9


def test_linear_count_overlap_sketch_algebra(spark):
    """r16: cohort-pair set algebra on linear-count bitmaps — estimates
    within sketch error of exact distinct/union/intersection on planted
    overlap, symmetric pair coverage, Jaccard consistent with the parts."""
    from pyspark.sql import functions as F

    from wallaroo_spark.operators.sketch import linear_count_overlap

    # cohorts: A = users 0..599, B = 300..899 (overlap 300), C disjoint
    rows = (
        [("A", str(u)) for u in range(600)]
        + [("B", str(u)) for u in range(300, 900)]
        + [("C", str(u)) for u in range(2000, 2100)]
    )
    df = spark.createDataFrame(rows, "co string, uid string")
    out = {
        (r.cohort_a, r.cohort_b): r
        for r in linear_count_overlap(df, "uid", "co").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    # m=4096 linear counting at n=600: std err ~ sqrt(m*(exp(n/m)-1-n/m))
    # ~ 2-3% — assert 10% bands
    assert abs(ab.est_a - 600) < 60 and abs(ab.est_b - 600) < 60
    assert abs(ab.est_union - 900) < 90
    assert abs(ab.est_intersection - 300) < 90
    assert abs(ab.est_jaccard - 300 / 900) < 0.12
    # disjoint cohorts: intersection estimate collapses toward 0
    ac = out[("A", "C")]
    assert ac.est_intersection < 60
    # occupancy identity holds exactly (it is integer algebra)
    assert ab.occ_union == ab.occ_a + ab.occ_b - (ab.occ_a + ab.occ_b - ab.occ_union)


def test_linear_count_overlap_emits_disjoint_pairs(spark):
    """r16 review: a cohort pair sharing ZERO bitmap cells must still get
    a row (est_intersection ~ 0) — absence would be indistinguishable
    from 'not computed'."""
    from wallaroo_spark.operators.sketch import linear_count_overlap

    # two singleton cohorts: shared cells essentially impossible
    df = spark.createDataFrame(
        [("X", "only-user-x"), ("Y", "only-user-y")], "co string, uid string"
    )
    rows = linear_count_overlap(df, "uid", "co").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.cohort_a, r.cohort_b) == ("X", "Y")
    assert r.occ_a == 1 and r.occ_b == 1 and r.occ_union == 2
    assert r.est_intersection == 0.0 and r.est_jaccard == 0.0
