"""Relational batch surface (SURVEY §2.6).

The reference has **no** built-in relational operators — its users compose
join/top-k/distinct from keyed state (`market_spread.py:58-103`). Our engine
exposes Spark's native relational algebra directly, which both subsumes those
compositions and is the batch correctness surface the driver checks.

Everything here is plain DataFrame API — zero custom code in the hot path —
so Catalyst gives predicate pushdown, column pruning, join reordering,
broadcast selection and AQE for free. The helpers encode the *scale
decisions*: which side broadcasts, where partial aggregation happens, when a
two-phase (local top-k → global) pattern avoids a full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact-to-dimension join with an explicit broadcast hint.

    At 100 TB the fact side never fits a hash map but dims (region/nation/
    part/supplier at typical ratios) do; broadcasting eliminates the shuffle
    of the fact table entirely. AQE would usually pick this, but being
    explicit keeps the plan stable under stats drift.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def colocated_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], n: int, how: str = "inner"
) -> DataFrame:
    """Fact-fact join with explicit co-partitioning.

    Both sides are hash-partitioned on the join key up front; the join then
    needs NO additional exchange (Catalyst sees children already
    partitioned). At 100 TB the durable version of this is bucketed tables
    (`df.write.bucketBy(n, key).sortBy(key).saveAsTable(...)`) — the write
    pays the shuffle once and every future join of the two tables skips it
    (see tests/test_plans.py::test_bucketed_tables_join_without_shuffle).
    """
    cols = [F.col(c) for c in on]
    return left.repartition(n, *cols).join(right.repartition(n, *cols), list(on), how)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k without a global sort: Spark's TakeOrderedAndProject
    computes per-partition top-k then merges k·p rows on the driver."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int, dense: bool = False
) -> DataFrame:
    """Top-k within each group via ranked window; one shuffle on keys.

    For heavily skewed groups at scale, pre-aggregate or pre-filter before
    the window (AQE skew-join doesn't split window partitions).
    """
    fn = F.dense_rank() if dense else F.row_number()
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("rk", fn.over(w)).filter(F.col("rk") <= k).drop("rk")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Keyed interval join: pairs where ``right_ts`` falls in
    ``(left_ts, left_ts + window_s]`` for the same key — the 'what happened
    in the N seconds after each anchor event' shape.

    A naive inequality join degenerates to a per-key nested loop. Here both
    sides get a coarse time bucket and the join is an EQUI-join on
    (key, bucket) with the range as a residual predicate: each left row
    explodes only the ``ceil(window_s/bucket_s) + 1`` buckets its window can
    touch, each right row lives in exactly one bucket (so no pair dedup),
    and the hash shuffle partitions by (key, bucket) — co-located,
    skew-splittable by AQE, no nested loop at any scale.
    """
    from wallaroo_spark.functions import epoch_seconds

    bucket_s = bucket_s or window_s
    # Ceiling coverage: a window of window_s seconds anchored anywhere can
    # straddle ceil(window_s/bucket_s)+1 buckets (the anchor's bucket plus a
    # partial tail bucket). Floor division under-explodes when bucket_s does
    # not divide window_s, silently dropping matches in the last partial span.
    n_spans = -(-window_s // bucket_s) + 1
    lep = epoch_seconds(left_ts)
    rep = epoch_seconds(right_ts)
    l = left.withColumn(
        "_bkt",
        F.explode(
            F.array(
                *[
                    (F.floor(lep / bucket_s) + i).cast("long")
                    for i in range(n_spans)
                ]
            )
        ),
    ).withColumn("_lep", lep)
    r = right.select(
        F.col(key).alias("_rkey"),
        F.floor(rep / bucket_s).cast("long").alias("_rbkt"),
        rep.alias("_rep"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    return (
        l.join(
            r,
            (F.col(key) == F.col("_rkey")) & (F.col("_bkt") == F.col("_rbkt")),
        )
        .filter((F.col("_rep") > F.col("_lep")) & (F.col("_rep") <= F.col("_lep") + window_s))
        .drop("_bkt", "_rkey", "_rbkt", "_lep", "_rep")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: float,
) -> DataFrame:
    """Point-in-interval range join: pairs where ``start <= point < end``.
    Completes the join family the reference lacks by design (SURVEY §2.6)
    next to as-of and keyed-interval joins.

    A naive inequality join is a nested loop over |points| x |intervals|.
    Bucketization turns it into an equi-join: every interval explodes to
    the coarse buckets it overlaps, every point lives in exactly ONE bucket
    (no pair dedup needed), and the residual range predicate runs on
    equi-matched rows only. The shuffle hash-partitions by bucket —
    co-located, AQE-skew-splittable, never quadratic. ``bucket`` trades
    explode factor (long intervals span more buckets) against candidate
    precision; when the interval side is dim-table-small, a plain
    broadcast inequality join is cheaper — this operator is the
    both-sides-large path.

    Interval columns are taken from the interval side as-is; point columns
    keep their names (collisions: caller renames).
    """
    p = points.withColumn("_pbkt", F.floor(F.col(point_col) / bucket).cast("long"))
    # end bucket = floor(end / bucket) exactly: every point < end satisfies
    # floor(p/b) <= floor(end/b), so no match is ever missed (an end sitting
    # exactly on a bucket boundary explodes one extra candidate bucket — the
    # residual filter discards it). An epsilon here would MISS points within
    # epsilon of end. Empty/inverted intervals (end <= start) are dropped
    # up front — otherwise a malformed row would explode a huge descending
    # sequence before the residual could reject it.
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket).cast("long"),
                F.floor(F.col(end_col) / bucket).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, p["_pbkt"] == iv["_bkt"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_pbkt", "_bkt")
    )


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10, round_dp: int = 4
) -> DataFrame:
    """Shuffle-skew diagnostic: the pre-flight check before keying a big
    join or aggregation on ``key_col`` at corpus scale — hot keys are what
    turn a clean hash shuffle into one straggler task. Emits the ``top_n``
    heaviest keys with their row share plus the corpus-wide imbalance
    ratio (max key count / mean key count): ratio ~1 means a uniform
    shuffle; ratios in the hundreds mean salt the key or pre-aggregate.

    One map-side-combined groupBy count (the same shuffle the real query
    would do, but carrying ONE row per key), a TakeOrdered top-n (no
    global sort), and a broadcast of the 2-value summary — nothing here
    is heavier than the shuffle being diagnosed.
    Output: (rank, key, cnt, share, imbalance).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    summary = counts.agg(
        F.sum("cnt").alias("_total"),
        (F.max("cnt") / F.avg("cnt")).alias("_imb"),
    )
    top = top_k(counts, [F.col("cnt").desc(), F.col("key")], top_n)
    # rank the <= top_n survivors via the one-row sorted-collect pattern —
    # a Window.orderBy here would be a partition-less WindowExec, which
    # the suite-wide plan assertion forbids (single-task global sort)
    ranked = (
        top.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("cnt")).alias("_neg"), F.col("key"), F.col("cnt")
                    )
                )
            ).alias("_a")
        )
        .select(F.posexplode("_a").alias("_i", "_s"))
        .select(
            (F.col("_i") + 1).alias("rank"),
            F.col("_s.key").alias("key"),
            F.col("_s.cnt").alias("cnt"),
        )
    )
    return ranked.crossJoin(F.broadcast(summary)).select(
        "rank",
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("_total"), round_dp).alias("share"),
        F.round("_imb", round_dp).alias("imbalance"),
    )
