"""Fixed-size sketches for unbounded-cardinality aggregation.

At 100 TB an exact per-token groupBy is a vocabulary-sized shuffle; a
count-min sketch bounds state at depth x width cells regardless of
cardinality, with a one-sided (overestimate-only) error of at most
``e/width * total`` per query. Not in the reference (its state is opaque
user Python); this is the training-pipeline scale path for frequency
estimation, and the shape Structured Streaming needs for windowed heavy
hitters with bounded state.

Deterministic by construction: the d row-hashes come from the shared
md5-based permutation family (``functions/hashing.py``), so the DuckDB
oracle rebuilds the identical sketch cell-for-cell — an *approximate*
operator with an *exact* correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wallaroo_spark.functions import hashing as H

DEPTH = 4
WIDTH = 1024


def _cell_col(item: Column, row: int, width: int) -> Column:
    return H.perm_col(H.hmod_col(item), row) % F.lit(width)


def _cell_sql(expr: str, row: int, width: int) -> str:
    return f"({H.perm_sql(H.hmod_sql(expr), row)} % {width})"


def countmin_build(
    items: DataFrame, item_col: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """items (one row per occurrence) -> sketch cells (row, col, cnt).

    One explode to (row, col) per occurrence + one groupBy: the shuffle key
    space is depth*width cells, CONSTANT in data size — the whole point.
    """
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell_col(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    ).select(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame, queries: DataFrame, item_col: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Estimate each query item's count: min over its depth cells.

    The sketch is depth*width rows — broadcast it; estimation is then a
    map-side join however large the query set is.
    """
    probes = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell_col(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(item_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def countmin_build_windowed(
    items: DataFrame,
    item_col: str,
    ts_col: str,
    size: str = "1 hour",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Per-tumbling-window CMS: one sketch per window, still one shuffle
    whose key space is windows x depth x width — constant per window
    regardless of item cardinality (the windowed-heavy-hitter scale shape).
    Output: (window_start, window_end, row, col, cnt)."""
    cells = items.select(
        F.window(F.col(ts_col), size).alias("w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell_col(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("rc.row").alias("row"),
        F.col("rc.col").alias("col"),
    )
    return cells.groupBy("window_start", "window_end", "row", "col").agg(
        F.count("*").alias("cnt")
    )


class CountMinAggregation:
    """Windowed-CMS-as-user-Aggregation: plugs into the `Aggregation`
    facade (`api/aggregation.py`) so STREAMING tumbling/sliding windows get
    a bounded depth*width sketch per (key, window) with watermark-evicted
    state — the streaming complement of ``countmin_build_windowed`` (whose
    batch path is native column math and stays the fast path).

    Cells use the same md5 + linear-permutation family as ``_cell_col``, so
    a drained stream reproduces the batch sketch cell-for-cell (parity-
    tested). Hash constants are captured into the instance at construction:
    the pickled accumulator closure must not reference this package
    (executors cannot import wallaroo_spark).

    ``output`` emits the flat row-major cells as a CSV string (schema
    ``cells string``) — decode with ``split``/``cast`` downstream.
    """

    def __init__(self, item_field: str, depth: int = DEPTH, width: int = WIDTH):
        self.item_field = item_field
        self.depth = depth
        self.width = width
        self._m = H.MERSENNE31
        self._ab = [(H.PERM_A[r], H.PERM_B[r]) for r in range(depth)]

    def name(self) -> str:
        return f"countmin_{self.item_field}"

    def initial_accumulator(self):
        return {"cells": [0] * (self.depth * self.width)}

    def update(self, rec, acc) -> None:
        import hashlib

        h = int(hashlib.md5(str(rec[self.item_field]).encode()).hexdigest()[:15], 16) % self._m
        cells = acc["cells"]
        for r, (a, b) in enumerate(self._ab):
            cells[r * self.width + (a * h + b) % self._m % self.width] += 1

    def combine(self, a, b):
        return {"cells": [x + y for x, y in zip(a["cells"], b["cells"])]}

    def output(self, key, acc):
        return {"cells": ",".join(map(str, acc["cells"]))}


def linear_count_distinct(
    items: DataFrame, item_col: str, m: int = 4096
) -> DataFrame:
    """Linear-counting distinct estimate with a deterministic hash: map
    items to m bitmap cells (md5 family), count occupied cells V, estimate
    ``-m * ln((m - V) / m)``. One constant-size aggregation however large
    the item cardinality — the distinct-counting sketch companion to the
    CMS (HLL's engine-native variants hash differently per engine; this
    one is oracle-replayable bit-for-bit). Output: (occupied, est_distinct).

    A fully saturated bitmap (occupied == m) would take ln(0), where Spark
    yields NULL but DuckDB -inf; ``occupied`` is clamped to m-1 inside the
    estimate (capping it at m·ln(m), the sketch's resolution limit) so both
    engines agree at the boundary. The oracle SQL applies the same clamp.
    """
    cells = items.select((H.hmod_col(F.col(item_col)) % F.lit(m)).alias("_cell"))
    occ = cells.agg(F.countDistinct("_cell").alias("occupied"))
    return occ.select(
        "occupied",
        F.round(
            -float(m)
            * F.log(
                (F.lit(float(m)) - F.least(F.col("occupied"), F.lit(m - 1)))
                / F.lit(float(m))
            ),
            2,
        ).alias("est_distinct"),
    )


class MisraGriesAggregation:
    """Windowed top-k heavy hitters as a user Aggregation: at most
    ``capacity`` counters per (key, window), streaming-ready through the
    Aggregation facade with watermark-evicted state — the per-window
    complement of ``streaming.sketch.heavy_hitters_stream`` (which keeps
    one RUNNING summary per key).

    ``combine`` is the standard mergeable-summaries MG merge (Agarwal et
    al., PODS'12): add counters, then subtract the (capacity+1)-th largest
    count and drop non-positives. It preserves the MG guarantee
    (true - n/capacity <= est <= true, no false negatives above
    n/capacity) but is NOT bit-deterministic across different chunk/batch
    groupings — the guarantee is the contract, so this operator carries
    guarantee-asserting tests instead of a value-hash oracle.

    Self-contained (no package references in the pickled instance);
    ``output`` emits ``n_seen`` and the counters as ``item:est`` CSV
    sorted by (-est, item).
    """

    def __init__(self, item_field: str, capacity: int = 16):
        self.item_field = item_field
        self.capacity = capacity

    def name(self) -> str:
        return f"misra_gries_{self.item_field}"

    def initial_accumulator(self):
        return {"n": 0, "c": {}}

    def update(self, rec, acc) -> None:
        item = str(rec[self.item_field])
        c = acc["c"]
        if item in c:
            c[item] += 1
        elif len(c) < self.capacity:
            c[item] = 1
        else:
            for k in list(c):
                c[k] -= 1
                if c[k] == 0:
                    del c[k]
        acc["n"] += 1

    def combine(self, a, b):
        c = dict(a["c"])
        for k, v in b["c"].items():
            c[k] = c.get(k, 0) + v
        if len(c) > self.capacity:
            thresh = sorted(c.values(), reverse=True)[self.capacity]
            c = {k: v - thresh for k, v in c.items() if v - thresh > 0}
        return {"n": a["n"] + b["n"], "c": c}

    def output(self, key, acc):
        top = sorted(acc["c"].items(), key=lambda t: (-t[1], t[0]))
        return {
            "n_seen": acc["n"],
            "items": ",".join(f"{k}:{v}" for k, v in top),
        }


def countmin_sql_cells(item_expr: str, source_sql: str, depth: int = DEPTH, width: int = WIDTH) -> str:
    """DuckDB CTE body rebuilding the identical sketch (UNION ALL per row)."""
    selects = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cell_sql(item_expr, r, width)} AS col FROM {source_sql}"
        for r in range(depth)
    )
    return f"SELECT row, col, count(*) AS cnt FROM ({selects}) GROUP BY row, col"


def linear_count_distinct_by(
    items: DataFrame, item_col: str, by: str, m: int = 4096
) -> DataFrame:
    """Group-wise linear counting: one m-cell bitmap PER group value, in a
    single pass — (group, cell) dedup partial-aggs map-side, then a per-
    group occupied count. State per group is bounded by m whatever the
    item cardinality, so a skewed group costs the same as a small one —
    the group-wise form of `linear_count_distinct`, same oracle-replayable
    md5 cell function, same saturation clamp (a hot group that fills its
    bitmap caps at m·ln(m) instead of diverging between engines).
    Output: (by, occupied, est_distinct)."""
    cells = items.select(
        F.col(by), (H.hmod_col(F.col(item_col)) % F.lit(m)).alias("_cell")
    )
    occ = cells.groupBy(by).agg(F.countDistinct("_cell").alias("occupied"))
    return occ.select(
        by,
        "occupied",
        F.round(
            -float(m)
            * F.log(
                (F.lit(float(m)) - F.least(F.col("occupied"), F.lit(m - 1)))
                / F.lit(float(m))
            ),
            2,
        ).alias("est_distinct"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    by: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    bins: int = 128,
    lo: float = 0.0,
    hi: float = 512.0,
) -> DataFrame:
    """Approximate per-group quantiles from a FIXED-width histogram: values
    clamp into ``bins`` equal buckets over [lo, hi), per-(group, bin)
    counts partial-agg map-side (state bounded by bins per group however
    many rows flow in), and each quantile reads off the first bin whose
    cumulative count reaches q * total, estimated at the bin midpoint.
    Error is bounded by the bin width — the quantile member of the
    bounded-state sketch family (CMS = frequency, linear counting =
    distinct), fully deterministic so the oracle replays it bin-for-bin.
    Output: (by, q, est) per requested quantile."""
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / width).cast("int")),
    )
    counts = df.select(F.col(by), b.alias("_bin")).groupBy(by, "_bin").agg(
        F.count("*").alias("_cnt")
    )
    from pyspark.sql.window import Window as W

    wcum = W.partitionBy(by).orderBy("_bin").rowsBetween(W.unboundedPreceding, 0)
    wtot = W.partitionBy(by)
    cum = counts.withColumn("_cum", F.sum("_cnt").over(wcum)).withColumn(
        "_tot", F.sum("_cnt").over(wtot)
    )
    est = F.round(lo + (F.col("_bin") + 0.5) * width, 4)
    out = None
    for q in quantiles:
        part = cum.groupBy(by).agg(
            F.lit(q).alias("q"),
            F.min(F.when(F.col("_cum") >= q * F.col("_tot"), est)).alias("est"),
        )
        out = part if out is None else out.unionByName(part)
    return out


class HistogramAggregation:
    """Windowed fixed-width histogram as a user Aggregation: ``bins``
    counters per (key, window) with watermark-evicted state — the
    streaming path for `histogram_quantiles`' bounded-state quantile
    sketch (same clamped-bin function, so a drained stream reproduces the
    batch histogram bin-for-bin). ``combine`` is element-wise addition
    (trivially mergeable). Parameters are captured into the instance at
    construction: the pickled closure must not reference this package
    (executors cannot import wallaroo_spark).

    ``output`` emits the bins as a CSV string (schema ``cells string``).
    """

    def __init__(self, value_field: str, bins: int = 128, lo: float = 0.0, hi: float = 512.0):
        self.value_field = value_field
        self.bins = bins
        self.lo = lo
        self.width = (hi - lo) / bins

    def name(self) -> str:
        return f"histogram_{self.value_field}"

    def initial_accumulator(self):
        return {"cells": [0] * self.bins}

    def update(self, rec, acc) -> None:
        b = int((float(rec[self.value_field]) - self.lo) / self.width)
        acc["cells"][min(self.bins - 1, max(0, b))] += 1

    def combine(self, a, b):
        return {"cells": [x + y for x, y in zip(a["cells"], b["cells"])]}

    def output(self, key, acc):
        return {"cells": ",".join(map(str, acc["cells"]))}


# ---------------------------------------------------------------------------
# HyperLogLog (round 8): md5-based, engine-portable — the mergeable
# distinct sketch whose native variants (Spark approx_count_distinct,
# DuckDB approx_count_distinct) hash differently per engine and therefore
# cannot share an oracle. This one replays bit-for-bit.
# ---------------------------------------------------------------------------

HLL_P = 10  # 2^10 = 1024 registers; std error ~ 1.04/sqrt(m) ~ 3.2%


def _hll_rho(w: Column, width: int) -> Column:
    """Leading-zero rank of ``w`` within a ``width``-bit window, + 1 —
    computed with EXACT integer/string math (length of the binary string:
    both engines render bin() without leading zeros), never float log2."""
    return F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )


def hll_registers(
    items: DataFrame, item_col: str, p: int = HLL_P, by: list[str] | None = None
) -> DataFrame:
    """(by..., reg, max_rho): the HLL register table — ONE constant-keyspace
    aggregation (m = 2^p registers per group) however large the input, with
    map-side partial max. Registers are max-mergeable by construction:
    union two register tables and groupBy-max to merge sketches (the same
    property the CMS/MG family exposes)."""
    width = 60 - p
    h = H.md5int_col(F.col(item_col).cast("string"))
    reg = F.shiftright(h, width).alias("reg")
    rho = _hll_rho(h.bitwiseAND(F.lit((1 << width) - 1)), width)
    keys = list(by or [])
    return (
        items.select(*keys, reg, rho.alias("_rho"))
        .groupBy(*keys, "reg")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_estimate(
    regs: DataFrame, p: int = HLL_P, by: list[str] | None = None
) -> DataFrame:
    """Registers -> cardinality estimate (the HLL formula with the
    small-range linear-counting correction; the large-range correction is
    moot in a 60-bit hash space). The harmonic sum folds over registers in
    REG ORDER (sorted collect + sequential aggregate — the list_reduce
    discipline that keeps float sums bit-identical to the oracle); absent
    registers contribute 2^0 = 1 each and count as zeros."""
    m = 1 << p
    keys = list(by or [])
    packed = regs.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("reg", "max_rho"))),
            lambda s: s["max_rho"],
        ).alias("_ms")
    )
    n_absent = (F.lit(m) - F.size("_ms")).cast("double")
    s = (
        F.aggregate(
            F.col("_ms"), F.lit(0.0), lambda acc, mj: acc + F.pow(F.lit(2.0), -mj)
        )
        + n_absent
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / s
    est = F.when(
        (raw <= 2.5 * m) & (n_absent > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_absent),
    ).otherwise(raw)
    return packed.select(
        *keys,
        F.size("_ms").alias("registers_used"),
        F.round(est, 2).alias("est_distinct"),
    )


def hll_sql(item_expr: str, source_sql: str, p: int = HLL_P, by: str = "") -> str:
    """DuckDB replay of hll_registers + hll_estimate (same reg-ordered
    fold, same branch, same rounding). ``by`` = optional 'col,' prefix for
    grouped sketches."""
    m = 1 << p
    width = 60 - p
    h = H.md5int_sql(f"CAST({item_expr} AS VARCHAR)")
    sel = f"{by} reg" if by else "reg"
    grp = by.rstrip(", ")
    gby = f"{grp}, reg" if grp else "reg"
    pk = f"{grp}," if grp else ""
    pgrp = f"GROUP BY {grp}" if grp else ""
    return f"""
    hraw AS (SELECT {pk} ({h} >> {width}) AS reg,
                    CASE WHEN ({h} & {(1 << width) - 1}) = 0 THEN {width + 1}
                         ELSE {width + 1} - length(bin({h} & {(1 << width) - 1}))
                    END AS rho
             FROM ({source_sql})),
    hreg AS (SELECT {sel}, max(rho) AS max_rho FROM hraw GROUP BY {gby}),
    hpack AS (SELECT {pk} list(max_rho ORDER BY reg) AS ms FROM hreg {pgrp}),
    hest AS (SELECT {pk} len(ms) AS registers_used,
                    list_reduce(list_prepend(0.0, [power(2.0, -mj) for mj in ms]),
                                (acc, x) -> acc + x)
                      + ({m} - len(ms))::DOUBLE AS s,
                    ({m} - len(ms))::DOUBLE AS zeros
             FROM hpack),
    hfin AS (SELECT {pk} registers_used,
                    (0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)} / s AS raw,
                    zeros
             FROM hest)
    SELECT {pk} registers_used,
           round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                      THEN {float(m)} * ln({float(m)} / zeros)
                      ELSE raw END, 2) AS est_distinct
    FROM hfin"""


class HLLAggregation:
    """Windowed-HLL-as-user-Aggregation: per (key, window) distinct-count
    registers through the `Aggregation` facade's watermark-evicted state —
    the streaming complement of ``hll_registers``/``hll_estimate``.
    ``combine`` is register-wise max (order-insensitive), so a drained
    stream reproduces the batch sketch EXACTLY register-for-register
    (parity-tested), the same contract as CountMinAggregation. State is
    2^p small ints per (key, window) — bounded by construction.

    Uses the identical md5 bit-split as the batch operator; constants are
    captured into the instance so the pickled closures never reference
    this package (executors cannot import wallaroo_spark). ``output``
    emits "reg:rho" CSV sorted by register plus the register count.
    """

    def __init__(self, item_field: str, p: int = HLL_P):
        self.item_field = item_field
        self.p = p
        self._width = 60 - p

    def name(self) -> str:
        return f"hll_{self.item_field}"

    def initial_accumulator(self):
        return {"regs": {}}

    def update(self, rec, acc) -> None:
        import hashlib

        h = int(
            hashlib.md5(str(rec[self.item_field]).encode()).hexdigest()[:15], 16
        )
        reg = h >> self._width
        w = h & ((1 << self._width) - 1)
        rho = self._width + 1 if w == 0 else self._width + 1 - w.bit_length()
        k = str(reg)
        if rho > acc["regs"].get(k, 0):
            acc["regs"][k] = rho

    def combine(self, a, b):
        out = dict(a["regs"])
        for k, v in b["regs"].items():
            if v > out.get(k, 0):
                out[k] = v
        return {"regs": out}

    def output(self, key, acc):
        items = sorted(((int(k), v) for k, v in acc["regs"].items()))
        return {
            "registers_used": len(items),
            "regs": ",".join(f"{r}:{v}" for r, v in items),
        }


def linear_count_overlap(
    items: DataFrame, item_col: str, cohort_col: str, m: int = 4096
) -> DataFrame:
    """Sketch SET ALGEBRA over linear-counting bitmaps (r16): distinct,
    union, intersection, and Jaccard estimates for every cohort PAIR —
    the audience-overlap question ("how many users click AND purchase")
    answered without ever joining raw identities.

    This is the property that makes sketches a data structure rather
    than just an estimator (the DataSketches set-operation model): the
    raw data is scanned ONCE into k cohort bitmaps of m cells (bounded
    (cohort, cell) state, dedup partial-aggs map-side exactly like
    `linear_count_distinct_by`), and all pair algebra runs on the
    sketches alone —

        occ(A ∪ B)  = occ_A + occ_B − |cells_A ∩ cells_B|
        est(A ∩ B)  = est_A + est_B − est(A ∪ B)   (clamped at 0)

    so p cohorts cost one corpus pass plus O(p² · m) sketch work, versus
    the exact path's p² shuffles of raw identity pairs. At 100 TB the
    cells table is k·m rows however many events flow in; the pair join
    is on the m-bounded cell space, broadcastable by construction.

    Estimates round through decimal (`det_round_col`) — cross-engine
    deterministic up to the ln() ulp (Java Math.log vs libm agree only
    within 1 ulp; at est magnitudes ~1e3 that is ~1e-13, well inside the
    1e-12 decimal quantum, the same accepted posture as every other
    linear-count emission since r5). Occupancies are exact integers. The
    same saturation clamp as the other linear counters. Output per
    unordered pair (a < b) INCLUDING pairs whose bitmaps share zero
    cells (disjoint audiences): occupancies, the three distinct
    estimates, the intersection estimate, and est_jaccard.
    """
    from wallaroo_spark.functions.hashing import det_round_col

    cells = (
        items.select(
            F.col(cohort_col).alias("_co"),
            (H.hmod_col(F.col(item_col)) % F.lit(m)).alias("_cell"),
        )
        .distinct()
        # the sketch IS the bounded artifact (k cohorts x m cells): pin it
        # so the occupancy pass and both pair-join sides read the k*m-row
        # sketch, not three more corpus scans (model-artifact discipline)
        .localCheckpoint(eager=True)
    )
    occ = cells.groupBy("_co").agg(F.count("*").alias("_occ"))

    def est(occ_col: F.Column) -> F.Column:
        return -float(m) * F.log(
            (F.lit(float(m)) - F.least(occ_col, F.lit(m - 1))) / F.lit(float(m))
        )

    a = cells.select(F.col("_co").alias("cohort_a"), "_cell")
    b = cells.select(F.col("_co").alias("cohort_b"), "_cell")
    inter_cells = (
        a.join(b, "_cell")
        .where(F.col("cohort_a") < F.col("cohort_b"))
        .groupBy("cohort_a", "cohort_b")
        .agg(F.count("*").alias("_inter_cells"))
    )
    occ_a = occ.select(F.col("_co").alias("cohort_a"), F.col("_occ").alias("occ_a"))
    occ_b = occ.select(F.col("_co").alias("cohort_b"), F.col("_occ").alias("occ_b"))
    # EVERY unordered pair, from the cohort list itself (r16 review): two
    # cohorts whose bitmaps share zero cells — genuinely disjoint
    # audiences, the case the overlap question most cares about — have no
    # inter_cells row; the pair frame is the occ x occ cross (k^2 rows,
    # trivially broadcastable) with the shared-cell count defaulting to 0
    paired = (
        occ_a.crossJoin(F.broadcast(occ_b))
        .where(F.col("cohort_a") < F.col("cohort_b"))
        .join(F.broadcast(inter_cells), ["cohort_a", "cohort_b"], "left")
        .withColumn("_inter_cells", F.coalesce(F.col("_inter_cells"), F.lit(0)))
        .withColumn("occ_union", F.col("occ_a") + F.col("occ_b") - F.col("_inter_cells"))
    )
    est_a, est_b = est(F.col("occ_a")), est(F.col("occ_b"))
    est_u = est(F.col("occ_union"))
    return paired.select(
        "cohort_a", "cohort_b", "occ_a", "occ_b", "occ_union",
        det_round_col(est_a, 2).alias("est_a"),
        det_round_col(est_b, 2).alias("est_b"),
        det_round_col(est_u, 2).alias("est_union"),
        det_round_col(
            F.greatest(est_a + est_b - est_u, F.lit(0.0)), 2
        ).alias("est_intersection"),
        det_round_col(
            F.greatest(est_a + est_b - est_u, F.lit(0.0))
            / F.greatest(est_u, F.lit(1.0)),
            4,
        ).alias("est_jaccard"),
    )


class LinearCountAggregation:
    """Windowed linear-counting bitmap as a user Aggregation (r16): per
    (key, window) the accumulator is the occupied-cell SET — ``combine``
    is set union (order-insensitive), so a drained stream reproduces the
    batch bitmap EXACTLY cell-for-cell (parity-tested), the same
    contract as HLLAggregation/CountMinAggregation. State per (key,
    window) is bounded by m whatever the stream volume.

    This is the streaming half of `linear_count_overlap`: keep one
    windowed sketch per cohort key on the stream, then run the pair set
    algebra (union/intersection/Jaccard) downstream on the EMITTED
    sketches — corpus-sized data never crosses the sketch boundary.
    Constants are captured so pickled closures never import this package
    (executors cannot). ``output`` emits the occupied count, the sorted
    cell CSV, and the linear-counting estimate rounded through decimal
    (det_round semantics, replicated in pure Python).
    """

    def __init__(self, item_field: str, m: int = 4096, mersenne: int = H.MERSENNE31):
        self.item_field = item_field
        self.m = m
        self.mersenne = mersenne

    def name(self) -> str:
        return f"lincount_{self.item_field}"

    def initial_accumulator(self):
        return {"cells": {}}

    def update(self, rec, acc) -> None:
        import hashlib

        h = int(
            hashlib.md5(str(rec[self.item_field]).encode()).hexdigest()[:15], 16
        )
        acc["cells"][str((h % self.mersenne) % self.m)] = 1

    def combine(self, a, b):
        out = dict(a["cells"])
        out.update(b["cells"])
        return {"cells": out}

    def output(self, key, acc):
        import math
        from decimal import ROUND_HALF_UP, Decimal

        occ = len(acc["cells"])
        est = -float(self.m) * math.log(
            (self.m - min(occ, self.m - 1)) / float(self.m)
        )
        d = Decimal(est).quantize(Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP)
        return {
            "occupied": occ,
            "cells": ",".join(str(c) for c in sorted(int(k) for k in acc["cells"])),
            "est_distinct": float(
                d.quantize(Decimal(1).scaleb(-2), rounding=ROUND_HALF_UP)
            ),
        }
