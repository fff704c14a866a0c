"""Batched model inference over text columns — the integration point where
a learned quality classifier / cross-encoder / reward model plugs into the
pipeline (the text-side sibling of `multimodal.py`'s kernels).

The model kernel runs as Arrow-batched ``mapInPandas``: rows stream
through the executor in vectorizable batches, the model is loaded once per
task (not per row), and nothing but (id, score) leaves the stage — at
100 TB this is the only sane shape for model-in-the-loop data curation
(score with a cheap model, keep/drop, THEN spend GPU time on survivors).

No ML runtime ships in this container, so the default kernel is a
deterministic STUB (engine-portable md5 pseudo-score, so the whole stage
stays oracle-checkable); swap ``model_fn`` for a real ``texts ->
scores`` callable (e.g. a fasttext / ONNX session) and nothing else
changes — batching, schema, and partitioning are the real, tested
plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wallaroo_spark.functions.hashing import det_round_col


def _stub_scores(texts):
    """Deterministic pseudo-model: md5-derived uniform score in [0, 1).
    Matches functions/hashing.md5int semantics so DuckDB replays it."""
    import hashlib

    out = []
    for t in texts:
        h = int(hashlib.md5((t or "").encode()).hexdigest()[:15], 16)
        out.append((h % 10_000) / 10_000.0)
    return out


def score_documents(
    df: DataFrame,
    model_fn=None,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """text -> model score, Arrow-batched. Returns (id_col, model_score)."""
    fn = model_fn or _stub_scores

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {id_col: pdf[id_col], "model_score": fn(list(pdf[text]))}
            )

    return df.select(id_col, text).mapInPandas(
        run, schema=f"{id_col} long, model_score double"
    )


def model_rerank(
    candidates: DataFrame,
    docs: DataFrame,
    k: int,
    model_fn=None,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-stage retrieval: cheap ranker candidates -> model re-rank.

    ``candidates`` is a small (id, retrieval_score) table from a cheap
    stage (BM25/TF-IDF/ANN); only those rows fetch their text (broadcast
    semi-join — the corpus is never model-scored wholesale) and pass
    through the model kernel; final order = model_score desc, id asc.
    Output: (id_col, retrieval_score, model_score, rank).
    """
    # candidates is candidates-sized by contract: materialize once — it
    # feeds both the text fetch and the score join, and every reuse of a
    # lazy plan re-runs the entire cheap-ranker pipeline that produced it
    candidates = candidates.localCheckpoint(eager=True)
    cand_docs = docs.join(F.broadcast(candidates.select(id_col)), id_col)
    scored = score_documents(cand_docs, model_fn, text, id_col)
    top = (
        candidates.join(scored, id_col)
        # rank on the ROUNDED score (id tiebreak) so float ulp differences
        # can't flip the cut between engines — same rule as BM25
        .orderBy(det_round_col(F.col("model_score"), 4).desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "retrieval_score",
            det_round_col(F.col("model_score"), 4).alias("model_score"),
        )
        # k rows; three consumers below — without this the model kernel
        # and the whole candidate pipeline run once per consumer
        .localCheckpoint(eager=True)
    )
    # rank via count-of-strictly-ahead on the k-row table (broadcast self-
    # join) — a global row_number window would be the partition-less
    # WindowExec single-task path the suite-wide plan assertion forbids
    rhs = top.select(
        F.col(id_col).alias("_oid"), F.col("model_score").alias("_os")
    )
    ahead = (
        top.crossJoin(F.broadcast(rhs))
        .filter(
            (F.col("_os") > F.col("model_score"))
            | ((F.col("_os") == F.col("model_score")) & (F.col("_oid") < F.col(id_col)))
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("_ahead"))
    )
    return (
        top.join(ahead, id_col, "left")
        .select(
            id_col,
            "retrieval_score",
            "model_score",
            (F.coalesce("_ahead", F.lit(0)) + 1).cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Trained quality classifier: distributed logistic regression over hashed
# bag-of-words (the GPT-3/CCNet "learned quality filter" shape) — fully
# deterministic and oracle-replayable, the model-TRAINING counterpart of
# the stub inference kernels above.
# ---------------------------------------------------------------------------


def _feature_buckets(text_col, n_hash: int, char_ngrams: int | None):
    """Distinct-feature bucket array for one document: md5-hashed distinct
    word tokens (salt ':clf'), optionally UNIONed with distinct character
    n-grams (salt ':cg') — the fastText trick that lets the model
    generalize to unseen words through shared subword units. Pure Column
    math; the same builder feeds fit (explode) and score (in-row)."""
    from wallaroo_spark.functions import hashing as H
    from wallaroo_spark.operators.text import tokens

    def bucket(col, salt):
        return (H.md5int_col(F.concat(col, F.lit(salt))) % F.lit(n_hash)).cast("int")

    feats = F.transform(
        F.array_distinct(tokens(text_col)), lambda t: bucket(t, ":clf")
    )
    if char_ngrams:
        n = int(char_ngrams)
        idx = F.sequence(
            F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(0))
        )
        grams = F.array_distinct(
            F.transform(idx, lambda i: text_col.substr(i, F.lit(n)))
        )
        feats = F.concat(feats, F.transform(grams, lambda g: bucket(g, ":cg")))
    return feats


def linear_classifier_fit(
    df: DataFrame,
    label_col: str,
    text: str = "text",
    n_hash: int = 512,
    iters: int = 3,
    lr: float = 1.0,
    round_dp: int = 6,
    char_ngrams: int | None = None,
) -> DataFrame:
    """Distributed full-batch logistic regression on hashed bag-of-words
    features: binary PRESENCE features over distinct word tokens
    (the classic BoW-LR encoding, margin-friendly so full-batch GD
    separates quickly), optionally unioned with distinct character
    n-grams (``char_ngrams`` — the fastText subword trick; generalizes
    to words never seen in training, pinned by pytest),
    p = sigmoid(bias + sum w[bucket]); the gradient step is
    w -= lr * sum_d (p_d - y_d) * x_d / N.

    Scale shape (the kmeans_fit recipe applied to GD): per iteration the
    corpus is touched ONCE — the per-doc error is pure in-row math against
    the broadcast one-row weight array, and the gradient (bias included,
    via a pseudo-bucket) is one explode into a groupBy whose key space is
    n_hash buckets, CONSTANT in corpus size (map-side partial aggregation
    compresses within-partition repeats). The weight array rebuild is
    n_hash rows; N is one up-front count. No other driver-side math; each
    iteration's one-row model is eagerly materialized (localCheckpoint,
    kmeans-style) so the plan stays shallow.

    Weights round to ``round_dp`` per iteration so the fixpoint is
    engine-reproducible — the DuckDB oracle replays every iteration
    bit-for-bit (the kmeans/CMS "approximate model, exact gate" trick).

    Returns ONE row: (clf_w array<double>, clf_b double) — broadcastable,
    scoring via ``linear_classifier_score`` runs unchanged on a stream.
    """
    spark = df.sparkSession
    docs = df.select(
        F.col(label_col).cast("double").alias("_y"),
        _feature_buckets(F.col(text), n_hash, char_ngrams).alias("_fb"),
    ).filter(F.size("_fb") > 0)
    docs = docs.persist()

    model = spark.createDataFrame(
        [([0.0] * n_hash, 0.0)], "clf_w array<double>, clf_b double"
    )
    # r16 fused step: N is one up-front count (exact scalar, constant
    # across iterations — it was re-broadcast twice per step), the bias
    # gradient rides the SAME explode+shuffle as the bucket gradients
    # (pseudo-bucket -1 appended per doc, so sum(_err) falls out of the
    # one hash agg), and the weight/bias update is ONE aggregation over
    # the (-1..n_hash-1) domain — the corpus is touched once per
    # iteration instead of twice and the per-step broadcast subtrees
    # drop from 6 to 2 (both the same one-row model exchange).
    # `or 1.0` (r17 review): an empty filtered corpus made this lit(0.0)
    # and the non-ANSI divide-by-zero NULL-poisoned every weight; with
    # divisor 1.0 the zero gradients make the step the no-op the
    # _fused_gd_step docstring promises (the SGD path's sizes.get(m, 1.0)
    # guard, mirrored)
    n_lit = F.lit(float(docs.count()) or 1.0)
    domain = spark.range(-1, n_hash).select(F.col("id").cast("int").alias("_b"))
    for _ in range(iters):
        model = _fused_gd_step(docs, model, domain, n_lit, n_hash, lr, round_dp)
    docs.unpersist()
    return model


def _fused_gd_step(batch, model, domain, n_lit, n_hash, lr, round_dp):
    """One fused GD update: score against the broadcast one-row model,
    explode features + the bias pseudo-bucket (-1) into ONE gradient
    shuffle, left-join the (-1..n_hash-1) domain, and reassemble the
    next (clf_w, clf_b) row in a single aggregation. The multiset summed
    per bucket (and for the bias) is identical to the two-pass form, so
    the rounded fixpoint is unchanged; an empty batch is a no-op step
    (every gradient coalesces to 0). Returns the eagerly checkpointed
    one-row model."""
    score = F.col("clf_b") + F.aggregate(
        F.transform(
            F.col("_fb"),
            lambda b: F.element_at(F.col("clf_w"), b + 1),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    grad_all = (
        batch.crossJoin(F.broadcast(model))
        .withColumn(
            "_err", F.lit(1.0) / (F.lit(1.0) + F.exp(-score)) - F.col("_y")
        )
        .select(
            F.explode(F.concat(F.col("_fb"), F.array(F.lit(-1)))).alias("_b"),
            F.col("_err").alias("_g"),
        )
        .groupBy("_b")
        .agg(F.sum("_g").alias("_grad"))
    )
    upd = (
        domain.join(grad_all, "_b", "left")
        .crossJoin(F.broadcast(model))
        .select(
            "_b",
            det_round_col(
                F.when(F.col("_b") < 0, F.col("clf_b")).otherwise(
                    F.element_at(F.col("clf_w"), F.col("_b") + 1)
                )
                - F.lit(lr) * F.coalesce(F.col("_grad"), F.lit(0.0)) / n_lit,
                round_dp,
            ).alias("_w"),
        )
        .agg(F.array_sort(F.collect_list(F.struct("_b", "_w"))).alias("_a"))
        .select(
            F.transform(
                F.slice(F.col("_a"), 2, n_hash), lambda e: e["_w"]
            ).alias("clf_w"),
            F.element_at(F.col("_a"), 1).getField("_w").alias("clf_b"),
        )
    )
    return upd.localCheckpoint(eager=True)


def linear_classifier_score(
    probe: DataFrame,
    model_row: DataFrame,
    text: str = "text",
    n_hash: int = 512,
    round_dp: int = 4,
    char_ngrams: int | None = None,
) -> DataFrame:
    """Score documents under the trained one-row model — PURE IN-ROW array
    math against the broadcast weights (no explode/shuffle/state): the
    identical plan runs on a batch corpus or a stream, like the DSIR and
    perplexity gates. Features are distinct-token presence, matching the
    fit. Adds ``clf_prob`` (rounded) and ``clf_pred``; docs without
    tokens drop out."""
    feats = _feature_buckets(F.col(text), n_hash, char_ngrams)
    score = F.col("clf_b") + F.aggregate(
        F.transform(feats, lambda b: F.element_at(F.col("clf_w"), b + 1)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return (
        probe.filter(F.size(feats) > 0)
        .crossJoin(F.broadcast(model_row))
        .withColumn("clf_prob", det_round_col(prob, round_dp))
        .withColumn("clf_pred", (F.col("clf_prob") >= 0.5).cast("int"))
        .drop("clf_w", "clf_b")
    )


def linear_classifier_fit_sgd(
    df: DataFrame,
    label_col: str,
    text: str = "text",
    id_col: str = "doc_id",
    n_hash: int = 512,
    epochs: int = 1,
    n_batches: int = 4,
    lr: float = 1.0,
    round_dp: int = 6,
    char_ngrams: int | None = None,
) -> DataFrame:
    """Deterministic mini-batch SGD variant of ``linear_classifier_fit``.

    Full-batch GD scans the whole corpus once per weight update — at
    100 TB that is the pipeline's most expensive loop, and most of each
    scan is wasted once the gradient direction is clear. Mini-batch SGD
    gets ``n_batches`` updates per corpus pass: each step touches only the
    rows whose salted-hash batch id matches (md5(id ~ ':sgd') %
    n_batches — deterministic, so the DuckDB oracle replays every step
    bit-for-bit; no Date/random anywhere), computes the in-row error
    against the broadcast one-row model, and shuffles one gradient whose
    key space is n_hash buckets. Early stopping after k steps touches
    k/n_batches of the corpus — the scan cost scales with the steps you
    actually need, not with epochs x corpus.

    Same rounding/fixpoint contract as the full-batch fit (weights round
    to ``round_dp`` per step); same one-row (clf_w, clf_b) output, scored
    by the unchanged ``linear_classifier_score``. Batch sizes come from
    ONE up-front groupBy over the tiny batch-id keyspace, collected once
    (bounded model-artifact scalars) and folded into every step as exact
    literals.
    """
    from wallaroo_spark.functions import hashing as H

    spark = df.sparkSession
    mb = (
        H.md5int_col(F.concat(F.col(id_col).cast("string"), F.lit(":sgd")))
        % F.lit(n_batches)
    ).cast("int")
    docs = df.select(
        mb.alias("_mb"),
        F.col(label_col).cast("double").alias("_y"),
        _feature_buckets(F.col(text), n_hash, char_ngrams).alias("_fb"),
    ).filter(F.size("_fb") > 0)
    docs = docs.persist()

    batch_n = docs.groupBy("_mb").agg(F.count("*").cast("double").alias("_N"))

    model = spark.createDataFrame(
        [([0.0] * n_hash, 0.0)], "clf_w array<double>, clf_b double"
    )
    # r16 fused step (see linear_classifier_fit): batch sizes collect
    # ONCE (n_batches bounded rows — the exact doubles the per-step
    # broadcast carried; a missing batch keeps the 1.0 no-op divisor)
    # and each step runs the fused single-shuffle update.
    sizes = {int(r["_mb"]): float(r["_N"]) for r in batch_n.collect()}
    domain = spark.range(-1, n_hash).select(F.col("id").cast("int").alias("_b"))
    for _ in range(epochs):
        for m in range(n_batches):
            model = _fused_gd_step(
                docs.filter(F.col("_mb") == m),
                model,
                domain,
                F.lit(sizes.get(m, 1.0)),
                n_hash,
                lr,
                round_dp,
            )
    docs.unpersist()
    return model


def windowed_calibration(
    scored: "DataFrame",
    ts_col: str = "ts",
    size: str = "1 hour",
    label_col: str = "y",
    prob_col: str = "clf_prob",
    bins: int = 10,
    round_dp: int = 4,
) -> "DataFrame":
    """Per-time-window expected calibration error over already-scored
    rows — the monitoring form of the calibration report: watch a
    deployed filter's ECE drift as the corpus drifts (the batch twin of
    `CalibrationAggregation`).

    Exactness trick: ``prob_col`` is the 4dp-rounded classifier output,
    so prob*10^4 is an exact integer and the whole ECE collapses to the
    INTEGER identity sum_b |sp_b - 10^4*np_b| / (10^4 * N) — no float
    fold anywhere, so the streaming facade twin reproduces it exactly.
    One bounded (window x bins) groupBy. Returns
    (window_start, n_scored, ece).

    Overflow posture (the TV-numerator discipline, r10 VERDICT #3): the
    10^4-scaled sums run in DECIMAL(38,0) — BIGINT sums of 10^4-scale
    terms wrap silently in non-ANSI Spark once a window passes ~9e14
    rows; decimal keeps the numerator exact to ~1e34 rows per window,
    far past any real deployment. The streaming twin
    (CalibrationAggregation) needs no cast: Python ints are
    arbitrary-precision. The DuckDB oracle needs none either: its
    BIGINT sum() already widens to HUGEINT."""
    b = F.least(F.floor(F.col(prob_col) * bins), F.lit(bins - 1)).cast("int")
    sp = F.round(F.col(prob_col) * 10000).cast("decimal(38,0)")
    per = (
        scored.groupBy(
            F.window(ts_col, size).getField("start").alias("window_start"),
            b.alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(sp).alias("sp"),
            F.sum(F.col(label_col).cast("decimal(38,0)")).alias("np"),
        )
    )
    return (
        per.groupBy("window_start")
        .agg(
            F.sum("n").alias("n_scored"),
            det_round_col(
                F.sum(
                    F.abs(
                        F.col("sp")
                        - F.lit(10000).cast("decimal(38,0)") * F.col("np")
                    )
                ).cast("double")
                / (F.lit(10000.0) * F.sum("n")),
                round_dp,
            ).alias("ece"),
        )
    )


class CalibrationAggregation:
    """Windowed ECE as a user Aggregation (the facade contract): per
    (key, window) the accumulator is 3 integer arrays of ``bins``
    entries (count, prob*10^4 sum, positives) — bounded state; output
    reproduces `windowed_calibration` EXACTLY because probs are
    4dp-rounded so the whole computation is integer until one final
    division. The streaming deployment shape: score in-row upstream
    (linear_classifier_score is a stateless map), monitor ECE per
    window here."""

    def __init__(self, bins: int = 10, prob_field: str = "clf_prob",
                 label_field: str = "y", round_dp: int = 4):
        self.bins = bins
        self.prob_field = prob_field
        self.label_field = label_field
        self.round_dp = round_dp

    def name(self) -> str:
        return "calibration"

    def initial_accumulator(self):
        return {"n": [0] * self.bins, "sp": [0] * self.bins,
                "np": [0] * self.bins}

    def update(self, rec, acc) -> None:
        import math

        p = rec[self.prob_field]
        if p is None:
            return
        p = float(p)
        if math.isnan(p):  # Arrow renders a null double as NaN
            return
        b = min(int(math.floor(p * self.bins)), self.bins - 1)
        acc["n"][b] += 1
        acc["sp"][b] += int(math.floor(p * 10000 + 0.5))
        acc["np"][b] += int(rec[self.label_field] or 0)

    def combine(self, a, b):
        return {k: [x + y for x, y in zip(a[k], b[k])] for k in ("n", "sp", "np")}

    def output(self, key, acc):
        def r(x, dp):
            # exact replica of det_round_col (r16): quantize the double's
            # EXACT binary expansion through scale 12, then HALF_UP at dp —
            # the old floor(x*s+0.5) multiply could land on the other side
            # of a half boundary than the batch twin's decimal path
            from decimal import ROUND_HALF_UP, Decimal

            d = Decimal(x).quantize(Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP)
            return float(d.quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP))

        n = sum(acc["n"])
        if n == 0:
            return {"n_scored": 0, "ece": 0.0}
        num = sum(abs(sp - 10000 * np) for sp, np in zip(acc["sp"], acc["np"]))
        return {"n_scored": n, "ece": r(num / (10000.0 * n), self.round_dp)}
