"""Text-analysis operators for training-data pipelines.

Not in the reference (its scalar layer is user Python — SURVEY §2.3); these
are the operations a 100 TB LLM-data pipeline runs over a `documents` table:
token statistics, language ID (stopword heuristic), quality scoring,
document fingerprinting. All pure Column expressions — JVM-side, whole-stage
codegen, no UDFs — so they run at scan speed and their DuckDB oracles are
direct transliterations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wallaroo_spark.functions.hashing import det_round_col, det_round_ratio_col

# Small fixed English stopword list (public knowledge); shared with oracles.
EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

WORD_RE = "[a-z]+|[0-9]+"  # BPE-ish: alpha runs and digit runs as tokens


def tokens(c: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(c, " "), lambda x: x != "")


def token_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics (count, distinct, avg length, regex
    tokens, stopword count)."""
    toks = tokens(F.col(text))
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        # det_round (r16): char/token ratios of small integers routinely
        # land EXACTLY on a .xxxx5 boundary (e.g. any /32 denominator) —
        # quantize through decimal so every engine/build rounds them alike
        det_round_col(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.size(F.regexp_extract_all(F.col(text), F.lit(WORD_RE), 0)).alias("n_re_tokens"),
        F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))).alias("n_stopwords"),
    )


def language_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language heuristic: 'en' iff >= 8% of tokens are English
    stopwords, else 'unk'. (An n-gram model plugs in the same shape.)"""
    toks = tokens(F.col(text))
    ratio = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))) / F.greatest(
        F.size(toks), F.lit(1)
    )
    return df.select(
        id_col,
        det_round_col(ratio, 4).alias("stopword_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
    )


def quality_score(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: length band + type/token ratio +
    stopword presence — the standard cheap pre-filter before expensive
    dedup/model scoring."""
    toks = tokens(F.col(text))
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))) / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 5) & (n <= 500), F.lit(1.0)).otherwise(F.lit(0.0))
    score = det_round_col(0.4 * len_ok + 0.4 * ttr + 0.2 * F.least(stop * 5, F.lit(1.0)), 4)
    return df.select(id_col, score.alias("quality"), n.alias("n_tokens"))


def fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization fingerprint: md5 over lowercased, whitespace-collapsed
    text, plus a word-order-insensitive variant (sorted tokens) that catches
    shuffled duplicates."""
    norm = F.regexp_replace(F.lower(F.col(text)), r"\s+", " ")
    sorted_norm = F.concat_ws(" ", F.array_sort(tokens(F.col(text))))
    return df.select(
        id_col,
        F.md5(norm).alias("fp_exact"),
        F.md5(sorted_norm).alias("fp_bag"),
    )


def deterministic_sample(
    df: DataFrame,
    fraction_pct: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Reproducible ~fraction_pct% sample by content-independent hash.

    Same contract as `deterministic_split`: replayable on any engine/run
    (no RNG, no shuffle — a pure map the scan filter absorbs). The salt
    decorrelates independent samples of the same table.
    """
    from wallaroo_spark.functions import hashing as H

    bucket = H.md5int_col(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % F.lit(100)
    return df.filter(bucket < fraction_pct)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Reproducible per-stratum sampling (class-balanced corpus thinning):
    each stratum value gets its own percentage; rows in unlisted strata are
    dropped. Same engine-portable hash contract as `deterministic_sample` —
    no RNG, no shuffle, replayable anywhere; salting by stratum decorrelates
    the per-class subsamples."""
    from wallaroo_spark.functions import hashing as H

    bucket = H.md5int_col(
        F.concat(F.lit(salt + ":"), F.col(strata_col).cast("string"),
                 F.lit(":"), F.col(id_col).cast("string"))
    ) % F.lit(100)
    pct = None
    for val, p in sorted(fractions.items()):
        cond = F.col(strata_col).cast("string") == val
        pct = F.when(cond, F.lit(p)) if pct is None else pct.when(cond, F.lit(p))
    pct = pct.otherwise(F.lit(0)) if pct is not None else F.lit(0)
    return df.filter(bucket < pct)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    m: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis-Spirakis A-Res scheme): each row gets priority
    ``u ** (1/w)`` with ``u`` a salted md5 uniform in (0,1], and the m
    largest priorities win — inclusion probability proportional to weight,
    reproducible on any engine (no RNG). The quality-weighted corpus
    selection step of a training pipeline. TakeOrdered top-m: per-partition
    heads merged at the driver, no global sort. Priorities are rounded to
    9dp before ranking (id tiebreak) so JVM/libm pow ulp differences can't
    flip the boundary."""
    from wallaroo_spark.functions import hashing as H

    big = float(H.MERSENNE31)
    u = (
        H.md5int_col(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        % F.lit(H.MERSENNE31)
        + 1
    ) / F.lit(big + 1.0)
    pr = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 9)
    return (
        df.withColumn("wpriority", pr)
        .orderBy(F.col("wpriority").desc(), F.col(id_col))
        .limit(m)
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (80, 10, 10),
) -> DataFrame:
    """Reproducible train/val/test assignment by content-independent hash.

    Random sampling isn't replayable across engines or runs; hashing the id
    is — the same row lands in the same split on any cluster, any engine
    (md5-based, matching the oracle). Pure map: no shuffle, no RNG.
    """
    from wallaroo_spark.functions import hashing as H

    bucket = H.md5int_col(F.col(id_col).cast("string")) % F.lit(100)
    train, val, _ = weights
    split = (
        F.when(bucket < train, F.lit("train"))
        .when(bucket < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def kgrams(c: Column, k: int) -> Column:
    """NON-distinct word k-grams, full-length only (docs with < k tokens
    yield none) — repetition statistics need occurrence counts, unlike the
    dedup family's distinct `kshingles`."""
    toks = tokens(c)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def repetition_signals(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_bigram_max: float = 0.08,
    dup_trigram_max: float = 0.02,
) -> DataFrame:
    """Gopher-style repetition quality signals per document: the fraction of
    bigram occurrences taken by the single most frequent bigram, and the
    fraction of trigram occurrences that are repeats (count > 1). Documents
    exceeding either threshold flag ``repetitive`` (the standard cheap
    filter against looped/boilerplate text before training).

    Scale shape: ONE explode pass tags each gram with its width, one
    (doc, k, gram) count, one per-doc rollup — two shuffles total, both
    keyed by doc so AQE coalesces them; no UDFs, no driver actions.
    """
    c = F.col(text)
    tagged = F.concat(
        F.transform(kgrams(c, 2), lambda g: F.struct(F.lit(2).alias("k"), g.alias("g"))),
        F.transform(kgrams(c, 3), lambda g: F.struct(F.lit(3).alias("k"), g.alias("g"))),
    )
    grams = df.select(id_col, F.explode(tagged).alias("kg")).select(
        id_col, F.col("kg.k").alias("k"), F.col("kg.g").alias("g")
    )
    counts = grams.groupBy(id_col, "k", "g").agg(F.count("*").alias("c"))
    stats = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("k") == 2, F.col("c"))).alias("_top2"),
        F.sum(F.when(F.col("k") == 2, F.col("c")).otherwise(F.lit(0))).alias("_tot2"),
        F.sum(
            F.when((F.col("k") == 3) & (F.col("c") > 1), F.col("c")).otherwise(F.lit(0))
        ).alias("_dup3"),
        F.sum(F.when(F.col("k") == 3, F.col("c")).otherwise(F.lit(0))).alias("_tot3"),
    )
    top_frac = det_round_col(
        F.coalesce(F.col("_top2") / F.nullif(F.col("_tot2"), F.lit(0)), F.lit(0.0)), 4
    )
    dup_frac = det_round_col(
        F.coalesce(F.col("_dup3") / F.nullif(F.col("_tot3"), F.lit(0)), F.lit(0.0)), 4
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce(top_frac, F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce(dup_frac, F.lit(0.0)).alias("dup_trigram_frac"),
            (
                (F.coalesce(top_frac, F.lit(0.0)) > top_bigram_max)
                | (F.coalesce(dup_frac, F.lit(0.0)) > dup_trigram_max)
            ).alias("repetitive"),
        )
    )


def pii_redact(
    df: DataFrame,
    pattern: str,
    replacement: str = "[REDACTED]",
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Regex scrub for sensitive spans (emails, phones, entity terms):
    returns the redacted text plus the number of redactions per document.
    Pure JVM regexp columns — runs at scan speed; the pattern must stay in
    the RE2-compatible subset so Spark (java.util.regex) and the DuckDB
    oracle (RE2) agree."""
    c = F.col(text)
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).alias("n_redactions"),
        F.md5(F.regexp_replace(c, pattern, replacement)).alias("redacted_md5"),
    )


def target_mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic domain-mixture resampling: given target mixture weights
    per stratum (domain/source) and a global budget (fraction of the corpus),
    compute each stratum's integer keep-percentage
    ``min(100, floor(100 * budget * w_s/Σw / n_s))`` and keep rows by the
    engine-portable salted md5 bucket — the "sample each domain toward a
    target mixture" step of corpus assembly, replayable on any engine.

    Scale shape: per-stratum counts are one partial-agged groupBy; the
    global total rides a broadcast single-row agg (no driver action); the
    tiny rates table broadcasts back onto the corpus scan, so the sample
    itself is a pure map-side filter.
    """
    wsum = float(sum(weights.values()))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n_stratum"))
    total = df.agg(F.count("*").alias("_tot"))
    wcol = None
    for val, wv in sorted(weights.items()):
        cond = F.col(strata_col) == val
        wcol = F.when(cond, F.lit(float(wv))) if wcol is None else wcol.when(cond, F.lit(float(wv)))
    wcol = wcol.otherwise(F.lit(0.0)) if wcol is not None else F.lit(0.0)
    pct = F.least(
        F.lit(100),
        F.floor(
            F.lit(100.0)
            * F.floor(F.lit(budget_frac) * F.col("_tot"))
            * (wcol / F.lit(wsum))
            / F.col("_n_stratum")
        ),
    ).cast("int")
    rates = counts.crossJoin(F.broadcast(total)).select(
        strata_col, "_n_stratum", pct.alias("_pct")
    )
    return _salted_keep_filter(df, rates, strata_col, id_col, salt)


def _salted_keep_filter(df, rates, strata_col: str, id_col: str, salt: str):
    """Keep rows whose salted md5 bucket (0..99) falls under their
    stratum's broadcast ``_pct`` — the engine-portable resample filter
    shared by `target_mixture_sample` and `temperature_mixture_sample`
    (the bucket encoding must stay in lockstep with both oracles, so it
    lives exactly once)."""
    from wallaroo_spark.functions import hashing as H

    bucket = H.md5int_col(
        F.concat(
            F.lit(salt + ":"),
            F.col(strata_col).cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    ) % F.lit(100)
    return df.join(F.broadcast(rates), strata_col).filter(bucket < F.col("_pct"))


def pack_manifest(
    df,
    seq_len: int,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
):
    """Writer-ready sequence assembly manifest: one row per training
    sequence with the ordered (offset-in-seq, doc, from-token, n-tokens)
    parts that fill it — the materialization step after `pack_sequences`
    decides placements. A doc spanning k sequences explodes into k part
    rows (fan-out bounded by doc_len/seq_len + 1, never quadratic); parts
    are assembled per sequence with one groupBy. Every sequence except the
    last is exactly full by construction (asserted in tests).

    Parts are encoded in a deterministic zero-padded string (engine-
    portable, hash-comparable): "offset:doc:from:n" joined by ",". A real
    writer would carry a struct array instead; the layout math is
    identical.

    Output: (seq_id, n_parts, n_tokens_filled, parts).
    """
    L = int(seq_len)
    p = (
        pack_sequences(df, seq_len, text=text, id_col=id_col, n_buckets=n_buckets)
        .withColumn("_st", F.col("seq_id") * L + F.col("seq_offset"))
        .withColumn("_en", F.col("_st") + F.col("n_tokens") - 1)
        .withColumn(
            "_s", F.explode(F.sequence(F.col("seq_id"), F.col("seq_id") + F.col("n_seqs") - 1))
        )
    )
    seq_start = F.col("_s") * L
    part_from = F.greatest(seq_start - F.col("_st"), F.lit(0))
    part_n = (
        F.least(F.col("_en"), seq_start + (L - 1))
        - F.greatest(F.col("_st"), seq_start)
        + 1
    )
    part_off = F.greatest(F.col("_st"), seq_start) - seq_start
    # 12-digit zero padding keeps lexicographic == numeric part order for
    # any seq_len < 10^12 (6 digits would mis-order offsets past 10^6)
    parts = p.select(
        F.col("_s").alias("seq_id"),
        F.format_string(
            "%012d:%d:%d:%d", part_off, F.col(id_col), part_from, part_n
        ).alias("_part"),
        part_n.alias("_n"),
    )
    return parts.groupBy("seq_id").agg(
        F.count("*").alias("n_parts"),
        F.sum("_n").alias("n_tokens_filled"),
        F.array_join(F.array_sort(F.collect_list("_part")), ",").alias("parts"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.3,
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual-training
    alpha-smoothing: sample strata proportional to ``n_s^alpha`` instead of
    ``n_s``, upweighting rare languages/sources). Keep probability per
    stratum is ``(n_s / n_min)^(alpha-1)`` — 100% for the rarest stratum,
    decreasing for common ones — applied as the engine-portable salted md5
    bucket filter, so the sample replays identically anywhere.

    Scale shape (same as `target_mixture_sample`): per-stratum counts are
    one partial-agged groupBy; the min count rides a broadcast single-row
    agg (never a partition-less window); the tiny rates table broadcasts
    onto the corpus scan — the sample itself is a map-side filter. The keep
    percentage is rounded to 4dp before the bucket comparison so Spark and
    oracle ``pow`` agree at the boundary.
    """
    # materialize the strata-sized counts once: nmin and rates both derive
    # from it, and without the checkpoint each consumer re-runs the corpus
    # count scan (Spark plans share nothing across DataFrame branches)
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("_n_stratum"))
        .localCheckpoint(eager=True)
    )
    nmin = counts.agg(F.min("_n_stratum").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        strata_col,
        F.round(
            F.lit(100.0)
            * F.pow(F.col("_n_stratum") / F.col("_nmin"), F.lit(alpha - 1.0)),
            4,
        ).alias("_pct"),
    )
    return _salted_keep_filter(df, rates, strata_col, id_col, salt)


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text: str = "text",
    id_col: str = "doc_id",
    n_hash: int = 1024,
    round_dp: int = 4,
) -> DataFrame:
    """DSIR-style data selection (hashed-n-gram importance resampling, after
    Xie et al. 2023's public method): score each raw document by the
    log-likelihood ratio of its tokens under a TARGET unigram model vs the
    RAW corpus model — both over an ``n_hash``-bucket hashed vocabulary
    with add-1 smoothing — and keep the top-k (the docs that look most like
    the target distribution).

    100 TB shape: both models are fixed-size (n_hash rows) however large
    the corpora; the scored pass is one token explode joined against the
    BROADCAST log-weight table and a per-doc sum — no corpus-vs-corpus
    join anywhere. Ranking uses the ROUNDED score (doc_id tiebreak) so
    engine log/ulp differences can't flip the cut; TakeOrdered top-k — no
    global sort.

    Output: (id_col, n_tokens, dsir_weight), the k best raw docs.
    """
    rb, ct, cr, nt, nr = _dsir_models(df, target, text, n_hash, id_col=id_col)
    # LEFT join, raw side first: a bucket absent from the raw corpus can
    # never match a raw token, so the full-outer form adds only dead rows —
    # and a left join keeps the (fixed-size) target model broadcastable
    # instead of forcing a sort-merge join
    dist = (
        cr.join(F.broadcast(ct), "_b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select("_b", _dsir_log_weight(n_hash).alias("_lw"))
    )
    scored = (
        rb.join(F.broadcast(dist), "_b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("_lw"), round_dp).alias("dsir_weight"),
        )
    )
    return scored.orderBy(F.col("dsir_weight").desc(), id_col).limit(k)


def _dsir_models(df, target, text: str, n_hash: int, id_col: str | None = None):
    """Shared DSIR model construction (one formula, one encoding — the
    score parity between `dsir_select` and `dsir_score_map` depends on
    both building from exactly this): hashed-bucket token tables, per-
    bucket counts materialized once (every consumer branch would otherwise
    re-run its corpus explode), totals derived from the counts by
    summation. Returns (rb, ct, cr, nt, nr); ``rb`` carries ``id_col``
    when given (the scoring join needs it), else buckets only."""
    from wallaroo_spark.functions import hashing as H

    def bkt(c):
        return H.md5int_col(c) % F.lit(n_hash)

    # explode first, hash after (generators can't nest inside expressions)
    tb = target.select(F.explode(tokens(F.col(text))).alias("_w")).select(
        bkt(F.col("_w")).alias("_b")
    )
    if id_col is not None:
        rb = df.select(
            F.col(id_col), F.explode(tokens(F.col(text))).alias("_w")
        ).select(id_col, bkt(F.col("_w")).alias("_b"))
    else:
        rb = df.select(F.explode(tokens(F.col(text))).alias("_w")).select(
            bkt(F.col("_w")).alias("_b")
        )
    ct = tb.groupBy("_b").agg(F.count("*").alias("_ct")).localCheckpoint(eager=True)
    cr = rb.groupBy("_b").agg(F.count("*").alias("_cr")).localCheckpoint(eager=True)
    nt = ct.agg(F.sum("_ct").alias("_nt"))
    nr = cr.agg(F.sum("_cr").alias("_nr"))
    return rb, ct, cr, nt, nr


def _dsir_log_weight(n_hash: int):
    """Add-1-smoothed log-likelihood-ratio column over (_ct, _cr, _nt,
    _nr); null counts (bucket absent on that side) smooth to zero."""
    return F.log(
        (F.coalesce("_ct", F.lit(0)) + 1) / (F.col("_nt") + n_hash)
    ) - F.log((F.coalesce("_cr", F.lit(0)) + 1) / (F.col("_nr") + n_hash))


def dsir_score_map(
    df: DataFrame,
    target: DataFrame,
    text: str = "text",
    n_hash: int = 1024,
) -> DataFrame:
    """The DSIR importance model as ONE broadcastable row: a bucket-indexed
    ``array<double>`` of log-weights over ALL ``n_hash`` hashed-vocabulary
    buckets (absent buckets carry the add-1 smoothing weight, so scoring
    is defined for tokens never seen when the model was built — the case a
    STREAM will hit). Build once from static corpora; ship everywhere.

    An ARRAY, not a map, deliberately: Spark's map ``element_at`` scans the
    entries linearly, while array indexing is O(1) — measured 5.7x on the
    per-token scoring loop. The full-domain build makes position == bucket
    exact."""
    _, ct, cr, nt, nr = _dsir_models(df, target, text, n_hash)
    domain = df.sparkSession.range(n_hash).select(F.col("id").alias("_b"))
    dist = (
        domain.join(F.broadcast(ct), "_b", "left")
        .join(F.broadcast(cr), "_b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select("_b", _dsir_log_weight(n_hash).alias("_lw"))
    )
    return dist.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_b", "_lw"))),
            lambda e: e["_lw"],
        ).alias("dsir_model")
    )


def dsir_score_filter(
    probe: DataFrame,
    model_row: DataFrame,
    min_score: float,
    text: str = "text",
    id_col: str = "doc_id",
    n_hash: int = 1024,
    round_dp: int = 4,
) -> DataFrame:
    """Streamable DSIR data selection: score each probe doc against the
    broadcast model map and keep docs with weight >= min_score — the
    online quality gate of a training-data front door (pair with
    `streaming.admission.token_budget_admit_stream` for quality + budget
    admission).

    The score is PURE IN-ROW array math (transform tokens -> O(1) array
    index into the broadcast model -> aggregate sum): no explode, no
    shuffle, no state — so it runs unchanged on a batch corpus or a
    streaming one (stream-static broadcast join, append mode), exactly
    like `decontaminate_filter`. Scores equal `dsir_select`'s dsir_weight
    (same model, same rounding).

    Output: probe columns + dsir_weight (docs >= min_score only).
    """
    from wallaroo_spark.functions import hashing as H

    toks = tokens(F.col(text))
    score = F.round(
        F.aggregate(
            F.transform(
                toks,
                lambda w: F.element_at(
                    F.col("dsir_model"),
                    (H.md5int_col(w) % F.lit(n_hash)).cast("int") + 1,
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_dp,
    )
    return (
        probe.crossJoin(F.broadcast(model_row))
        .withColumn("dsir_weight", score)
        .filter(F.col("dsir_weight") >= min_score)
        .drop("dsir_model")
    )


def _budget_bucket(id_col: str, n_buckets: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":budget"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )


def token_budget_fill(
    df,
    budget: int,
    domain: str = "source",
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
):
    """Deterministic per-domain token-budget sampling ("give me ~N tokens of
    each source"): docs are assigned a salted md5 bucket; per domain the
    bucket-wise token histogram is cumulated in bucket order and the cutoff
    is the last whole bucket that still fits the budget. Keep = bucket <=
    cutoff, so the selection is reproducible on any engine and never
    exceeds the budget.

    100 TB shape: the sequential "fill until the budget" scan happens on
    the (domain x n_buckets) histogram — tiny, whatever the corpus size —
    never on the corpus itself; the corpus sees one pre-agg pass and one
    map-side filter against broadcast cutoffs. A naive per-domain
    cumulative-sum window over the docs would serialize each domain through
    one task; the histogram two-phase keeps every stage parallel.

    Output per domain: (domain, cutoff_bucket, n_docs_kept, tokens_kept).
    """
    from pyspark.sql.window import Window

    bucket = _budget_bucket(id_col, n_buckets).alias("_bkt")
    d = df.select(
        F.col(domain).alias("_dom"), bucket, F.size(tokens(F.col(text))).alias("_nt")
    )
    hist = d.groupBy("_dom", "_bkt").agg(
        F.sum("_nt").alias("_btok"), F.count("*").alias("_bdocs")
    )
    w = (
        Window.partitionBy("_dom")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_btok").over(w))
    filled = (
        cum.filter(F.col("_cum") <= budget)
        .groupBy("_dom")
        .agg(
            F.max("_bkt").alias("cutoff_bucket"),
            F.sum("_bdocs").alias("n_docs_kept"),
            F.sum("_btok").alias("tokens_kept"),
        )
    )
    # a domain whose FIRST bucket already exceeds the budget would silently
    # vanish (no cum <= budget rows) and token_budget_filter would drop the
    # whole domain with no trace — emit an explicit zero-kept marker row
    # (cutoff_bucket = -1) instead, so "nothing fits" is visible output
    domains = d.select("_dom").distinct()
    return (
        domains.join(filled, "_dom", "left")
        .select(
            F.col("_dom").alias(domain),
            F.coalesce("cutoff_bucket", F.lit(-1)).alias("cutoff_bucket"),
            F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
    )


def token_budget_admit(
    df,
    budget: int,
    domain: str = "source",
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
):
    """Exact doc-level token-budget admission as a DISTRIBUTED PREFIX SCAN.

    Where `token_budget_fill` keeps whole buckets (cheapest; bucket-granular
    cut), this admits documents ONE BY ONE in the deterministic
    salted-bucket-then-id order until each domain's budget is exactly
    exhausted: a doc is admitted iff its running token total (in that
    order) stays <= budget. The salted-md5 bucket order makes admission a
    reproducible pseudo-random sample rather than a lowest-id bias.

    100 TB shape — the classic two-phase scan: (1) per-(domain, bucket)
    token sums form a tiny histogram, cumulated per domain in bucket order
    to give each bucket its start OFFSET; (2) within each (domain, bucket)
    a window cumsum ordered by id, shifted by the broadcast offset. A naive
    ``sum() OVER (PARTITION BY domain ORDER BY id)`` serializes each domain
    through ONE task; here the only per-domain-sequential work is the
    n_buckets-row histogram cumsum, and every corpus-sized stage is
    parallel across (domain x bucket). The oracle IS the naive window —
    proving the scan exact.

    Output: admitted docs (domain, id_col, n_tokens, cum_tokens).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    d = df.select(
        F.col(domain).alias("_dom"),
        F.col(id_col),
        F.size(tokens(F.col(text))).alias("n_tokens"),
        _budget_bucket(id_col, n_buckets).alias("_bkt"),
    )
    return (
        _scan_cum_tokens(d, id_col)
        .filter(F.col("cum_tokens") <= budget)
        .select(F.col("_dom").alias(domain), id_col, "n_tokens", "cum_tokens")
    )


def _scan_cum_tokens(d, id_col: str):
    """Distributed prefix scan: per-_dom running token total in (_bkt,
    id_col) order, via bucket-histogram offsets + parallel within-bucket
    window cumsum (see `token_budget_admit` for the 100 TB rationale).
    ``d`` must have columns (_dom, id_col, n_tokens, _bkt); adds
    ``cum_tokens``.

    Bucket offsets come from a broadcast TRIANGULAR self-join on the tiny
    (domains x n_buckets) histogram — each bucket sums the strictly-earlier
    buckets of its domain — rather than a cumsum window: a single-domain
    caller (pack_sequences' constant _dom) would constant-fold the window's
    partition spec into WindowExec's single-task 'No Partition Defined'
    path, and at <=65k histogram pairs per domain the join is free."""
    from pyspark.sql.window import Window

    hist = d.groupBy("_dom", "_bkt").agg(F.sum("n_tokens").alias("_btok"))
    earlier = hist.select(
        F.col("_dom").alias("_dom2"),
        F.col("_bkt").alias("_bkt2"),
        F.col("_btok").alias("_btok2"),
    )
    offsets = (
        hist.join(
            F.broadcast(earlier),
            (F.col("_dom") == F.col("_dom2")) & (F.col("_bkt2") < F.col("_bkt")),
            "left",
        )
        .groupBy("_dom", "_bkt")
        .agg(F.coalesce(F.sum("_btok2"), F.lit(0)).alias("_off"))
    )
    w_in = (
        Window.partitionBy("_dom", "_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.join(F.broadcast(offsets), ["_dom", "_bkt"]).withColumn(
        "cum_tokens", F.col("_off") + F.sum("n_tokens").over(w_in)
    )


def pack_sequences(
    df,
    seq_len: int,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
):
    """Concat-then-chunk sequence packing: lay every document end-to-end in
    the deterministic salted-bucket-then-id order and cut the token stream
    into fixed ``seq_len`` training contexts — the standard GPT-style
    packing (documents split across context boundaries; no padding). Each
    doc's placement is pure arithmetic on its global token offset, so the
    full corpus->training-sequence layout is computed WITHOUT materializing
    a token stream: one distributed prefix scan (`_scan_cum_tokens` — every
    corpus-sized stage parallel across buckets) and a map-side projection.

    Output per non-empty doc: (id_col, n_tokens, seq_id, seq_offset,
    n_seqs) — the sequence its first token lands in, the offset inside it,
    and how many consecutive sequences the doc spans. Token-less docs
    occupy no space and are dropped. ``sum(n_tokens)/seq_len`` sequences
    come out fully packed by construction; a writer task can then fetch its
    sequence range by ``seq_id`` partition pruning.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    d = df.select(
        F.lit("_").alias("_dom"),
        F.col(id_col),
        F.size(tokens(F.col(text))).alias("n_tokens"),
        _budget_bucket(id_col, n_buckets).alias("_bkt"),
    )
    c = (
        _scan_cum_tokens(d, id_col)
        .filter(F.col("n_tokens") > 0)
        .withColumn("_st", F.col("cum_tokens") - F.col("n_tokens"))
        .withColumn("_en", F.col("cum_tokens") - 1)
    )
    L = int(seq_len)
    return c.select(
        id_col,
        "n_tokens",
        F.expr(f"_st div {L}").alias("seq_id"),
        (F.col("_st") % L).alias("seq_offset"),
        (F.expr(f"_en div {L}") - F.expr(f"_st div {L}") + 1).alias("n_seqs"),
    )


def bigram_surprisal(df, text: str = "text", id_col: str = "doc_id", round_dp: int = 4):
    """Corpus-LM quality score: average bigram surprisal (-log2 p) of each
    document under the corpus's own bigram distribution — the cheap,
    self-supervised stand-in for a perplexity filter (docs full of rare
    token transitions score high; repetitive/templated docs score low).

    Two passes: (1) explode adjacent-token bigrams, count into the
    distribution table; (2) re-explode and join each doc's bigrams against
    it, averaging per doc. The synthetic vocabulary keeps the table tiny
    (broadcast); with a real 50k-token vocab the table exceeds broadcast
    range — cap it to the top-K bigrams via frequency sketch (Misra-Gries,
    `operators/sketch.py`) and back off unseen bigrams to a floor count,
    keeping the join broadcastable. Single-token docs have no bigrams and
    drop out (n_bigrams would be 0).

    Output: (id_col, n_bigrams, avg_bits).
    """
    toks = tokens(F.col(text))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    b = df.select(id_col, F.explode(bigrams).alias("_bg"))
    cnt = b.groupBy("_bg").agg(F.count("*").alias("_c"))
    tot = cnt.agg(F.sum("_c").alias("_n"))
    dist = cnt.crossJoin(F.broadcast(tot))
    return (
        b.join(F.broadcast(dist), "_bg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(-F.log2(F.col("_c") / F.col("_n"))), round_dp
            ).alias("avg_bits"),
        )
    )


def token_budget_filter(
    df,
    budget: int,
    domain: str = "source",
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
):
    """Doc-level form of `token_budget_fill`: return the documents inside
    each domain's token budget. The per-domain cutoffs (a domain-sized
    table) broadcast back; the corpus itself sees one pre-agg pass and one
    map-side bucket comparison — no corpus shuffle, no ordering."""
    cuts = token_budget_fill(df, budget, domain, text, id_col, n_buckets).select(
        domain, "cutoff_bucket"
    )
    return (
        df.withColumn("_bkt", _budget_bucket(id_col, n_buckets))
        .join(F.broadcast(cuts), domain)
        .filter(F.col("_bkt") <= F.col("cutoff_bucket"))
        .drop("_bkt", "cutoff_bucket")
    )


BPE_MAX_ITERS = 512  # one Spark job per merge step; see bpe_train docstring


def bpe_train(df, iters: int = 4, text: str = "text"):
    """Distributed BPE vocabulary training (the merge loop of Sennrich et
    al., 2016): learn ``iters`` merges by repeatedly taking the most
    frequent adjacent symbol pair (count desc, lexicographic tiebreak) and
    fusing it corpus-wide.

    Merge semantics — documented divergence: the fuse is ONE left-to-right
    non-overlapping pass of the guarded replace, whose matches consume the
    shared delimiter. On a run of immediately-repeated symbols one pass
    merges every OTHER occurrence ('a a a a' -> 'aa a a', where classic
    BPE gives 'aa aa'); the leftover self-pairs win again in later rounds
    (lexicographic tiebreak), so runs converge one round late and the
    learned MERGE TABLE can differ from Sennrich's on self-pair runs —
    rare in word-type tables. Pair COUNTS match Sennrich's get_stats
    exactly. The rule is deterministic and replayed verbatim by the DuckDB
    oracle (test pins the 'aaaa' case).

    The working set is the classic one: the WORD-TYPE frequency table, not
    the corpus — one corpus pass builds (word, count), and every iteration
    runs on word types only (at 100 TB the type table is millions of rows
    against trillions of tokens). Each iteration is one pair-count shuffle
    + a driver reduce on exactly ONE row (the argmax — the same O(1)
    driver reduction MLlib's k-means|| does) + a map-side guarded string
    replace; the type table is re-materialized per iteration to cut
    lineage. Symbol sequences ride as '|'-delimited strings so the merge
    is a plain non-overlapping replace — identical left-to-right semantics
    on any engine, which is what makes the whole training replayable by
    the DuckDB oracle.

    Returns the learned merge table: (step, left, right, pair_count).

    Scale posture: each merge step is ONE bounded Spark job over the
    word-TYPE table (a pair-count shuffle + a 1-row driver argmax), so
    ``iters`` merges cost ``iters`` jobs — fine for the few-hundred-merge
    tables this engine trains, wrong for a 30k-merge production vocab
    (30k driver round-trips). ``BPE_MAX_ITERS`` guards that cliff: past
    it, collect the type table (vocab-bounded by definition — millions of
    rows from trillions of tokens) and run the merge loop driver-local,
    which is exactly what reference tokenizer trainers do.
    """
    if iters > BPE_MAX_ITERS:
        raise ValueError(
            f"bpe_train: {iters} merges would launch {iters} Spark jobs "
            f"(one per merge step; ceiling {BPE_MAX_ITERS}). For vocab-scale "
            "merge tables, collect the word-type frequency table (bounded by "
            "vocabulary, not corpus) and run the merge loop driver-local."
        )
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(F.col(text))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    seqs = words.select(
        F.concat(
            F.lit("|"),
            F.array_join(F.filter(F.split("w", ""), lambda x: x != ""), "|"),
            F.lit("|"),
        ).alias("seq"),
        "cnt",
    ).localCheckpoint(eager=True)
    merges = []
    for step in range(iters):
        arr = F.filter(F.split(F.col("seq"), r"\|"), lambda x: x != "")
        n = F.size(arr)
        pairs = seqs.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                )
            ).alias("p"),
        )
        counts = pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y")).agg(
            F.sum("cnt").alias("c")
        )
        top = counts.orderBy(F.col("c").desc(), "x", "y").limit(1).collect()
        if not top:
            break
        x, y, c = top[0]["x"], top[0]["y"], int(top[0]["c"])
        merges.append((step, x, y, c))
        seqs = seqs.select(
            F.replace(
                F.col("seq"), F.lit(f"|{x}|{y}|"), F.lit(f"|{x}{y}|")
            ).alias("seq"),
            "cnt",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count long"
    )


def bpe_encode(df, merges, text: str = "text", id_col: str = "doc_id"):
    """Apply a learned BPE merge table to the corpus: every word becomes
    its merged symbol sequence; returns per-doc token statistics under the
    learned vocabulary — (id_col, n_ws_tokens, n_bpe_tokens, ratio).

    ``merges`` is the (step, left, right, ...) DataFrame from `bpe_train`
    (or an equivalent list of (left, right) pairs); each merge applies with
    the same single-pass guarded-replace semantics as training (see
    `bpe_train` for the self-pair-run divergence note). The merge list is
    driver-collected (it is vocabulary-sized by definition) and compiled
    into a chain of guarded replaces applied in merge order — a pure
    map-side expression; the corpus sees one pass, no shuffle beyond the
    final doc agg (which is itself in-row array math, so actually ZERO
    shuffles)."""
    if hasattr(merges, "collect"):
        pairs = [(r["left"], r["right"]) for r in merges.orderBy("step").collect()]
    else:
        pairs = list(merges)
    toks = tokens(F.col(text))
    seq = F.concat(
        F.lit("|"),
        F.array_join(
            F.transform(
                toks,
                lambda w: F.concat(
                    F.lit("|"),
                    F.array_join(F.filter(F.split(w, ""), lambda x: x != ""), "|"),
                    F.lit("|"),
                ),
            ),
            "",
        ),
    )
    # NB: words are separated by '||' (adjacent guards), so merges can
    # never fuse across a word boundary — same invariant as bpe_train's
    # per-word sequences
    for x, y in pairs:
        seq = F.replace(seq, F.lit(f"|{x}|{y}|"), F.lit(f"|{x}{y}|"))
    n_bpe = F.size(F.filter(F.split(seq, r"\|"), lambda s: s != ""))
    n_ws = F.size(toks)
    return df.select(
        id_col,
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        det_round_col(n_bpe / F.greatest(n_ws, F.lit(1)), 4).alias("ratio"),
    )


def _adjacent_bigrams(c: Column) -> Column:
    """'w1 w2' strings for each adjacent whitespace-token pair."""
    toks = tokens(c)
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


LM_BROADCAST_MAX = 2_000_000  # bigram-table rows; ~50-100 B/row => ~150 MB cap


def reference_lm_cross_entropy(
    df,
    ref,
    text: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
    model_broadcast_max: int | None = LM_BROADCAST_MAX,
):
    """CCNet-shape perplexity scoring: fit an add-one-smoothed bigram LM on
    a REFERENCE corpus (CCNet fits KenLM on Wikipedia), then score every
    document of ``df`` by average cross-entropy under that reference model
    — low bits == reference-like text, high bits == noise/boilerplate.
    Unlike ``bigram_surprisal`` (self-scoring), the model and the scored
    corpus are different tables, which is what makes it a quality filter
    rather than a repetition signal.

    Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V + 1) with V = reference
    bigram-vocabulary size (distinct successor tokens) — add-one backoff
    keeps every probability defined for unseen bigrams AND unseen
    contexts (c12 = c1 = 0 -> 1/(V+1)). Integer counts + one final log:
    deterministic, oracle-replayable at ``round_dp``.

    Scale: the model is REFERENCE-sized, not corpus-sized — CCNet's wiki
    reference yields tens of millions of bigrams (~GBs), so the model join
    is size-aware like `ngram_jaccard_pairs`: approx-count the bigram table
    and broadcast under ``model_broadcast_max``, else fall back to a hash
    shuffle join on the bigram key (the corpus side shuffles once; partial
    aggregation still applies). Pruned-model variants (top-K by Misra-Gries
    + floor backoff) keep the broadcast path at any reference size.

    Output: (id_col, n_bigrams, avg_bits) — avg_bits = mean -log2 p;
    perplexity = 2^avg_bits. Docs with no bigrams drop out.
    """
    rb = ref.select(F.explode(_adjacent_bigrams(F.col(text))).alias("_bg"))
    c12 = rb.groupBy("_bg").agg(F.count("*").alias("_c12"))
    # context counts derive from the bigram table itself (no second explode)
    c1 = (
        c12.withColumn("_w1", F.split("_bg", " ")[0])
        .groupBy("_w1")
        .agg(F.sum("_c12").alias("_c1"))
    )
    vocab = c12.select(F.split("_bg", " ")[1].alias("_w2")).agg(
        F.countDistinct("_w2").alias("_V")
    )

    if model_broadcast_max is not None:
        n_model = c12.agg(F.approx_count_distinct("_bg").alias("v")).first()["v"]
        bcast = n_model <= model_broadcast_max
    else:
        bcast = True
    model12 = F.broadcast(c12) if bcast else c12
    model1 = F.broadcast(c1) if bcast else c1

    db = df.select(id_col, F.explode(_adjacent_bigrams(F.col(text))).alias("_bg"))
    db = db.withColumn("_w1", F.split("_bg", " ")[0])
    scored = (
        db.join(model12, "_bg", "left")
        .join(model1, "_w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_bits",
            -F.log2(
                (F.coalesce(F.col("_c12"), F.lit(0)) + 1)
                / (F.coalesce(F.col("_c1"), F.lit(0)) + F.col("_V") + 1)
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_bits"), round_dp).alias("avg_bits"),
    )


def perplexity_filter(
    df,
    ref,
    max_avg_bits: float,
    text: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
    model_broadcast_max: int | None = LM_BROADCAST_MAX,
):
    """Keep documents whose reference-LM cross-entropy is at most
    ``max_avg_bits`` (the CCNet head/middle cut, as a fixed threshold so
    the gate is deterministic — quantile thresholds ride
    `histogram_quantiles` upstream). Scores are doc-id-keyed (one hash agg)
    and join back semi-style: the corpus text crosses the wire once."""
    scores = reference_lm_cross_entropy(
        df, ref, text, id_col, round_dp, model_broadcast_max
    )
    keep = scores.filter(F.col("avg_bits") <= max_avg_bits).select(id_col)
    return df.join(keep, id_col, "left_semi")


def lm_score_map(ref, text: str = "text", n_hash: int = 4096):
    """The reference bigram LM as ONE broadcastable row — the streamable
    form of `reference_lm_cross_entropy`'s model (same shape as
    `dsir_score_map`): two full-domain bucket-indexed ``array<bigint>``
    (bigram counts hashed by md5 of 'w1 w2'; context counts hashed by md5
    of w1) plus the successor-vocabulary size V. Hashing makes the model
    FIXED-SIZE however large the reference vocabulary — the property that
    lets the model ride a stream-static broadcast join; colliding buckets
    merge counts (count-min-style over-estimation of p, i.e. optimistic
    bits), documented and replayed exactly by the oracle.

    Arrays, not maps: O(1) ``element_at`` indexing (the measured 5.7x from
    the DSIR model). Full-domain build (absent buckets hold 0) keeps
    scoring defined for never-seen tokens — the case a stream will hit."""
    from wallaroo_spark.functions import hashing as H

    rb = ref.select(F.explode(_adjacent_bigrams(F.col(text))).alias("_bg"))
    c12 = rb.groupBy(
        (H.md5int_col(F.col("_bg")) % F.lit(n_hash)).cast("int").alias("_b")
    ).agg(F.count("*").alias("_c"))
    c1 = rb.groupBy(
        (H.md5int_col(F.split("_bg", " ")[0]) % F.lit(n_hash)).cast("int").alias("_b")
    ).agg(F.count("*").alias("_c"))
    vocab = rb.select(F.split("_bg", " ")[1].alias("_w2")).agg(
        F.countDistinct("_w2").alias("_V")
    )
    domain = ref.sparkSession.range(n_hash).select(F.col("id").cast("int").alias("_b"))

    def dense(counts, name):
        return (
            domain.join(F.broadcast(counts), "_b", "left")
            .select("_b", F.coalesce(F.col("_c"), F.lit(0)).alias("_c"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_b", "_c"))),
                    lambda e: e["_c"],
                ).alias(name)
            )
        )

    return (
        dense(c12, "lm_c12")
        .crossJoin(dense(c1, "lm_c1"))
        .crossJoin(F.broadcast(vocab))
    )


def perplexity_filter_streamable(
    probe,
    model_row,
    max_avg_bits: float,
    text: str = "text",
    n_hash: int = 4096,
    round_dp: int = 4,
):
    """Streamable perplexity gate: score each probe doc against the
    broadcast one-row LM and keep docs at or below ``max_avg_bits``.

    The score is PURE IN-ROW array math — bigram array -> O(1) indexes
    into the broadcast count arrays -> add-one-smoothed bits -> average:
    no explode, no shuffle, no state. Runs unchanged on a batch corpus or
    a stream (stream-static broadcast join, append mode), exactly like
    `dsir_score_filter` — the online quality gate in front of streaming
    admission. Docs without bigrams are dropped (no evidence).

    Output: probe columns + n_bigrams + avg_bits (kept docs only)."""
    from wallaroo_spark.functions import hashing as H

    bgs = _adjacent_bigrams(F.col(text))
    bits = F.transform(
        bgs,
        lambda bg: -F.log2(
            (
                F.element_at(
                    F.col("lm_c12"),
                    (H.md5int_col(bg) % F.lit(n_hash)).cast("int") + 1,
                )
                + 1
            )
            / (
                F.element_at(
                    F.col("lm_c1"),
                    (H.md5int_col(F.split_part(bg, F.lit(" "), F.lit(1))) % F.lit(n_hash)).cast("int") + 1,
                )
                + F.col("_V")
                + 1
            )
        ),
    )
    n = F.size(bgs)
    avg_bits = F.round(
        F.aggregate(bits, F.lit(0.0), lambda a, x: a + x) / n, round_dp
    )
    return (
        probe.crossJoin(F.broadcast(model_row))
        .withColumn("n_bigrams", n)
        .withColumn("avg_bits", avg_bits)
        .filter((F.col("n_bigrams") > 0) & (F.col("avg_bits") <= max_avg_bits))
        .drop("lm_c12", "lm_c1", "_V")
    )


LM_INTERP_WEIGHTS = (0.5, 0.3, 0.2)  # trigram, bigram, unigram


def _adjacent_trigrams(c: Column) -> Column:
    """'w1 w2 w3' strings for each adjacent token triple."""
    toks = tokens(c)
    n = F.size(toks)
    m = F.greatest(n - 2, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat_ws(" ", a, b)
    )
    return F.zip_with(
        pairs, F.slice(toks, 3, m), lambda p, w: F.concat_ws(" ", p, w)
    )


def lm_score_map_interp(ref, text: str = "text", n_hash: int = 4096):
    """Interpolated trigram reference LM as ONE broadcastable row — the
    KenLM-flavored upgrade of `lm_score_map` (CCNet scores with a
    5-gram KenLM; this is the same interpolated-backoff shape at order 3,
    hash-bucketed so the model is FIXED-SIZE at any reference
    vocabulary): three full-domain count arrays (unigram / bigram /
    trigram buckets, md5-hashed) plus V (distinct tokens) and T (total
    tokens). Per token: p = 0.5*p3 + 0.3*p2 + 0.2*p1 with each order
    add-one-smoothed (p3 = (c3+1)/(c2[ctx]+V+1), p2 = (c2+1)/(c1[ctx]+V+1),
    p1 = (c1+1)/(T+V)) — every order stays defined for never-seen tokens,
    the case a stream will hit. Colliding buckets merge counts
    (count-min-style optimistic probabilities), replayed exactly by the
    oracle via the shared md5 family."""
    from wallaroo_spark.functions import hashing as H

    toks = ref.select(F.explode(tokens(F.col(text))).alias("_w"))
    c1 = toks.groupBy(
        (H.md5int_col(F.col("_w")) % F.lit(n_hash)).cast("int").alias("_b")
    ).agg(F.count("*").alias("_c"))
    scalars = toks.agg(
        F.countDistinct("_w").alias("_V"), F.count("*").alias("_T")
    )
    bg = ref.select(F.explode(_adjacent_bigrams(F.col(text))).alias("_g"))
    c2 = bg.groupBy(
        (H.md5int_col(F.col("_g")) % F.lit(n_hash)).cast("int").alias("_b")
    ).agg(F.count("*").alias("_c"))
    tg = ref.select(F.explode(_adjacent_trigrams(F.col(text))).alias("_g"))
    c3 = tg.groupBy(
        (H.md5int_col(F.col("_g")) % F.lit(n_hash)).cast("int").alias("_b")
    ).agg(F.count("*").alias("_c"))
    domain = ref.sparkSession.range(n_hash).select(F.col("id").cast("int").alias("_b"))

    def dense(counts, name):
        return (
            domain.join(F.broadcast(counts), "_b", "left")
            .select("_b", F.coalesce(F.col("_c"), F.lit(0)).alias("_c"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_b", "_c"))),
                    lambda e: e["_c"],
                ).alias(name)
            )
        )

    return (
        dense(c1, "lm1")
        .crossJoin(dense(c2, "lm2"))
        .crossJoin(dense(c3, "lm3"))
        .crossJoin(F.broadcast(scalars))
    )


def interp_lm_score(
    probe,
    model_row,
    text: str = "text",
    n_hash: int = 4096,
    round_dp: int = 4,
):
    """Score each probe doc's average interpolated-trigram cross-entropy
    against the broadcast one-row model — PURE IN-ROW (trigram array ->
    O(1) indexes into three broadcast count arrays -> interpolated bits ->
    average): no explode, no shuffle, no state, so the identical plan runs
    on batch or stream. Docs with fewer than 3 tokens drop out.

    Output: probe columns + n_trigrams + avg_bits."""
    from wallaroo_spark.functions import hashing as H

    w3, w2, w1 = LM_INTERP_WEIGHTS

    def bucket(col_expr):
        return (H.md5int_col(col_expr) % F.lit(n_hash)).cast("int") + 1

    def cnt(arr, col_expr):
        return F.element_at(F.col(arr), bucket(col_expr))

    tris = _adjacent_trigrams(F.col(text))
    V1 = F.col("_V") + F.lit(1)

    # per-trigram expressions: tri = "w1 w2 w3"
    def tri_bits(tri):
        wa = F.split_part(tri, F.lit(" "), F.lit(1))
        wb = F.split_part(tri, F.lit(" "), F.lit(2))
        wc = F.split_part(tri, F.lit(" "), F.lit(3))
        ctx12 = F.concat_ws(" ", wa, wb)
        g23 = F.concat_ws(" ", wb, wc)
        p3 = (cnt("lm3", tri) + 1) / (cnt("lm2", ctx12) + V1)
        p2 = (cnt("lm2", g23) + 1) / (cnt("lm1", wb) + V1)
        p1 = (cnt("lm1", wc) + 1) / (F.col("_T") + F.col("_V"))
        return -F.log2(F.lit(w3) * p3 + F.lit(w2) * p2 + F.lit(w1) * p1)

    n = F.size(tris)
    avg_bits = F.round(
        F.aggregate(F.transform(tris, tri_bits), F.lit(0.0), lambda a, x: a + x) / n,
        round_dp,
    )
    return (
        probe.crossJoin(F.broadcast(model_row))
        .withColumn("n_trigrams", n)
        .withColumn("avg_bits", avg_bits)
        .filter(F.col("n_trigrams") > 0)
        .drop("lm1", "lm2", "lm3", "_V", "_T")
    )


def corpus_drift(
    old,
    new,
    text: str = "text",
    n_hash: int = 1024,
    round_dp: int = 4,
):
    """Distribution drift between two corpus snapshots over hashed token
    histograms — the monitoring signal for a continuously-assembled corpus
    (vocabulary shift, source mix change, quality regression) before it
    shows up in model evals.

    Both corpora reduce to ``n_hash``-bucket token histograms (one explode
    + one bounded-keyspace groupBy each; the comparison itself is
    n_hash-row math). Add-one smoothing keeps both distributions fully
    supported, so KL is always finite. Output ONE row:
    (n_tokens_old, n_tokens_new, kl_bits, tv_distance) with
    KL(new || old) in bits and total-variation distance, both rounded —
    deterministic, oracle-replayable.
    """
    from wallaroo_spark.functions import hashing as H

    def hist(df, name):
        t = df.select(F.explode(tokens(F.col(text))).alias("_w"))
        # persist: the histogram subtree is referenced through both `tots`
        # and `terms` (and the static plan shows ZERO ReusedExchange), so
        # without it the corpus tokenize re-runs per reference — measured
        # r16 on the windowed sibling: 14 parquet scans in one plan.
        # <= n_hash rows however large the corpus.
        return t.groupBy(
            (H.md5int_col(F.col("_w")) % F.lit(n_hash)).cast("int").alias("_b")
        ).agg(F.count("*").alias(name)).persist()

    spark = old.sparkSession
    domain = spark.range(n_hash).select(F.col("id").cast("int").alias("_b"))
    joined = (
        domain.join(F.broadcast(hist(old, "_co")), "_b", "left")
        .join(F.broadcast(hist(new, "_cn")), "_b", "left")
        .select(
            "_b",
            F.coalesce(F.col("_co"), F.lit(0)).alias("_co"),
            F.coalesce(F.col("_cn"), F.lit(0)).alias("_cn"),
        )
    )
    tots = joined.agg(
        F.sum("_co").alias("_to"), F.sum("_cn").alias("_tn")
    )
    terms = joined.crossJoin(F.broadcast(tots)).select(
        "_to",
        "_tn",
        ((F.col("_cn") + 1) / (F.col("_tn") + n_hash)).alias("_q"),
        ((F.col("_co") + 1) / (F.col("_to") + n_hash)).alias("_p"),
    )
    return terms.agg(
        F.first("_to").alias("n_tokens_old"),
        F.first("_tn").alias("n_tokens_new"),
        F.round(F.sum(F.col("_q") * F.log2(F.col("_q") / F.col("_p"))), round_dp).alias(
            "kl_bits"
        ),
        F.round(F.sum(F.abs(F.col("_q") - F.col("_p"))) / 2, round_dp).alias(
            "tv_distance"
        ),
    )


def corpus_drift_by(
    old,
    new,
    by: str = "lang",
    text: str = "text",
    n_hash: int = 1024,
    round_dp: int = 4,
):
    """Per-slice drift: `corpus_drift` computed independently for every
    value of ``by`` (source, lang, shard...) in ONE pass per side — the
    slice that moved shows up directly instead of being averaged away in
    the corpus-wide number.

    Histograms key on (slice, bucket): still a bounded-keyspace groupBy
    (|slices| x n_hash); the comparison is |slices| x n_hash row math.
    Slices appearing on only one side still score (their other side is
    pure add-one smoothing mass). Output per slice:
    (by, n_tokens_old, n_tokens_new, kl_bits, tv_distance)."""
    from wallaroo_spark.functions import hashing as H

    def hist(df, name):
        t = df.select(
            F.col(by).alias("_g"), F.explode(tokens(F.col(text))).alias("_w")
        )
        # persist: referenced by `slices` AND the broadcast domain joins —
        # |slices| x n_hash rows, bounded (see corpus_drift's rationale)
        return t.groupBy(
            "_g",
            (H.md5int_col(F.col("_w")) % F.lit(n_hash)).cast("int").alias("_b"),
        ).agg(F.count("*").alias(name)).persist()

    ho, hn = hist(old, "_co"), hist(new, "_cn")
    spark = old.sparkSession
    slices = ho.select("_g").union(hn.select("_g")).distinct()
    domain = slices.crossJoin(
        spark.range(n_hash).select(F.col("id").cast("int").alias("_b"))
    )
    joined = (
        domain.join(F.broadcast(ho), ["_g", "_b"], "left")
        .join(F.broadcast(hn), ["_g", "_b"], "left")
        .select(
            "_g",
            "_b",
            F.coalesce(F.col("_co"), F.lit(0)).alias("_co"),
            F.coalesce(F.col("_cn"), F.lit(0)).alias("_cn"),
        )
    )
    tots = joined.groupBy("_g").agg(
        F.sum("_co").alias("_to"), F.sum("_cn").alias("_tn")
    )
    terms = joined.join(F.broadcast(tots), "_g").select(
        "_g",
        "_to",
        "_tn",
        ((F.col("_cn") + 1) / (F.col("_tn") + n_hash)).alias("_q"),
        ((F.col("_co") + 1) / (F.col("_to") + n_hash)).alias("_p"),
    )
    return terms.groupBy(F.col("_g").alias(by)).agg(
        F.first("_to").alias("n_tokens_old"),
        F.first("_tn").alias("n_tokens_new"),
        F.round(F.sum(F.col("_q") * F.log2(F.col("_q") / F.col("_p"))), round_dp).alias(
            "kl_bits"
        ),
        F.round(F.sum(F.abs(F.col("_q") - F.col("_p"))) / 2, round_dp).alias(
            "tv_distance"
        ),
    )


def reference_token_probs(
    ref, text: str = "text", n_hash: int = 1024
) -> list[float]:
    """Add-one-smoothed hashed-token probabilities of a reference corpus as
    a plain Python list (model-sized: n_hash floats) — the embedded model
    for `DriftAggregation`, computed once and shipped inside the
    aggregation instance (closures pickle by value; executors never import
    the package). p_b = (c_b + 1) / (T + n_hash), identical to the batch
    `windowed_drift` reference side."""
    from wallaroo_spark.functions import hashing as H

    rows = (
        ref.select(F.explode(tokens(F.col(text))).alias("_w"))
        .groupBy((H.md5int_col(F.col("_w")) % F.lit(n_hash)).cast("int").alias("_b"))
        .agg(F.count("*").alias("_c"))
        .collect()
    )
    counts = [0] * n_hash
    total = 0
    for r in rows:
        counts[r["_b"]] = r["_c"]
        total += r["_c"]
    return [(c + 1) / (total + n_hash) for c in counts]


def windowed_drift(
    df,
    ref,
    ts_col: str = "ts",
    size: str = "1 hour",
    text: str = "text",
    n_hash: int = 1024,
    round_dp: int = 4,
):
    """Per-tumbling-window drift against a reference corpus: KL(window ||
    reference) in bits + TV distance of each window's hashed-token
    histogram — the batch twin of the streaming `DriftAggregation`
    (facade) and the time-axis form of `corpus_drift`.

    Shapes: reference histogram is n_hash rows (broadcast); window counts
    are one explode + one (window, bucket) groupBy — key space windows x
    n_hash; the comparison joins the distinct-window list against the
    broadcast reference domain, so zero-count buckets are represented
    exactly (windows x n_hash rows, bounded).

    Output: (window_start, window_end, n_tokens, kl_bits, tv_distance)."""
    from wallaroo_spark.functions import hashing as H

    # persist both bounded aggregates: ref_h feeds p_tab AND ref_tot, wc
    # feeds wins, joined and tots, and joined is itself read twice — the
    # static plan had 14 parquet scans / 14 explodes with ZERO
    # ReusedExchange, i.e. the corpus tokenize re-ran per reference
    # (measured r16; persist + tots-from-wc cut it to one scan per side).
    # ref_h <= n_hash rows; wc <= windows x n_hash rows.
    ref_h = (
        ref.select(F.explode(tokens(F.col(text))).alias("_w"))
        .groupBy((H.md5int_col(F.col("_w")) % F.lit(n_hash)).cast("int").alias("_b"))
        .agg(F.count("*").alias("_rc"))
        .persist()
    )
    ref_tot = ref_h.agg(F.sum("_rc").alias("_rt"))
    spark = df.sparkSession
    domain = spark.range(n_hash).select(F.col("id").cast("int").alias("_b"))
    p_tab = (
        domain.join(F.broadcast(ref_h), "_b", "left")
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "_b",
            (
                (F.coalesce(F.col("_rc"), F.lit(0)) + 1)
                / (F.col("_rt") + n_hash)
            ).alias("_p"),
        )
    )
    w = F.window(F.col(ts_col), size)
    wc = (
        df.select(w.alias("_w"), F.explode(tokens(F.col(text))).alias("_t"))
        .groupBy(
            "_w", (H.md5int_col(F.col("_t")) % F.lit(n_hash)).cast("int").alias("_b")
        )
        .agg(F.count("*").alias("_c"))
        .persist()
    )
    wins = wc.select("_w").distinct()
    dom = wins.crossJoin(F.broadcast(p_tab))
    joined = dom.join(wc, ["_w", "_b"], "left").select(
        "_w", "_b", "_p", F.coalesce(F.col("_c"), F.lit(0)).alias("_c")
    )
    # per-window totals straight from wc: the zero-filled buckets joined
    # adds contribute 0 to an integer sum, so this is value-identical and
    # drops a second read of the (twice-expanded) joined subtree
    tots = wc.groupBy("_w").agg(F.sum("_c").alias("_T"))
    terms = joined.join(F.broadcast(tots), "_w").select(
        "_w",
        "_T",
        ((F.col("_c") + 1) / (F.col("_T") + n_hash)).alias("_q"),
        "_p",
    )
    return terms.groupBy("_w").agg(
        F.first(F.col("_w.start")).alias("window_start"),
        F.first(F.col("_w.end")).alias("window_end"),
        F.first("_T").alias("n_tokens"),
        F.round(F.sum(F.col("_q") * F.log2(F.col("_q") / F.col("_p"))), round_dp).alias(
            "kl_bits"
        ),
        F.round(F.sum(F.abs(F.col("_q") - F.col("_p"))) / 2, round_dp).alias(
            "tv_distance"
        ),
    ).drop("_w")


class DriftAggregation:
    """Windowed drift as a user Aggregation (the facade contract, like
    CountMinAggregation): per-(key, window) hashed-token histogram with
    watermark-evicted streaming state, output = KL/TV against the
    EMBEDDED reference distribution (n_hash floats captured at
    construction via `reference_token_probs` — model-sized, pickled by
    value with the instance). State per window is a dense n_hash count
    list — bounded whatever the vocabulary. Streamed windows reproduce
    the batch `windowed_drift` numbers (parity-tested)."""

    def __init__(self, ref_probs, text_field: str = "text", round_dp: int = 4):
        self.p = [float(x) for x in ref_probs]
        self.text_field = text_field
        self.round_dp = round_dp

    def name(self) -> str:
        return "drift"

    def initial_accumulator(self):
        return {"counts": [0] * len(self.p)}

    def update(self, rec, acc) -> None:
        import hashlib

        h = len(self.p)
        counts = acc["counts"]
        for tok in (rec[self.text_field] or "").split(" "):
            if tok:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % h
                counts[b] += 1

    def combine(self, a, b):
        return {"counts": [x + y for x, y in zip(a["counts"], b["counts"])]}

    def output(self, key, acc):
        import math

        def r(x, dp):  # half-away-from-zero, matching Spark/DuckDB round()
            s = 10.0 ** dp
            return math.floor(x * s + 0.5) / s if x >= 0 else -math.floor(-x * s + 0.5) / s

        h = len(self.p)
        counts = acc["counts"]
        total = sum(counts)
        kl = 0.0
        tv = 0.0
        for c, p in zip(counts, self.p):
            q = (c + 1) / (total + h)
            kl += q * math.log2(q / p)
            tv += abs(q - p)
        return {
            "n_tokens": total,
            "kl_bits": r(kl, self.round_dp),
            "tv_distance": r(tv / 2, self.round_dp),
        }


def readability_signals(
    df, text: str = "text", id_col: str = "doc_id", round_dp: int = 4
):
    """Readability quality signals — the classic cheap text-quality family
    (used alongside Gopher rules in corpus filtering): words/sentence,
    syllables/word (vowel-group proxy), and the Flesch reading-ease
    composite 206.835 - 1.015*(W/S) - 84.6*(Sy/W). Pure Column regexp
    math — scan speed, no shuffle; the oracle is a direct
    transliteration. Output: (id, n_words, n_sentences, n_syllables,
    words_per_sentence, syllables_per_word, flesch)."""
    toks = tokens(F.col(text))
    n_w = F.size(toks)
    n_s = F.greatest(
        F.size(F.filter(F.split(F.col(text), r"[.!?]+"), lambda x: F.trim(x) != "")),
        F.lit(1),
    )
    n_sy = F.size(F.regexp_extract_all(F.lower(F.col(text)), F.lit("[aeiouy]+"), 0))
    # r17 (round_lint stage 2): wps/spw/flesch are rationals over integer
    # counts, and flesch lands EXACTLY on 4dp half boundaries for real
    # documents (-6.04875, -9.57375 at sf0.001) — det_round's DECIMAL cast
    # of the raw double is build-sensitive precisely there. Round on exact
    # integers instead: one identical IEEE division per signal, no double
    # ever crosses a decimal cast. long casts first — 206835*s*w
    # overflows 32-bit int arithmetic.
    w = n_w.cast("long")
    s = n_s.cast("long")
    sy = n_sy.cast("long")
    wg = F.greatest(w, F.lit(1).cast("long"))
    flesch_num = (
        F.lit(206835) * s * wg - F.lit(1015) * w * wg - F.lit(84600) * sy * s
    )
    return df.select(
        id_col,
        n_w.alias("n_words"),
        n_s.alias("n_sentences"),
        n_sy.alias("n_syllables"),
        det_round_ratio_col(w, s, round_dp).alias("words_per_sentence"),
        det_round_ratio_col(sy, wg, round_dp).alias("syllables_per_word"),
        det_round_ratio_col(flesch_num, F.lit(1000) * s * wg, round_dp).alias(
            "flesch"
        ),
    )


# ---------------------------------------------------------------------------
# RAG/packing chunking + CCNet-style paragraph-level dedup (round 8)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int | None = None,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the retrieval /
    context-chunking step of a RAG or long-context pipeline: chunk i covers
    tokens [1 + i*stride, ... + window), the final partial window is kept
    (so every token lands in >= 1 chunk), ``stride`` defaults to
    ``window`` (no overlap). Pure Column math — sequence + slice +
    concat_ws, no explode of individual tokens (the chunk list is built
    in-row, then ONE explode per chunk): at 100 TB this runs at scan speed
    with output ~ corpus size x (window/stride) and no shuffle at all.

    Returns (id, chunk_id, n_chunk_tokens, chunk): deterministic dense
    chunk ids per document.
    """
    stride = stride or window
    if stride > window:
        # mirror hamming_pairs' explicit losslessness guard: a stride wider
        # than the window silently loses the tokens between windows,
        # breaking the every-token-covered promise above
        raise ValueError(
            f"chunk_documents: stride ({stride}) must be <= window ({window})"
        )
    if window < 1 or stride < 1:
        raise ValueError("chunk_documents: window and stride must be >= 1")
    toks = tokens(F.col(text))
    n = F.size(toks)
    # last start: far enough that the PREVIOUS chunk did not already reach
    # the end (s <= n - window + stride), capped at n — this keeps the
    # final partial window (a plain n-window+1 bound silently drops the
    # tail whenever (n - window) % stride != 0)
    starts = F.sequence(
        F.lit(1),
        F.least(F.greatest(n - F.lit(window) + F.lit(stride), F.lit(1)), n),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s, window)).alias("chunk"),
            F.least(n - s + 1, F.lit(window)).alias("n_chunk_tokens"),
        ),
    )
    return (
        df.filter(n > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_id", "_c"))
        .select(
            id_col,
            "chunk_id",
            F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("_c.chunk").alias("chunk"),
        )
    )


def split_paragraphs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    block_tokens: int | None = None,
) -> DataFrame:
    """(id, para_idx, para): newline-delimited paragraphs by default (the
    CCNet unit), or fixed ``block_tokens`` token blocks for corpora without
    newline structure (this repo's testdata). Empty paragraphs drop."""
    if block_tokens:
        toks = tokens(F.col(text))
        n = F.size(toks)
        # non-overlapping blocks incl. the final partial one (same tail
        # rule as chunk_documents with stride == window: last start <= n)
        starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(block_tokens))
        paras = F.transform(
            starts, lambda s: F.concat_ws(" ", F.slice(toks, s, block_tokens))
        )
    else:
        paras = F.filter(F.split(F.col(text), "\n"), lambda p: F.trim(p) != "")
    return df.select(id_col, F.posexplode(paras).alias("para_idx", "para")).filter(
        F.col("para") != ""
    )


def paragraph_dedup(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    block_tokens: int | None = None,
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup: drop every repeated
    paragraph occurrence corpus-wide (keep the FIRST by (doc, position)),
    then reassemble each document from its surviving paragraphs in order.
    The Common Crawl preprocessing step that removes boilerplate (headers,
    nav bars, cookie banners) repeated across pages while keeping each
    document's unique prose.

    Scale shape: paragraphs shuffle ONCE as 60-bit md5 ints for the
    min_by first-occurrence agg (map-side combine: one survivor per
    paragraph hash per partition crosses the wire); the keep-join is an
    equi-join on (hash) followed by the per-doc ordered reassembly — no
    windows, no all-pairs anything. Returns (id, text, n_paras,
    n_dropped); documents whose every paragraph was seen earlier come back
    EMPTY (n_paras=0, text='') rather than vanishing, so downstream
    accounting sees them.
    """
    from wallaroo_spark.functions import hashing as H

    paras = split_paragraphs(df, text, id_col, block_tokens)
    hashed = paras.select(
        id_col,
        "para_idx",
        "para",
        H.md5int_col(F.col("para")).alias("_ph"),
    )
    first = hashed.groupBy("_ph").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("para_idx").alias("p"))).alias(
            "_first"
        )
    )
    kept = (
        hashed.join(first, "_ph")
        .filter(
            (F.col(id_col) == F.col("_first.d"))
            & (F.col("para_idx") == F.col("_first.p"))
        )
        .select(id_col, "para_idx", "para")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text_dedup"),
        F.count("*").alias("n_paras"),
    )
    totals = hashed.groupBy(id_col).agg(F.count("*").alias("_total"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.coalesce(F.col("n_paras"), F.lit(0)).cast("long").alias("n_paras"),
            (F.col("_total") - F.coalesce(F.col("n_paras"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def paragraph_dedup_stream(
    sdf: DataFrame,
    ts_col: str,
    delay: str,
    text: str = "text",
    id_col: str = "doc_id",
    block_tokens: int | None = None,
) -> DataFrame:
    """Streaming twin of ``paragraph_dedup``'s survival rule: documents
    explode into paragraphs in-row (stream-safe Column math), and a
    paragraph survives iff its hash was not seen within the watermark
    horizon (native ``dropDuplicatesWithinWatermark`` — state bounded by
    the horizon, the same eviction contract as ``exact_dedup_stream``).

    Semantics note: the batch twin keeps the global (doc, position)-first
    occurrence; an unbounded stream has no global order, so the stream
    keeps the first ARRIVAL — identical output when events arrive in
    (doc, position) order (pinned by the parity pytest), and the standard
    CCNet behavior for incremental crawls. Returns surviving
    (id, para_idx, para, ts) rows; per-document reassembly is a batch
    concern (needs the doc complete)."""
    from wallaroo_spark.functions import hashing as H

    if block_tokens:
        toks = tokens(F.col(text))
        n = F.size(toks)
        starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(block_tokens))
        paras = F.transform(
            starts, lambda s: F.concat_ws(" ", F.slice(toks, s, block_tokens))
        )
    else:
        paras = F.filter(F.split(F.col(text), "\n"), lambda p: F.trim(p) != "")
    p = (
        sdf.select(id_col, ts_col, F.posexplode(paras).alias("para_idx", "para"))
        .filter(F.col("para") != "")
        .withColumn("_ph", H.md5int_col(F.col("para")))
    )
    return (
        p.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_ph"])
        .drop("_ph")
    )


def c4_gopher_filters(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The C4 / Gopher rule-flag battery — the cheap document filters every
    web-scale curation pipeline runs before anything expensive (C4:
    boilerplate markers; Gopher: word-shape sanity bounds). Pure Column
    regex/ratio math at scan speed; emits each signal AND its flag so a
    pipeline can tune thresholds without recomputing, plus the composite
    ``keep``.

    Signals: mean word length in [3, 10] (Gopher); fraction of words
    containing an alphabetic character >= 0.8 (Gopher); symbol ratio
    (# / ellipsis per word) <= 0.1 (Gopher); fraction of ALL-CAPS words
    <= 0.2; boilerplate markers — 'lorem ipsum', '{' (C4 drops pages with
    code braces), 'javascript'/'cookie' notices.
    """
    c = F.col(text)
    toks = tokens(c)
    n = F.greatest(F.size(toks), F.lit(1))
    mean_wl = det_round_col(
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        / n,
        4,
    )
    alpha_frac = det_round_col(
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))) / n, 4
    )
    sym_ratio = det_round_col(
        (
            F.length(c) - F.length(F.regexp_replace(c, "#", ""))
            + F.size(F.split(c, r"\.\.\.")) - 1
        )
        / n,
        4,
    )
    caps_frac = det_round_col(
        F.size(F.filter(toks, lambda x: x.rlike("^[A-Z]+$"))) / n, 4
    )
    lower = F.lower(c)
    has_lorem = lower.contains("lorem ipsum")
    has_brace = c.contains("{")
    has_boiler = lower.contains("javascript") | lower.contains("cookie")
    flags = {
        "flag_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "flag_alpha": alpha_frac >= 0.8,
        "flag_symbol": sym_ratio <= 0.1,
        "flag_caps": caps_frac <= 0.2,
        "flag_no_lorem": ~has_lorem,
        "flag_no_brace": ~has_brace,
        "flag_no_boiler": ~has_boiler,
    }
    keep = None
    for f in flags.values():
        keep = f if keep is None else (keep & f)
    return df.select(
        id_col,
        F.size(toks).alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        sym_ratio.alias("symbol_ratio"),
        caps_frac.alias("caps_frac"),
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )
