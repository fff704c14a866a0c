"""Typo-tolerant fuzzy string matching: edit-distance joins with NO
cartesian product.

Deletion-neighborhood blocking (the SymSpell recipe — Garbe's public
symmetric-delete algorithm): any two strings within Levenshtein distance
``k`` share at least one common string in their delete-up-to-``k``
neighborhoods, so generating the neighborhoods map-side and equi-joining
on the variant yields a COMPLETE candidate set; an exact ``levenshtein``
verify then drops the false candidates (neighborhood overlap only bounds
the distance by 2k). Both stages are plain Catalyst operators — an
in-row ``transform`` explode and a hash-shuffle equi-join — so the cost
is O(n · len^k) candidates, never O(n²), and it parallelizes like any
other keyed join.

Candidate de-duplication (a pair sharing m>1 variants would emit m
rows) uses TWO mechanisms, chosen by measurement, not theory:
`fuzzy_join`/`fuzzy_self_join` dedupe with a plain ``distinct`` — on
dense serial-number keys at n=30k the in-row alternative below measured
89.7s vs 5.3s for distinct (the per-candidate neighborhood recompute
dwarfs a short-string shuffle; A/B in SCALE.md). `fuzzy_lookup` instead
dedupes IN-ROW via `_once_per_pair` (keep a candidate row only if its
join variant is the minimum of the pair's shared variant set,
recomputed in-row): there a distinct would be WRONG — identical payload
rows must not collapse — and statelessness is what makes the lookup
legal on a streaming DataFrame (stream-static join, no watermark, no
state store). The exact-verify filter runs BEFORE the in-row dedup
(3.4x measured — levenshtein's threshold early-exit kills most false
candidates cheaply).

Scale shape at 100 TB: the explode factor is len+1 variants at k=1 and
+C(len,2) at k=2, capped by ``max_len`` (longer strings are dropped, not
truncated — a truncated string would fabricate matches). Variant-bucket
skew mirrors `dedup.hamming_pairs`: a variant shared by m strings emits
C(m,2) candidate rows, which is the irreducible candidate set for that
bucket, not an artifact of the plan — and m is STRUCTURALLY bounded: the
strings sharing a length-L variant v at k=1 are v itself plus strings
reachable by one insertion into v, so m <= 1 + (L+1)·|alphabet| (a few
hundred for ASCII keys; k=2 squares the insertion term). The verify is
Spark's builtin ``levenshtein(_, _, threshold)`` with early exit.

Why this belongs in the engine: the reference's dedup surface is
set-similarity (shingles/MinHash — e.g. its token-set pipelines); an
edit-distance join is the character-level complement — OCR/typo
canonicalization of near-identical KEYS (vocab terms, entity names, IDs)
ahead of exact dedup, where Jaccard on shingles is the wrong metric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_self_join", "fuzzy_join", "fuzzy_lookup"]


def deletion_variants(c: Column, k: int = 1) -> Column:
    """array<string> of every string reachable from ``c`` by deleting up
    to ``k`` characters (including ``c`` itself), distinct. Pure
    expression — stays inside whole-stage codegen, no UDF."""
    if k not in (1, 2):
        raise ValueError(f"deletion_variants: k must be 1 or 2, got {k}")

    def _del_one(s: Column) -> Column:
        # delete the i-th char (1-based): substr(s,1,i-1) || substr(s,i+1)
        n = F.length(s)
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                F.substr(s, F.lit(1), i - F.lit(1)),
                F.substr(s, i + F.lit(1), n),
            ),
        )

    v1 = _del_one(c)
    parts = [F.array(c), v1]
    if k == 2:
        parts.append(F.flatten(F.transform(v1, _del_one)))
    return F.array_distinct(F.concat(*parts))


def _once_per_pair(a: Column, b: Column, var: Column, k: int) -> Column:
    """True on exactly ONE candidate row per (a, b) pair: the row whose
    join variant is the minimum of the pair's SHARED variant set,
    recomputed in-row — de-duplication without a distinct shuffle, and
    without state (streaming-legal)."""
    shared = F.array_intersect(deletion_variants(a, k), deletion_variants(b, k))
    return var == F.array_min(shared)


def _vocab_variants(df: DataFrame, col: str, out: str, k: int, max_len: int) -> DataFrame:
    toks = (
        df.select(F.col(col).alias(out))
        .where(F.col(out).isNotNull() & (F.length(out) <= max_len))
        .distinct()
    )
    return toks.select(
        out, F.explode(deletion_variants(F.col(out), k)).alias("_var")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int = 1,
    max_len: int = 24,
) -> DataFrame:
    """All (left, right) string pairs within Levenshtein distance ``k``,
    via deletion-neighborhood blocking + exact verify. Output columns:
    ``<left_col>_a``, ``<right_col>_b``, ``dist`` (0..k; equal strings
    pair at dist 0). Inputs are deduplicated on their string column —
    this is a VOCABULARY join; join payloads back on the string key (or
    use `fuzzy_lookup` to keep row payloads). Strings longer than
    ``max_len`` are dropped (documented cap on the explode factor), as
    are NULLs."""
    la, rb = f"{left_col}_a", f"{right_col}_b"
    cand = (
        _vocab_variants(left, left_col, la, k, max_len)
        .join(_vocab_variants(right, right_col, rb, k, max_len), "_var")
        .select(la, rb)
        .distinct()
    )
    dist = F.levenshtein(F.col(la), F.col(rb), k)
    return cand.select(la, rb, dist.alias("dist")).where(F.col("dist") >= 0)


def fuzzy_self_join(
    df: DataFrame, col: str, k: int = 1, max_len: int = 24
) -> DataFrame:
    """All UNORDERED pairs of distinct strings in ``df[col]`` within
    Levenshtein distance ``k`` (``<col>_a < <col>_b`` lexicographically —
    each pair once, no self-pairs). Same blocking + verify as
    `fuzzy_join`; the candidate set is halved by the ordering predicate
    before the distinct, so the shuffle carries each pair once."""
    a, b = f"{col}_a", f"{col}_b"
    v = _vocab_variants(df, col, col, k, max_len)
    cand = (
        v.select(F.col(col).alias(a), "_var")
        .join(v.select(F.col(col).alias(b), "_var"), "_var")
        .where(F.col(a) < F.col(b))
        .select(a, b)
        .distinct()
    )
    dist = F.levenshtein(F.col(a), F.col(b), k)
    return cand.select(a, b, dist.alias("dist")).where(F.col("dist") > 0)


def fuzzy_lookup(
    df: DataFrame,
    col: str,
    vocab: DataFrame,
    vocab_col: str,
    k: int = 1,
    max_len: int = 24,
) -> DataFrame:
    """Match every ROW of ``df`` against a static vocabulary: output is
    ``df``'s columns plus ``match`` (the vocab string within distance
    ``k``) and ``dist`` — one row per (input row, vocab match), rows with
    no match dropped. ``df`` rows are NOT deduplicated (they are events,
    not a vocabulary); NULL / over-``max_len`` keys never match.

    Streaming twin for free: every stage is stateless (in-row variant
    explode, stream-static equi-join, in-row once-per-pair filter, in-row
    verify), so ``df`` may be a STREAMING DataFrame — no watermark, no
    state store, exact batch parity (pytest-pinned). The vocab side is
    sized like any broadcast dimension; at huge vocabularies the join
    degrades gracefully to a shuffled hash join on variants."""
    clash = {"match", "dist", "_var"} & set(df.columns)
    if clash:
        raise ValueError(
            f"fuzzy_lookup: input already has column(s) {sorted(clash)} "
            "(match/dist are outputs; _var is the internal join key)"
        )
    ex = df.where(
        F.col(col).isNotNull() & (F.length(col) <= max_len)
    ).select("*", F.explode(deletion_variants(F.col(col), k)).alias("_var"))
    vv = _vocab_variants(vocab, vocab_col, "match", k, max_len)
    out = (
        ex.join(vv, "_var")
        # verify FIRST: the threshold early-exit is far cheaper than the
        # in-row shared-neighborhood dedup it protects (3.4x measured)
        .withColumn("dist", F.levenshtein(F.col(col), F.col("match"), k))
        .where(F.col("dist") >= 0)
        .where(_once_per_pair(F.col(col), F.col("match"), F.col("_var"), k))
    )
    return out.drop("_var")
