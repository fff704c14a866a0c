"""Typo/OCR key canonicalization recipe at the engine surface.

A character-level pre-pass for exact dedup: keys that differ by one or
two edits (OCR noise, typos, serial-number transcription errors) are
clustered and rewritten to a canonical survivor, after which the plain
exact-dedup operators see them as identical. Set-similarity dedup
(shingles/MinHash) is the wrong metric for short keys — Jaccard over a
name's shingle set barely moves under a single character flip on a long
document, but a KEY is all signal; the edit-distance join is the right
tool.

The composition, all Catalyst operators (operators/fuzzy.py +
operators/dedup.py):

1. `fuzzy_self_join(vocab, k)` — every key pair within edit distance k
   (deletion-neighborhood blocking, no cartesian);
2. min-label connected components over the pair graph — the same
   iterative pointer-doubling loop duplicate_clusters uses, on a
   pairs-sized frame;
3. a canonical map (key -> min key of its component), broadcast-joined
   back to rewrite the corpus column in place.

CAVEAT (demonstrated by the demo run itself): canonicalization is
TRANSITIVE — components, not pairwise matches. On a DENSE key space
(consecutive serial numbers, e.g. this testdata's customer names) every
key chains to its neighbor and the whole space collapses to one
canonical, which is exactly what connected components means and exactly
not what you want there. The tool is for SPARSE typo noise — a corpus
where true variants are rare islands (the regime OCR/typo errors
produce) — or for pairwise use via `fuzzy_join` against a trusted
reference vocabulary instead of self-join CC. The same caveat applies
to MinHash cluster dedup; it is inherent to clustering, not to the
fuzzy join.

Run: python examples/fuzzy_canonicalize.py [sf_dir]
Prints the canonical map's cluster count and the row-count invariants.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from wallaroo_spark.operators import fuzzy


def canonical_map(vocab: DataFrame, col: str, k: int = 1) -> DataFrame:
    """(key, canonical) for every key that has at least one fuzzy
    neighbor; keys with no neighbor are their own canonical and are
    absent (the rewrite join treats them as identity). Canonical = the
    MINIMUM key of the connected component, found by iterative min-label
    propagation over the pairs graph (pairs-sized work, logarithmic
    rounds — the duplicate_clusters discipline, no driver-side graph)."""
    pairs = fuzzy.fuzzy_self_join(vocab, col, k=k).select(
        F.col(f"{col}_a").alias("src"), F.col(f"{col}_b").alias("dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = edges.groupBy("src").agg(
        F.least(F.min("dst"), F.min("src")).alias("lbl")
    ).persist()
    converged = False
    for _ in range(20):  # doubling => covers diameter 2^20, loop exits earlier
        prop = (
            edges.join(
                labels.select(F.col("src").alias("dst"), F.col("lbl").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("pl"))
        )
        # label-of-label pointer doubling: long chains (the dense serial
        # regime in the module caveat) converge in O(log diameter) rounds,
        # not O(diameter) — one-hop propagation alone would need a round
        # per hop and a silent cap would return split components
        dbl = labels.select(F.col("lbl").alias("dsrc"), F.col("src").alias("_via")).join(
            labels.select(F.col("src").alias("dsrc"), F.col("lbl").alias("dl")), "dsrc"
        ).select(F.col("_via").alias("src"), "dl")
        nxt = (
            labels.join(prop, "src", "left")
            .join(dbl, "src", "left")
            .select(
                "src",
                F.least(
                    "lbl", F.coalesce("pl", "lbl"), F.coalesce("dl", "lbl")
                ).alias("lbl"),
            )
            .persist()
        )
        changed = (
            nxt.join(labels.withColumnRenamed("lbl", "old"), "src")
            .where(F.col("lbl") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = nxt
        if changed == 0:
            converged = True
            break
    if not converged:  # pragma: no cover - 2^20 diameter is unreachable
        raise RuntimeError("canonical_map: label propagation did not converge")
    return labels.select(F.col("src").alias(col), F.col("lbl").alias("canonical"))


def canonicalize(df: DataFrame, col: str, k: int = 1) -> DataFrame:
    """Rewrite ``df[col]`` to each value's fuzzy-cluster canonical (values
    without a neighbor keep themselves). The map is vocabulary-sized —
    broadcast it; the corpus never shuffles."""
    cmap = canonical_map(df.select(col).distinct(), col, k=k)
    return (
        df.join(F.broadcast(cmap), col, "left")
        .withColumn(col, F.coalesce("canonical", F.col(col)))
        .drop("canonical")
    )


def main() -> None:
    from wallaroo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("fuzzy-canonicalize")
    spark.sparkContext.setLogLevel("ERROR")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = canonicalize(cust, "c_name", k=1)
    n_in, n_out = cust.count(), out.count()
    n_keys = out.select("c_name").distinct().count()
    print(f"rows {n_in} -> {n_out} (must match); distinct keys after "
          f"canonicalization: {n_keys}")
    assert n_in == n_out


if __name__ == "__main__":
    main()
