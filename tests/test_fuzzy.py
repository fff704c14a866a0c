"""Fuzzy (edit-distance) join: SymSpell deletion-neighborhood blocking +
exact levenshtein verify (`operators/fuzzy.py`). The property under test
is COMPLETENESS — blocking must never lose a pair the brute-force O(n²)
definition finds — plus the bounding guards (max_len drop, null drop)."""

import random

import pytest
from pyspark.sql import functions as F

from wallaroo_spark.operators import fuzzy


def _typo_vocab(seed=7, n_base=120, alphabet="abcdef"):
    random.seed(seed)
    base = [
        "".join(random.choice(alphabet) for _ in range(random.randint(4, 10)))
        for _ in range(n_base)
    ]
    typo = []
    for w in base[:40]:
        i = random.randrange(len(w))
        typo.append(w[:i] + random.choice(alphabet) + w[i:])  # insertion
        typo.append(w[:i] + w[i + 1:])  # deletion
        typo.append(w[:i] + random.choice("xyz") + w[i + 1:])  # substitution
    return base, typo


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_self_join_matches_brute_force(spark, k):
    """Blocking completeness at k=1 and k=2: pair set == brute force."""
    base, typo = _typo_vocab()
    vocab = sorted(set(base + typo))
    df = spark.createDataFrame([(w,) for w in vocab], "tok string")
    got = sorted(map(tuple, fuzzy.fuzzy_self_join(df, "tok", k=k).collect()))
    a = df.select(F.col("tok").alias("tok_a"))
    b = df.select(F.col("tok").alias("tok_b"))
    want = sorted(
        map(
            tuple,
            a.crossJoin(b)
            .where(F.col("tok_a") < F.col("tok_b"))
            .withColumn("dist", F.levenshtein("tok_a", "tok_b"))
            .where(F.col("dist") <= k)
            .collect(),
        )
    )
    assert got == want and len(got) > 50
    # every distance is in 1..k (no self-pairs, no over-distance leaks)
    assert all(1 <= d <= k for _, _, d in got)


def test_fuzzy_two_table_join_matches_brute_force(spark):
    base, typo = _typo_vocab(seed=11)
    typo.append(base[0])  # one exact cross-side match pins the dist=0 path
    l = spark.createDataFrame([(w,) for w in sorted(set(base))], "x string")
    r = spark.createDataFrame([(w,) for w in sorted(set(typo))], "y string")
    got = sorted(map(tuple, fuzzy.fuzzy_join(l, r, "x", "y", k=1).collect()))
    want = sorted(
        map(
            tuple,
            l.crossJoin(r)
            .withColumn("dist", F.levenshtein("x", "y"))
            .where(F.col("dist") <= 1)
            .select(F.col("x").alias("x_a"), F.col("y").alias("y_b"), "dist")
            .collect(),
        )
    )
    assert got == want and len(got) > 30
    # dist 0 pairs (same string on both sides) ARE matches in the 2-table form
    assert any(d == 0 for _, _, d in got)


def test_fuzzy_guards_max_len_null_duplicates(spark):
    rows = [("abcd",), ("abce",), (None,), ("x" * 30,), ("abcd",)]
    df = spark.createDataFrame(rows, "tok string")
    got = fuzzy.fuzzy_self_join(df, "tok", k=1, max_len=24).collect()
    # nulls and >max_len dropped; duplicate strings deduped (one pair)
    assert [tuple(r) for r in got] == [("abcd", "abce", 1)]
    with pytest.raises(ValueError, match="k must be 1 or 2"):
        fuzzy.fuzzy_self_join(df, "tok", k=3)
    # fuzzy_lookup refuses inputs that collide with its outputs/join key
    clash = df.withColumnRenamed("tok", "_var")
    with pytest.raises(ValueError, match="_var"):
        fuzzy.fuzzy_lookup(clash, "_var", df, "tok")


def test_deletion_variant_counts(spark):
    """k=1 neighborhood is exactly len+1 variants for a repeat-free
    string; duplicates from repeated chars are collapsed."""
    df = spark.createDataFrame([("abcd",), ("aaaa",)], "s string")
    out = {
        r["s"]: sorted(r["v"])
        for r in df.select(
            "s", fuzzy.deletion_variants(F.col("s"), 1).alias("v")
        ).collect()
    }
    assert sorted(out["abcd"]) == sorted(["abcd", "bcd", "acd", "abd", "abc"])
    assert sorted(out["aaaa"]) == ["aaa", "aaaa"]


def test_fuzzy_lookup_keeps_payload_and_matches(spark):
    base, typo = _typo_vocab(seed=3)
    vocab = spark.createDataFrame([(w,) for w in sorted(set(base))], "term string")
    events = spark.createDataFrame(
        [(i, w) for i, w in enumerate(typo + [None, "z" * 30])],
        "event_id long, key string",
    )
    got = fuzzy.fuzzy_lookup(events, "key", vocab, "term", k=1)
    rows = got.collect()
    # null / over-max_len keys never match; payload column rides through
    assert set(got.columns) == {"event_id", "key", "match", "dist"}
    assert all(r.key is not None and len(r.key) <= 24 for r in rows)
    # parity with the brute-force definition, INCLUDING duplicate rows
    want = sorted(
        map(
            tuple,
            events.where(F.col("key").isNotNull())
            .crossJoin(vocab)
            .withColumn("dist", F.levenshtein("key", "term"))
            .where(F.col("dist") <= 1)
            .select("event_id", "key", F.col("term").alias("match"), "dist")
            .collect(),
        )
    )
    assert sorted(map(tuple, rows)) == want and len(want) > 50


def test_fuzzy_lookup_streaming_matches_batch(spark, tmp_path):
    """The lookup is fully stateless (in-row explode, stream-static join,
    in-row once-per-pair dedup + verify), so it runs on a STREAMING
    DataFrame with no watermark or state store — and must emit exactly
    the batch result."""
    base, typo = _typo_vocab(seed=5)
    vocab = spark.createDataFrame([(w,) for w in sorted(set(base))], "term string")
    events = spark.createDataFrame(
        [(i, w) for i, w in enumerate(typo)], "event_id long, key string"
    )
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    events.write.parquet(src)

    batch = sorted(
        map(tuple, fuzzy.fuzzy_lookup(events, "key", vocab, "term", k=1).collect())
    )

    sdf = spark.readStream.schema("event_id long, key string").parquet(src)
    out = fuzzy.fuzzy_lookup(sdf, "key", vocab, "term", k=1)
    assert out.isStreaming
    got = []
    q = (
        out.writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(map(tuple, got)) == batch and len(batch) > 30
