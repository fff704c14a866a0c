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
        .orderBy(F.round("model_score", 4).desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            "retrieval_score",
            F.round("model_score", 4).alias("model_score"),
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
