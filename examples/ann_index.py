"""Persisted ANN index: build once, probe many — the IVF lifecycle as a
system, composed from the engine's pieces.

    build:   k-means fit -> assign every corpus vector to a centroid ->
             write BOTH tables (centroids, assignments) into ONE
             ManifestTable atomically (readers see a complete index or
             none)
    refresh: new vectors assign against the FROZEN centroids and append
             as a new manifest version (the standard IVF maintenance
             pattern: postings grow, centroids re-fit rarely)
    query:   load the index, probe with `ivf_topk(corpus_assigned=...)` —
             the corpus-side assignment is never recomputed

At 100 TB the assignments table is the big artifact (written once,
partitionable by cent_id for co-located probes); centroids are k rows.

Run: python examples/ann_index.py [sf_dir] [index_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.operators import similarity
from wallaroo_spark.sinks.manifest import ManifestTable
from wallaroo_spark.sources import read_table


def _assign(vectors, cents):
    """Nearest-centroid assignment — the ONE shared rule
    (`similarity.assign_nearest`), so the persisted index can never
    desynchronize from the in-engine assignment/oracle contract."""
    return similarity.assign_nearest(vectors, cents)


def build_index(spark, corpus, index_dir: str, k: int = 6, iters: int = 2):
    """Fit centroids, assign the corpus, commit both as one atomic version.
    Both tables live in one manifest (tagged by a `kind` column) so the
    index is readable only as a consistent whole."""
    cents = similarity.kmeans_fit(corpus, k=k, iters=iters)
    assigned = _assign(corpus, cents)
    t = ManifestTable(index_dir)
    bundle = assigned.select(
        F.lit("assign").alias("kind"), "vec_id", "embedding", "cent_id"
    ).unionByName(
        cents.select(
            F.lit("cent").alias("kind"),
            F.col("cent_id").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("cent_id"),
        )
    )
    t.append(bundle)
    return t


def refresh_index(spark, t: ManifestTable, new_vectors):
    """Append new vectors under the FROZEN centroids (one manifest version)."""
    cents = load_centroids(spark, t)
    assigned = _assign(new_vectors, cents)
    t.append(
        assigned.select(F.lit("assign").alias("kind"), "vec_id", "embedding", "cent_id")
    )


def load_centroids(spark, t: ManifestTable):
    return t.read(spark).filter(F.col("kind") == "cent").select("cent_id", "embedding")


def load_assignments(spark, t: ManifestTable):
    return t.read(spark).filter(F.col("kind") == "assign").select(
        "vec_id", "embedding", "cent_id"
    )


def query_index(spark, t: ManifestTable, queries, k: int = 3, nprobe: int = 2):
    """Probe the persisted index: no corpus-side assignment recompute."""
    return similarity.ivf_topk(
        corpus=None,
        queries=queries,
        centroids=load_centroids(spark, t).withColumnRenamed("cent_id", "vec_id"),
        k=k,
        nprobe=nprobe,
        corpus_assigned=load_assignments(spark, t),
    )


if __name__ == "__main__":
    import tempfile

    from wallaroo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="annidx_")
    spark = get_spark("ann-index")
    emb = read_table(spark, sf_dir, "embeddings")
    t = build_index(spark, emb.filter(F.col("vec_id") >= 10), index_dir)
    out = query_index(spark, t, emb.filter(F.col("vec_id") < 10))
    out.show()
    print(f"index committed under {index_dir}")
