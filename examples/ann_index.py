"""Persisted ANN index: build once, probe many — the IVF lifecycle as a
system, composed from the engine's pieces.

    build:   k-means fit -> assign every corpus vector to a centroid ->
             commit BOTH tables (centroids, assignments) in ONE
             MultiManifestTable transaction (readers see a complete
             index or none; time travel rolls the pair back together)
    refresh: new vectors assign against the FROZEN centroids and append
             as a new manifest version (the standard IVF maintenance
             pattern: postings grow, centroids re-fit rarely)
    refit:   `drift_stats` measures what fraction of vectors would move
             under freshly-fit centroids (one broadcast assign pass);
             `refit_index` swaps BOTH tables atomically only when drift
             exceeds the threshold — the re-fit-rarely policy, automated
    query:   load the index, probe with `ivf_topk(corpus_assigned=...)` —
             the corpus-side assignment is never recomputed
    PQ:      `build_pq_index` commits the compressed form of the same
             lifecycle — coarse + fine codebooks and the 4-byte codes
             (the ONLY corpus-sized artifact, 128x smaller than float64)
             in one transaction; `probe_pq_index` scores incoming
             vectors (batch OR stream — `similarity.ivfpq_probe` is
             stateless per micro-batch) against the frozen index

At 100 TB the assignments table is the big artifact (written once,
partitionable by cent_id for co-located probes); centroids are k rows.

Run: python examples/ann_index.py [sf_dir] [index_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.operators import similarity
from wallaroo_spark.sinks.manifest import MultiManifestTable
from wallaroo_spark.sources import read_table


def _assign(vectors, cents):
    """Nearest-centroid assignment — the ONE shared rule
    (`similarity.assign_nearest`), so the persisted index can never
    desynchronize from the in-engine assignment/oracle contract."""
    return similarity.assign_nearest(vectors, cents)


def build_index(spark, corpus, index_dir: str, k: int = 6, iters: int = 2):
    """Fit centroids, assign the corpus, commit BOTH tables in one
    MultiManifestTable transaction — the index is readable only as a
    consistent whole, and per-table compaction keeps the (large)
    assignments table tidy without rewriting centroids."""
    cents = similarity.kmeans_fit(corpus, k=k, iters=iters)
    assigned = _assign(corpus, cents)
    t = MultiManifestTable(index_dir)
    t.append_multi(
        {
            "centroids": cents.select(
                "cent_id", F.col("embedding").cast("array<double>").alias("embedding")
            ),
            "assignments": assigned.select("vec_id", "embedding", "cent_id"),
        }
    )
    return t


def refresh_index(spark, t: MultiManifestTable, new_vectors):
    """Append new vectors under the FROZEN centroids (one manifest version)."""
    cents = load_centroids(spark, t)
    assigned = _assign(new_vectors, cents)
    t.append_multi(
        {"assignments": assigned.select("vec_id", "embedding", "cent_id")}
    )


def load_centroids(spark, t: MultiManifestTable):
    return t.read(spark, "centroids").select("cent_id", "embedding")


def load_assignments(spark, t: MultiManifestTable):
    return t.read(spark, "assignments").select("vec_id", "embedding", "cent_id")


def drift_stats(spark, t: MultiManifestTable, new_cents):
    """Per-centroid drift under candidate centroids: (cent_id, n_vecs,
    n_drifted) — ONE broadcast-centroid assign pass over the persisted
    assignments, no index mutation. The monitoring signal behind the
    re-fit-rarely policy."""
    cur = load_assignments(spark, t)
    re = similarity.assign_nearest(
        cur.select("vec_id", "embedding"), new_cents
    ).withColumnRenamed("cent_id", "_new_cent")
    joined = cur.select("vec_id", "cent_id").join(
        re.select("vec_id", "_new_cent"), "vec_id"
    )
    return joined.groupBy("cent_id").agg(
        F.count("*").alias("n_vecs"),
        F.sum((F.col("cent_id") != F.col("_new_cent")).cast("int")).alias("n_drifted"),
    )


def refit_index(
    spark,
    t: MultiManifestTable,
    k: int = 6,
    iters: int = 2,
    max_drift_frac: float = 0.2,
):
    """Drift-gated re-fit: fit fresh centroids on the CURRENT postings,
    measure what fraction of vectors would move, and only when it exceeds
    ``max_drift_frac`` swap centroids + re-assigned postings ATOMICALLY
    (overwrite_multi — readers see the old consistent index or the new
    one, never a mix). Below the threshold the index is left untouched
    (returns None) — centroid re-fits are the expensive rare event, drift
    measurement is one cheap broadcast pass."""
    cur = load_assignments(spark, t)
    vectors = cur.select("vec_id", "embedding")
    new_cents = similarity.kmeans_fit(vectors, k=k, iters=iters)
    stats = drift_stats(spark, t, new_cents).agg(
        F.sum("n_vecs").alias("n"), F.sum("n_drifted").alias("d")
    ).first()
    if stats["n"] == 0 or stats["d"] / stats["n"] <= max_drift_frac:
        return None
    assigned = similarity.assign_nearest(vectors, new_cents)
    return t.overwrite_multi(
        {
            "centroids": new_cents.select(
                "cent_id", F.col("embedding").cast("array<double>").alias("embedding")
            ),
            "assignments": assigned.select("vec_id", "embedding", "cent_id"),
        }
    )


def query_index(spark, t: MultiManifestTable, queries, k: int = 3, nprobe: int = 2):
    """Probe the persisted index: no corpus-side assignment recompute."""
    return similarity.ivf_topk(
        corpus=None,
        queries=queries,
        centroids=load_centroids(spark, t).withColumnRenamed("cent_id", "vec_id"),
        k=k,
        nprobe=nprobe,
        corpus_assigned=load_assignments(spark, t),
    )


def build_pq_index(
    spark,
    train,
    corpus,
    index_dir: str,
    n_cells: int = 8,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    opq: bool | str = False,
    packed: bool = True,
):
    """Commit the compressed IVF-PQ index: coarse codebook (n_cells
    rows), fine codebook (m*k rows), and the coded corpus
    (vec_id, codes, cell — 4 bytes/vector at this geometry) in ONE
    MultiManifestTable transaction. At 100 TB the codes table is the only
    corpus-sized artifact; both codebooks are broadcast-sized forever.

    ``opq`` selects the learned orthogonal pre-transform, fitted on the
    train set and committed as a table in the SAME transaction — the
    transform is part of the index (codes are meaningless without it),
    so it must version atomically with the codebooks; `probe_pq_index`
    applies it to incoming queries automatically (stream-safe):

      * ``True`` / ``"perm"`` — OPQ-lite variance-balancing dimension
        permutation (table ``pq_perm``);
      * ``"rot"`` — FULL parametric OPQ rotation
        (`similarity.opq_fit_rotation`, driver-side eigensolve; table
        ``pq_rot`` = d rows of (row_idx, coeffs), the d x d matrix).
    """
    d = m * sub_dim
    tables = {}
    if opq == "rot":
        rot = similarity.opq_fit_rotation(train, m=m, sub_dim=sub_dim)
        train = similarity.apply_rotation(train, rot)
        corpus = similarity.apply_rotation(corpus, rot)
        tables["pq_rot"] = spark.createDataFrame(
            [(i, row) for i, row in enumerate(rot)],
            "row_idx int, coeffs array<double>",
        )
    elif opq:
        perm = similarity.opq_fit_permutation(train, m=m, sub_dim=sub_dim)
        train = similarity.apply_dim_permutation(train, perm)
        corpus = similarity.apply_dim_permutation(corpus, perm)
        tables["pq_perm"] = perm
    coarse = similarity.pq_train(train, m=1, sub_dim=d, k=n_cells, iters=2)
    fine = similarity.pq_train(train, m=m, sub_dim=sub_dim, k=k, iters=2)
    cells = similarity.pq_encode(corpus, coarse, m=1, sub_dim=d).select(
        "vec_id", F.element_at("codes", 1).alias("cell")
    )
    codes = similarity.pq_encode(corpus, fine, m=m, sub_dim=sub_dim)
    if packed:  # one INT32-sized word per vector — the production store
        codes = similarity.pq_pack_codes(codes, m=m, k=k)
    tables.update(
        {
            "pq_coarse": coarse,
            "pq_fine": fine,
            "pq_codes": codes.join(cells, "vec_id"),
        }
    )
    t = MultiManifestTable(index_dir)
    t.append_multi(tables)
    return t


def probe_pq_index(
    spark,
    t: MultiManifestTable,
    incoming,
    nprobe: int = 3,
    topk: int | None = 3,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
):
    """Score incoming query vectors against the persisted PQ index —
    `incoming` may be a STREAM (the probe is a stateless stream-static
    join; pass ``topk=None`` and apply `topk_cut` per micro-batch via
    foreachBatch, exactly as tests/test_pq.py's parity test does) or a
    batch frame (cut inline). An OPQ index (pq_perm or pq_rot table
    present) transforms incoming vectors first — in-row, stream-safe."""
    if topk is not None and incoming.isStreaming:
        # the inline cut is a global row_number window — not stream-
        # expressible; fail here with the recipe instead of letting
        # Spark raise an opaque AnalysisException at plan time
        raise ValueError(
            "probe_pq_index: topk cut is a global rank and cannot run on a "
            "streaming input — pass topk=None and apply similarity.topk_cut "
            "per micro-batch via foreachBatch"
        )
    if t.table_files("pq_rot"):
        rot = [
            list(r["coeffs"])
            for r in sorted(
                t.read(spark, "pq_rot").collect(),
                key=lambda r: int(r["row_idx"]),
            )
        ]
        incoming = similarity.apply_rotation(incoming, rot)
    elif t.table_files("pq_perm"):
        incoming = similarity.apply_dim_permutation(
            incoming, t.read(spark, "pq_perm")
        )
    scored = similarity.ivfpq_probe(
        incoming,
        t.read(spark, "pq_coarse"),
        t.read(spark, "pq_fine"),
        t.read(spark, "pq_codes"),
        nprobe=nprobe,
        m=m,
        sub_dim=sub_dim,
        k=k,
    )
    return similarity.topk_cut(scored, topk) if topk is not None else scored


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
    pq_t = build_pq_index(
        spark, emb, emb.filter(F.col("vec_id") >= 10), index_dir + "_pq"
    )
    probe_pq_index(spark, pq_t, emb.filter(F.col("vec_id") < 10)).show()
    rot_t = build_pq_index(
        spark, emb, emb.filter(F.col("vec_id") >= 10), index_dir + "_rot",
        opq="rot",
    )
    probe_pq_index(spark, rot_t, emb.filter(F.col("vec_id") < 10)).show()
    print(
        f"indexes committed under {index_dir}, {index_dir}_pq "
        f"and {index_dir}_rot (full-OPQ)"
    )
