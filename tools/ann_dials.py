"""ANN dials sweep: recall@10 of IVF-PQ (+ exact re-rank) as a function
of nprobe and shortlist at fixed auto-sized n_cells — the measurement
behind the dials table in NOTES.md and the recall@10 >= 0.8 operating
point the r9 VERDICT asked for.

Usage: python tools/ann_dials.py [sf_dir]
Prints one line per (nprobe, shortlist) arm plus the truth/ceiling
context. Shares one fine codebook/codes and one coarse book across all
arms (the ann_recall_prod_audit discipline), so the sweep costs
training ONCE plus the cheap per-arm searches.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wallaroo_spark.operators import similarity as S
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    topk = 10
    spark = get_spark("ann-dials")
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    qs = emb.filter(F.col("vec_id") < 10)

    n = corpus.count()
    auto = S.ivf_auto_size(n, topk)
    nc = auto["n_cells"]
    print(f"corpus n={n}  auto: n_cells={nc} nprobe={auto['nprobe']}")

    qv = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    )
    exact = corpus.crossJoin(F.broadcast(qv)).select(
        "query_id", "vec_id",
        F.round(S._sqdist(F.col("embedding").cast("array<double>"),
                          F.col("_qv")), 6).alias("_d"),
    )
    w = Window.partitionBy("query_id").orderBy("_d", "vec_id")
    truth = (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    n_true = truth.count()

    cb = S.pq_train(emb, iters=2)
    codes = S.pq_encode(corpus, cb).localCheckpoint(eager=True)
    coarse = S.pq_train(emb, m=1, sub_dim=64, k=nc, iters=2).localCheckpoint(
        eager=True
    )
    cells = (
        S.pq_encode(corpus, coarse, m=1, sub_dim=64)
        .select("vec_id", F.element_at("codes", 1).alias("_cell"))
        .localCheckpoint(eager=True)
    )

    def recall(df):
        approx = df.select("query_id", "vec_id")
        hit = truth.join(approx, ["query_id", "vec_id"], "left_semi").count()
        return hit / n_true

    # cell-coverage ceiling per nprobe: |truth ∩ probed cells| / |truth| —
    # exactly what exact re-rank converges to as the shortlist grows (a
    # truth member in a probed cell can only rank BETTER within the
    # candidate subset), computed as cheap joins instead of an unbounded-
    # shortlist rerank whose candidate frame would be driver-broadcast
    ccb = coarse.select(
        F.col("cent_id").alias("_cell"), F.col("centroid").alias("_cv")
    )
    qv2 = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    )
    ranked_cells = (
        qv2.crossJoin(F.broadcast(ccb))
        .select(
            "query_id", "_cell",
            F.round(S._sqdist(F.col("_qv"), F.col("_cv")), 6).alias("_pd"),
        )
        .withColumn(
            "_pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("_pd", "_cell")
            ),
        )
        .localCheckpoint(eager=True)  # Q x n_cells rows
    )
    truth_cells = truth.join(cells, "vec_id")  # truth member -> its cell

    for nprobe in sorted({auto["nprobe"], 8, 11, 16, 22, nc // 2}):
        if nprobe < 1 or nprobe > nc:
            continue
        probed = ranked_cells.filter(F.col("_pr") <= nprobe).select(
            "query_id", "_cell"
        )
        ceil = (
            truth_cells.join(probed, ["query_id", "_cell"], "left_semi").count()
            / n_true
        )
        print(f"nprobe={nprobe:3d}  scan={nprobe/nc:5.1%}  "
              f"cell-coverage ceiling={ceil:.3f}")
        for shortlist in (60, 120, 200):
            r = recall(
                S.ivfpq_topk_rerank(
                    emb, corpus, qs, topk=topk, shortlist=shortlist,
                    n_cells=nc, nprobe=nprobe,
                    coarse=coarse, fine=cb, cells=cells, codes=codes,
                )
            )
            print(f"    shortlist={shortlist:4d}  recall@10={r:.3f}")


if __name__ == "__main__":
    main()
