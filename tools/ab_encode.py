"""A/B: pq_encode join-form vs in-row form (VERDICT r11 #5).

The question: corpus-side nearest-centroid assignment can run as
(a) "join"  — subvectors broadcast-join the codebook (N*m*k scored rows
              through codegen) + TWO partial-agg shuffles of N*m rows, or
(b) "inrow" — the bounded codebook collapses into one projection
              expression (per subspace an array_sort over k rounded
              (dist, cent_id) structs — `ivfpq_probe`'s shape): a pure
              map, zero shuffles, zero row generation.

Measures both at 1x / 10x / 30x the sf0.1 embeddings corpus for the two
geometries that matter (coarse: m=1, k=sqrt-N cells over the full dim;
fine: m=8, sub_dim=8, k=16), asserts code-for-code parity on the base
corpus, and prints one JSON line. Replication fabricates new vec_ids
deterministically (id*1000+rep) so runs are reproducible.

Run: python tools/ab_encode.py [sf_dir] [reps...]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.operators import similarity as S
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table


def replicate(emb, reps: int):
    if reps == 1:
        return emb
    return (
        emb.crossJoin(F.broadcast(
            emb.sparkSession.range(reps).select(F.col("id").alias("_rep"))
        ))
        .select(
            (F.col("vec_id") * 1000 + F.col("_rep")).alias("vec_id"),
            "embedding",
        )
    )


def timed(df):
    """Force the codes column itself (a bare count() would let Catalyst
    prune the in-row projection and time nothing)."""
    t0 = time.time()
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.element_at("codes", 1).cast("long")).alias("chk"),
    ).first()
    return round(time.time() - t0, 2), int(r["n"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps_list = [int(x) for x in sys.argv[2:]] or [1, 10, 30]
    spark = get_spark("ab-encode")
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    n = emb.count()
    n_cells = S.ivf_auto_size(n)["n_cells"]
    geos = {
        "coarse": dict(m=1, sub_dim=64, k=n_cells),
        "fine": dict(m=8, sub_dim=8, k=16),
    }
    out = {"sf_dir": sf_dir, "base_rows": n, "n_cells": n_cells, "runs": {}}

    for name, g in geos.items():
        cb = S.pq_train(
            emb, iters=2, **g,
            sample=(39 * n_cells if name == "coarse" else None),
        ).localCheckpoint(eager=True)
        # parity on the base corpus: identical codes row-for-row
        a = {r["vec_id"]: list(r["codes"]) for r in
             S.pq_encode(emb, cb, m=g["m"], sub_dim=g["sub_dim"],
                         method="join").collect()}
        b = {r["vec_id"]: list(r["codes"]) for r in
             S.pq_encode(emb, cb, m=g["m"], sub_dim=g["sub_dim"],
                         method="inrow").collect()}
        assert a == b, f"parity violation in {name}"
        for reps in reps_list:
            corpus = replicate(emb, reps).localCheckpoint(eager=True)
            res = {}
            for method in ("join", "inrow"):
                sec, cnt = timed(
                    S.pq_encode(corpus, cb, m=g["m"], sub_dim=g["sub_dim"],
                                method=method)
                )
                res[method] = sec
                assert cnt == n * reps
            res["speedup_inrow"] = round(res["join"] / max(res["inrow"], 1e-9), 2)
            out["runs"][f"{name}_x{reps}"] = res
            print(f"# {name}_x{reps}: {res}", flush=True)
            corpus.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
