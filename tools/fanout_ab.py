"""A/B harness for the fan_out scan-width floor: times each named query
(noop sink, guide §1.4) with the stock `_t` loader vs `_t` wrapped in
`fan_out` for the tables named in --tables. Usage:

  python tools/fanout_ab.py SF_DIR tableA,tableB QUERY [QUERY ...]

Emits one JSON line per query: {"query", "base_s": [...], "fan_s": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = {
    "events": ("event_id",),
    "embeddings": ("vec_id",),
    "documents": ("doc_id",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}


def main() -> None:
    sf_dir = sys.argv[1]
    tables = set(sys.argv[2].split(","))
    names = sys.argv[3:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from wallaroo_spark.session import get_spark

    spark = get_spark("fanout_ab")
    spark.sparkContext.setLogLevel("ERROR")

    import wallaroo_spark.queries as Q
    from wallaroo_spark.operators.fanout import fan_out

    orig_t = Q._t

    def fanned_t(s, d, name):
        df = orig_t(s, d, name)
        if name in tables:
            df = fan_out(df, *KEYS[name])
        return df

    # queries.py references both `_t` and bare `read_table`
    orig_rt = Q.read_table

    from wallaroo_spark.queries import QUERIES

    QUERIES["global_collect_agg"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = int(os.environ.get("AB_REPS", "2"))
    for name in names:
        out = {"query": name, "base_s": [], "fan_s": []}
        # interleave A/B to decorrelate from machine drift
        for _ in range(reps):
            for mode, label in ((orig_t, "base_s"), (fanned_t, "fan_s")):
                Q._t = mode
                Q.read_table = mode
                try:
                    spark.sparkContext.setJobDescription(f"ab:{name}:{label}")
                    t0 = time.perf_counter()
                    df = QUERIES[name](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    out[label].append(round(time.perf_counter() - t0, 3))
                finally:
                    Q._t = orig_t
                    Q.read_table = orig_rt
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
