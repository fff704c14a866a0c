"""Fuzzy-join scale exponent — measure, don't assume.

The deletion-neighborhood join's cost model is O(n · len^k) exploded
keys through one hash shuffle (plus the irreducible candidate mass).
Verify the exponent on synthetic name keys at n and 10n: serial-number
strings ("Item#%09d" — the dense-neighbor adversarial shape, every name
has ~dozens of true ed-1 neighbors), k=1. Exponent = log(t10/t1)/log(10)
should sit near 1.0; the brute-force alternative is exactly 2.0.

Usage: python tools/fuzzy_scale_study.py [out.json]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from wallaroo_spark.operators import fuzzy  # noqa: E402


def run(spark, n: int) -> tuple[float, int]:
    df = spark.range(n).select(
        F.format_string("Item#%09d", F.col("id")).alias("name")
    )
    out = fuzzy.fuzzy_self_join(df, "name", k=1)
    t0 = time.perf_counter()
    n_pairs = out.count()
    return time.perf_counter() - t0, n_pairs


def main() -> None:
    from wallaroo_spark.session import get_spark

    spark = get_spark("fuzzy-scale")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, 1000)  # warm-up
    results = {}
    for n in (10_000, 100_000):
        t, pairs = zip(*[run(spark, n) for _ in range(2)])  # min-of-2
        results[f"n={n}"] = {"sec": round(min(t), 2), "pairs": pairs[0]}
        print(n, results[f"n={n}"], flush=True)
    e = math.log(
        results["n=100000"]["sec"] / results["n=10000"]["sec"]
    ) / math.log(10)
    results["exponent"] = round(e, 2)
    print("exponent:", results["exponent"])
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
