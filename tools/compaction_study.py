"""Partial vs full compaction cost — measure, don't assume.

Round 13 replaced the budget-triggered full-table `compact_table` with
the partition-scoped `compact_partitions` (only over-budget directories
rewrite). The claim to verify: maintenance cost fired from a streaming
micro-batch or an index refresh is O(hot directories), independent of
table size — at 10x the directory count, partial compaction of ONE hot
directory should cost ~the same, while a full rewrite scales ~10x.

Setup: a real MultiManifestTable with D cell directories at `cold_files`
files each, plus ONE hot cell pushed past the budget; time
  partial   compact_partitions(budget)   (rewrites the one hot dir)
  full      compact_table()              (rewrites all D dirs)
at D and 10xD. Small rows keep data volume trivial so the measured cost
is the file/task overhead that dominates small-file maintenance.

Usage: python tools/compaction_study.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wallaroo_spark.sinks.manifest import MultiManifestTable  # noqa: E402


def build(spark, base: str, n_dirs: int, cold_files: int, hot_files: int):
    t = MultiManifestTable(base)
    df = spark.range(n_dirs * 4).select(
        F.col("id").alias("i"), (F.col("id") % n_dirs).alias("cell")
    )
    for _ in range(cold_files):
        t.append_multi({"codes": df}, partition_by={"codes": "cell"})
    hot = df.filter(F.col("cell") == 0)
    for _ in range(hot_files - cold_files):
        t.append_multi({"codes": hot}, partition_by={"codes": "cell"})
    return t


def run(spark, n_dirs: int, budget: int) -> dict:
    out: dict[str, float] = {}
    for mode in ("partial", "full"):
        d = tempfile.mkdtemp(prefix=f"cmp_{mode}_")
        t = build(spark, d, n_dirs, cold_files=budget, hot_files=budget + 2)
        t0 = time.perf_counter()
        if mode == "partial":
            v = t.compact_partitions("codes", budget=budget)
        else:
            v = t.compact_table("codes")
        out[mode] = round(time.perf_counter() - t0, 3)
        assert v is not None
        counts = t.part_file_counts("codes")
        assert max(counts.values()) <= budget, counts
        shutil.rmtree(d, ignore_errors=True)
    out["ratio_full_over_partial"] = round(out["full"] / out["partial"], 2)
    return out


def main() -> None:
    from wallaroo_spark.session import get_spark

    spark = get_spark("compaction-study")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n_dirs in (40, 400):
        results[f"dirs={n_dirs}"] = run(spark, n_dirs, budget=2)
        print(n_dirs, results[f"dirs={n_dirs}"], flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
