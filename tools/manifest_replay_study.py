"""Manifest metadata cost at production file counts — measure, don't assume.

VERDICT r12 #2: `table_files` replays the manifest log per probe; with
partitioned appends the adds lists grow multiplicatively (one file per
touched cell per refresh). This study synthesizes a manifest — log entries
only, no parquet data, since replay/prune never open data files — at
1e4-1e5 committed files and times the three driver-side operations every
pruned probe pays:

  replay      full snapshot_files() log replay (checkpoint-seeded or not)
  prune       table_files(parts={"cell": [26 cells]}) partition filtering
  counts      part_file_counts() (the compaction-budget check)

Geometries mirror the production ANN shape: n_cells cells, R refreshes,
one file per cell per refresh (the post-round-13 bounded write path).

Usage: python tools/manifest_replay_study.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wallaroo_spark.sinks.manifest import MultiManifestTable  # noqa: E402


def build_synthetic(base: str, n_cells: int, refreshes: int,
                    checkpoint_interval: int | None) -> MultiManifestTable:
    t = MultiManifestTable(base, checkpoint_interval=checkpoint_interval)
    for r in range(refreshes):
        adds = [
            os.path.join(
                t._data, "pq_codes", f"stage{r:04d}",
                f"_wsp_cell={c}", f"part-{r:04d}-{c:05d}.parquet",
            )
            for c in range(n_cells)
        ]
        t._commit(adds=adds, removes=[])
    return t


def timeit(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def study(n_cells: int, refreshes: int, checkpoint_interval: int | None) -> dict:
    base = tempfile.mkdtemp(prefix="replay_study_")
    try:
        t = build_synthetic(base, n_cells, refreshes, checkpoint_interval)
        probe_cells = list(range(0, n_cells, max(1, n_cells // 26)))[:26]
        n_files = n_cells * refreshes
        out = {
            "n_cells": n_cells,
            "refreshes": refreshes,
            "n_files": n_files,
            "checkpoint_interval": checkpoint_interval,
            "replay_s": round(timeit(lambda: t.snapshot_files()), 4),
            "prune_s": round(
                timeit(
                    lambda: t.table_files("pq_codes", parts={"cell": probe_cells})
                ),
                4,
            ),
            "counts_s": round(timeit(lambda: t.part_file_counts("pq_codes")), 4),
        }
        pruned = t.table_files("pq_codes", parts={"cell": probe_cells})
        out["pruned_files"] = len(pruned)
        out["pruned_frac"] = round(len(pruned) / n_files, 4)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    rows = []
    for n_cells, refreshes, ck in [
        (100, 100, None),      # 1e4 files, raw log
        (100, 100, 20),        # 1e4 files, checkpointed
        (1000, 100, None),     # 1e5 files, raw log
        (1000, 100, 20),       # 1e5 files, checkpointed
        (10000, 10, 5),        # 1e5 files, wide cells (bucketing target)
    ]:
        r = study(n_cells, refreshes, ck)
        rows.append(r)
        print(json.dumps(r))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
