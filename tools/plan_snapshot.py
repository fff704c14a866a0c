"""Regenerate PLANS.json — the committed plan-shape snapshot.

For every registered query (at sf0.001, the plan-test scale), record the
physical-plan scale metrics from `wallaroo_spark.plans.audit`:

    scans, exchanges, broadcast_joins, sort_merge_joins,
    nested_loop_joins, python_ops, windows, partitionless_windows

`tests/test_plans.py::test_plan_shape_no_regression` compares the live
plans against this file and fails on any SCALE REGRESSION (more shuffles,
new Python ops, new sort-merge/nested-loop joins, a partition-less
window) — so a plan can only get cheaper without a deliberate snapshot
update. Run this tool and commit the diff when a change is intentional;
the diff itself then documents the plan-shape change for review.

Usage: python tools/plan_snapshot.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

TRACKED = (
    "read_cols_total",
    "scans",
    "exchanges",
    "broadcast_joins",
    "sort_merge_joins",
    "nested_loop_joins",
    "python_ops",
    "windows",
    "partitionless_windows",
)


def snapshot(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    from wallaroo_spark.plans import audit
    from wallaroo_spark.queries import QUERIES

    out: dict[str, dict[str, int]] = {}
    for name in sorted(QUERIES):
        a = audit(QUERIES[name](spark, sf_dir))
        m = {k: getattr(a, k) for k in TRACKED if k != "read_cols_total"}
        # total columns leaving all scans: an increase = column-pruning
        # regression (a projection stopped reaching the reader)
        m["read_cols_total"] = sum(a.read_cols)
        out[name] = m
    return out


def main() -> None:
    from wallaroo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    snap = snapshot(spark, sf_dir)
    with open("/root/repo/PLANS.json", "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote PLANS.json ({len(snap)} queries)")


if __name__ == "__main__":
    main()
