"""Plan inspection: make scale properties assertable.

A correct result with a wrong plan is a 100 TB incident waiting — these
helpers expose the physical-plan facts the engine's tests assert on:
filters reached the scan, dims broadcast, no stray shuffles, Python stays
out of hot paths.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    scans: int = 0
    read_cols: list[int] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    python_ops: int = 0
    text: str = ""


def audit(df: DataFrame) -> PlanAudit:
    # scan metadata (PushedFilters/ReadSchema) is truncated at 100 chars by
    # default, losing the closing bracket — widen it for the render
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "10000")
    plan = df._jdf.queryExecution().executedPlan().toString()
    a = PlanAudit(text=plan)
    a.scans = len(re.findall(r"FileScan parquet", plan))
    a.read_cols = [len(s.split(",")) for s in re.findall(r"ReadSchema: ([^\n ]+)", plan)]
    a.pushed_filters = [p for p in re.findall(r"PushedFilters: \[([^\]\n]*)", plan) if p]
    a.exchanges = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )
    a.broadcast_joins = plan.count("BroadcastHashJoin")
    a.sort_merge_joins = plan.count("SortMergeJoin")
    a.nested_loop_joins = plan.count("BroadcastNestedLoopJoin")
    a.python_ops = (
        plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("BatchEvalPython")
    )
    return a
