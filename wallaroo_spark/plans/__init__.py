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
    windows: int = 0
    partitionless_windows: int = 0
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
    # A Window with an empty partition spec funnels every input row through
    # ONE task (WindowExec's "No Partition Defined" path) — a serialization
    # point no plan should carry at scale. Counted from the optimized
    # logical plan, where partitionSpec is directly inspectable (the
    # physical string renders partition and order specs ambiguously).
    for node in _walk(df._jdf.queryExecution().optimizedPlan()):
        if node.nodeName() == "Window":
            a.windows += 1
            if node.partitionSpec().isEmpty():
                a.partitionless_windows += 1
    return a


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))
