"""Plan-inspection helpers: assert the physical plans we expect.

The reference has no optimizer to inspect (eager execution); here Catalyst
produces plans and these helpers make plan shape testable — filter pushdown
reached the scan, a join is broadcast, no single-partition exchange hides in
an 'order-dependent' operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF


def physical_plan(sdf: SDF) -> str:
    return sdf._jdf.queryExecution().executedPlan().toString()


def optimized_plan(sdf: SDF) -> str:
    return sdf._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(sdf: SDF) -> bool:
    """True if the parquet scan carries PushedFilters."""
    plan = physical_plan(sdf)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_columns(sdf: SDF) -> list[str]:
    """Columns in the scan ReadSchema (checks column pruning)."""
    import re

    plan = physical_plan(sdf)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0] for f in m.group(1).split(",") if f]

def uses_broadcast_join(sdf: SDF) -> bool:
    return "BroadcastHashJoin" in physical_plan(sdf) or "BroadcastNestedLoopJoin" in physical_plan(sdf)


def single_partition_exchanges(sdf: SDF) -> int:
    """Count SinglePartition exchanges — the scale smell for global windows."""
    return physical_plan(sdf).count("Exchange SinglePartition")


def unsafe_single_partition_exchanges(sdf: SDF) -> int:
    """SinglePartition exchanges whose child is NOT an aggregate.

    The block/carry two-pass scheme deliberately funnels per-block aggregates
    (#blocks rows) through one partition — bounded and safe. A SinglePartition
    exchange over non-aggregated data is the real scale hazard (a global
    window over every row)."""
    lines = physical_plan(sdf).splitlines()
    unsafe = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "HashAggregate" not in child and "SortAggregate" not in child and "ObjectHashAggregate" not in child:
            unsafe += 1
    return unsafe
