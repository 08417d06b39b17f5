"""Physical-plan audit utilities.

The perf contract for every operator in this engine ("is this the
plan I'd want at 100 TB?") is checkable, not aspirational: audit_plan
inspects the executed plan for the properties that matter at scale —
filters reaching the scan, broadcast vs shuffle joins, Python-UDF
nodes in the hot path, cartesian products — so tests can assert them
and regressions fail loudly instead of shipping as silent slowdowns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanAudit:
    """Summary of the scale-relevant properties of a physical plan."""

    shuffles: int
    broadcast_hash_joins: int
    sort_merge_joins: int
    broadcast_nested_loop_joins: int
    cartesian_products: int
    python_row_udfs: int
    arrow_python_nodes: int
    whole_stage_codegen_spans: int
    pushed_filters: tuple[str, ...] = field(default=())
    scans: int = 0
    single_partition_exchanges: int = 0

    @property
    def python_free_hot_path(self) -> bool:
        """True when no row-at-a-time Python UDF appears anywhere."""
        return self.python_row_udfs == 0

    @property
    def join_strategies(self) -> dict[str, int]:
        return {
            "broadcast_hash": self.broadcast_hash_joins,
            "sort_merge": self.sort_merge_joins,
            "broadcast_nested_loop": self.broadcast_nested_loop_joins,
            "cartesian": self.cartesian_products,
        }


def audit_plan(df: DataFrame) -> PlanAudit:
    """Audit the executed (post-AQE-planning) physical plan of ``df``."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Post-execution AQE plans render "== Final Plan ==" followed by
    # "== Initial Plan ==" — audit only the final section, or every
    # node double-counts.
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    # Spark abbreviates long plan fields with "...", so the filter list
    # may not have a closing bracket — capture up to it or the next field.
    pushed = tuple(
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|, ReadSchema)", plan)
        if m.group(1).strip()
    )
    return PlanAudit(
        shuffles=plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        broadcast_nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        python_row_udfs=plan.count("BatchEvalPython"),
        arrow_python_nodes=plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        whole_stage_codegen_spans=max(
            len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
            len(set(re.findall(r"\*\((\d+)\)", plan))),  # executed-plan marker
        ),
        pushed_filters=pushed,
        scans=plan.count("FileScan"),
        single_partition_exchanges=plan.count("Exchange SinglePartition"),
    )
