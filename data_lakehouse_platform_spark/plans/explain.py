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


def canonical_plan(df: DataFrame) -> str:
    """Canonicalize ``df``'s physical plan to its operator-node
    sequence — expression ids, codegen ids, file paths, and all other
    run-varying detail stripped — so a hash of it pins the plan SHAPE.

    Wall-time at sf0.1 cannot see a plan flip that stays fast locally
    but kills at 100x (a broadcast silently becoming a shuffle under a
    stats change); this canonical form changes exactly when the
    operator tree changes.  Generate with AQE DISABLED on a fixed
    session config: the static plan is deterministic for a given
    (code, schema, stats) triple, while AQE finals depend on runtime
    partition sizes.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    nodes = []
    for line in plan.splitlines():
        # strip tree art (":  +- ", "*(3) ", ...) then take the node name
        stripped = re.sub(r"^[\s:+\-*()\d]*", "", line)
        m = re.match(r"[A-Za-z][A-Za-z0-9]*", stripped)
        if not m:
            continue
        name = m.group(0)
        if name in ("Arguments", "Input", "Output", "Results", "Keys",
                    "Functions", "Condition", "ReadSchema", "Location",
                    "PushedFilters", "Batched", "DataFilters",
                    "PartitionFilters", "Format", "Statistics"):
            continue  # formatted-mode detail lines, not operator nodes
        nodes.append(name)
    return "\n".join(nodes)


def plan_fingerprint(df: DataFrame) -> str:
    """sha256 (12 hex chars) of :func:`canonical_plan`."""
    import hashlib

    return hashlib.sha256(
        canonical_plan(df).encode()
    ).hexdigest()[:12]


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
