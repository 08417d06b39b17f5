"""Minimal dependency-ordered pipeline runner — the engine-side analog
of the reference's Airflow DAGs (reference: `airflow/dags/*` chain
bronze -> silver -> gold -> validation as task dependencies; the
engine keeps orchestration thin because the heavy lifting is one
declarative Spark plan per task).

Semantics:
* topological execution of a task DAG (deterministic order: ready
  tasks run in name order — reruns produce identical logs);
* **idempotent skip**: a task with a `done_marker` that already exists
  is skipped (the reference gets this from Airflow task state; here it
  is a filesystem marker so reruns after a crash resume, not redo);
* fail-fast with downstream cancellation: a failed task marks every
  transitive dependent SKIPPED_UPSTREAM, everything independent still
  runs — the partial-progress behavior you want for a nightly load;
* a status table (task, state, seconds) comes back as a DataFrame so
  run history can land in the lakehouse like any other table.

This is NOT a scheduler: no cron, no executors. Bounded in-process
retries ARE supported (``retries=N`` per task) because transient
Spark failures — a lost executor, a fetch failure — are an engine
concern, not an orchestrator one; sleep/backoff policy and cron
still belong to Airflow/dbt. The point is that pipeline structure
(deps, idempotence, retries, partial progress) lives with the engine
and stays testable without an orchestrator.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Task:
    name: str
    fn: Callable[[], None]
    deps: list[str] = field(default_factory=list)
    done_marker: str | None = None
    retries: int = 0  # extra attempts after the first failure


class PipelineRunner:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tasks: dict[str, Task] = {}

    def add(
        self,
        name: str,
        fn: Callable[[], None],
        deps: list[str] | None = None,
        done_marker: str | None = None,
        retries: int = 0,
    ) -> "PipelineRunner":
        if name in self.tasks:
            raise ValueError(f"duplicate task {name}")
        self.tasks[name] = Task(name, fn, list(deps or []), done_marker, retries)
        return self

    def run(self) -> DataFrame:
        """Execute the DAG; returns the status table (task, state,
        seconds). States: OK, SKIPPED_DONE, FAILED, SKIPPED_UPSTREAM."""
        for t in self.tasks.values():
            for d in t.deps:
                if d not in self.tasks:
                    raise ValueError(f"{t.name} depends on unknown task {d}")
        state: dict[str, str] = {}
        seconds: dict[str, float] = {}
        attempts: dict[str, int] = {}
        errors: dict[str, str | None] = {}
        remaining = dict(self.tasks)
        while remaining:
            ready = sorted(
                n
                for n, t in remaining.items()
                if all(d not in remaining for d in t.deps)
            )
            if not ready:
                raise ValueError(f"dependency cycle among {sorted(remaining)}")
            for name in ready:
                t = remaining.pop(name)
                bad = [d for d in t.deps if state[d] not in ("OK", "SKIPPED_DONE")]
                if bad:
                    state[name], seconds[name], attempts[name] = "SKIPPED_UPSTREAM", 0.0, 0
                    continue
                if t.done_marker and os.path.exists(t.done_marker):
                    state[name], seconds[name], attempts[name] = "SKIPPED_DONE", 0.0, 0
                    continue
                t0 = time.perf_counter()
                for attempt in range(1, t.retries + 2):
                    attempts[name] = attempt
                    try:
                        t.fn()
                        if t.done_marker:
                            marker_dir = os.path.dirname(t.done_marker)
                            if marker_dir:  # bare filename: cwd, no mkdir
                                os.makedirs(marker_dir, exist_ok=True)
                            with open(t.done_marker, "w") as fh:
                                fh.write("done")
                        state[name] = "OK"
                        errors[name] = None
                        break
                    except Exception as e:  # noqa: BLE001 — runner boundary
                        state[name] = "FAILED"  # sticks if retries exhaust
                        # keep the failure diagnosable: type + message
                        # land in the status table's error column
                        errors[name] = f"{type(e).__name__}: {e}"[:500]
                seconds[name] = round(time.perf_counter() - t0, 3)
        return self.spark.createDataFrame(
            [
                (n, state[n], seconds[n], attempts[n], errors.get(n))
                for n in sorted(self.tasks)
            ],
            "task: string, state: string, seconds: double, attempts: int, "
            "error: string",
        )
