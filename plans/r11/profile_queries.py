#!/usr/bin/env python
"""Per-query profiling lane for the optimization round: steady wall
time (best of N), Spark job/stage/task counts, and duplicate-scan
detection from the formatted plan.

Methodology matches bench.py (unwrapped builder, noop sink, cache
cleared between runs) so numbers are comparable; this script just adds
the per-query execution-shape columns that wall time alone hides.

Usage: python plans/r10/profile_queries.py [query ...] > profile.json
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/plans/r11")

from bench import HEADLINE  # noqa: E402
from data_lakehouse_platform_spark.catalog import TABLES, load_table  # noqa: E402
from data_lakehouse_platform_spark.queries import all_queries  # noqa: E402
from data_lakehouse_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    from bench_env import setup
    iters = int(os.environ.get("PROFILE_ITERS", "3"))
    spark, sf_dir = setup("dlp-profile-r11")
    sc = spark.sparkContext
    registry = all_queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in registry]

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    jsc = sc._jsc.sc()
    tracker = sc.statusTracker()

    def _run(name: str) -> float:
        build = getattr(registry[name].build, "__wrapped__", registry[name].build)
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        spark.catalog.clearCache()
        return el

    out = {}
    for name in names:
        _run(name)  # warm codegen
        best = min(_run(name) for _ in range(max(1, iters - 1)))
        # counted lane: job/stage/task shape of ONE steady run
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(name, name)
        _run(name)
        sc.setJobGroup(None, None)
        job_ids = [j for j in (tracker.getJobIdsForGroup(name) or [])]
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        # duplicate-scan detection from the formatted plan
        build = getattr(registry[name].build, "__wrapped__", registry[name].build)
        buf = io.StringIO()
        with redirect_stdout(buf):
            build(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        scans = re.findall(r"Scan parquet[^\n]*\[([a-zA-Z_0-9]+)", plan)
        files = re.findall(r"Location:.*?/(\w+)\.parquet", plan)
        from collections import Counter

        dup_scans = {
            f: c for f, c in Counter(files).items() if c > 1
        }
        n_exchange = plan.count("Exchange")
        n_reused = plan.count("ReusedExchange")
        # planning-lane cost: build the DataFrame + full physical
        # planning (explain) without executing — the steady lane pays
        # this every iteration because builders re-run per timed run
        t0 = time.perf_counter()
        df2 = build(spark, sf_dir)
        with redirect_stdout(io.StringIO()):
            df2.explain("formatted")
        t_plan = time.perf_counter() - t0
        spark.catalog.clearCache()
        out[name] = {
            "steady_sec": round(best, 3),
            "plan_sec": round(t_plan, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
            "exchanges": n_exchange,
            "reused_exchanges": n_reused,
            "dup_scans": dup_scans,
        }
        print(
            f"{name}: {best:.3f}s jobs={len(job_ids)} stages={n_stages} "
            f"tasks={n_tasks} exch={n_exchange} reuse={n_reused} "
            f"dup={dup_scans}",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
