"""Metrics export — the engine-scope analog of the reference's
Grafana/JMX monitoring stack (reference: volumes/grafana +
docker-compose-*.yaml wire Spark's JMX sink into dashboards; see
SURVEY.md §1).  That stack is orchestration infra; what belongs IN the
engine is a dependency-free way to get pipeline health out:

* :func:`export_prometheus` — write metrics in the Prometheus *text
  exposition format* to a ``.prom`` file (the node_exporter
  textfile-collector contract, a public integration point every
  Prometheus deployment already scrapes).  Atomic via temp+rename so a
  scrape never reads a half-written file.
* :func:`observation_metrics` / :func:`dq_check_metrics` — adapt the
  engine's existing zero-extra-scan instrumentation
  (operators/quality.py ``observe_metrics`` Observations, ``run_checks``
  DQ tables) into flat metric dicts.
* :func:`streaming_progress_metrics` — a StreamingQuery's
  ``lastProgress`` flattened to the numbers an operator pages on
  (input/processed rows per second, batch duration, state rows,
  watermark age).
* :class:`MetricsHistory` — append-only parquet history of metric
  points (hive-partitioned by day), so dashboards and volume-anomaly
  queries (``dq_volume_anomaly``) run over plain tables.

Scale posture: every function here handles METADATA-sized payloads
(metric name/value pairs); nothing scans data.  The expensive part —
computing the metrics — stays where it already is: riding the job
itself via Observations, or one aggregate pass via run_checks.
"""

from __future__ import annotations

import json
import math
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NAME_RE = re.compile(r"[^a-zA-Z0-9_:]")
_LABEL_RE = re.compile(r"[^a-zA-Z0-9_]")


def _metric_name(name: str) -> str:
    """Sanitize to the Prometheus metric-name charset."""
    n = _NAME_RE.sub("_", str(name))
    return n if not n or not n[0].isdigit() else f"_{n}"


def _label_value(v) -> str:
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
    )


def prometheus_lines(
    metrics: dict,
    labels: dict | None = None,
    prefix: str = "dlp",
    help_text: dict | None = None,
) -> list[str]:
    """Metric dict -> Prometheus text-exposition lines.  Non-numeric
    values are skipped (exposition is numbers-only); NaN/inf pass
    through spelled the way the format defines them."""
    lbl = ""
    if labels:
        inner = ",".join(
            f'{_LABEL_RE.sub("_", str(k))}="{_label_value(v)}"'
            for k, v in sorted(labels.items())
        )
        lbl = "{" + inner + "}"
    out: list[str] = []
    for k in sorted(metrics):
        v = metrics[k]
        if isinstance(v, bool):
            v = int(v)
        if not isinstance(v, (int, float)):
            continue
        name = _metric_name(f"{prefix}_{k}" if prefix else k)
        if help_text and k in help_text:
            out.append(f"# HELP {name} {help_text[k]}")
        if isinstance(v, float):
            if math.isnan(v):
                sval = "NaN"
            elif math.isinf(v):
                sval = "+Inf" if v > 0 else "-Inf"
            else:
                sval = repr(v)
        else:
            sval = str(v)
        out.append(f"{name}{lbl} {sval}")
    return out


def export_prometheus(
    path: str,
    metrics: dict,
    labels: dict | None = None,
    prefix: str = "dlp",
    append: bool = False,
) -> str:
    """Write (or append) metrics to a ``.prom`` textfile-collector
    file.  Writes are atomic (temp + ``os.replace``) so a concurrent
    scrape never sees a torn file — the same contract delta_lite's
    commit path uses."""
    lines = prometheus_lines(metrics, labels, prefix)
    body = "\n".join(lines) + "\n"
    if append and os.path.exists(path):
        with open(path) as fh:
            body = fh.read() + body
    tmp = f"{path}.tmp-{os.getpid()}-{time.monotonic_ns()}"
    with open(tmp, "w") as fh:
        fh.write(body)
    os.replace(tmp, path)
    return path


def observation_metrics(observation) -> dict:
    """A pyspark ``Observation``'s collected values as a flat metric
    dict (call AFTER an action executed the instrumented plan —
    quality.observe_metrics returns the pair)."""
    return dict(observation.get)


def dq_check_metrics(dq_df: DataFrame) -> dict:
    """quality.run_checks output -> flat metrics:
    ``{table}__{check}__{column} -> metric_value`` plus a companion
    ``..._passed`` gauge (1/0).  The collect is bounded by CHECK count
    (config-sized), never data."""
    out: dict = {}
    for r in dq_df.collect():
        key = f"{r.table_name}__{r.check_name}__{r.column_name or 'all'}"
        if r.metric_value is not None:
            out[key] = float(r.metric_value)
        out[f"{key}_passed"] = int(bool(r.passed))
    return out


def streaming_progress_metrics(progress: dict | None) -> dict:
    """A StreamingQuery ``lastProgress`` dict -> the operator pager
    numbers: rows/sec in and processed, batch duration, total/updated
    state rows (summed over stateful operators), and watermark age in
    milliseconds (0 when no watermark)."""
    if not progress:
        return {}
    out: dict = {
        "input_rows_per_second": float(
            progress.get("inputRowsPerSecond") or 0.0
        ),
        "processed_rows_per_second": float(
            progress.get("processedRowsPerSecond") or 0.0
        ),
        "num_input_rows": int(progress.get("numInputRows") or 0),
        "batch_id": int(progress.get("batchId") or 0),
        "batch_duration_ms": int(
            (progress.get("durationMs") or {}).get("triggerExecution") or 0
        ),
    }
    state_total = state_updated = 0
    for op in progress.get("stateOperators") or []:
        state_total += int(op.get("numRowsTotal") or 0)
        state_updated += int(op.get("numRowsUpdated") or 0)
    out["state_rows_total"] = state_total
    out["state_rows_updated"] = state_updated
    evt = progress.get("eventTime") or {}
    wm, mx = evt.get("watermark"), evt.get("max")
    if wm and mx:
        import datetime as _dt

        def _p(s):
            return _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))

        out["watermark_age_ms"] = max(
            0, int((_p(mx) - _p(wm)).total_seconds() * 1000)
        )
    else:
        out["watermark_age_ms"] = 0
    return out


def executor_metrics(spark: SparkSession) -> dict:
    """Driver-visible execution health from the public status tracker:
    active job/stage counts (the JMX numbers the reference's Grafana
    boards chart, without the JMX sink)."""
    st = spark.sparkContext.statusTracker()
    return {
        "active_jobs": len(st.getActiveJobsIds()),
        "active_stages": len(st.getActiveStageIds()),
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }


class MetricsHistory:
    """Append-only metric-point history on plain parquet, partitioned
    by day: ``(ts_ms, day, name, value, labels_json)``.  Being a plain
    table, the engine's own queries dashboard it (rolling z-scores,
    ``dq_volume_anomaly``-style gates) with no extra infra; being
    day-partitioned, retention is directory drops and reads prune.
    """

    SCHEMA = "ts_ms long, day string, name string, value double, labels string"

    def __init__(self, path: str):
        self.path = path

    def append(
        self,
        spark: SparkSession,
        metrics: dict,
        labels: dict | None = None,
        ts_ms: int | None = None,
    ) -> int:
        ts = int(time.time() * 1000) if ts_ms is None else int(ts_ms)
        day = time.strftime("%Y-%m-%d", time.gmtime(ts / 1000))
        lab = json.dumps(labels or {}, sort_keys=True)
        rows = [
            (ts, day, str(k), float(v), lab)
            for k, v in sorted(metrics.items())
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        ]
        if not rows:
            return 0
        (
            spark.createDataFrame(rows, self.SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .partitionBy("day")
            .parquet(self.path)
        )
        return len(rows)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(self.SCHEMA).parquet(self.path)

    def latest(self, spark: SparkSession) -> DataFrame:
        """Most recent point per (name, labels) — the 'current value'
        board; one window pass, pruned by partition when filtered."""
        from pyspark.sql import Window

        w = Window.partitionBy("name", "labels").orderBy(
            F.col("ts_ms").desc()
        )
        return (
            self.read(spark)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
