"""Streaming pipeline monitoring — wires Structured Streaming's
progress events into the metrics-export surface
(operators/metrics_export.py), the streaming half of the reference's
Grafana/JMX loop (its consumers are only observable through Redis
side-effects; reference scripts/real-time/orders_consumer.py).

:class:`ProgressMetricsListener` is a ``StreamingQueryListener``: every
micro-batch's progress is flattened (rows/sec, batch duration, state
rows, watermark age) and

* optionally exported straight to a Prometheus textfile-collector
  ``.prom`` file (atomic replace; scrape-safe), and
* buffered in memory for :meth:`flush_to_history`, which appends the
  points to a :class:`~..operators.metrics_export.MetricsHistory`
  parquet table in ONE batched write.

Listener callbacks run on a driver listener thread, so the callback
itself never launches Spark jobs (a job-from-listener can deadlock a
busy scheduler); everything Spark-side happens in ``flush_to_history``
on the caller's thread.  The buffer is bounded (``max_points``,
oldest-dropped) so an unattended long-running query cannot grow driver
memory without bound.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

from data_lakehouse_platform_spark.operators.metrics_export import (
    MetricsHistory,
    export_prometheus,
    streaming_progress_metrics,
)


class ProgressMetricsListener(StreamingQueryListener):
    def __init__(
        self,
        prom_path: str | None = None,
        labels: dict | None = None,
        max_points: int = 10_000,
    ):
        self.prom_path = prom_path
        self.labels = dict(labels or {})
        self.max_points = max_points
        self._lock = threading.Lock()
        self._points: list[tuple[int, dict, dict]] = []

    # -- StreamingQueryListener hooks (driver listener thread) ----------

    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        m = streaming_progress_metrics(p)
        if not m:
            return
        labels = {
            **self.labels,
            "query": p.get("name") or str(p.get("id") or ""),
        }
        ts = int(time.time() * 1000)
        with self._lock:
            self._points.append((ts, m, labels))
            if len(self._points) > self.max_points:
                del self._points[: -self.max_points]
        if self.prom_path:
            # pure-Python atomic file write — no Spark job from the
            # listener thread
            export_prometheus(
                self.prom_path, m, labels, prefix="dlp_stream"
            )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    # -- caller-thread drains -------------------------------------------

    def snapshot(self) -> list[tuple[int, dict, dict]]:
        with self._lock:
            return list(self._points)

    def flush_to_history(
        self, spark: SparkSession, history: MetricsHistory
    ) -> int:
        """Append every buffered point to the metrics history table
        (one batched write per distinct (ts, labels) point) and clear
        the buffer.  Returns the number of metric rows written."""
        with self._lock:
            points, self._points = self._points, []
        n = 0
        for ts, metrics, labels in points:
            n += history.append(spark, metrics, labels=labels, ts_ms=ts)
        return n
