"""Custom STREAMING Python Data Source (Spark 4
``pyspark.sql.datasource`` stream API): an offset-tracked, replayable
event log — the Kafka-shaped abstraction this container can actually
run (no broker needed).

The reference's entire real-time path rides Kafka topics
(scripts/real-time/orders_consumer.py); the spark-sql-kafka package is
absent here, so the engine's streaming pipelines are exercised through
file sources. This source closes the remaining conceptual gap: a
SOURCE WITH REAL OFFSETS — monotone, checkpointed by Spark, replayable
on restart — which is the property that makes Kafka integration
exactly-once, demonstrated with the public Python DataSource API:

* a producer appends SEALED segments (``segment-00000042.jsonl``,
  written tmp-then-rename so readers never see partial files) — the
  on-disk analog of a Kafka partition's closed log segments;
* the stream offset is ``{"segment": N}`` = number of sealed segments
  consumed; Spark persists it in the checkpoint WAL;
* each micro-batch serves segments ``[start, latest)``, ONE INPUT
  PARTITION PER SEGMENT — rows are parsed executor-side, in parallel,
  never on the driver (DataSourceStreamReader, not the Simple driver-
  side variant);
* restart replays from the checkpointed offset: segments consumed
  before the stop are never re-served, segments appended while the
  stream was down are picked up — exactly-once end to end (tested).

Usage:
    spark.dataSource.register(EventLogStreamDataSource)
    stream = (spark.readStream.format("eventlog")
              .option("path", log_dir).load())
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

EVENTLOG_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts string, value double"
)

_FIELDS = ("event_id", "user_id", "event_type", "ts", "value")


def segment_path(log_dir: str, n: int) -> str:
    return os.path.join(log_dir, f"segment-{n:08d}.jsonl")


def sealed_segments(log_dir: str) -> int:
    """Count of contiguous sealed segments starting at 0."""
    n = 0
    while os.path.exists(segment_path(log_dir, n)):
        n += 1
    return n


def append_segment(log_dir: str, rows: list[dict]) -> int:
    """Producer API: atomically seal ``rows`` as the next segment
    (write tmp, fsync, rename — readers never observe a partial
    segment). Returns the segment number."""
    os.makedirs(log_dir, exist_ok=True)
    n = sealed_segments(log_dir)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, segment_path(log_dir, n))
    return n


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EventLogStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("eventlog source requires .option('path', dir)")

    def initialOffset(self) -> dict:
        return {"segment": 0}

    def latestOffset(self) -> dict:
        return {"segment": sealed_segments(self.log_dir)}

    def partitions(self, start: dict, end: dict):
        return [
            _SegmentPartition(segment_path(self.log_dir, n))
            for n in range(start["segment"], end["segment"])
        ]

    def read(self, partition: _SegmentPartition):
        # Executor-side parse: one sealed segment per task.
        with open(partition.path) as fh:
            for line in fh:
                if line.strip():
                    r = json.loads(line)
                    yield tuple(r.get(f) for f in _FIELDS)

    def commit(self, end: dict) -> None:
        # Segments are retained for replay (vacuum is the producer's
        # policy decision, like Kafka retention) — nothing to do.
        return


class EventLogStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventlog"

    def schema(self) -> str:
        return EVENTLOG_SCHEMA

    def streamReader(self, schema: StructType) -> EventLogStreamReader:
        return EventLogStreamReader(self.options)
