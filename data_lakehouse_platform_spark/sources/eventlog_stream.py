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

The format is also WRITABLE, batch and streaming, with the two-phase
commit protocol a Kafka producer's transactions provide:

* every write task serializes its partition to a ``.tmp-*`` file
  (invisible to readers — only ``segment-*`` names are served) and
  reports it in its commit message; a failed/aborted task's tmp file
  is deleted and never published;
* the DRIVER commit seals the tmp files as consecutive segments
  (rename is the atomic publish), so a batch's segments appear only
  after every task succeeded;
* the STREAMING sink additionally records each committed micro-batch
  id in a marker file created with ``O_EXCL`` — when Spark replays a
  batch after a failure-between-commit-and-checkpoint, the duplicate
  commit sees the marker, discards its tmp files, and publishes
  nothing: idempotent commit ⇒ exactly-once from source offset to
  sealed sink segment.

The transport is schema-generic: pass any flat schema of JSON-
representable atomic types (``.schema("k bigint, v string, ...")``)
on read, and any such DataFrame on write — the default schema is the
events-table shape. Producers control retention with
``vacuum_segments`` (the log-start offset moves forward, consumers
below the floor fail loudly, like Kafka's earliest offset), and
consumers may start mid-log with ``.option("startingSegment", n)``
(the startingOffsets analog).

Usage:
    spark.dataSource.register(EventLogStreamDataSource)
    stream = (spark.readStream.format("eventlog")
              .option("path", log_dir).load())
    df.write.format("eventlog").mode("append").option("path", d).save()
    stream.writeStream.format("eventlog").option("path", d)...
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

EVENTLOG_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts string, value double"
)

_FIELDS = ("event_id", "user_id", "event_type", "ts", "value")

_SEG_PREFIX, _SEG_SUFFIX = "segment-", ".jsonl"


def segment_path(log_dir: str, n: int) -> str:
    return os.path.join(log_dir, f"{_SEG_PREFIX}{n:08d}{_SEG_SUFFIX}")


def segment_range(log_dir: str) -> tuple[int, int]:
    """``(first, end)`` of the contiguous sealed segments on disk —
    ``first`` > 0 after a retention vacuum (like a Kafka partition's
    log-start offset moving forward). One directory listing, not a
    stat per segment."""
    try:
        names = os.listdir(log_dir)
    except FileNotFoundError:
        return (0, 0)
    nums = sorted(
        int(f[len(_SEG_PREFIX):-len(_SEG_SUFFIX)])
        for f in names
        if f.startswith(_SEG_PREFIX) and f.endswith(_SEG_SUFFIX)
    )
    if not nums:
        return (0, 0)
    return (nums[0], nums[-1] + 1)


def sealed_segments(log_dir: str) -> int:
    """End of the sealed log (= count when never vacuumed)."""
    return segment_range(log_dir)[1]


def append_segment(log_dir: str, rows: list[dict]) -> int:
    """Producer API: atomically seal ``rows`` as the next segment
    (write tmp, fsync, rename — readers never observe a partial
    segment). Returns the segment number."""
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r, default=str) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    n = sealed_segments(log_dir)
    while True:
        try:
            os.link(tmp, segment_path(log_dir, n))  # atomic put-if-absent
            break
        except FileExistsError:
            n += 1  # concurrent producer took this slot
    os.unlink(tmp)
    return n


def vacuum_segments(log_dir: str, keep_from: int) -> int:
    """Retention: drop sealed segments below ``keep_from`` (the
    producer's policy decision, like Kafka retention). Consumers whose
    checkpointed offset is at or past the floor are unaffected; a
    consumer asking for a vacuumed segment fails loudly rather than
    silently skipping data. Returns the number of segments removed."""
    first, end = segment_range(log_dir)
    removed = 0
    for n in range(first, min(keep_from, end)):
        os.remove(segment_path(log_dir, n))
        removed += 1
    return removed


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _parse_segment(path: str, fields):
    """Executor-side parse of one sealed segment. A missing file means
    the consumer fell behind the retention vacuum — fail loudly."""
    with open(path) as fh:
        for line in fh:
            if line.strip():
                r = json.loads(line)
                yield tuple(r.get(f) for f in fields)


class EventLogStreamReader(DataSourceStreamReader):
    def __init__(self, options, fields):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("eventlog source requires .option('path', dir)")
        self.fields = tuple(fields)
        self.starting = int(options.get("startingsegment", 0))

    def initialOffset(self) -> dict:
        # Never start below the retention floor; honor an explicit
        # startingSegment option (the Kafka startingOffsets analog).
        first, _end = segment_range(self.log_dir)
        return {"segment": max(first, self.starting)}

    def latestOffset(self) -> dict:
        return {"segment": sealed_segments(self.log_dir)}

    def partitions(self, start: dict, end: dict):
        return [
            _SegmentPartition(segment_path(self.log_dir, n))
            for n in range(start["segment"], end["segment"])
        ]

    def read(self, partition: _SegmentPartition):
        yield from _parse_segment(partition.path, self.fields)

    def commit(self, end: dict) -> None:
        # Segments are retained for replay (vacuum is the producer's
        # policy decision, like Kafka retention) — nothing to do.
        return


class EventLogBatchReader(DataSourceReader):
    """Batch scan of the sealed log: one input partition per segment,
    executor-side parse — the bootstrap/backfill read path."""

    def __init__(self, options, fields):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("eventlog source requires .option('path', dir)")
        self.fields = tuple(fields)

    def partitions(self):
        first, end = segment_range(self.log_dir)
        return [
            _SegmentPartition(segment_path(self.log_dir, n))
            for n in range(first, end)
        ]

    def read(self, partition: _SegmentPartition):
        yield from _parse_segment(partition.path, self.fields)


class _TmpFileMessage(WriterCommitMessage):
    """Per-task commit message: the invisible tmp file holding the
    task's rows (None when the partition was empty)."""

    def __init__(self, tmp_path: str | None, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


def _write_tmp(log_dir: str, iterator, fields) -> _TmpFileMessage:
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
    rows = 0
    with open(tmp, "w") as fh:
        for row in iterator:
            d = row.asDict()
            fh.write(json.dumps({f: d.get(f) for f in fields}) + "\n")
            rows += 1
        fh.flush()
        os.fsync(fh.fileno())
    if rows == 0:
        os.remove(tmp)
        return _TmpFileMessage(None, 0)
    return _TmpFileMessage(tmp, rows)


def _seal_tmps(log_dir: str, messages) -> list[int]:
    """Driver-side publish: link each task's tmp file in as the next
    consecutive segment number. ``os.link`` is the atomic put-if-absent
    (a plain rename would silently CLOBBER a segment another writer
    sealed concurrently) — on collision we retry the next number, so
    two committers interleave instead of overwriting. Tmp names never
    match the reader's ``segment-*`` pattern, so readers observe only
    fully-written segments."""
    sealed = []
    for m in messages:
        if m is not None and m.tmp_path is not None:
            n = sealed_segments(log_dir)
            while True:
                try:
                    os.link(m.tmp_path, segment_path(log_dir, n))
                    break
                except FileExistsError:
                    n += 1  # lost the race for this slot: take the next
            os.unlink(m.tmp_path)
            sealed.append(n)
    return sealed


def _drop_tmps(messages) -> None:
    for m in messages:
        if m is not None and getattr(m, "tmp_path", None):
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class EventLogBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool, fields=_FIELDS):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("eventlog sink requires .option('path', dir)")
        self.overwrite = overwrite
        self.fields = tuple(fields)

    def write(self, iterator) -> _TmpFileMessage:
        return _write_tmp(self.log_dir, iterator, self.fields)

    def commit(self, messages) -> None:
        if self.overwrite:
            first, end = segment_range(self.log_dir)
            for n in range(first, end):
                os.remove(segment_path(self.log_dir, n))
        _seal_tmps(self.log_dir, messages)

    def abort(self, messages) -> None:
        _drop_tmps(messages)


def _batch_marker(log_dir: str, batch_id: int) -> str:
    return os.path.join(log_dir, f".batch-{batch_id:012d}.committed")


class EventLogStreamWriter(DataSourceStreamWriter):
    """Streaming sink with IDEMPOTENT batch commit — the transactional-
    producer half of the Kafka-shaped contract.

    Spark may re-run a micro-batch whose commit landed but whose
    checkpoint advance did not (failure in the gap). The replayed
    batch's tasks write fresh tmp files, but ``commit`` finds the
    ``O_EXCL``-created marker for that batchId already present,
    discards the tmps, and seals nothing — each micro-batch publishes
    exactly once no matter how many times it is replayed."""

    def __init__(self, options, fields=_FIELDS):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("eventlog sink requires .option('path', dir)")
        self.fields = tuple(fields)

    def write(self, iterator) -> _TmpFileMessage:
        return _write_tmp(self.log_dir, iterator, self.fields)

    def commit(self, messages, batchId: int) -> None:
        try:
            fd = os.open(
                _batch_marker(self.log_dir, batchId),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            _drop_tmps(messages)  # replayed batch: already published
            return
        sealed = _seal_tmps(self.log_dir, messages)
        with os.fdopen(fd, "w") as fh:
            fh.write(json.dumps({"batch_id": batchId, "segments": sealed}))
            fh.flush()
            os.fsync(fh.fileno())

    def abort(self, messages, batchId: int) -> None:
        _drop_tmps(messages)


class EventLogStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventlog"

    def schema(self) -> str:
        return EVENTLOG_SCHEMA

    def reader(self, schema: StructType) -> EventLogBatchReader:
        return EventLogBatchReader(self.options, schema.fieldNames())

    def streamReader(self, schema: StructType) -> EventLogStreamReader:
        return EventLogStreamReader(self.options, schema.fieldNames())

    def writer(self, schema: StructType, overwrite: bool) -> EventLogBatchWriter:
        return EventLogBatchWriter(self.options, overwrite, schema.fieldNames())

    def streamWriter(self, schema: StructType, overwrite: bool) -> EventLogStreamWriter:
        return EventLogStreamWriter(self.options, schema.fieldNames())
