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
* the STREAMING sink runs a two-marker commit (``begin`` pins the
  batch's slot range before anything seals; sealing is per-slot
  put-if-absent and therefore idempotent; ``committed`` ends the
  transaction) — a crash at ANY point inside commit, replayed by
  Spark, re-seals only the missing slots: exactly-once from source
  offset to sealed sink segment with no loss-or-duplicate window.

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


def _atomic_write_json(log_dir: str, name: str, payload: dict) -> bool:
    """Create ``name`` with ``payload`` atomically (tmp + link put-if-
    absent): the file is either absent or complete, never partial.
    Returns False when it already existed."""
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(json.dumps(payload))
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, os.path.join(log_dir, name))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _log_start(log_dir: str) -> int:
    """Durable log-start floor: advanced by vacuum/overwrite so segment
    NUMBERING never reuses a retired number — a consumer checkpointed
    past the floor keeps monotone offsets instead of silently skipping
    the first N newly produced segments."""
    try:
        with open(os.path.join(log_dir, ".log-start")) as fh:
            return json.load(fh)["log_start"]
    except FileNotFoundError:
        return 0


def _advance_log_start(log_dir: str, n: int) -> None:
    cur = _log_start(log_dir)
    if n <= cur:
        return
    tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(json.dumps({"log_start": n}))
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(log_dir, ".log-start"))


def segment_range(log_dir: str) -> tuple[int, int]:
    """``(first, end)`` of the contiguous sealed segments on disk —
    ``first`` > 0 after a retention vacuum (like a Kafka partition's
    log-start offset moving forward), and both never fall below the
    durable log-start floor even when every segment is gone. One
    directory listing, not a stat per segment."""
    floor = _log_start(log_dir)
    try:
        names = os.listdir(log_dir)
    except FileNotFoundError:
        return (floor, floor)
    nums = sorted(
        int(f[len(_SEG_PREFIX):-len(_SEG_SUFFIX)])
        for f in names
        if f.startswith(_SEG_PREFIX) and f.endswith(_SEG_SUFFIX)
    )
    if not nums:
        return (floor, floor)
    return (max(nums[0], floor), max(nums[-1] + 1, floor))


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
    # Persist the floor so numbering never reuses retired numbers —
    # even when keep_from == end removed every segment.
    _advance_log_start(log_dir, min(keep_from, end))
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
            # overwrite truncates CONTENT, never numbering: new
            # segments continue past the old end so consumer offsets
            # stay monotone.
            _advance_log_start(self.log_dir, end)
        _seal_tmps(self.log_dir, messages)

    def abort(self, messages) -> None:
        _drop_tmps(messages)


def _batch_marker(log_dir: str, batch_id: int, phase: str) -> str:
    return os.path.join(log_dir, f".batch-{batch_id:012d}.{phase}")


class EventLogStreamWriter(DataSourceStreamWriter):
    """Streaming sink with a two-marker commit protocol — the
    transactional-producer half of the Kafka-shaped contract, safe
    against a crash at ANY point inside commit:

    1. ``begin`` marker (atomic put-if-absent, complete-or-absent):
       pins the batch's BASE segment number and slot count. Written
       durably BEFORE any segment seals, so every retry of this batch
       seals into the SAME slots.
    2. seal: each task's tmp file links into its pinned slot with
       ``os.link`` put-if-absent, in message order (readers only ever
       observe a contiguous prefix). A slot that already exists was
       sealed by a previous attempt of this same batch — same offsets,
       same rows — so the retry just skips it: sealing is idempotent.
    3. ``committed`` marker records the sealed range; a replay that
       finds it drops its tmps and exits (the common fast path).

    Crash matrix: before begin → fresh attempt, nothing published;
    after begin, any subset sealed → retry re-links only the missing
    slots; after all seals, before committed → retry links nothing and
    writes the marker; after committed → retry is a no-op. No window
    loses rows and none duplicates them.

    Contract: while a sink-owned batch is mid-commit, no FOREIGN
    producer may append to the same log (slot pinning assumes the base
    range stays ours — Kafka's single-leader-per-partition rule);
    between batches, interleaved producers are safe."""

    def __init__(self, options, fields=_FIELDS):
        self.log_dir = options.get("path")
        if not self.log_dir:
            raise ValueError("eventlog sink requires .option('path', dir)")
        self.fields = tuple(fields)

    def write(self, iterator) -> _TmpFileMessage:
        return _write_tmp(self.log_dir, iterator, self.fields)

    def commit(self, messages, batchId: int) -> None:
        if os.path.exists(_batch_marker(self.log_dir, batchId, "committed")):
            _drop_tmps(messages)  # replayed batch: already published
            return
        tmps = [m for m in messages if m is not None and m.tmp_path]
        os.makedirs(self.log_dir, exist_ok=True)
        begin_name = f".batch-{batchId:012d}.begin"
        base = sealed_segments(self.log_dir)
        if not _atomic_write_json(
            self.log_dir, begin_name, {"base": base, "count": len(tmps)}
        ):
            # a previous attempt of this batch pinned the slots — reuse
            with open(_batch_marker(self.log_dir, batchId, "begin")) as fh:
                base = json.load(fh)["base"]
        sealed = []
        for i, m in enumerate(tmps):
            target = segment_path(self.log_dir, base + i)
            try:
                os.link(m.tmp_path, target)
            except FileExistsError:
                pass  # sealed by a previous attempt of this batch
            os.unlink(m.tmp_path)
            sealed.append(base + i)
        _atomic_write_json(
            self.log_dir,
            f".batch-{batchId:012d}.committed",
            {"batch_id": batchId, "segments": sealed},
        )

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
