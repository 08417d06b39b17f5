"""Structured-Streaming SOURCE over delta_lite tables (Spark 4 Python
DataSource stream API) — the delta-spark ``readStream.format("delta")``
surface for this engine's own log format.

delta-spark's DeltaSource turns a Delta table into an exactly-once
stream: the offset is the table VERSION (checkpointed by Spark's WAL),
the first batch serves the table's current snapshot, and every later
micro-batch serves the ``add`` files of the commits that landed since
the last offset.  This module implements the same contract against
delta_lite's log with the public ``pyspark.sql.datasource`` API
(pattern proven by sources/eventlog_stream.py):

* **offset** = ``{"version": N}`` — every commit ``<= N`` consumed.
  The log is immutable per version, so replaying a checkpointed range
  after a crash serves byte-identical rows: exactly-once end to end.
* **initial batch** = the SNAPSHOT at the start version (live files
  after replay, deletion vectors applied) — never the raw per-commit
  adds, which would double-count rows rewritten by compaction.
  ``startingVersion`` (int) starts the per-commit tail at that version
  with no snapshot; ``startingVersion=latest`` serves only commits
  that land after the stream starts (Kafka's ``latest`` analog).
* **later batches** serve each commit's ``dataChange: true`` adds, one
  input partition per file — parsed executor-side with pyarrow, never
  on the driver.  ``dataChange: false`` adds (OPTIMIZE output) are
  always skipped, exactly as delta-spark does.
* **non-append commits** (a commit that also REMOVES data files:
  overwrite/merge/update/delete) FAIL LOUDLY by default — a stream of
  appends cannot represent them.  ``ignoreChanges=true`` serves such a
  commit's add files anyway (delta-spark's semantics: rewritten rows
  re-emit, consumers must dedup), ``skipChangeCommits=true`` skips
  them entirely.  For a true row-level change stream set
  ``readChangeFeed=true`` (below) or use
  ``DeltaLiteTable.table_changes`` in batch.
* **CDF mode** (``readChangeFeed=true``, delta-spark's streaming CDF):
  the result schema gains ``_change_type`` / ``_commit_version`` /
  ``_commit_timestamp``; each micro-batch serves the commits' real
  ``_change_data`` files (insert / delete / update_preimage /
  update_postimage), add-only commits infer as inserts, the bootstrap
  snapshot arrives as inserts at the starting version, and a mixed
  commit without cdc actions refuses loudly (enable
  ``delta.enableChangeDataFeed`` so mutating verbs write change
  files).

Refusals: column-mapping tables and unknown reader features are
refused at plan time (the module's loud-refusal discipline);
deletion vectors are APPLIED in the snapshot batch (deleted row
indexes resolved driver-side from the log-sized bitmaps and shipped
in the partition descriptor) and cannot appear on fresh appends.

Usage::

    spark.dataSource.register(DeltaLiteStreamDataSource)
    stream = (spark.readStream.format("delta_lite")
              .option("path", table_dir).load())

Reference analog: the reference's real-time path consumes Kafka
(scripts/real-time/orders_consumer.py) and lands batches into Delta;
this source closes the reverse direction — the lakehouse table itself
as a replayable stream, which is how medallion silver/gold layers
tail bronze without an external broker.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import urllib.parse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
    DeltaProtocolError,
)

__all__ = ["DeltaLiteStreamDataSource"]


class _FilePartition(InputPartition):
    """One data file to serve: absolute path, the table's partition-
    column values for it (decoded, from the LOG — the source of truth,
    never directory inference), and the row indexes its deletion
    vector masks (empty for appends).  In CDF mode (``kind`` set) the
    partition also carries the commit coordinates: ``kind='cdc'``
    means the file itself stores ``_change_type``; ``kind='insert'``
    stamps every row as an insert (the spec's add-only inference)."""

    def __init__(
        self,
        path: str,
        partition_values: dict,
        deleted_rows: list[int],
        kind: str | None = None,
        version: int | None = None,
        ts_ms: int | None = None,
    ):
        self.path = path
        self.partition_values = partition_values
        self.deleted_rows = deleted_rows
        self.kind = kind
        self.version = version
        self.ts_ms = ts_ms


def _pv_cast(raw: str | None, dt_name: str):
    """Decode one partitionValues string to the column's Python value
    (the same serialization delta_lite's batch reader casts in SQL)."""
    if raw is None:
        return None
    if dt_name in ("byte", "short", "integer", "long"):
        return int(raw)
    if dt_name in ("float", "double"):
        return float(raw)
    if dt_name == "boolean":
        return raw == "true"
    if dt_name == "date":
        return _dt.date.fromisoformat(raw)
    if dt_name.startswith("decimal"):
        from decimal import Decimal

        return Decimal(raw)
    return raw  # string et al.


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delta_lite stream requires .option('path', ...)")
        self._schema = schema
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        self._starting = options.get("startingversion")
        self._read_cdf = (
            str(options.get("readchangefeed", "false")).lower()
            == "true"
        )
        self._table = DeltaLiteTable(self._path)
        latest = self._table.latest_version()
        if latest is None:
            raise FileNotFoundError(
                f"no Delta log at {self._table.log_dir}"
            )
        meta, _live, proto = self._table._replay(latest)
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode != "none":
            raise DeltaProtocolError(
                "delta_lite streaming source does not support "
                f"column mapping (mode={mode!r}) — read in batch mode"
            )
        self._part_cols = meta.get("partitionColumns", [])

    # -- offsets -------------------------------------------------------

    def initialOffset(self) -> dict:
        if self._starting is None:
            # snapshot bootstrap: the first batch serves the CURRENT
            # snapshot; the per-commit tail starts after it
            return {"version": -1}
        if str(self._starting).lower() == "latest":
            return {"version": int(self._table.latest_version())}
        v = int(self._starting)
        if v < 0:
            raise ValueError("startingVersion must be >= 0 or 'latest'")
        return {"version": v - 1, "no_snapshot": True}

    def latestOffset(self) -> dict:
        return {"version": int(self._table.latest_version())}

    def commit(self, end: dict) -> None:
        pass  # the log is the durable store; nothing to acknowledge

    # -- planning (driver-side, log-sized metadata only) ---------------

    def _snapshot_partitions(self, version: int) -> list[_FilePartition]:
        _meta, live, _proto = self._table._replay(version)
        parts = []
        for rel in sorted(live):
            a = live[rel]
            dv = a.get("deletionVector")
            deleted = self._table._dv_deleted_rows(dv) if dv else []
            parts.append(
                _FilePartition(
                    os.path.join(self._table.path, rel),
                    a.get("partitionValues") or {},
                    deleted,
                )
            )
        return parts

    def _commit_ts(self, version: int) -> int:
        for a in self._table._actions(version):
            if "commitInfo" in a and "timestamp" in a["commitInfo"]:
                return int(a["commitInfo"]["timestamp"])
        return int(
            os.path.getmtime(
                os.path.join(
                    self._table.log_dir, f"{version:020d}.json"
                )
            )
            * 1000
        )

    def _cdf_commit_partitions(
        self, version: int
    ) -> list[_FilePartition]:
        """CDF mode: a commit's change files (or add-only inference) as
        partitions stamped with the commit coordinates — the streaming
        twin of DeltaLiteTable._table_changes_cdf."""
        acts = self._table._actions(version)
        ts = self._commit_ts(version)
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        adds = [
            a["add"]
            for a in acts
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"]
            for a in acts
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        if cdc:
            src, kind = cdc, "cdc"
        elif adds and not removes:
            src, kind = adds, "insert"
        elif not adds and not removes:
            return []
        else:
            raise DeltaProtocolError(
                f"version {version} mixes dataChange adds and removes "
                "without cdc actions — its change set is not "
                "derivable; enable delta.enableChangeDataFeed so "
                "mutating commits write change files"
            )
        return [
            _FilePartition(
                os.path.join(
                    self._table.path,
                    urllib.parse.unquote(a["path"]),
                ),
                a.get("partitionValues") or {},
                [],
                kind=kind,
                version=version,
                ts_ms=ts,
            )
            for a in src
        ]

    def _commit_partitions(self, version: int) -> list[_FilePartition]:
        acts = self._table._actions(version)
        removes = [
            a["remove"]
            for a in acts
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        adds = [
            a["add"]
            for a in acts
            if "add" in a and a["add"].get("dataChange", True)
        ]
        if removes:
            if self._skip_change_commits:
                return []
            if not self._ignore_changes:
                raise DeltaProtocolError(
                    f"version {version} is not an append (it removes "
                    "data files) — a streaming read of appends cannot "
                    "represent it; set ignoreChanges=true to re-emit "
                    "its rewritten rows, skipChangeCommits=true to "
                    "skip it, or consume table_changes() instead"
                )
        return [
            _FilePartition(
                os.path.join(
                    self._table.path,
                    urllib.parse.unquote(a["path"]),
                ),
                a.get("partitionValues") or {},
                [],
            )
            for a in adds
        ]

    def partitions(self, start: dict, end: dict) -> list[_FilePartition]:
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[_FilePartition] = []
        if lo < 0 and not start.get("no_snapshot"):
            # bootstrap batch: snapshot at `hi`, nothing per-commit.
            # CDF mode stamps every snapshot row as an insert at the
            # bootstrap version (delta-spark's readChangeFeed start).
            parts = self._snapshot_partitions(hi)
            if self._read_cdf:
                ts = self._commit_ts(hi)
                for p in parts:
                    p.kind, p.version, p.ts_ms = "insert", hi, ts
                    if p.deleted_rows:
                        # a snapshot-with-DV row set is still served
                        # (deletions applied); the surviving rows are
                        # the snapshot's inserts
                        pass
            return parts or [_FilePartition("", {}, [])]
        for v in range(lo + 1, hi + 1):
            parts.extend(
                self._cdf_commit_partitions(v)
                if self._read_cdf
                else self._commit_partitions(v)
            )
        # Spark requires >= 1 partition per batch; an empty range
        # (metadata-only commits) serves one empty partition
        return parts or [_FilePartition("", {}, [])]

    # -- executor-side read --------------------------------------------

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        cols = set(tbl.column_names)
        data = {
            c: tbl.column(c).to_pylist() for c in tbl.column_names
        }
        n = tbl.num_rows
        deleted = set(partition.deleted_rows)
        cdf = partition.kind is not None
        ts = (
            _dt.datetime.fromtimestamp(
                partition.ts_ms / 1000.0, tz=_dt.timezone.utc
            )
            if cdf
            else None
        )
        meta_vals = {
            "_commit_version": partition.version,
            "_commit_timestamp": ts,
        }
        fields = self._schema.fields
        pvals = {
            f.name: _pv_cast(
                partition.partition_values.get(f.name),
                f.dataType.typeName(),
            )
            for f in fields
            if f.name not in cols and f.name not in meta_vals
            and f.name != "_change_type"
        }

        def _cell(f, i):
            if cdf and f.name == "_change_type":
                # cdc files store it; add-only inference stamps it
                return (
                    data["_change_type"][i]
                    if partition.kind == "cdc"
                    else "insert"
                )
            if cdf and f.name in meta_vals:
                return meta_vals[f.name]
            if f.name in cols:
                return data[f.name][i]
            return pvals[f.name]

        return iter(
            tuple(_cell(f, i) for f in fields)
            for i in range(n)
            if i not in deleted
        )


_ARROW_BY_SPARK = {
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date32",
    "timestamp": "us",  # resolved specially below
}


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged_path: str, rows: int):
        self.staged_path = staged_path
        self.rows = rows


class _DeltaStreamWriter(DataSourceStreamWriter):
    """Transactional STREAMING SINK into a delta_lite table — the
    delta-spark ``writeStream.format("delta")`` contract:

    * every task stages its rows as a hidden parquet file (pyarrow,
      executor-side);
    * the DRIVER commit publishes the batch as ONE Delta version:
      staged files renamed to visible names, ``add`` actions plus a
      ``txn {appId, version: batchId}`` action in a single
      put-if-absent commit — so a replayed micro-batch (Spark retries
      commit after a crash) finds its batchId already recorded in
      :meth:`DeltaLiteTable.txn_versions` and drops the staged files
      instead of double-committing: exactly-once end to end;
    * a first commit CREATES the table from the stream's schema
      (protocol + metaData actions, delta-spark's sink behavior).

    ``txnAppId`` (option) names the idempotence ledger; the default is
    derived from the table path, correct for the common one-query-per-
    table case — set it explicitly when several queries append to the
    same table.  Unpartitioned appends only (atomic top-level columns);
    partitioned or nested sinks go through foreachBatch +
    ``DeltaLiteTable.write``."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "delta_lite sink requires .option('path', ...)"
            )
        self._schema = schema
        self._app_id = options.get(
            "txnappid",
            f"delta-lite-stream-sink:{os.path.basename(os.path.abspath(self._path))}",
        )
        for f in schema.fields:
            t = f.dataType.typeName()
            if t not in _ARROW_BY_SPARK and not t.startswith("decimal"):
                raise ValueError(
                    f"column {f.name!r} has type {t!r} — the streaming "
                    "sink writes atomic top-level columns only; use "
                    "foreachBatch + DeltaLiteTable.write for nested or "
                    "partitioned appends"
                )

    def _arrow_schema(self):
        import pyarrow as pa

        fields = []
        for f in self._schema.fields:
            t = f.dataType.typeName()
            if t == "timestamp":
                pt = pa.timestamp("us")
            elif t.startswith("decimal"):
                pt = pa.decimal128(
                    f.dataType.precision, f.dataType.scale
                )
            else:
                pt = pa.type_for_alias(_ARROW_BY_SPARK[t])
            fields.append(pa.field(f.name, pt, nullable=True))
        return pa.schema(fields)

    def write(self, iterator) -> _StagedFile:
        import uuid as uuidlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        names = [f.name for f in self._schema.fields]
        cols: dict[str, list] = {n: [] for n in names}
        n = 0
        for row in iterator:
            for name in names:
                cols[name].append(row[name])
            n += 1
        if n == 0:
            return _StagedFile("", 0)
        tbl = pa.table(
            {name: cols[name] for name in names},
            schema=self._arrow_schema(),
        )
        # hidden while staged: Spark's file listings skip dot-files,
        # and delta readers only ever open files the LOG references
        staged = os.path.join(
            self._path, f".stream-stage-{uuidlib.uuid4().hex}.parquet"
        )
        os.makedirs(self._path, exist_ok=True)
        pq.write_table(tbl, staged)
        return _StagedFile(staged, n)

    # -- driver-side commit protocol ------------------------------------

    def commit(self, messages, batchId: int) -> None:
        import json as jsonlib
        import time
        import uuid as uuidlib

        staged = [
            m for m in messages
            if m is not None and getattr(m, "staged_path", "")
        ]
        t = DeltaLiteTable(self._path)
        latest = t.latest_version()
        if latest is not None:
            done = t.txn_versions().get(self._app_id, -1)
            if batchId <= done:
                for m in staged:  # replayed batch: already published
                    try:
                        os.remove(m.staged_path)
                    except FileNotFoundError:
                        pass
                return
        now_ms = int(time.time() * 1000)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "STREAMING UPDATE",
                    "operationParameters": {
                        "outputMode": "Append",
                        "epochId": batchId,
                    },
                    "engineInfo": "delta-lite/0.1 (stream sink)",
                }
            }
        ]
        if latest is None:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(uuidlib.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": self._schema.json(),
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": now_ms,
                    }
                }
            )
        else:
            meta, _live, proto = t._replay(latest)
            t._check_write_protocol(meta, proto, "append")
            if jsonlib.loads(meta["schemaString"]) != jsonlib.loads(
                self._schema.json()
            ):
                raise ValueError(
                    "stream schema differs from the table schema; "
                    "delta_lite does not evolve schemas implicitly"
                )
        for i, m in enumerate(sorted(staged, key=lambda m: m.staged_path)):
            final = os.path.join(
                self._path,
                f"part-stream-{batchId:012d}-{i:05d}-"
                f"{uuidlib.uuid4().hex[:12]}.parquet",
            )
            os.replace(m.staged_path, final)  # visible at publish
            actions.append(
                {
                    "add": {
                        "path": os.path.basename(final),
                        "partitionValues": {},
                        "size": os.path.getsize(final),
                        "modificationTime": now_ms,
                        "dataChange": True,
                    }
                }
            )
        actions.append(
            {
                "txn": {
                    "appId": self._app_id,
                    "version": int(batchId),
                    "lastUpdated": now_ms,
                }
            }
        )
        # pure append: a lost slot race retries onto the next version
        # (the txn action still guards against double-commit)
        t._commit(
            actions,
            (latest + 1) if latest is not None else 0,
            stale_sensitive=(latest is None),
            computed_against=latest,
            op_desc=f"streaming batch {batchId}",
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            p = getattr(m, "staged_path", "") if m is not None else ""
            if p:
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass


class DeltaLiteStreamDataSource(DataSource):
    """``spark.readStream.format("delta_lite")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "delta_lite"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_lite source requires .option('path', ...)")
        t = DeltaLiteTable(path)
        latest = t.latest_version()
        if latest is None:
            raise FileNotFoundError(f"no Delta log at {t.log_dir}")
        meta, _live, _proto = t._replay(latest)
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                TimestampType,
            )

            schema = StructType(
                list(schema.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", TimestampType()),
                ]
            )
        return schema

    def streamReader(self, schema: StructType) -> _DeltaStreamReader:
        return _DeltaStreamReader(schema, dict(self.options))

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> _DeltaStreamWriter:
        if overwrite:
            raise ValueError(
                "delta_lite sink supports append output mode only"
            )
        return _DeltaStreamWriter(schema, dict(self.options))
