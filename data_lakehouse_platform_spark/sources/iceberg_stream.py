"""Structured-Streaming SOURCE over iceberg_lite tables (Spark 4
Python DataSource stream API) — the Iceberg-Spark
``readStream.format("iceberg")`` surface for this engine's own
metadata format, the sibling of sources/delta_stream.py.

Contract (Iceberg's streaming read = the incremental APPEND scan,
repeated):

* **offset** = ``{"snapshot_id": N}`` — every snapshot up to and
  including ``N`` consumed.  Snapshot ids are assigned sequentially by
  this writer and the chain is validated by parent links, so a
  checkpointed range replays byte-identically: exactly-once.
* **first batch** = the SNAPSHOT at stream start (live files with
  POSITION deletes applied — deleted row indexes resolved driver-side
  from the delete files, which are delete-cardinality-sized like the
  metadata itself).  Tables whose bootstrap snapshot carries EQUALITY
  deletes are refused loudly (apply them in batch mode or start from
  ``startingSnapshotId=latest``).  ``startingSnapshotId=<id|latest>``
  starts the per-snapshot tail with no bootstrap.
* **later batches** serve each snapshot's APPENDED files
  (:meth:`IcebergLiteTable.incremental_append_files`): ``replace``
  (compaction) snapshots contribute nothing, ``delete`` / ``overwrite``
  snapshots refuse loudly unless ``skipChangeCommits=true`` (skip) or
  ``ignoreChanges=true`` (emit the files they added — rewritten rows
  re-emit, consumers dedup).
* **column resolution is BY FIELD-ID executor-side**: each partition
  ships the read-schema's (field-id, name, type) triples; the executor
  maps them to the file's physical columns through the parquet
  ``PARQUET:field_id`` footer metadata (falling back to by-name for
  id-less files), so renames between the range's snapshots read
  correctly and columns added later read as NULL.

Top-level atomic columns only (the streaming transport's row format);
nested struct/list/map tables are refused at plan time — read them in
batch mode.

Usage::

    spark.dataSource.register(IcebergLiteStreamDataSource)
    stream = (spark.readStream.format("iceberg_lite")
              .option("path", table_dir).load())
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType  # noqa: F401 (streamReader signature)

from data_lakehouse_platform_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    IcebergProtocolError,
)

__all__ = ["IcebergLiteStreamDataSource"]


def _schema_triples(table: IcebergLiteTable) -> list[tuple[int, str, str]]:
    """(field-id, name, spark DDL type) for the CURRENT schema's
    top-level fields; refuses unmappable or nested types."""
    meta = table.metadata()
    fields, _sid = table._current_schema(meta)
    out = []
    for f in fields:
        ddl = table._iceberg_type_to_spark_ddl(f["type"])
        if ddl is None or ddl.startswith(("struct<", "array<", "map<")):
            raise IcebergProtocolError(
                f"column {f['name']!r} has type {f['type']!r} — the "
                "streaming source serves top-level atomic columns "
                "only; read nested tables in batch mode"
            )
        out.append((int(f["id"]), str(f["name"]), ddl))
    return out


class _IceFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        triples: list[tuple[int, str, str]],
        deleted_rows: list[int],
        eq_filters: list[tuple[tuple[int, ...], frozenset]] | None = None,
    ):
        self.path = path
        self.triples = triples
        self.deleted_rows = deleted_rows
        # (equality field-id tuple, key-tuple set) per applicable
        # equality delete — already sequence-gated driver-side, so the
        # executor only does set-membership drops
        self.eq_filters = eq_filters or []


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(
                "iceberg_lite stream requires .option('path', ...)"
            )
        self._table = IcebergLiteTable(path)
        if self._table.current_snapshot_id() is None:
            raise FileNotFoundError(
                f"table at {path} has no current snapshot"
            )
        self._triples = _schema_triples(self._table)
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        self._starting = options.get("startingsnapshotid")

    # -- offsets -------------------------------------------------------

    def initialOffset(self) -> dict:
        if self._starting is None:
            return {"snapshot_id": -1}  # bootstrap snapshot first
        if str(self._starting).lower() == "latest":
            return {
                "snapshot_id": int(self._table.current_snapshot_id())
            }
        return {
            "snapshot_id": int(self._starting),
            "no_snapshot": True,
        }

    def latestOffset(self) -> dict:
        return {"snapshot_id": int(self._table.current_snapshot_id())}

    def commit(self, end: dict) -> None:
        pass  # the table metadata is the durable store

    # -- planning ------------------------------------------------------

    def _bootstrap_partitions(
        self, snapshot_id: int
    ) -> list[_IceFilePartition]:
        data_files, deletes = self._table.plan_files(snapshot_id)
        # EQUALITY deletes (r8 — the bootstrap table may be a Flink-
        # style upsert table this engine itself now writes): resolve
        # each delete file driver-side into (field-id tuple, key-tuple
        # set) — bounded by deleted-KEY cardinality, the same
        # boundedness argument as the position-delete lists below —
        # then gate per data file by the spec's strict
        # ``data seq < delete seq`` rule so each partition ships only
        # the filters that apply to IT.
        eq = [d for d in deletes if d["kind"] == "eq"]
        eq_resolved: list[tuple[tuple[int, ...], int, frozenset]] = []
        if eq:
            import pyarrow.parquet as pq

            id_to_name = {fid: name for fid, name, _d in self._triples}
            for d in sorted(eq, key=lambda d: (d["seq"], d["path"])):
                t = pq.read_table(d["path"])
                id_to_col: dict[int, str] = {}
                for f in t.schema:
                    fid = (f.metadata or {}).get(b"PARQUET:field_id")
                    if fid is not None:
                        id_to_col[int(fid)] = f.name
                col_vals = []
                for fid in d["equality_ids"]:
                    phys = id_to_col.get(int(fid))
                    if phys is None:
                        name = id_to_name.get(int(fid))
                        phys = (
                            name if name in t.column_names else None
                        )
                    # the id must ALSO be in the emitted schema — the
                    # executor matches key tuples against emitted rows
                    if phys is None or int(fid) not in id_to_name:
                        raise IcebergProtocolError(
                            f"equality delete {d['path']} references "
                            f"field id {fid} this schema cannot "
                            "resolve — refusing rather than resurrect "
                            "deleted rows"
                        )
                    col_vals.append(t.column(phys).to_pylist())
                keys = frozenset(zip(*col_vals)) if col_vals else frozenset()
                eq_resolved.append(
                    (
                        tuple(int(i) for i in d["equality_ids"]),
                        int(d["seq"]),
                        keys,
                    )
                )
        # position deletes: (file_path, pos) rows, resolved driver-side
        # — bounded by deleted-row cardinality, like the metadata.
        # file_path values come from _metadata.file_path, a URI whose
        # path may be percent-encoded — normalize to a scheme-less
        # local path (the batch reader's strip rule) and match each
        # data file under BOTH its raw and URI-encoded spelling.
        by_file: dict[str, list[int]] = {}
        pos_dels = [d for d in deletes if d["kind"] == "pos"]
        if pos_dels:
            import re

            import pyarrow.parquet as pq

            for d in pos_dels:
                t = pq.read_table(
                    d["path"], columns=["file_path", "pos"]
                )
                for fp, pos in zip(
                    t.column("file_path").to_pylist(),
                    t.column("pos").to_pylist(),
                ):
                    key = re.sub(r"^[a-zA-Z0-9+.-]+:/+", "/", str(fp))
                    by_file.setdefault(key, []).append(int(pos))

        def _deleted(p: str) -> list[int]:
            import urllib.parse

            ap = os.path.abspath(p)
            rows = by_file.get(ap) or by_file.get(
                urllib.parse.quote(ap, safe="/=")
            )
            return sorted(rows) if rows else []

        return [
            _IceFilePartition(
                p,
                self._triples,
                _deleted(p),
                [
                    (ids, keys)
                    for ids, dseq, keys in eq_resolved
                    if seq < dseq
                ],
            )
            for p, seq, _part in sorted(data_files)
        ]

    def partitions(self, start: dict, end: dict) -> list[_IceFilePartition]:
        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        if lo < 0 and not start.get("no_snapshot"):
            parts = self._bootstrap_partitions(hi)
            return parts or [_IceFilePartition("", self._triples, [])]
        if lo == hi:
            return [_IceFilePartition("", self._triples, [])]
        on_change = (
            "skip"
            if self._skip_change_commits
            else ("emit_added" if self._ignore_changes else "error")
        )
        files = self._table.incremental_append_files(
            lo, hi, on_change=on_change
        )
        return [
            _IceFilePartition(p, self._triples, [])
            for _sid, p, _seq, _part in files
        ] or [_IceFilePartition("", self._triples, [])]

    # -- executor-side read --------------------------------------------

    def read(self, partition: _IceFilePartition):
        if not partition.path:
            return iter(())
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        # field-id resolution: map each wanted field id to the file's
        # physical column through PARQUET:field_id footer metadata;
        # id-less files resolve by name (the batch reader's rule)
        id_to_col: dict[int, str] = {}
        for f in tbl.schema:
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                id_to_col[int(fid)] = f.name
        cols: list[list | None] = []
        for fid, name, ddl in partition.triples:
            phys = id_to_col.get(fid)
            if phys is None and not id_to_col:
                phys = name if name in tbl.column_names else None
            if phys is None:
                cols.append(None)  # added after this file: NULL
            else:
                vals = tbl.column(phys).to_pylist()
                if ddl == "date":
                    vals = [
                        v
                        if v is None or isinstance(v, _dt.date)
                        else _dt.date.fromisoformat(str(v))
                        for v in vals
                    ]
                cols.append(vals)
        n = tbl.num_rows
        deleted = set(partition.deleted_rows)
        # equality filters: map each filter's field ids to positions in
        # the emitted row (triples order), then drop rows whose key
        # tuple is in the filter's set — null-safe by construction
        # (None == None in python tuples, matching eqNullSafe)
        fid_pos = {
            fid: i for i, (fid, _n, _d) in enumerate(partition.triples)
        }
        eq_idx = [
            ([fid_pos[f] for f in ids], keys)
            for ids, keys in partition.eq_filters
        ]

        def _alive(row: tuple) -> bool:
            for idxs, keys in eq_idx:
                if tuple(row[j] for j in idxs) in keys:
                    return False
            return True

        rows = (
            tuple(c[i] if c is not None else None for c in cols)
            for i in range(n)
            if i not in deleted
        )
        return iter(r for r in rows if _alive(r)) if eq_idx else rows


class IcebergLiteStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_lite")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_lite"

    def schema(self) -> str:
        # a DDL string, not a StructType: schema() runs in the data-
        # source worker process where no SparkContext exists to parse
        # DDL into types
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "iceberg_lite source requires .option('path', ...)"
            )
        triples = _schema_triples(IcebergLiteTable(path))
        return ", ".join(f"`{n}` {d}" for _i, n, d in triples)

    def streamReader(self, schema: StructType) -> _IcebergStreamReader:
        return _IcebergStreamReader(dict(self.options))
