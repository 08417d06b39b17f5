"""Dependency-free read-only Apache Iceberg table reader (v1/v2).

The reference stack's interchange formats are the open table formats
(delta_lite covers Delta); Iceberg is the other one a migrating user
may hold.  No Iceberg runtime jar ships in this container (JARS.md),
but the table format is a PUBLIC spec (https://iceberg.apache.org/spec/)
whose metadata is plain JSON + Avro, so a snapshot read needs no jar:

* ``metadata/v{N}.metadata.json`` (or ``{seq}-{uuid}.metadata.json``)
  holds the snapshot list; ``version-hint.text`` points at the current
  one for filesystem catalogs;
* each snapshot names a MANIFEST LIST (Avro): one row per manifest,
  with ``content`` 0 = data manifests, 1 = delete manifests (v2);
* each manifest (Avro) holds ``manifest_entry`` rows: ``status``
  (0 existing / 1 added / 2 deleted) + a ``data_file`` record with
  ``file_path``, ``file_format``, and for v2 a ``content`` field
  (0 data / 1 position deletes / 2 equality deletes);
* POSITION DELETES are parquet files of (file_path, pos) pairs —
  applied here via the same ``_metadata.row_index`` anti-join
  delta_lite uses for deletion vectors (both formats index 0-based
  row positions within the named data file).

Avro decoding is writer-schema-driven (sources/avro_lite.py), so
manifests written by any engine decode without this module hard-coding
Iceberg's Avro schemas.  Capability boundary, refused loudly rather
than misread: format-version > 2, equality deletes, and non-parquet
data files.  Writes are out of scope — SnapshotTable/DeltaLiteTable
are the engine's write paths; this is the read edge for existing
Iceberg tables.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.avro_lite import read_container


class IcebergProtocolError(RuntimeError):
    """Table requires Iceberg features this reader does not speak."""


_VFILE_RE = re.compile(r"^v(\d+)\.metadata\.json$")
_SEQFILE_RE = re.compile(r"^(\d+)-[0-9a-fA-F-]+(?:\.gz)?\.metadata\.json$")


def _local_path(uri: str) -> str:
    """Iceberg metadata stores full URIs; strip the scheme for local
    filesystem access (file:///x, file:/x -> /x)."""
    if "://" in uri:
        uri = uri.split("://", 1)[1]
        if not uri.startswith("/"):
            uri = "/" + uri
    elif uri.startswith("file:"):
        uri = uri[len("file:"):]
    return urllib.parse.unquote(uri)


class IcebergLiteTable:
    def __init__(self, path: str, metadata_file: str | None = None):
        self.path = path
        self.metadata_dir = os.path.join(path, "metadata")
        self.metadata_file = metadata_file

    # -- metadata resolution --------------------------------------------

    def _resolve_metadata_file(self) -> str:
        if self.metadata_file:
            return self.metadata_file
        hint = os.path.join(self.metadata_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                v = fh.read().strip()
            cand = os.path.join(self.metadata_dir, f"v{v}.metadata.json")
            if os.path.exists(cand):
                return cand
        best: tuple[int, str] | None = None
        if os.path.isdir(self.metadata_dir):
            for f in os.listdir(self.metadata_dir):
                m = _VFILE_RE.match(f) or _SEQFILE_RE.match(f)
                if m:
                    key = (int(m.group(1)), f)
                    if best is None or key > best:
                        best = key
        if best is None:
            raise FileNotFoundError(
                f"no Iceberg metadata under {self.metadata_dir}"
            )
        return os.path.join(self.metadata_dir, best[1])

    def metadata(self) -> dict:
        with open(self._resolve_metadata_file()) as fh:
            meta = json.load(fh)
        fv = meta.get("format-version", 1)
        if fv not in (1, 2):
            raise IcebergProtocolError(
                f"format-version={fv}; this reader speaks v1/v2 and "
                "refuses rather than misread (v3 adds deletion vectors "
                "and row lineage with different semantics)"
            )
        return meta

    def snapshots(self) -> list[dict]:
        return self.metadata().get("snapshots", [])

    def current_snapshot_id(self) -> int | None:
        sid = self.metadata().get("current-snapshot-id")
        return None if sid in (None, -1) else int(sid)

    # -- snapshot read ---------------------------------------------------

    def _manifest_paths(self, snap: dict) -> list[tuple[str, int]]:
        """(manifest path, content) pairs — content 0 data, 1 deletes."""
        if "manifest-list" in snap:
            _, rows = read_container(_local_path(snap["manifest-list"]))
            return [
                (_local_path(r["manifest_path"]), int(r.get("content") or 0))
                for r in rows
            ]
        # v1 tables may embed the manifest list inline
        return [(_local_path(p), 0) for p in snap.get("manifests", [])]

    def _live_files(self, snap: dict) -> tuple[list[str], list[str]]:
        """Replay the snapshot's manifests: returns (data file paths,
        position-delete file paths); refuses equality deletes."""
        data_files: list[str] = []
        pos_deletes: list[str] = []
        for mpath, mcontent in self._manifest_paths(snap):
            _, entries = read_container(mpath)
            for e in entries:
                if int(e.get("status") or 0) == 2:  # DELETED entry
                    continue
                df = e["data_file"]
                content = int(df.get("content") or 0)
                fmt = str(df.get("file_format", "")).upper()
                if content == 2:
                    raise IcebergProtocolError(
                        "table has EQUALITY deletes; this reader applies "
                        "position deletes only and refuses rather than "
                        "resurrect deleted rows — compact the table "
                        "(rewrite_position_delete_files / major "
                        "compaction) or use an Iceberg runtime"
                    )
                if fmt != "PARQUET":
                    raise IcebergProtocolError(
                        f"data file format {fmt or '?'} not supported; "
                        "parquet only"
                    )
                if content == 1 or mcontent == 1:
                    pos_deletes.append(_local_path(df["file_path"]))
                else:
                    data_files.append(_local_path(df["file_path"]))
        return data_files, pos_deletes

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        """Snapshot read (current snapshot, or time travel by id).

        Identity-partitioned source columns are PRESENT in Iceberg data
        files (unlike hive layouts), so reading the parquet directly
        yields complete rows; position deletes are applied by
        (file, row-position) anti-join.
        """
        meta = self.metadata()
        snaps = {int(s["snapshot-id"]): s for s in meta.get("snapshots", [])}
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
            if snapshot_id is None:
                raise FileNotFoundError(
                    f"table at {self.path} has no current snapshot"
                )
        if snapshot_id not in snaps:
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not in table (have "
                f"{sorted(snaps)})"
            )
        data_files, pos_deletes = self._live_files(snaps[snapshot_id])
        if not data_files:
            raise FileNotFoundError(
                f"snapshot {snapshot_id} has no data files"
            )
        df = spark.read.parquet(*data_files)
        if pos_deletes:
            # Position-delete parquet: (file_path, pos[, row]).  Both
            # sides normalize to a scheme-less local path so the join
            # key matches _metadata.file_path regardless of URI
            # spelling.
            strip = lambda c: F.regexp_replace(  # noqa: E731
                c, "^[a-zA-Z0-9+.-]+:/+", "/"
            )
            deletes = (
                spark.read.parquet(*pos_deletes)
                .select(
                    strip(F.col("file_path")).alias("__ib_path"),
                    F.col("pos").cast("long").alias("__ib_pos"),
                )
            )
            df = (
                df.withColumn(
                    "__ib_path", strip(F.col("_metadata.file_path"))
                )
                .withColumn("__ib_pos", F.col("_metadata.row_index"))
                # No forced broadcast: delete files carry parquet size
                # stats, so Spark broadcasts small ones on its own and
                # a corpus-sized delete set degrades to a shuffled
                # anti-join instead of a driver OOM.
                .join(deletes, on=["__ib_path", "__ib_pos"], how="left_anti")
                .drop("__ib_path", "__ib_pos")
            )
        return df

    def history(self) -> list[dict]:
        return self.metadata().get("snapshot-log", [])
