"""A minimal snapshot table format on plain parquet: versioned
writes, time travel, copy-free rollback, history, vacuum.

The reference leans on Delta Lake for exactly these (gold tables are
Delta so SCD2 merges are transactional and old versions readable);
Delta isn't in this container, so this module provides the same
*operations* with the same log-structured design Delta/Iceberg use:

* data files are IMMUTABLE — every write creates a new uniquely-named
  data directory ``<path>/data/vN-<uuid>`` and commits a tiny JSON
  manifest ``<path>/_log/N.json`` pointing at it;
* readers resolve the manifest first (O(1), no listing of data dirs)
  and read only the referenced directory — a reader never sees a
  half-written version because the manifest is created last,
  atomically (O_EXCL — the commit point);
* version slots are claimed with O_EXCL creation, so history is never
  overwritten: a concurrent APPEND that loses the race retries onto
  the next slot, while a READ-MODIFY-WRITE commit (upsert, optimize)
  that loses raises :class:`ConcurrentModificationError` and is
  recomputed against the new latest snapshot — Delta's optimistic
  concurrency, including its conflicting-MERGE abort;
* rollback commits a NEW manifest referencing an OLD data directory —
  O(1), no data copied, full history preserved (Delta's RESTORE);
* vacuum deletes data directories no live manifest references
  (Delta's VACUUM).

Scale posture: the log is one small JSON per version (never scanned
as data); data dirs hold arbitrarily many parquet files written by
executors; nothing here is driver-sized except the manifest. On a
real deployment swap this for Delta/Iceberg — call sites keep the
same shape (write/read/time-travel/rollback/history).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentModificationError(RuntimeError):
    """A read-modify-write commit (upsert/optimize/ledger merge) found
    that another writer advanced the table past the snapshot the merge
    was computed from. Retrying the commit blindly would publish a
    stale merge and silently drop the other writer's rows — the same
    condition Delta surfaces as ConcurrentModificationException on a
    conflicting MERGE. Callers re-read and re-merge (upsert does this
    automatically) or give up."""


@dataclass(frozen=True)
class Snapshot:
    version: int
    data_dir: str
    operation: str
    committed_at: float
    row_count: int
    txn_id: str | None = None


class SnapshotTable:
    """Versioned parquet table with a JSON commit log."""

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_root = os.path.join(path, "data")

    # -- log ------------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self.log_dir)
            # Commit manifests are bare "<N>.json"; index sidecars
            # (bloom-N.json) live alongside and are not versions.
            if f.endswith(".json") and f[: -len(".json")].isdigit()
        )

    def _manifest(self, version: int) -> Snapshot:
        with open(os.path.join(self.log_dir, f"{version}.json")) as fh:
            m = json.load(fh)
        return Snapshot(
            version=m["version"],
            data_dir=m["data_dir"],
            operation=m["operation"],
            committed_at=m["committed_at"],
            row_count=m["row_count"],
            txn_id=m.get("txn_id"),
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _commit(
        self,
        version: int,
        data_dir: str,
        operation: str,
        row_count: int,
        txn_id: str | None = None,
        exact_version: bool = False,
    ) -> int:
        """Atomically claim a version slot (Delta-style optimistic
        concurrency). The manifest is created with O_EXCL, so exactly
        one writer can ever own ``N.json``: history is never
        overwritten. For blind APPENDS a concurrent committer that
        finds the slot taken simply moves to the next version (its
        rows don't depend on what it read). For READ-MODIFY-WRITE
        commits the caller passes ``exact_version=True`` — the merge
        was computed against version-1, so landing anywhere later
        would publish a stale merge that drops the intervening
        writer's rows; instead the slot loss raises
        :class:`ConcurrentModificationError` and the caller re-reads
        and re-merges (Delta's conflicting-MERGE abort). Data
        directories are immutable and uniquely named, so retrying a
        commit never rewrites data. Returns the version actually
        committed."""
        os.makedirs(self.log_dir, exist_ok=True)
        while True:
            manifest = {
                "version": version,
                "data_dir": data_dir,
                "operation": operation,
                "committed_at": time.time(),
                "row_count": row_count,
                "txn_id": txn_id,
            }
            target = os.path.join(self.log_dir, f"{version}.json")
            try:
                fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                # Lost the race for this slot — another writer
                # committed version N first. Re-check txn idempotence
                # (the winner might BE our replayed transaction), then
                # try the next slot.
                if txn_id is not None:
                    for s in self.history():
                        if s.txn_id == txn_id:
                            return s.version
                    if txn_id in self._retired_txns():
                        return version - 1  # committed then vacuumed
                if exact_version:
                    raise ConcurrentModificationError(
                        f"version {version} was committed by another writer "
                        f"while this merge was computed against version "
                        f"{version - 1}; re-read and re-merge"
                    )
                version += 1
                continue
            with os.fdopen(fd, "w") as fh:
                json.dump(manifest, fh)
            return version

    def _new_data_dir(self, version_hint: int) -> str:
        """Unique, immutable data-directory name. The uuid suffix
        decouples the directory from the version number so an
        optimistic-concurrency retry (commit landing at version+1)
        never needs to move data."""
        return f"v{version_hint}-{uuid.uuid4().hex[:8]}"

    # -- operations -----------------------------------------------------

    def txn_committed(self, txn_id: str) -> bool:
        """True when a commit carrying ``txn_id`` is already in the log
        — the Delta-style idempotent-writer check (txn appId+version)
        that turns at-least-once stream delivery into exactly-once
        table versions. Checks retired txns too: vacuum folds the
        txn_ids of dropped manifests into a sidecar so reclaiming
        history can never reopen the exactly-once window."""
        if any(s.txn_id == txn_id for s in self.history()):
            return True
        return txn_id in self._retired_txns()

    def _retired_txns(self) -> set[str]:
        try:
            with open(os.path.join(self.log_dir, "_retired_txns.json")) as fh:
                return set(json.load(fh))
        except FileNotFoundError:
            return set()

    def write_snapshot(
        self,
        df: DataFrame,
        operation: str = "write",
        txn_id: str | None = None,
        partition_by: list[str] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Commit `df` as the next version. Returns the new version.

        With ``txn_id``: if that transaction already committed, the
        write is skipped and the existing version returned (replay /
        retry safe).

        With ``partition_by``: the version's data directory is laid
        out hive-partitioned on those columns, so filtered reads of
        the snapshot get PARTITION PRUNING on top of time travel —
        Delta's partitioned-table layout per version. Different
        versions may use different partition specs (each version is a
        self-contained directory), which is partition-spec evolution
        for free.

        With ``base_version``: declares the commit a READ-MODIFY-WRITE
        derived from that snapshot — it must land at exactly
        ``base_version + 1`` or raise
        :class:`ConcurrentModificationError` (never silently publish a
        merge computed against a superseded snapshot)."""
        if txn_id is not None:
            for s in self.history():
                if s.txn_id == txn_id:
                    return s.version
            if txn_id in self._retired_txns():
                # the txn's manifest was vacuumed; its version number is
                # gone but the commit HAPPENED — replay must still skip.
                latest = self.latest_version()
                return latest if latest is not None else -1
        if base_version is not None:
            next_v = base_version + 1
        else:
            next_v = (self.latest_version() or 0) + 1 if self._versions() else 1
        rel_dir = self._new_data_dir(next_v)
        out = os.path.join(self.data_root, rel_dir)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        n = df.sparkSession.read.parquet(out).count()
        return self._commit(
            next_v,
            rel_dir,
            operation,
            n,
            txn_id=txn_id,
            exact_version=base_version is not None,
        )

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of_ts: float | None = None,
    ) -> DataFrame:
        """Latest snapshot, time-travel to `version`, or Delta-style
        ``timestampAsOf``: with ``as_of_ts`` (unix seconds), read the
        newest version committed at or before that instant — what the
        table looked like then, resolved from commit timestamps in the
        manifests (O(#versions) metadata reads, no data touched)."""
        if version is not None and as_of_ts is not None:
            raise ValueError("pass version OR as_of_ts, not both")
        if as_of_ts is not None:
            eligible = [
                s.version for s in self.history() if s.committed_at <= as_of_ts
            ]
            if not eligible:
                raise FileNotFoundError(
                    f"no snapshot at {self.path} committed at or before {as_of_ts}"
                )
            version = max(eligible)
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        snap = self._manifest(v)
        return spark.read.parquet(os.path.join(self.data_root, snap.data_dir))

    def changes(
        self,
        spark: SparkSession,
        key_cols: list[str],
        from_version: int,
        to_version: int,
    ) -> DataFrame:
        """Change data feed between two committed versions (Delta
        `table_changes` semantics): one row per inserted/deleted key,
        TWO rows per updated key (`update_preimage` with the old
        values, `update_postimage` with the new), each original column
        preserved plus `_change_type` and `_commit_version`.

        Computed as a single key-keyed full-outer join of the two
        snapshots with a row fingerprint for change detection — the
        reads co-partition on the key, so the diff costs one shuffle
        of each side regardless of how many commits lie between the
        versions. Reference analog: this is the batch twin of the
        Debezium CDC stream the reference consumes
        (scripts/real-time/orders_consumer.py) — same
        insert/update/delete row images, derived from snapshots
        instead of binlogs.
        """
        old = self.read(spark, from_version)
        new = self.read(spark, to_version)
        cols = new.columns
        val_cols = [c for c in cols if c not in key_cols]
        # Fingerprint only the non-key payload; same-engine compare, so
        # xxhash64 (fastest JVM hash) is fine here.
        # Null-safe key matching + literal presence markers: a NULL-
        # keyed row must behave like any other key (upsert() matches
        # null keys with eqNullSafe), and side-presence must never be
        # probed through a key column that can itself be NULL.
        o = old.select(
            *[F.col(c).alias(f"__o_{c}") for c in cols],
            F.xxhash64(*val_cols).alias("__oh"),
            F.lit(True).alias("__o_present"),
        )
        n = new.select(
            *[F.col(c).alias(f"__n_{c}") for c in cols],
            F.xxhash64(*val_cols).alias("__nh"),
            F.lit(True).alias("__n_present"),
        )
        cond = None
        for k in key_cols:
            t = F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}"))
            cond = t if cond is None else cond & t
        j = o.join(n, cond, "full_outer")

        def _emit(side: str, change: str, flt) -> DataFrame:
            return j.filter(flt).select(
                *[F.col(f"__{side}_{c}").alias(c) for c in cols],
                F.lit(change).alias("_change_type"),
                F.lit(to_version).alias("_commit_version"),
            )

        o_here = F.col("__o_present").isNotNull()
        n_here = F.col("__n_present").isNotNull()
        inserts = _emit("n", "insert", ~o_here)
        deletes = _emit("o", "delete", ~n_here)
        upd = o_here & n_here & (F.col("__oh") != F.col("__nh"))
        pre = _emit("o", "update_preimage", upd)
        post = _emit("n", "update_postimage", upd)
        return inserts.unionAll(deletes).unionAll(pre).unionAll(post)

    def upsert(
        self,
        df: DataFrame,
        key_cols: list[str],
        evolve_schema: bool = True,
        txn_id: str | None = None,
    ) -> int:
        """Delta-style ``MERGE`` with optional automatic schema
        evolution (Delta's ``mergeSchema``): rows in ``df`` replace
        same-key rows in the latest snapshot, other rows are kept, and
        with ``evolve_schema`` new columns in ``df`` are added to the
        table (pre-existing rows read NULL for them) while columns
        missing from ``df`` survive as NULL on the updated rows.

        Physically one anti join of old-vs-new keys + a union — the
        join keys co-partition, so at scale this is one shuffle of each
        side (or a broadcast when the upsert batch is small; AQE picks).
        Key matching is null-safe (``<=>``): a null-keyed row in ``df``
        REPLACES the null-keyed row in the table instead of silently
        duplicating it. A column present on both sides with a different
        type raises (no silent Spark coercion).

        Concurrency: the merge is computed against the latest snapshot
        and committed with ``base_version`` pinning — if another
        writer lands first, the stale merge is thrown away and
        recomputed against the new latest (bounded retries), so a
        concurrent writer's rows can never silently vanish. Reference
        analog: gold SCD merges (gold_dim_products.py:66-131) run
        DeltaTable.merge, which aborts conflicting merges the same way.
        """
        if txn_id is not None:
            for s in self.history():
                if s.txn_id == txn_id:
                    return s.version
        for _attempt in range(5):
            base = self.latest_version()
            if base is None:
                return self.write_snapshot(df, operation="upsert", txn_id=txn_id)
            old = self.read(df.sparkSession, version=base)
            old_cols, new_cols = set(old.columns), set(df.columns)
            extra = sorted(new_cols - old_cols)
            if extra and not evolve_schema:
                raise ValueError(
                    f"upsert adds columns {extra}; pass evolve_schema=True to allow"
                )
            new_types = dict(df.dtypes)
            old_types = dict(old.dtypes)
            mismatched = {
                c: (old_types[c], new_types[c])
                for c in sorted(old_cols & new_cols)
                if old_types[c] != new_types[c]
            }
            if mismatched:
                raise ValueError(
                    "upsert column types disagree with the table (cast the "
                    f"batch explicitly): {mismatched}"
                )
            # Align both sides to the union schema (old's order, then
            # new's additions) with typed NULLs for the missing columns.
            target = list(old.columns) + [c for c in df.columns if c not in old_cols]
            o = old.select(
                *[
                    F.col(c)
                    if c in old_cols
                    else F.lit(None).cast(new_types[c]).alias(c)
                    for c in target
                ]
            )
            n = df.select(
                *[
                    F.col(c)
                    if c in new_cols
                    else F.lit(None).cast(old_types[c]).alias(c)
                    for c in target
                ]
            )
            keys = n.select(
                *[F.col(k).alias(f"__k_{k}") for k in key_cols]
            ).distinct()
            anti_cond = None
            for k in key_cols:
                t = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
                anti_cond = t if anti_cond is None else anti_cond & t
            survivors = o.join(keys, anti_cond, "left_anti")
            merged = survivors.unionByName(n)
            try:
                return self.write_snapshot(
                    merged, operation="upsert", txn_id=txn_id, base_version=base
                )
            except ConcurrentModificationError:
                continue  # another writer landed — re-read, re-merge
        raise ConcurrentModificationError(
            f"upsert at {self.path} lost the commit race 5 times; "
            "writer contention too high"
        )

    # -- bloom-filter point-lookup index --------------------------------

    @staticmethod
    def _bloom_positions(value, m_bits: int, k: int) -> list[int]:
        """The k bit positions for ``value`` — md5-derived so the
        driver-side probe and the executor-side build agree bit-for-bit
        (same trick as the MinHash permutations: md5 of ``seed|value``
        string bytes is identical in Python, Spark, and DuckDB)."""
        import hashlib

        return [
            int(hashlib.md5(f"{seed}|{value}".encode()).hexdigest()[:8], 16) % m_bits
            for seed in range(k)
        ]

    def write_snapshot_bloom(
        self,
        df: DataFrame,
        bloom_col: str,
        n_files: int = 8,
        m_bits: int = 8192,
        k: int = 5,
        operation: str = "write-bloom",
        txn_id: str | None = None,
    ) -> int:
        """Commit a version hash-distributed on ``bloom_col`` with a
        per-file Bloom filter sidecar, so ``read_point_lookup`` opens
        only files that may contain the probed key — Delta's
        ``bloomFilterIndex`` for point lookups on a non-clustered,
        high-cardinality column (range stats can't skip for those).

        Build is executor-side: each file contributes at most
        ``m_bits`` distinct bit positions (a bounded collect_set), and
        the sidecar costs O(n_files * m_bits / 8) bytes — the same
        budget Delta spends on its index files; nothing driver-sized
        depends on row count.
        """
        if txn_id is not None:
            for s in self.history():
                if s.txn_id == txn_id:
                    return s.version
        next_v = (self.latest_version() or 0) + 1 if self._versions() else 1
        rel_dir = self._new_data_dir(next_v)
        out = os.path.join(self.data_root, rel_dir)
        df.repartition(n_files, F.col(bloom_col)).write.mode("errorifexists").parquet(out)

        back = df.sparkSession.read.parquet(out)
        n = back.count()
        pos_exprs = [
            f"cast(conv(substring(md5(cast(concat('{seed}', '|', cast({bloom_col} as string)) as binary)), 1, 8), 16, 10) as bigint) % {m_bits}"
            for seed in range(k)
        ]
        per_file = (
            back.select(
                F.input_file_name().alias("__file"),
                F.explode(F.array(*[F.expr(e) for e in pos_exprs])).alias("__pos"),
            )
            .groupBy("__file")
            .agg(F.collect_set("__pos").alias("__bits"))
            .collect()
        )
        blooms = {}
        for row in per_file:
            bitmap = 0
            for p in row["__bits"]:
                bitmap |= 1 << int(p)
            blooms[os.path.basename(row["__file"])] = f"{bitmap:x}"
        # Commit first (the version may shift if another writer raced
        # us), then write the sidecar under the FINAL version. A reader
        # probing in the tiny window between the two sees the documented
        # fail-loud FileNotFoundError, never wrong results.
        final_v = self._commit(next_v, rel_dir, operation, n, txn_id=txn_id)
        if self._manifest(final_v).data_dir != rel_dir:
            # txn replay: the slot check matched an EXISTING commit for
            # this txn_id, whose manifest points at the original data
            # dir — our freshly written dir is an orphan (vacuum will
            # reclaim it). Writing a sidecar keyed to our orphan's file
            # names would destroy the committed version's valid index.
            return final_v
        os.makedirs(self.log_dir, exist_ok=True)
        with open(os.path.join(self.log_dir, f"bloom-{final_v}.json"), "w") as fh:
            json.dump(
                {"column": bloom_col, "m_bits": m_bits, "k": k, "files": blooms}, fh
            )
        return final_v

    def read_point_lookup(
        self, spark: SparkSession, value, version: int | None = None
    ) -> DataFrame:
        """Point lookup through the version's Bloom sidecar: test the
        probe's k bits against each file's bitmap, scan only files
        where every bit is set (false positives re-filtered by the
        exact predicate; false negatives impossible). Falls back to a
        full filtered scan when the version carries no bloom index."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        snap = self._manifest(v)
        data_dir = os.path.join(self.data_root, snap.data_dir)
        sidecar = os.path.join(self.log_dir, f"bloom-{v}.json")
        if not os.path.exists(sidecar):
            raise FileNotFoundError(
                f"version {v} has no bloom index; use read() with a filter"
            )
        with open(sidecar) as fh:
            idx = json.load(fh)
        col, m_bits, k = idx["column"], idx["m_bits"], idx["k"]
        positions = self._bloom_positions(value, m_bits, k)
        candidates = [
            os.path.join(data_dir, fname)
            for fname, hexmap in idx["files"].items()
            if all((int(hexmap, 16) >> p) & 1 for p in positions)
        ]
        base = spark.read.parquet(data_dir)
        if not candidates:
            return base.where(F.lit(False))
        return spark.read.parquet(*candidates).where(F.col(col) == F.lit(value))

    def optimize(self, spark: SparkSession, target_files: int = 4) -> int:
        """Delta ``OPTIMIZE`` (bin-packing compaction) as a commit:
        rewrite the latest version's many small files into
        ``target_files`` larger ones and commit the result as a new
        version. Data is byte-identical (same rows), old versions stay
        time-travelable, and vacuum can later reclaim the small-file
        directory. Streaming sinks create exactly the small-file debris
        this removes (one file per micro-batch per partition).

        At scale, target_files comes from total bytes / desired file
        size (Delta uses ~1 GB); coalesce avoids a full shuffle — it
        merges existing partitions in place.
        """
        v = self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        df = self.read(spark, v).coalesce(target_files)
        # Read-modify-write: pin to the version we compacted so a
        # concurrent writer's commit is never shadowed by stale data.
        return self.write_snapshot(
            df, operation=f"optimize(from={v})", base_version=v
        )

    def rollback(self, to_version: int) -> int:
        """RESTORE: commit a new version whose data is an old version's
        directory. O(1) — no data moves; history stays intact."""
        old = self._manifest(to_version)
        next_v = self.latest_version() + 1
        return self._commit(
            next_v, old.data_dir, f"rollback(to={to_version})", old.row_count
        )

    def write_snapshot_clustered(
        self,
        df: DataFrame,
        cluster_col: str,
        n_files: int = 8,
        operation: str = "write-clustered",
        txn_id: str | None = None,
    ) -> int:
        """Commit a version laid out range-clustered on ``cluster_col``
        (each file owns a contiguous value slice) so `read_pruned` can
        skip files from footer stats alone — Delta's OPTIMIZE-then-
        data-skipping flow as one commit."""
        if txn_id is not None:
            for s in self.history():
                if s.txn_id == txn_id:
                    return s.version
        from data_lakehouse_platform_spark.sources.clustering import write_clustered

        next_v = (self.latest_version() or 0) + 1 if self._versions() else 1
        rel_dir = self._new_data_dir(next_v)
        out = os.path.join(self.data_root, rel_dir)
        write_clustered(df, out, cluster_col, n_files=n_files)
        n = df.sparkSession.read.parquet(out).count()
        return self._commit(next_v, rel_dir, operation, n, txn_id=txn_id)

    def read_pruned(
        self,
        spark: SparkSession,
        column: str,
        lo,
        hi,
        version: int | None = None,
    ) -> DataFrame:
        """Filtered read of a snapshot that consults per-file footer
        stats first (sources/clustering.py) — on a clustered commit a
        selective predicate opens a handful of files instead of the
        whole version directory. Conservative: files without stats are
        scanned. Composes with time travel via ``version``."""
        from data_lakehouse_platform_spark.sources.clustering import read_pruned

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        snap = self._manifest(v)
        return read_pruned(
            spark, os.path.join(self.data_root, snap.data_dir), column, lo, hi
        )

    def history(self) -> list[Snapshot]:
        return [self._manifest(v) for v in self._versions()]

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete data directories referenced by NO retained manifest.

        Keeps the last `keep_last` versions' manifests as the live set
        (older manifests remain readable history but their exclusive
        data may be reclaimed). Returns removed directory names.
        """
        vs = self._versions()
        live = {self._manifest(v).data_dir for v in vs[-keep_last:]}
        removed = []
        if not os.path.isdir(self.data_root):
            return removed
        for d in sorted(os.listdir(self.data_root)):
            if d not in live:
                shutil.rmtree(os.path.join(self.data_root, d), ignore_errors=True)
                removed.append(d)
        # Drop manifests whose data is gone so history() stays truthful
        # — but FIRST fold their txn_ids into the retired-txns sidecar:
        # deleting a manifest must never reopen the exactly-once window
        # for a replayed stream batch (txn_committed checks both).
        retiring = [
            v for v in vs if self._manifest(v).data_dir not in live
        ]
        txns = self._retired_txns()
        for v in retiring:
            t = self._manifest(v).txn_id
            if t:
                txns.add(t)
        tmp = os.path.join(self.log_dir, f"_retired_txns.{os.getpid()}.tmp")
        with open(tmp, "w") as fh:
            json.dump(sorted(txns), fh)
        os.replace(tmp, os.path.join(self.log_dir, "_retired_txns.json"))
        for v in retiring:
            os.remove(os.path.join(self.log_dir, f"{v}.json"))
        return removed
