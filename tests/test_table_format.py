"""Snapshot table format: versioned writes, time travel, copy-free
rollback, history, vacuum (the Delta/Iceberg operation set on plain
parquet)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.table_format import SnapshotTable


def _df(spark, values):
    return spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id int, val string")


def test_versioned_write_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = t.write_snapshot(_df(spark, ["a", "b"]), operation="initial")
    v2 = t.write_snapshot(_df(spark, ["a", "b", "c"]), operation="append-rewrite")
    assert (v1, v2) == (1, 2)

    assert t.read(spark).count() == 3  # latest
    assert t.read(spark, version=1).count() == 2  # time travel
    ops = [s.operation for s in t.history()]
    assert ops == ["initial", "append-rewrite"]
    assert [s.row_count for s in t.history()] == [2, 3]


def test_rollback_is_copy_free(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.write_snapshot(_df(spark, ["a", "b"]))
    t.write_snapshot(_df(spark, ["x"]))
    v3 = t.rollback(to_version=1)

    assert v3 == 3
    assert sorted(r.val for r in t.read(spark).collect()) == ["a", "b"]
    # copy-free: v3 references v1's data directory
    snaps = {s.version: s for s in t.history()}
    assert snaps[3].data_dir == snaps[1].data_dir
    # only two physical data dirs exist
    assert len(os.listdir(tmp_path / "tbl" / "data")) == 2


def test_vacuum_keeps_referenced_data(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.write_snapshot(_df(spark, ["a"]))
    t.write_snapshot(_df(spark, ["b"]))
    t.rollback(to_version=1)  # v3 -> v1's dir

    v2_dir = {s2.version: s2.data_dir for s2 in t.history()}[2]
    removed = t.vacuum(keep_last=1)
    # v3 (latest) references v1's dir, so only v2's dir is reclaimable
    assert removed == [v2_dir]
    assert sorted(r.val for r in t.read(spark).collect()) == ["a"]
    # v2's manifest is gone (its data was reclaimed); v1 stays readable
    # because the rollback version still references its directory
    assert [s.version for s in t.history()] == [1, 3]
    assert t.read(spark, version=1).count() == 1


def test_txn_id_commits_are_idempotent(spark, tmp_path):
    """Replaying a committed transaction returns the existing version
    and writes nothing new — exactly-once under retry."""
    from data_lakehouse_platform_spark.sources.table_format import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(5).withColumnRenamed("id", "k")
    v1 = t.write_snapshot(df, operation="load", txn_id="batch-0")
    v_replay = t.write_snapshot(df, operation="load", txn_id="batch-0")
    assert v1 == v_replay == 1
    assert t.txn_committed("batch-0") and not t.txn_committed("batch-1")
    v2 = t.write_snapshot(df, operation="load", txn_id="batch-1")
    assert v2 == 2 and len(t.history()) == 2


def test_snapshot_schema_evolution(spark, tmp_path):
    """Each version carries its own schema: adding a column is just a
    new commit, old versions still read with their original schema."""
    from data_lakehouse_platform_spark.sources.table_format import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    v1_df = spark.range(3).withColumnRenamed("id", "k")
    t.write_snapshot(v1_df, operation="load")
    v2_df = v1_df.withColumn("flag", F.lit("new"))
    t.write_snapshot(v2_df, operation="evolve")
    assert t.read(spark, version=1).columns == ["k"]
    assert sorted(t.read(spark).columns) == ["flag", "k"]
    assert t.read(spark).filter("flag = 'new'").count() == 3


def test_clustered_snapshot_pruned_read(spark, tmp_path):
    """Clustered commit + footer-stats pruned read: exact filter
    results from a strict subset of the version's files; time travel
    still sees the earlier unclustered commit."""
    from data_lakehouse_platform_spark.catalog import load_table
    from tests.conftest import SF_DIR

    t = SnapshotTable(str(tmp_path / "t"))
    orders = load_table(spark, SF_DIR, "orders")
    t.write_snapshot(orders.limit(10), operation="seed")
    v2 = t.write_snapshot_clustered(orders, "o_totalprice", n_files=8)
    assert v2 == 2

    lo, hi = 1000.0, 5000.0
    pruned = t.read_pruned(spark, "o_totalprice", lo, hi)
    want = sorted(
        r["o_orderkey"]
        for r in orders.filter(F.col("o_totalprice").between(lo, hi)).collect()
    )
    assert sorted(r["o_orderkey"] for r in pruned.collect()) == want
    files_touched = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert 0 < len(files_touched) < 8
    # time travel unaffected
    assert t.read(spark, version=1).count() == 10
    # idempotent clustered commit via txn id
    v_replay = t.write_snapshot_clustered(
        orders, "o_totalprice", n_files=8, txn_id="c1"
    )
    v_replay2 = t.write_snapshot_clustered(
        orders, "o_totalprice", n_files=8, txn_id="c1"
    )
    assert v_replay == 3 and v_replay2 == 3


def test_change_data_feed_between_versions(spark, tmp_path):
    """changes(): Delta-CDF row images — insert/delete one row each,
    update emits pre+post images; replaying the feed onto the old
    version reproduces the new version exactly."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, val string, qty int"
        ),
        operation="v1",
    )
    t.write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "B", 99), (4, "d", 40)], "id int, val string, qty int"
        ),
        operation="v2",
    )

    feed = t.changes(spark, ["id"], from_version=1, to_version=2)
    got = {
        (r["id"], r["_change_type"]): (r["val"], r["qty"], r["_commit_version"])
        for r in feed.collect()
    }
    assert got == {
        (4, "insert"): ("d", 40, 2),
        (3, "delete"): ("c", 30, 2),
        (2, "update_preimage"): ("b", 20, 2),
        (2, "update_postimage"): ("B", 99, 2),
    }

    # CDC replay: old - deletes - pre-images + post-images + inserts == new.
    old_rows = {tuple(r) for r in t.read(spark, version=1).collect()}
    removed = {
        (r["id"], r["val"], r["qty"])
        for r in feed.filter(F.col("_change_type").isin("delete", "update_preimage")).collect()
    }
    added = {
        (r["id"], r["val"], r["qty"])
        for r in feed.filter(F.col("_change_type").isin("insert", "update_postimage")).collect()
    }
    new_rows = {tuple(r) for r in t.read(spark, version=2).collect()}
    assert (old_rows - removed) | added == new_rows


def test_upsert_merge_with_schema_evolution(spark, tmp_path):
    """Delta-MERGE analog: same-key rows replaced, new keys inserted,
    and a new column arriving mid-stream evolves the schema — old rows
    read NULL for it, time travel preserves the pre-evolution schema."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.upsert(_df(spark, ["a", "b", "c"]), key_cols=["id"])  # v1: ids 0,1,2

    batch = spark.createDataFrame(
        [(1, "B", "eu"), (9, "z", "us")], "id int, val string, region string"
    )
    v2 = t.upsert(batch, key_cols=["id"])
    assert v2 == 2
    got = {r["id"]: (r["val"], r["region"]) for r in t.read(spark).collect()}
    assert got == {0: ("a", None), 1: ("B", "eu"), 2: ("c", None), 9: ("z", "us")}
    # time travel: v1 keeps its original 2-column schema
    assert t.read(spark, version=1).columns == ["id", "val"]
    # evolve_schema=False rejects new columns instead of silently dropping
    import pytest as _pytest

    with _pytest.raises(ValueError, match="evolve_schema"):
        t.upsert(
            spark.createDataFrame([(0, "x", 1.0)], "id int, val string, w double"),
            key_cols=["id"],
            evolve_schema=False,
        )
    # columns missing from a later batch survive as NULL on updated rows
    v3 = t.upsert(spark.createDataFrame([(9, "Z")], "id int, val string"), ["id"])
    got3 = {r["id"]: (r["val"], r["region"]) for r in t.read(spark, version=v3).collect()}
    assert got3[9] == ("Z", None) and got3[1] == ("B", "eu")
    # idempotent replay via txn id
    v4 = t.upsert(spark.createDataFrame([(0, "q")], "id int, val string"), ["id"], txn_id="u1")
    v4b = t.upsert(spark.createDataFrame([(0, "q")], "id int, val string"), ["id"], txn_id="u1")
    assert v4 == v4b


def test_bloom_index_point_lookup_skips_files(spark, tmp_path):
    """Bloom-sidecar point lookup: exact same result as a full filtered
    scan, touching a strict subset of the version's files; absent keys
    come back empty (usually zero files opened); composes with time
    travel."""
    from data_lakehouse_platform_spark.catalog import load_table
    from tests.conftest import SF_DIR

    t = SnapshotTable(str(tmp_path / "t"))
    orders = load_table(spark, SF_DIR, "orders")
    t.write_snapshot(orders.limit(5), operation="seed")
    v2 = t.write_snapshot_bloom(orders, "o_orderkey", n_files=8)
    assert v2 == 2

    keys = [r["o_orderkey"] for r in orders.select("o_orderkey").limit(3).collect()]
    total_files = orders.count() and 8
    for k in keys:
        hit = t.read_point_lookup(spark, k)
        want = [tuple(r) for r in orders.where(F.col("o_orderkey") == k).collect()]
        assert sorted(tuple(r) for r in hit.collect()) == sorted(want)
        touched = {r[0] for r in hit.select(F.input_file_name()).distinct().collect()}
        assert 0 < len(touched) < total_files
    # absent key: no false negatives possible; result must be empty
    assert t.read_point_lookup(spark, -12345).count() == 0
    # time travel to a bloom-less version raises the documented error
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="bloom"):
        t.read_point_lookup(spark, keys[0], version=1)


def test_optimize_compacts_small_files(spark, tmp_path):
    """OPTIMIZE: a fragmented version (many tiny files) is rewritten
    into few larger files as a NEW commit — same rows, old fragmented
    version still time-travelable, vacuum reclaims the debris."""
    t = SnapshotTable(str(tmp_path / "t"))
    frag = spark.range(200).repartition(16).withColumnRenamed("id", "k")
    v1 = t.write_snapshot(frag, operation="fragmented-load")

    def n_files(version):
        d = os.path.join(t.data_root, t._manifest(version).data_dir)
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    assert n_files(v1) == 16
    v1_dir = t._manifest(v1).data_dir
    v2 = t.optimize(spark, target_files=4)
    assert v2 == v1 + 1 and n_files(v2) <= 4
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(200))
    assert sorted(r["k"] for r in t.read(spark, version=v1).collect()) == list(range(200))
    assert t.history()[-1].operation == f"optimize(from={v1})"
    removed = t.vacuum(keep_last=1)
    assert v1_dir in removed


def test_concurrent_commit_conflict_retries_not_clobbers(spark, tmp_path):
    """Optimistic concurrency: when another writer claims the version
    slot first (simulated by pre-creating its manifest), a committer
    retries onto the NEXT slot — history is never overwritten, both
    writes survive, and txn replay still resolves to the winner."""
    import json as _json

    t = SnapshotTable(str(tmp_path / "t"))
    t.write_snapshot(_df(spark, ["a"]))  # v1

    # Writer X half-commits: claims slot 2 directly (the race winner).
    os.makedirs(t.log_dir, exist_ok=True)
    foreign = {
        "version": 2,
        "data_dir": t._manifest(1).data_dir,  # reuse v1's data for realism
        "operation": "foreign-write",
        "committed_at": 0.0,
        "row_count": 1,
        "txn_id": "batch-X",
    }
    with open(os.path.join(t.log_dir, "2.json"), "w") as fh:
        _json.dump(foreign, fh)

    # Writer Y computed next_v=2 concurrently; its commit must land at 3.
    v = t.write_snapshot(_df(spark, ["y1", "y2"]), operation="mine")
    assert v == 3
    assert [s.version for s in t.history()] == [1, 2, 3]
    assert t.history()[1].operation == "foreign-write"  # untouched
    assert sorted(r.val for r in t.read(spark, version=3).collect()) == ["y1", "y2"]

    # txn idempotence across the conflict: replaying the WINNER's txn id
    # returns its version instead of double-committing
    v_replay = t.write_snapshot(_df(spark, ["zzz"]), txn_id="batch-X")
    assert v_replay == 2 and t.latest_version() == 3


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """Delta-style timestampAsOf: reading at an instant resolves to
    the newest commit at-or-before it; instants before the first
    commit fail loudly; version and timestamp selectors are mutually
    exclusive."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    t.write_snapshot(_df(spark, ["a"]))
    t1 = t.history()[-1].committed_at
    t.write_snapshot(_df(spark, ["a", "b"]))
    t2 = t.history()[-1].committed_at

    assert [r.val for r in t.read(spark, as_of_ts=t1).collect()] == ["a"]
    assert sorted(r.val for r in t.read(spark, as_of_ts=t2 + 10).collect()) == ["a", "b"]
    # between the two commits -> still v1
    mid = (t1 + t2) / 2 if t2 > t1 else t1
    assert [r.val for r in t.read(spark, as_of_ts=mid).collect()] == ["a"]
    with _pytest.raises(FileNotFoundError, match="at or before"):
        t.read(spark, as_of_ts=t1 - 1000)
    with _pytest.raises(ValueError, match="not both"):
        t.read(spark, version=1, as_of_ts=t1)


def test_partitioned_snapshot_prunes_partitions(spark, tmp_path):
    """Partitioned commits: a snapshot written partitionBy(date-ish
    column) serves filtered reads from ONLY the matching partition
    directories (partition pruning composes with time travel), and a
    later version may change the partition spec entirely."""
    from data_lakehouse_platform_spark.catalog import load_table
    from tests.conftest import SF_DIR

    t = SnapshotTable(str(tmp_path / "t"))
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    v1 = t.write_snapshot(orders, partition_by=["order_month"])

    months = [r["order_month"] for r in orders.select("order_month").distinct().collect()]
    pick = sorted(months)[0]
    filtered = t.read(spark, v1).where(F.col("order_month") == pick)
    want = orders.where(F.col("order_month") == pick).count()
    assert filtered.count() == want > 0
    touched = {
        r[0] for r in filtered.select(F.input_file_name()).distinct().collect()
    }
    assert all(f"order_month={pick}" in f for f in touched)

    # partition-spec evolution: next version partitions by status
    v2 = t.write_snapshot(orders, partition_by=["o_orderstatus"])
    f2 = t.read(spark, v2).where(F.col("o_orderstatus") == "F")
    touched2 = {r[0] for r in f2.select(F.input_file_name()).distinct().collect()}
    assert touched2 and all("o_orderstatus=F" in f for f in touched2)
    # v1 still reads with its own layout
    assert t.read(spark, v1).count() == orders.count()


def test_read_modify_write_conflict_raises_not_clobbers(spark, tmp_path):
    """A merge committed with base_version pinning must land at
    base+1; if another writer took the slot first, the stale merge
    raises ConcurrentModificationError instead of silently publishing
    onto a later slot and dropping the intervening writer's rows."""
    from data_lakehouse_platform_spark.sources.table_format import (
        ConcurrentModificationError,
    )
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    base = t.write_snapshot(_df(spark, ["a"]))  # v1
    # Another writer lands v2 while our merge (computed against v1) is
    # in flight.
    t.write_snapshot(_df(spark, ["a", "b"]), operation="foreign-append")
    with _pytest.raises(ConcurrentModificationError):
        t.write_snapshot(_df(spark, ["stale-merge"]), base_version=base)
    # History untouched: the foreign append is still the latest.
    assert t.history()[-1].operation == "foreign-append"


def test_upsert_remerges_after_concurrent_writer(spark, tmp_path):
    """upsert recomputes its merge when a concurrent writer lands
    between its read and its commit — the concurrent writer's rows
    survive in the final snapshot (Delta's conflicting-MERGE abort +
    retry), instead of silently vanishing under a stale merge."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.write_snapshot(
        spark.createDataFrame([(1, "one"), (2, "two")], "id int, val string")
    )

    # Simulate the race: the first time upsert reads the table, sneak
    # in a competing append (id=3) AFTER the read, so upsert's first
    # commit attempt is computed against a superseded snapshot.
    original_read = SnapshotTable.read
    state = {"raced": False}

    def racing_read(self, s, version=None, as_of_ts=None):
        out = original_read(self, s, version=version, as_of_ts=as_of_ts)
        if not state["raced"]:
            state["raced"] = True
            original_read_df = out.localCheckpoint()  # pin pre-race data
            t.write_snapshot(
                spark.createDataFrame(
                    [(1, "one"), (2, "two"), (3, "three")], "id int, val string"
                ),
                operation="concurrent-append",
            )
            return original_read_df
        return out

    SnapshotTable.read = racing_read
    try:
        t.upsert(
            spark.createDataFrame([(2, "TWO")], "id int, val string"),
            key_cols=["id"],
        )
    finally:
        SnapshotTable.read = original_read

    rows = {(r.id, r.val) for r in t.read(spark).collect()}
    # id=3 from the concurrent writer MUST survive; id=2 updated.
    assert rows == {(1, "one"), (2, "TWO"), (3, "three")}


def test_upsert_null_key_replaces_not_duplicates(spark, tmp_path):
    """Null-safe key matching: a null-keyed upsert row replaces the
    existing null-keyed row instead of duplicating it."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.write_snapshot(
        spark.createDataFrame([(None, "old-null"), (1, "one")], "id int, val string")
    )
    t.upsert(
        spark.createDataFrame([(None, "new-null")], "id int, val string"),
        key_cols=["id"],
    )
    rows = {(r.id, r.val) for r in t.read(spark).collect()}
    assert rows == {(None, "new-null"), (1, "one")}


def test_upsert_type_mismatch_raises(spark, tmp_path):
    """A shared column with a different type raises loudly instead of
    passing through to unionByName / silent coercion."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    t.write_snapshot(spark.createDataFrame([(1, "one")], "id int, val string"))
    with _pytest.raises(ValueError, match="types disagree"):
        t.upsert(
            spark.createDataFrame([(1, 999)], "id int, val bigint"),
            key_cols=["id"],
        )


def test_bloom_sidecar_not_clobbered_by_txn_replay(spark, tmp_path):
    """Replaying a bloom write with the same txn_id must NOT overwrite
    the committed version's sidecar with file names from the replay's
    orphan data directory — point lookups keep working."""
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(i, f"k{i}") for i in range(64)], "id int, key string")
    v1 = t.write_snapshot_bloom(df, "key", n_files=4, txn_id="batch-7")
    before = t.read_point_lookup(spark, "k13", version=v1).collect()
    assert [r.id for r in before] == [13]

    # Replay the same transaction (at-least-once delivery).
    v2 = t.write_snapshot_bloom(df, "key", n_files=4, txn_id="batch-7")
    assert v2 == v1  # idempotent commit
    after = t.read_point_lookup(spark, "k13", version=v1).collect()
    assert [r.id for r in after] == [13]  # sidecar still valid


def test_changes_null_keyed_rows(spark, tmp_path):
    """CDC must treat a NULL key like any other key (null-safe match):
    unchanged null-keyed rows emit nothing; an updated one emits a
    pre/post image pair — never spurious all-null inserts/deletes."""
    t = SnapshotTable(str(tmp_path / "nullkey"))
    v0 = t.write_snapshot(
        spark.createDataFrame(
            [(None, "a", 1.0), (1, "b", 2.0)], "k bigint, g string, v double"
        )
    )
    v1 = t.write_snapshot(
        spark.createDataFrame(
            [(None, "a", 1.0), (1, "b", 2.0)], "k bigint, g string, v double"
        )
    )
    assert t.changes(spark, ["k"], v0, v1).count() == 0

    v2 = t.write_snapshot(
        spark.createDataFrame(
            [(None, "a", 9.0), (1, "b", 2.0)], "k bigint, g string, v double"
        )
    )
    cdf = t.changes(spark, ["k"], v1, v2).collect()
    kinds = sorted(r._change_type for r in cdf)
    assert kinds == ["update_postimage", "update_preimage"]
    assert all(r.k is None for r in cdf)


def test_vacuum_preserves_txn_idempotence(spark, tmp_path):
    """Reclaiming old versions must not reopen the exactly-once window:
    a txn_id whose manifest was vacuumed still reports committed, and a
    replayed commit with that txn_id is skipped."""
    t = SnapshotTable(str(tmp_path / "txnvac"))
    df1 = spark.createDataFrame([(1, "x")], "k bigint, s string")
    df2 = spark.createDataFrame([(2, "y")], "k bigint, s string")
    t.write_snapshot(df1, txn_id="stream:ck:7")
    t.write_snapshot(df2)  # newer version; v0 becomes vacuumable
    t.vacuum(keep_last=1)
    assert t.txn_committed("stream:ck:7")
    v_before = t.latest_version()
    t.write_snapshot(df1, txn_id="stream:ck:7")  # replayed batch
    assert t.latest_version() == v_before  # skipped, not re-committed
