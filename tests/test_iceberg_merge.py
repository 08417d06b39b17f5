"""Copy-on-write MERGE on iceberg_lite tables: file-scoped rewrites
via manifest surgery (touched entries DELETED, untouched carried as
EXISTING with original provenance), insert-only and update+insert
shapes, conditional clauses, position-delete interaction, and time
travel across the merge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.avro_lite import read_container
from data_lakehouse_platform_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    IcebergProtocolError,
)


def _table(spark, tmp_path, partitioned=True):
    t = IcebergLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, ["eu", "us", "ap"][i % 3], float(i)) for i in range(30)],
        "id int, region string, v double",
    )
    t.write(df, partition_by=["region"] if partitioned else None)
    return t


def _rows(t, spark, snapshot_id=None):
    return sorted(
        (r.id, r.region, r.v)
        for r in t.read(spark, snapshot_id=snapshot_id).collect()
    )


def test_merge_upsert_basic(spark, tmp_path):
    t = _table(spark, tmp_path)
    pre = _rows(t, spark)
    v0 = t.current_snapshot_id()
    src = spark.createDataFrame(
        [(0, "eu", 100.0), (3, "eu", 103.0), (99, "eu", 199.0)],
        "id int, region string, v double",
    )
    res = t.merge(spark, src, keys=["id"])
    got = dict((i, v) for i, _r, v in _rows(t, spark))
    assert got[0] == 100.0 and got[3] == 103.0 and got[99] == 199.0
    assert len(got) == 31
    # untouched rows unchanged
    assert got[1] == 1.0 and got[29] == 29.0
    # time travel: the pre-merge snapshot still reads exactly
    assert _rows(t, spark, snapshot_id=v0) == pre
    assert res["files_rewritten"] >= 1


def test_merge_rewrites_only_touched_partition_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    files_before = {p for p, _s, _pt in t.plan_files()[0]}
    # all source keys live in region=eu (id % 3 == 0)
    src = spark.createDataFrame(
        [(0, "eu", -1.0), (6, "eu", -2.0)],
        "id int, region string, v double",
    )
    t.merge(spark, src, keys=["id"])
    files_after = {p for p, _s, _pt in t.plan_files()[0]}
    # file-scoped: ONLY eu files (the ones holding ids 0/6) are
    # dropped; every us/ap file survives under its original path
    dropped = files_before - files_after
    assert dropped and all("region=eu" in p for p in dropped)
    us_ap_before = {
        p for p in files_before if "region=eu" not in p
    }
    assert us_ap_before <= files_after


def test_merge_manifest_surgery_provenance(spark, tmp_path):
    """Carried entries keep their ORIGINAL snapshot/sequence; touched
    entries are status-2 with the merging snapshot's id."""
    t = _table(spark, tmp_path)
    v0 = t.current_snapshot_id()
    src = spark.createDataFrame(
        [(0, "eu", -1.0)], "id int, region string, v double"
    )
    res = t.merge(spark, src, keys=["id"])
    meta = t.metadata()
    snap = next(
        s
        for s in meta["snapshots"]
        if int(s["snapshot-id"]) == res["snapshot_id"]
    )
    _, ml = read_container(snap["manifest-list"])
    surgical = [
        r
        for r in ml
        if int(r.get("deleted_files_count") or 0) > 0
    ]
    assert len(surgical) == 1
    _, entries = read_container(surgical[0]["manifest_path"])
    dead = [e for e in entries if int(e["status"]) == 2]
    kept = [e for e in entries if int(e["status"]) == 0]
    assert dead and all(
        int(e["snapshot_id"]) == res["snapshot_id"] for e in dead
    )
    # carried entries keep the ORIGINAL adding snapshot id
    assert all(int(e["snapshot_id"]) == v0 for e in kept)


def test_merge_insert_only(spark, tmp_path):
    t = _table(spark, tmp_path)
    files_before = {p for p, _s, _pt in t.plan_files()[0]}
    src = spark.createDataFrame(
        [(100, "eu", 1.0), (101, "us", 2.0)],
        "id int, region string, v double",
    )
    res = t.merge(spark, src, keys=["id"])
    assert res["files_rewritten"] == 0 and res["files_added"] >= 1
    files_after = {p for p, _s, _pt in t.plan_files()[0]}
    assert files_before <= files_after  # pure append of new files
    assert t.read(spark).count() == 32


def test_merge_noop_source(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.current_snapshot_id()
    src = spark.createDataFrame(
        [], "id int, region string, v double"
    )
    res = t.merge(spark, src, keys=["id"])
    assert res["snapshot_id"] == v0  # no commit at all
    assert t.current_snapshot_id() == v0


def test_merge_duplicate_source_keys_refused(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "eu", 1.0), (1, "eu", 2.0)],
        "id int, region string, v double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(spark, src, keys=["id"])


def test_merge_schema_mismatch_refused(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame([(1, "eu")], "id int, region string")
    with pytest.raises(ValueError, match="schema differs"):
        t.merge(spark, src, keys=["id"])


def test_merge_conditional_clauses(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(0, "eu", 50.0), (3, "eu", -3.0), (6, "eu", 6.0)],
        "id int, region string, v double",
    )
    # delete matches with negative source v; update only when s.v > t.v
    t.merge(
        spark,
        src,
        keys=["id"],
        matched_update_condition="s.v > t.v",
        matched_delete_condition="s.v < 0",
    )
    got = dict((i, v) for i, _r, v in _rows(t, spark))
    assert got[0] == 50.0      # updated (50 > 0)
    assert 3 not in got        # deleted
    assert got[6] == 6.0       # condition 6.0 > 6.0 false -> kept
    assert len(got) == 29


def test_merge_respects_position_deletes(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete(spark, "id = 1")
    src = spark.createDataFrame(
        # id=4 lives in the same region=us partition files as id=1
        [(4, "us", 44.0)], "id int, region string, v double"
    )
    t.merge(spark, src, keys=["id"])
    got = dict((i, v) for i, _r, v in _rows(t, spark))
    assert 1 not in got        # deleted row must NOT resurrect
    assert got[4] == 44.0
    assert len(got) == 29


def test_merge_then_expire_snapshots_keeps_current(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(0, "eu", -1.0), (77, "us", 77.0)],
        "id int, region string, v double",
    )
    t.merge(spark, src, keys=["id"])
    expected = _rows(t, spark)
    t.expire_snapshots(retain_last=1)
    assert _rows(t, spark) == expected
    # expired snapshot's exclusive files are gone, shared ones remain
    assert t.read(spark).count() == 31


def test_merge_unpartitioned_table(spark, tmp_path):
    t = _table(spark, tmp_path, partitioned=False)
    src = spark.createDataFrame(
        [(2, "eu", 22.0), (200, "xx", 0.5)],
        "id int, region string, v double",
    )
    t.merge(spark, src, keys=["id"])
    got = dict((i, v) for i, _r, v in _rows(t, spark))
    assert got[2] == 22.0 and got[200] == 0.5 and len(got) == 31


def test_merge_composite_keys(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(0, "eu", 9.0), (0, "us", 8.0)],
        "id int, region string, v double",
    )
    # composite key (id, region): only (0, eu) exists in the table
    t.merge(spark, src, keys=["id", "region"])
    rows = _rows(t, spark)
    assert (0, "eu", 9.0) in rows and (0, "us", 8.0) in rows
    assert len(rows) == 31
