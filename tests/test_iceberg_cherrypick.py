"""cherrypick_snapshot (r9): the WAP loop's recovery verb — re-apply
an audited APPEND onto a head that advanced past the audit branch
point, where fast_forward correctly refuses (diverged heads)."""

from __future__ import annotations

import pytest

from data_lakehouse_platform_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    IcebergProtocolError,
)

SCHEMA = "id long, v string"


def _rows(spark, t, **kw):
    return sorted((r.id, r.v) for r in t.read(spark, **kw).collect())


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_cherrypick_diverged_wap_branch(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.create_branch("audit")
    staged = t.write(_df(spark, [(2, "b")]), mode="append",
                     branch="audit")
    # main advances independently -> branches diverge
    t.write(_df(spark, [(3, "c")]), mode="append")
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("main", "audit")
    # the recovery verb: re-apply the audited append onto main's head
    new_id = t.cherrypick_snapshot(staged)
    assert _rows(spark, t) == [(1, "a"), (2, "b"), (3, "c")]
    snap = next(
        s for s in t.snapshots() if int(s["snapshot-id"]) == new_id
    )
    assert snap["summary"]["operation"] == "append"
    assert snap["summary"]["source-snapshot-id"] == str(staged)
    # audit branch itself is untouched
    assert _rows(spark, t, ref="audit") == [(1, "a"), (2, "b")]


def test_cherrypick_resequences_for_equality_deletes(spark, tmp_path):
    """The re-stamped sequence number is what makes the pick SOUND:
    an equality delete committed on main AFTER the audit branch point
    must still retract a matching cherry-picked row (the row arrives
    now, not at its original sequence)."""
    t = IcebergLiteTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.create_branch("audit")
    staged = t.write(_df(spark, [(2, "b")]), mode="append",
                     branch="audit")
    # main: delete key 2 (no row yet — pure tombstone for the future
    # at delete seq > staged's original seq)
    t.delete_equality(
        spark, spark.createDataFrame([(2,)], "id long"), ["id"]
    )
    t.cherrypick_snapshot(staged)
    # the delete has a LOWER sequence number than the re-applied rows,
    # so the spec gate (data seq < delete seq) does NOT retract them —
    # matching real Iceberg, where a cherry-picked append lands as a
    # NEW commit that later deletes would have to target again
    assert _rows(spark, t) == [(1, "a"), (2, "b")]


def test_cherrypick_refusals(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="append")
    head_append = t.current_snapshot_id()
    # ancestor: nothing to apply
    with pytest.raises(ValueError, match="already an ancestor"):
        t.cherrypick_snapshot(head_append)
    # non-append refused
    t.delete(spark, "id = 1")
    del_snap = t.current_snapshot_id()
    t.write(_df(spark, [(4, "d")]), mode="append")
    with pytest.raises(IcebergProtocolError, match="APPEND"):
        t.cherrypick_snapshot(del_snap)
    # unknown snapshot
    with pytest.raises(FileNotFoundError):
        t.cherrypick_snapshot(99999)


def test_refs_metadata_table(spark, tmp_path):
    """`tbl.refs` metadata table (r9): every named ref + the implicit
    main head — the audit surface of the WAP loop."""
    t = IcebergLiteTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.create_branch("audit")
    t.create_tag("v1")
    t.write(_df(spark, [(2, "b")]), mode="append", branch="audit")
    rows = {
        r.name: (r.type, r.snapshot_id)
        for r in t.metadata_table(spark, "refs").collect()
    }
    assert rows["main"] == ("branch", t.current_snapshot_id())
    assert rows["audit"][0] == "branch"
    assert rows["audit"][1] == t.resolve_ref("audit")
    assert rows["audit"][1] != t.current_snapshot_id()
    assert rows["v1"] == ("tag", 1)
