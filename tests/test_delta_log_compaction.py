"""Delta minor log compactions + .crc checksum files (r9): an adopted
table an ACTIVE delta-spark writer maintains contains
``{start}.{end}.compacted.json`` files and per-commit ``{v}.crc``
checksums.  Reads must tolerate both (previously silently true,
untested), and compactions now serve as a replay shortcut — the only
copy of a range after external log cleanup."""

from __future__ import annotations

import json
import os

import pytest

from data_lakehouse_platform_spark.sources.delta_lite import DeltaLiteTable


def _table(spark, tmp_path, n_commits=5):
    t = DeltaLiteTable(str(tmp_path / "t"))
    for i in range(n_commits):
        df = spark.createDataFrame(
            [(i * 10 + j, f"v{i}") for j in range(3)], "id int, val string"
        )
        t.write(df, mode="append" if i else "overwrite")
    return t


def _snap(spark, t, version=None):
    return sorted(tuple(r) for r in t.read(spark, version=version).collect())


def test_reads_tolerate_compacted_and_crc_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = _snap(spark, t)
    # what a live delta-spark writer leaves behind: a minor compaction
    # and per-commit checksum files
    t.compact_log(1, 3)
    for v in range(5):
        with open(os.path.join(t.log_dir, f"{v:020d}.crc"), "w") as fh:
            json.dump({"tableSizeBytes": 0, "numFiles": v + 1}, fh)
    assert t.all_versions() == [0, 1, 2, 3, 4]
    assert t.latest_version() == 4
    assert _snap(spark, t) == before
    assert _snap(spark, t, version=2) == _snap(spark, t, version=2)


def test_replay_prefers_compaction(spark, tmp_path):
    t = _table(spark, tmp_path)
    fname = t.compact_log(1, 3)
    segs = t._commit_segments(-1, 4)
    assert [f for f, _ in segs] == [
        "00000000000000000000.json", fname, "00000000000000000004.json"
    ]
    # interior version of the range: compaction unusable, JSONs used
    segs2 = t._commit_segments(-1, 2)
    assert [f for f, _ in segs2] == [
        f"{v:020d}.json" for v in range(3)
    ]


def test_compaction_is_only_copy_after_cleanup(spark, tmp_path):
    t = _table(spark, tmp_path)
    expect_latest = _snap(spark, t)
    expect_v3 = _snap(spark, t, version=3)
    t.compact_log(1, 3)
    for v in (1, 2, 3):
        os.remove(os.path.join(t.log_dir, f"{v:020d}.json"))
    assert _snap(spark, t) == expect_latest
    assert _snap(spark, t, version=3) == expect_v3
    # an interior version of the compacted range is NOT reconstructible
    # (reconciled actions carry only the end state) — loud, not wrong
    with pytest.raises(FileNotFoundError, match="not in log"):
        t.read(spark, version=2).collect()


def test_compaction_reconciles_removes_and_txns(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(i, "a") for i in range(6)],
                              "id int, val string")
    )
    t.write(
        spark.createDataFrame([(100, "b")], "id int, val string"),
        mode="append", txn=("job", 7),
    )
    t.delete(spark, "id < 3")  # rewrites files -> remove actions
    expect = _snap(spark, t)
    last = t.latest_version()
    t.compact_log(0, last)
    for v in range(last + 1):
        os.remove(os.path.join(t.log_dir, f"{v:020d}.json"))
    assert _snap(spark, t) == expect
    assert t.txn_versions() == {"job": 7}


def test_compact_log_refuses_missing_versions(spark, tmp_path):
    t = _table(spark, tmp_path, n_commits=3)
    with pytest.raises(FileNotFoundError, match="no JSON commit"):
        t.compact_log(1, 9)


def test_replay_reads_one_segment_for_compacted_range(spark, tmp_path):
    """The replay-cost contract: after compaction, reconstructing the
    latest state opens segment files proportional to SEGMENTS, not
    VERSIONS — a 100-commit adopted table with one compaction replays
    from 2 files, not 101."""
    t = DeltaLiteTable(str(tmp_path / "t"))
    for i in range(12):
        t.write(
            spark.createDataFrame([(i, "x")], "id int, val string"),
            mode="append" if i else "overwrite",
        )
    t.compact_log(0, 10)
    segs = t._commit_segments(-1, t.latest_version())
    assert len(segs) == 2  # the compaction + the one trailing JSON
    calls = []
    orig = t._segment_actions

    def counting(fname):
        calls.append(fname)
        return orig(fname)

    t._segment_actions = counting
    assert t.read(spark).count() == 12
    assert len(calls) == 2
    assert any(c.endswith(".compacted.json") for c in calls)
