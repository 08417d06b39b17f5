"""Delta SHALLOW CLONE: zero-copy table creation over absolute add
paths, independent evolution, DV carry as absolute descriptors, and
the clone-vacuum-never-touches-the-source guarantee."""

from __future__ import annotations

import os

import pytest

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
)


def _mk_source(spark, tmp_path, partitioned=False):
    src = DeltaLiteTable(str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(i, ["eu", "us"][i % 2], float(i)) for i in range(20)],
        "id int, region string, v double",
    )
    src.write(df, partition_by=["region"] if partitioned else None)
    return src


def _parquets_under(path):
    return [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = _mk_source(spark, tmp_path, partitioned=True)
    clone = src.clone_to(str(tmp_path / "c"))
    want = sorted(map(tuple, src.read(spark).collect()))
    got = sorted(map(tuple, clone.read(spark).collect()))
    assert got == want
    assert _parquets_under(clone.path) == []  # no data copied
    assert clone.latest_version() == 0  # fresh history


def test_clone_evolves_independently(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    clone = src.clone_to(str(tmp_path / "c"))
    clone.write(
        spark.createDataFrame([(100, "ap", 1.5)],
                              "id int, region string, v double"),
        mode="append",
    )
    clone.delete(spark, "id = 0", strategy="dv")
    assert src.read(spark).count() == 20        # source untouched
    got = {r.id for r in clone.read(spark).collect()}
    assert 0 not in got and 100 in got and len(got) == 20
    # the clone's DV landed under the CLONE root
    dvs = [
        f for f in os.listdir(clone.path)
        if f.startswith("deletion_vector_")
    ]
    assert dvs


def test_clone_update_rewrites_into_clone_dir(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    n_src_files = len(_parquets_under(src.path))
    clone = src.clone_to(str(tmp_path / "c"))
    clone.update(spark, "id = 3", {"v": "99.0"})
    assert len(_parquets_under(src.path)) == n_src_files  # source intact
    assert _parquets_under(clone.path)  # rewrite landed in the clone
    assert clone.read(spark, predicate="id = 3").collect()[0].v == 99.0
    assert src.read(spark, predicate="id = 3").collect()[0].v == 3.0


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    clone = src.clone_to(str(tmp_path / "c"))
    # clone overwrite tombstones the ABSOLUTE source files
    clone.write(
        spark.createDataFrame([(1, "eu", 1.0)],
                              "id int, region string, v double"),
        mode="overwrite",
    )
    before = set(_parquets_under(src.path))
    removed = clone.vacuum(retain_last=1)
    assert set(_parquets_under(src.path)) == before
    assert all(os.path.abspath(src.path) not in r for r in removed)
    assert src.read(spark).count() == 20


def test_clone_carries_dvs_as_absolute(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    src.delete(spark, "id < 3", strategy="dv")
    clone = src.clone_to(str(tmp_path / "c"))
    got = {r.id for r in clone.read(spark).collect()}
    assert got == set(range(3, 20))
    _meta, live, _proto = clone._replay(0)
    dv = next(a["deletionVector"] for a in live.values()
              if a.get("deletionVector"))
    assert dv["storageType"] == "p"
    assert os.path.isabs(dv["pathOrInlineDv"])


def test_clone_keeps_stats_skipping(spark, tmp_path):
    src = DeltaLiteTable(str(tmp_path / "src"))
    for lo in (0, 100, 200):
        src.write(
            spark.createDataFrame([(lo + i,) for i in range(10)],
                                  "id int").coalesce(1),
            mode="append",
        )
    clone = src.clone_to(str(tmp_path / "c"))
    kept, total = clone.files_matching(spark, "id >= 200")
    assert (len(kept), total) == (1, 3)
    got = sorted(r.id for r in clone.read(spark, predicate="id >= 205").collect())
    assert got == [205, 206, 207, 208, 209]


def test_clone_onto_existing_table_refused(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    other = DeltaLiteTable(str(tmp_path / "c"))
    other.write(spark.createDataFrame([(1,)], "x int"))
    with pytest.raises(ValueError, match="already holds"):
        src.clone_to(str(tmp_path / "c"))
