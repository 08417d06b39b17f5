"""Delta column mapping WRITES + schema evolution verbs: upgrade
(annotate every nesting level, bump protocol), rename/drop as
metadata-only commits, add_column with never-reused ids, physical-name
staging for every mutating verb, CDF under mapping, and the
no-resurrection rule for re-added names."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
    DeltaProtocolError,
)


def _mk(spark, tmp_path, conf=None):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id int, name string, v double"
    )
    t.write(df.coalesce(1), configuration=conf)
    return t


def _meta(t):
    meta, _live, proto = t._replay(t.latest_version())
    return meta, proto


def test_upgrade_annotates_and_bumps_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = sorted(map(tuple, t.read(spark).collect()))
    t.upgrade_column_mapping()
    meta, proto = _meta(t)
    conf = meta["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"
    assert conf["delta.columnMapping.maxColumnId"] == "3"
    fields = json.loads(meta["schemaString"])["fields"]
    ids = [f["metadata"]["delta.columnMapping.id"] for f in fields]
    assert ids == [1, 2, 3]
    assert all(
        f["metadata"]["delta.columnMapping.physicalName"] == f["name"]
        for f in fields
    )
    assert proto["minReaderVersion"] >= 2
    assert proto["minWriterVersion"] >= 5
    # reads unchanged across the upgrade
    assert sorted(map(tuple, t.read(spark).collect())) == before


def test_upgrade_annotates_nested_levels(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, ("x", [1, 2]))],
        "id int, s struct<a:string, bs:array<int>>",
    )
    t.write(df)
    t.upgrade_column_mapping()
    meta, _ = _meta(t)
    sfield = json.loads(meta["schemaString"])["fields"][1]
    inner = sfield["type"]["fields"]
    assert all(
        "delta.columnMapping.physicalName" in f["metadata"] for f in inner
    )
    # 4 fields total: id, s, s.a, s.bs
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] == "4"


def test_rename_is_metadata_only_and_reads_back(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = {a for a in os.listdir(t.path) if a != "_delta_log"}
    t.upgrade_column_mapping()
    t.rename_column("name", "label")
    assert {a for a in os.listdir(t.path) if a != "_delta_log"} == (
        files_before
    )  # no data files touched
    got = sorted(map(tuple, t.read(spark).select("id", "label").collect()))
    assert got == [(1, "a"), (2, "b")]
    # time travel BEFORE the rename still shows the old name
    old = t.read(spark, version=0)
    assert "name" in old.columns and "label" not in old.columns


def test_write_after_rename_stages_physical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upgrade_column_mapping()
    t.rename_column("name", "label")
    t.write(
        spark.createDataFrame(
            [(3, "c", 30.0)], "id int, label string, v double"
        ),
        mode="append",
    )
    got = sorted(map(tuple, t.read(spark).collect()))
    assert (3, "c", 30.0) in got and len(got) == 3
    # the NEW data file physically stores the ORIGINAL column name
    # (physicalName survives the rename)
    meta, _ = _meta(t)
    v = t.latest_version()
    acts = [json.loads(line) for line in open(
        os.path.join(t.log_dir, f"{v:020d}.json"))]
    rel = next(a["add"]["path"] for a in acts if "add" in a)
    raw = spark.read.parquet(os.path.join(t.path, rel))
    assert "name" in raw.columns and "label" not in raw.columns
    # stats keys are physical too -> skipping still prunes on the
    # LOGICAL name in predicates
    kept, total = t.files_matching(spark, "label = 'zzz'")
    assert len(kept) < total


def test_partition_column_rename(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, ["eu", "us"][i % 2]) for i in range(6)],
        "id int, region string",
    )
    t.write(df, partition_by=["region"])
    t.upgrade_column_mapping()
    t.rename_column("region", "zone")
    meta, _ = _meta(t)
    assert meta["partitionColumns"] == ["zone"]
    got = sorted(
        (r.id, r.zone) for r in t.read(spark).collect()
    )
    assert got == [(i, ["eu", "us"][i % 2]) for i in range(6)]
    # appends after the rename partition correctly
    t.write(
        spark.createDataFrame([(10, "ap")], "id int, zone string"),
        mode="append",
    )
    assert (
        t.read(spark, predicate="zone = 'ap'").count() == 1
    )


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upgrade_column_mapping()
    t.drop_column("name")
    assert t.read(spark).columns == ["id", "v"]
    t.add_column("name", "string")
    got = {r.id: r.name for r in t.read(spark).collect()}
    # the re-added column reads NULL — old bytes stay buried under the
    # old physicalName
    assert got == {1: None, 2: None}
    meta, _ = _meta(t)
    f = json.loads(meta["schemaString"])["fields"][-1]
    assert f["metadata"]["delta.columnMapping.physicalName"].startswith(
        "col-"
    )
    assert f["metadata"]["delta.columnMapping.id"] == 4


def test_add_column_on_unmapped_table(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("extra", "bigint")
    assert t.read(spark).columns == ["id", "name", "v", "extra"]
    t.write(
        spark.createDataFrame(
            [(9, "z", 0.5, 99)], "id int, name string, v double, extra bigint"
        ),
        mode="append",
    )
    got = {r.id: r.extra for r in t.read(spark).collect()}
    assert got == {1: None, 2: None, 9: 99}


def test_evolution_refusals(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "eu")], "id int, region string"
        ),
        partition_by=["region"],
    )
    with pytest.raises(ValueError, match="column mapping"):
        t.rename_column("id", "id2")
    with pytest.raises(ValueError, match="column mapping"):
        t.drop_column("id")
    t.upgrade_column_mapping()
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("region")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("id", "int")
    with pytest.raises(ValueError, match="already"):
        t.upgrade_column_mapping()
    # mergeSchema is the unmapped path; mapped tables use add_column
    with pytest.raises(ValueError, match="add_column"):
        t.write(
            spark.createDataFrame(
                [(1, "eu", 5)], "id int, region string, x int"
            ),
            mode="append",
            merge_schema=True,
        )
    # creation-time mapping is refused toward the upgrade verb
    with pytest.raises(ValueError, match="upgrade_column_mapping"):
        DeltaLiteTable(str(tmp_path / "t2")).write(
            spark.createDataFrame([(1,)], "id int"),
            configuration={"delta.columnMapping.mode": "name"},
        )


def test_mutating_verbs_on_mapped_table(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upgrade_column_mapping()
    t.rename_column("v", "score")
    t.write(
        spark.createDataFrame(
            [(3, "c", 30.0), (4, "d", 40.0)],
            "id int, name string, score double",
        ),
        mode="append",
    )
    t.delete(spark, "id = 1", strategy="dv")
    t.update(spark, "id = 2", {"score": "99.0"})
    src = spark.createDataFrame(
        [(4, "dd", 44.0), (5, "e", 50.0)],
        "id int, name string, score double",
    )
    t.merge(spark, src, keys=["id"])
    t.optimize(spark)
    got = sorted(map(tuple, t.read(spark).collect()))
    assert got == [
        (2, "b", 99.0), (3, "c", 30.0), (4, "dd", 44.0), (5, "e", 50.0),
    ]
    # checkpoint + clean_log keep the mapped schema readable
    t.checkpoint()
    t.clean_log()
    assert sorted(map(tuple, t.read(spark).collect())) == got


def test_cdf_roundtrip_on_mapped_table(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t.upgrade_column_mapping()
    t.rename_column("name", "label")
    v_before = t.latest_version()
    t.update(spark, "id = 1", {"label": "'aa'"})
    feed = t.table_changes(spark, from_version=v_before)
    rows = {
        (r._change_type, r.id, r.label) for r in feed.collect()
    }
    assert ("update_preimage", 1, "a") in rows
    assert ("update_postimage", 1, "aa") in rows


# -- CHECK constraints ----------------------------------------------------

from data_lakehouse_platform_spark.sources.delta_lite import (  # noqa: E402
    DeltaConstraintViolation,
)


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(DeltaConstraintViolation, match="existing rows"):
        t.add_constraint(spark, "pos", "v > 15.0")
    t.add_constraint(spark, "pos", "v > 0.0")
    meta, proto = _meta(t)
    assert meta["configuration"]["delta.constraints.pos"] == "v > 0.0"
    assert proto["minWriterVersion"] >= 3


def test_writes_validate_constraints(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "pos", "v > 0.0")
    v = t.latest_version()
    bad = spark.createDataFrame(
        [(3, "c", -1.0)], "id int, name string, v double"
    )
    with pytest.raises(DeltaConstraintViolation, match="pos"):
        t.write(bad, mode="append")
    assert t.latest_version() == v  # nothing committed
    # NULL results count as violations (Delta's CHECK semantics)
    nullish = spark.createDataFrame(
        [(4, "d", None)], "id int, name string, v double"
    )
    with pytest.raises(DeltaConstraintViolation):
        t.write(nullish, mode="append")
    t.write(
        spark.createDataFrame(
            [(3, "c", 5.0)], "id int, name string, v double"
        ),
        mode="append",
    )
    assert t.read(spark).count() == 3
    # UPDATE rewrites violating the constraint are refused pre-commit
    with pytest.raises(DeltaConstraintViolation):
        t.update(spark, "id = 3", {"v": "-9.0"})
    assert t.read(spark, predicate="id = 3").collect()[0].v == 5.0
    # MERGE too
    src = spark.createDataFrame(
        [(3, "c", -3.0)], "id int, name string, v double"
    )
    with pytest.raises(DeltaConstraintViolation):
        t.merge(spark, src, keys=["id"])
    # drop lifts the gate
    t.drop_constraint("pos")
    t.update(spark, "id = 3", {"v": "-9.0"})
    assert t.read(spark, predicate="id = 3").collect()[0].v == -9.0


def test_constraint_on_first_commit_configuration(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    with pytest.raises(DeltaConstraintViolation):
        t.write(
            spark.createDataFrame([(0,)], "id int"),
            configuration={"delta.constraints.idpos": "id > 0"},
        )
    assert t.latest_version() is None
    t.write(
        spark.createDataFrame([(1,)], "id int"),
        configuration={"delta.constraints.idpos": "id > 0"},
    )
    assert t.read(spark).count() == 1


def test_constraints_compose_with_column_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upgrade_column_mapping()
    t.rename_column("v", "score")
    t.add_constraint(spark, "pos", "score > 0.0")
    with pytest.raises(DeltaConstraintViolation):
        t.write(
            spark.createDataFrame(
                [(7, "g", -1.0)], "id int, name string, score double"
            ),
            mode="append",
        )
    t.write(
        spark.createDataFrame(
            [(7, "g", 1.0)], "id int, name string, score double"
        ),
        mode="append",
    )
    assert t.read(spark, predicate="id = 7").collect()[0].score == 1.0


# -- generated columns ------------------------------------------------------


def test_generated_columns_at_creation(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "2024-03-15"), (2, "2024-07-01")], "id int, d string"
        ).select("id", F.col("d").cast("date").alias("d")),
        generated_columns={"d_month": ("int", "month(d)")},
    )
    got = {r.id: r.d_month for r in t.read(spark).collect()}
    assert got == {1: 3, 2: 7}
    meta, proto = _meta(t)
    f = json.loads(meta["schemaString"])["fields"][-1]
    assert f["metadata"]["delta.generationExpression"] == "month(d)"
    assert proto["minWriterVersion"] >= 4  # generatedColumns implied


def test_generated_column_computed_on_append(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "2024-03-15")], "id int, d string"
        ).select("id", F.col("d").cast("date").alias("d")),
        generated_columns={"d_month": ("int", "month(d)")},
    )
    # append WITHOUT the generated column: computed
    t.write(
        spark.createDataFrame(
            [(2, "2024-09-09")], "id int, d string"
        ).select("id", F.col("d").cast("date").alias("d")),
        mode="append",
    )
    got = {r.id: r.d_month for r in t.read(spark).collect()}
    assert got == {1: 3, 2: 9}


def test_generated_column_contradiction_refused(spark, tmp_path):
    from data_lakehouse_platform_spark.sources.delta_lite import (
        DeltaConstraintViolation,
    )

    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "2024-03-15")], "id int, d string"
        ).select("id", F.col("d").cast("date").alias("d")),
        generated_columns={"d_month": ("int", "month(d)")},
    )
    v = t.latest_version()
    # append with a WRONG provided value
    bad = spark.createDataFrame(
        [(2, "2024-09-09", 1)], "id int, d string, d_month int"
    ).select("id", F.col("d").cast("date").alias("d"), "d_month")
    with pytest.raises(DeltaConstraintViolation, match="d_month"):
        t.write(bad, mode="append")
    assert t.latest_version() == v
    # UPDATE that changes the source but not the generated column
    # refuses (delta-spark would recompute; this writer refuses drift)
    with pytest.raises(DeltaConstraintViolation, match="d_month"):
        t.update(spark, "id = 1", {"d": "DATE '2024-12-25'"})
    # a CONSISTENT update passes
    t.update(
        spark, "id = 1",
        {"d": "DATE '2024-12-25'", "d_month": "12"},
    )
    got = {r.id: r.d_month for r in t.read(spark).collect()}
    assert got == {1: 12}


def test_generated_columns_creation_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="creation"):
        t.write(
            spark.createDataFrame(
                [(9, "z", 1.0)], "id int, name string, v double"
            ),
            mode="append",
            generated_columns={"x": ("int", "id + 1")},
        )


# -- identity columns -------------------------------------------------------


def test_identity_column_generation_and_high_water(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([("a",), ("b",), ("c",)], "name string"),
        identity_columns={"uid": (100, 10)},
    )
    rows = {r.name: r.uid for r in t.read(spark).collect()}
    assert len(set(rows.values())) == 3          # unique
    assert all(v >= 100 and (v - 100) % 10 == 0 for v in rows.values())
    meta, proto = _meta(t)
    f = next(
        f for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "uid"
    )
    md = f["metadata"]
    assert md["delta.identity.start"] == 100
    assert md["delta.identity.step"] == 10
    assert md["delta.identity.highWaterMark"] == max(rows.values())
    assert proto["minWriterVersion"] >= 6
    # append WITHOUT the column: values continue past the mark and the
    # commit advances it
    t.write(
        spark.createDataFrame([("d",), ("e",)], "name string"),
        mode="append",
    )
    rows2 = {r.name: r.uid for r in t.read(spark).collect()}
    assert len(set(rows2.values())) == 5
    assert min(rows2[n] for n in ("d", "e")) > max(rows.values())
    meta2, _ = _meta(t)
    f2 = next(
        f for f in json.loads(meta2["schemaString"])["fields"]
        if f["name"] == "uid"
    )
    assert f2["metadata"]["delta.identity.highWaterMark"] == max(
        rows2.values()
    )


def test_identity_explicit_insert_refused(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([("a",)], "name string"),
        identity_columns={"uid": (1, 1)},
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.write(
            spark.createDataFrame(
                [("x", 999)], "name string, uid long"
            ),
            mode="append",
        )
    # merge inserts would also write explicit values -> refused
    src = spark.createDataFrame(
        [("new", 5)], "name string, uid long"
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.merge(spark, src, keys=["uid"])
    # mutating verbs that only REWRITE existing rows still work
    t.write(
        spark.createDataFrame([("b",)], "name string"), mode="append"
    )
    t.update(spark, "name = 'b'", {"name": "'bb'"})
    got = {r.name for r in t.read(spark).collect()}
    assert got == {"a", "bb"}


def test_identity_negative_step_refused(spark, tmp_path):
    t = DeltaLiteTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="step"):
        t.write(
            spark.createDataFrame([("a",)], "name string"),
            identity_columns={"uid": (0, -1)},
        )
