"""Equality-delete WRITES on iceberg_lite tables (VERDICT r7 gap #4):
delete_equality commits content=2 files with equality_ids and strict
``data seq < delete seq`` gating; upsert is the Flink-style one-snapshot
equality-delete + append.  Every behavior is checked against an
independent twin (position-delete / copy-on-write merge / dict model)
and the refusal surface (merge, incremental scans) is exercised on
tables produced by THIS writer, not just fixtures."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_lakehouse_platform_spark.sources.avro_lite import read_container
from data_lakehouse_platform_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    IcebergProtocolError,
)


def _table(spark, tmp_path, name="t", partitioned=True, n=30):
    t = IcebergLiteTable(str(tmp_path / name))
    df = spark.createDataFrame(
        [(i, ["eu", "us", "ap"][i % 3], float(i)) for i in range(n)],
        "id int, region string, v double",
    )
    t.write(df, partition_by=["region"] if partitioned else None)
    return t


def _rows(t, spark, snapshot_id=None):
    return sorted(
        (r.id, r.region, r.v)
        for r in t.read(spark, snapshot_id=snapshot_id).collect()
    )


def test_delete_equality_basic_and_time_travel(spark, tmp_path):
    t = _table(spark, tmp_path)
    pre = _rows(t, spark)
    v0 = t.current_snapshot_id()
    vals = spark.createDataFrame([(3,), (7,), (999,)], "id int")
    res = t.delete_equality(spark, vals, ["id"])
    assert res["keys"] == 3 and res["files"] >= 1
    got = _rows(t, spark)
    assert {i for i, _r, _v in got} == set(range(30)) - {3, 7}
    # time travel: pre-delete snapshot unaffected
    assert _rows(t, spark, snapshot_id=v0) == pre


def test_delete_equality_matches_position_delete_twin(spark, tmp_path):
    te = _table(spark, tmp_path, "eq")
    tp = _table(spark, tmp_path, "pos")
    vals = spark.createDataFrame([(i,) for i in range(0, 30, 5)], "id int")
    te.delete_equality(spark, vals, ["id"])
    tp.delete(spark, "id % 5 = 0")
    assert _rows(te, spark) == _rows(tp, spark)


def test_sequence_gating_rows_after_delete_survive(spark, tmp_path):
    """The spec's strict gate: an equality delete applies only to data
    files with sequence number < the delete's — a row re-inserted
    AFTER the delete with the same key must survive."""
    t = _table(spark, tmp_path)
    t.delete_equality(
        spark, spark.createDataFrame([(3,)], "id int"), ["id"]
    )
    assert 3 not in {i for i, _r, _v in _rows(t, spark)}
    t.write(
        spark.createDataFrame([(3, "eu", 333.0)],
                              "id int, region string, v double"),
        mode="append",
    )
    got = dict((i, v) for i, _r, v in _rows(t, spark))
    assert got[3] == 333.0  # resurrected row NOT re-deleted


def test_multi_column_keys_and_null_matching(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "nk"))
    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, None, 3.0), (2, "a", 4.0)],
        "id int, tag string, v double",
    )
    t.write(df)
    vals = spark.createDataFrame([(1, "b"), (2, None)], "id int, tag string")
    t.delete_equality(spark, vals, ["id", "tag"])
    got = sorted((r.id, r.tag) for r in t.read(spark).collect())
    # eqNullSafe in the reader: the (2, NULL) tuple matches the NULL row
    assert got == [(1, "a"), (2, "a")]


def test_upsert_one_snapshot_matches_merge_twin(spark, tmp_path):
    tu = _table(spark, tmp_path, "up")
    tm = _table(spark, tmp_path, "mg")
    n_snaps_before = len(tu.snapshots())
    src = spark.createDataFrame(
        [(0, "eu", 100.0), (3, "eu", 103.0), (99, "eu", 199.0)],
        "id int, region string, v double",
    )
    res = tu.upsert(spark, src, keys=["id"])
    tm.merge(spark, src, keys=["id"])
    assert _rows(tu, spark) == _rows(tm, spark)
    # ONE snapshot for delete+append (the Flink checkpoint-commit shape)
    assert len(tu.snapshots()) == n_snaps_before + 1
    assert res["rows"] == 3 and res["keys"] == 3


def test_upsert_on_empty_table_is_append(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "fresh"))
    src = spark.createDataFrame(
        [(1, "eu", 1.0)], "id int, region string, v double"
    )
    t.upsert(spark, src, keys=["id"])
    assert _rows(t, spark) == [(1, "eu", 1.0)]


def test_manifest_carries_equality_ids_and_content(spark, tmp_path):
    """The committed bytes, not just this reader's view: the delete
    manifest entry must carry content=2 and the key field ids (spec
    data_file fields 134/135)."""
    t = _table(spark, tmp_path)
    t.delete_equality(
        spark, spark.createDataFrame([(3,)], "id int"), ["id"]
    )
    snap = t.snapshots()[-1]
    del_manifests = [
        r for r in t._manifest_list_rows(snap)
        if int(r.get("content") or 0) == 1
    ]
    assert len(del_manifests) == 1
    _, entries = read_container(del_manifests[0]["manifest_path"])
    assert len(entries) >= 1
    for e in entries:
        dfent = e["data_file"]
        assert int(dfent["content"]) == 2
        assert list(dfent["equality_ids"]) == [1]  # id is field 1


def test_incremental_scan_refuses_equality_delete_snapshot(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.current_snapshot_id()
    t.delete_equality(
        spark, spark.createDataFrame([(3,)], "id int"), ["id"]
    )
    with pytest.raises(IcebergProtocolError, match="delete"):
        t.incremental_append_files(v0, on_change="error")
    # skip: the delete snapshot contributes nothing
    assert t.incremental_append_files(v0, on_change="skip") == []


def test_merge_refuses_table_with_own_equality_deletes(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_equality(
        spark, spark.createDataFrame([(3,)], "id int"), ["id"]
    )
    src = spark.createDataFrame(
        [(0, "eu", 100.0)], "id int, region string, v double"
    )
    with pytest.raises(IcebergProtocolError, match="equality-delete"):
        t.merge(spark, src, keys=["id"])


def test_rewrite_folds_equality_deletes(spark, tmp_path):
    """Compaction: rewritten files take a NEW sequence number above
    every delete's, so the equality manifests stop applying — the read
    is unchanged and the upsert/merge refusal clears."""
    t = _table(spark, tmp_path)
    t.delete_equality(
        spark, spark.createDataFrame([(3,), (7,)], "id int"), ["id"]
    )
    before = _rows(t, spark)
    t.rewrite_data_files(spark)
    assert _rows(t, spark) == before
    # the table is mergeable again
    t.merge(
        spark,
        spark.createDataFrame([(0, "eu", 100.0)],
                              "id int, region string, v double"),
        keys=["id"],
    )
    got = dict((i, v) for i, _r, v in _rows(t, spark))
    assert got[0] == 100.0


def test_validation_refusals(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="not in table schema"):
        t.delete_equality(
            spark, spark.createDataFrame([(1,)], "nope int"), ["nope"]
        )
    with pytest.raises(ValueError, match="not in the values DataFrame"):
        t.delete_equality(
            spark, spark.createDataFrame([(1,)], "id int"), ["id", "v"]
        )
    with pytest.raises(ValueError, match="differs from table schema"):
        t.upsert(
            spark, spark.createDataFrame([(1,)], "id int"), keys=["id"]
        )
    with pytest.raises(ValueError, match="not in table columns"):
        t.upsert(
            spark,
            spark.createDataFrame(
                [(1, "eu", 1.0)], "id int, region string, v double"
            ),
            keys=["zz"],
        )


@pytest.mark.slow
def test_verb_model_equality_sequences(spark, tmp_path):
    """Seeded random verb sequences (append / delete_equality / upsert /
    rewrite) checked after EVERY verb against a driver-side dict model —
    the same model-based discipline the delta/iceberg verb suites use
    (tests/test_delta_model.py), extended to the equality-delete
    writer."""
    rng = random.Random(17)
    t = IcebergLiteTable(str(tmp_path / "model"))
    model: dict[int, tuple[str, float]] = {}
    next_val = [0.0]

    def mk(rows):
        return spark.createDataFrame(
            [(i, ["eu", "us"][i % 2], v) for i, v in rows],
            "id int, region string, v double",
        )

    # seed table
    seed = [(i, float(i)) for i in range(20)]
    t.write(mk(seed), partition_by=["region"])
    model.update({i: (["eu", "us"][i % 2], v) for i, v in seed})

    def check():
        got = sorted((r.id, r.region, r.v) for r in t.read(spark).collect())
        want = sorted((i, reg, v) for i, (reg, v) in model.items())
        assert got == want

    for _step in range(12):
        verb = rng.choice(["append", "del_eq", "upsert", "rewrite"])
        if verb == "append":
            rows = []
            for _ in range(rng.randint(1, 4)):
                i = rng.randint(100, 200)
                while i in model:
                    i += 1
                next_val[0] += 1
                rows.append((i, next_val[0]))
            t.write(mk(rows), mode="append")
            model.update({i: (["eu", "us"][i % 2], v) for i, v in rows})
        elif verb == "del_eq":
            pool = list(model) or [0]
            ids = sorted({rng.choice(pool) for _ in range(3)} | {777})
            t.delete_equality(
                spark, spark.createDataFrame([(i,) for i in ids], "id int"),
                ["id"],
            )
            for i in ids:
                model.pop(i, None)
        elif verb == "upsert":
            rows = []
            pool = list(model)
            for _ in range(rng.randint(1, 3)):
                next_val[0] += 1
                i = rng.choice(pool) if pool and rng.random() < 0.5 else rng.randint(300, 400)
                rows.append((i, next_val[0]))
            rows = list({i: (i, v) for i, v in rows}.values())
            t.upsert(spark, mk(rows), keys=["id"])
            model.update({i: (["eu", "us"][i % 2], v) for i, v in rows})
        else:
            t.rewrite_data_files(spark)
        check()
