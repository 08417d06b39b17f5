"""V2-spec checkpoints (Delta reader feature ``v2Checkpoint``) — the
format a newly-created delta-spark table carries BY DEFAULT, so a
migrating user hits it on day one (VERDICT r7 gap #3).  Read support
is fixture-built (uuid-named JSON and parquet manifests, sidecar
spill files in _delta_log/_sidecars/); writes into such tables refuse
loudly through the writer-feature gate."""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_lakehouse_platform_spark.sources.delta_lite import (
    DeltaLiteTable,
    DeltaProtocolError,
)

_V2_PROTOCOL = {
    "minReaderVersion": 3,
    "minWriterVersion": 7,
    "readerFeatures": ["v2Checkpoint"],
    "writerFeatures": ["v2Checkpoint"],
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, val string")


def _build_table(spark, tmp_path, name="t"):
    """3-commit table whose state we re-express as a v2 checkpoint."""
    t = DeltaLiteTable(str(tmp_path / name))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    t.write(_df(spark, [(3, "c")]), mode="append")
    t.write(_df(spark, [(4, "d")]), mode="append")
    return t


def _current_actions(t):
    """The table's live state as raw actions (from its own JSON log)."""
    proto, meta, adds = None, None, {}
    for v in range(t.latest_version() + 1):
        for a in t._actions(v):
            if "protocol" in a:
                proto = a["protocol"]
            elif "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                adds[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                adds.pop(a["remove"]["path"], None)
    return proto, meta, list(adds.values())


def _drop_json_log(t):
    """Simulate log cleanup: only the checkpoint remains readable."""
    for f in os.listdir(t.log_dir):
        if f.endswith(".json") and f[: -len(".json")].isdigit():
            os.remove(os.path.join(t.log_dir, f))


def _write_v2_json_checkpoint(t, version, protocol=None, cp_version=None,
                              with_cp_meta=True):
    _proto, meta, adds = _current_actions(t)
    name = f"{version:020d}.checkpoint.{uuid.uuid4()}.json"
    lines = []
    if with_cp_meta:
        lines.append({"checkpointMetadata": {
            "version": version if cp_version is None else cp_version,
            "tags": {},
        }})
    lines.append({"protocol": protocol or _V2_PROTOCOL})
    lines.append({"metaData": meta})
    lines.extend({"add": a} for a in adds)
    with open(os.path.join(t.log_dir, name), "w") as fh:
        for ln in lines:
            fh.write(json.dumps(ln) + "\n")
    return name


def _write_v2_parquet_checkpoint(t, version, sidecar_extra=None,
                                 missing_sidecar=False):
    """Parquet manifest + one parquet sidecar carrying the add state
    (the delta-spark default layout)."""
    _proto, meta, adds = _current_actions(t)
    sdir = os.path.join(t.log_dir, "_sidecars")
    os.makedirs(sdir, exist_ok=True)
    sc_name = f"{uuid.uuid4()}.parquet"
    add_rows = [
        {
            "path": a["path"],
            "size": int(a.get("size") or 0),
            "modificationTime": int(a.get("modificationTime") or 0),
            "dataChange": False,
        }
        for a in adds
    ]
    n = len(add_rows) + len(sidecar_extra or [])
    sidecar_tbl = pa.table({
        "add": pa.array(add_rows + [None] * len(sidecar_extra or [])),
        **(
            {
                k: pa.array([None] * len(add_rows) + [r[k] for r in sidecar_extra])
                for k in (sidecar_extra[0] if sidecar_extra else {})
            }
        ),
    }) if sidecar_extra else pa.table({"add": pa.array(add_rows)})
    pq.write_table(sidecar_tbl, os.path.join(sdir, sc_name))
    if missing_sidecar:
        os.remove(os.path.join(sdir, sc_name))

    name = f"{version:020d}.checkpoint.{uuid.uuid4()}.parquet"
    manifest = pa.table({
        "checkpointMetadata": pa.array(
            [{"version": version}, None, None, None]
        ),
        "protocol": pa.array([
            None,
            {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
                "writerFeatures": ["v2Checkpoint"],
            },
            None, None,
        ]),
        "metaData": pa.array(
            [
                None, None,
                {
                    "id": meta["id"],
                    "format": {"provider": "parquet"},
                    "schemaString": meta["schemaString"],
                    "partitionColumns": meta.get("partitionColumns") or [],
                    "configuration": list(
                        (meta.get("configuration") or {}).items()
                    ),
                },
                None,
            ],
            type=pa.struct({
                "id": pa.string(),
                "format": pa.struct({"provider": pa.string()}),
                "schemaString": pa.string(),
                "partitionColumns": pa.list_(pa.string()),
                "configuration": pa.map_(pa.string(), pa.string()),
            }),
        ),
        "sidecar": pa.array([
            None, None, None,
            {"path": sc_name,
             "sizeInBytes": 0 if missing_sidecar else os.path.getsize(
                 os.path.join(sdir, sc_name))},
        ]),
    })
    pq.write_table(manifest, os.path.join(t.log_dir, name))
    return name


def test_v2_json_checkpoint_reads_after_log_cleanup(spark, tmp_path):
    t = _build_table(spark, tmp_path)
    want = sorted((r.id, r.val) for r in t.read(spark).collect())
    v = t.latest_version()
    _write_v2_json_checkpoint(t, v)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    assert t2.latest_version() == v
    got = sorted((r.id, r.val) for r in t2.read(spark).collect())
    assert got == want


def test_v2_parquet_checkpoint_with_sidecar(spark, tmp_path):
    t = _build_table(spark, tmp_path)
    want = sorted((r.id, r.val) for r in t.read(spark).collect())
    v = t.latest_version()
    _write_v2_parquet_checkpoint(t, v)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    got = sorted((r.id, r.val) for r in t2.read(spark).collect())
    assert got == want


def test_v2_checkpoint_txn_rows_survive(spark, tmp_path):
    """Exactly-once ledgers (txn actions) must replay from V2
    checkpoints exactly as from classic ones."""
    t = _build_table(spark, tmp_path)
    v = t.latest_version()
    sidecar_extra = [{"txn": {"appId": "job-7", "version": 41,
                              "lastUpdated": 0}}]
    _write_v2_parquet_checkpoint(t, v, sidecar_extra=sidecar_extra)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    assert t2.txn_versions() == {"job-7": 41}


def test_v2_checkpoint_version_mismatch_refused(spark, tmp_path):
    t = _build_table(spark, tmp_path)
    v = t.latest_version()
    _write_v2_json_checkpoint(t, v, cp_version=v - 1)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    with pytest.raises(DeltaProtocolError, match="corrupt checkpoint"):
        t2.read(spark)


def test_uuid_named_without_checkpoint_metadata_refused(spark, tmp_path):
    t = _build_table(spark, tmp_path)
    v = t.latest_version()
    _write_v2_json_checkpoint(t, v, with_cp_meta=False)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    with pytest.raises(DeltaProtocolError, match="checkpointMetadata"):
        t2.read(spark)


def test_missing_sidecar_refused(spark, tmp_path):
    t = _build_table(spark, tmp_path)
    v = t.latest_version()
    _write_v2_parquet_checkpoint(t, v, missing_sidecar=True)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    with pytest.raises(DeltaProtocolError, match="sidecar"):
        t2.read(spark)


def test_write_and_v2_checkpoint_roundtrip(spark, tmp_path):
    """Writes into a v2Checkpoint table are SAFE because checkpoint()
    honors the feature: it emits the V2-spec layout (uuid-named
    manifest + sidecar under _delta_log/_sidecars/), never a classic
    checkpoint.  Full loop: adopt the table -> append -> checkpoint ->
    clean_log -> read back through OUR OWN v2 checkpoint."""
    t = _build_table(spark, tmp_path)
    v = t.latest_version()
    _write_v2_json_checkpoint(t, v)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    t2.write(_df(spark, [(9, "z")]), mode="append")
    cv = t2.checkpoint()
    # the new checkpoint is V2: uuid-named, with a sidecar file
    new_cp = [
        f for f in os.listdir(t2.log_dir)
        if t2._CP_V2_RE.match(f) and int(f[:20]) == cv
    ]
    assert len(new_cp) == 1
    assert os.listdir(os.path.join(t2.log_dir, "_sidecars"))
    # and NO classic checkpoint was written for that version
    assert not os.path.exists(
        os.path.join(t2.log_dir, f"{cv:020d}.checkpoint.parquet")
    )
    t2.clean_log()
    t3 = DeltaLiteTable(str(tmp_path / "t"))
    got = sorted((r.id, r.val) for r in t3.read(spark).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (9, "z")]


def test_v2_checkpoint_write_preserves_txn_and_tombstones(spark, tmp_path):
    """The V2 writer's manifest carries txn markers and its sidecar
    carries remove tombstones — the same clean_log survival contract
    as classic checkpoints."""
    t = DeltaLiteTable(str(tmp_path / "w"))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    t.write(_df(spark, [(3, "c")]), mode="append", txn=("app-1", 7))
    t.write(_df(spark, [(9, "z")]), mode="overwrite")  # tombstones
    # flip the table to v2Checkpoint by hand (the adopted-table shape)
    v = t.latest_version()
    _write_v2_json_checkpoint(t, v)  # carries the v2 protocol
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "w"))
    t2.write(_df(spark, [(10, "y")]), mode="append", txn=("app-1", 8))
    cv = t2.checkpoint()
    t2.clean_log()
    t3 = DeltaLiteTable(str(tmp_path / "w"))
    assert t3.txn_versions() == {"app-1": 8}
    got = sorted((r.id, r.val) for r in t3.read(spark).collect())
    assert got == [(9, "z"), (10, "y")]
    assert cv == t3.latest_version()


def test_other_unknown_reader_features_still_refused(spark, tmp_path):
    t = _build_table(spark, tmp_path)
    v = t.latest_version()
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint", "typeWidening"],
        "writerFeatures": ["v2Checkpoint", "typeWidening"],
    }
    _write_v2_json_checkpoint(t, v, protocol=proto)
    _drop_json_log(t)
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    with pytest.raises(DeltaProtocolError, match="typeWidening"):
        t2.read(spark)


def test_classic_checkpoint_still_wins_roundtrip(spark, tmp_path):
    """Regression guard: classic checkpoints and their consumers are
    untouched by the shared action iterator."""
    t = _build_table(spark, tmp_path)
    want = sorted((r.id, r.val) for r in t.read(spark).collect())
    t.checkpoint()
    t.clean_log()
    t2 = DeltaLiteTable(str(tmp_path / "t"))
    got = sorted((r.id, r.val) for r in t2.read(spark).collect())
    assert got == want
