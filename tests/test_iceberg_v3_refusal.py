"""Iceberg v3 refusal (r9): the reader still refuses format-version 3,
but the refusal now NAMES the v3 constructs the table actually uses —
a migrating user gets a feature list, not a bare "v3 unsupported"."""

from __future__ import annotations

import json
import os

import pytest

from data_lakehouse_platform_spark.sources.iceberg_lite import (
    IcebergLiteTable,
    IcebergProtocolError,
)


def _v3_table(tmp_path, name, extra_meta=None, fields=None, snapshots=None):
    root = tmp_path / name
    mdir = root / "metadata"
    os.makedirs(str(mdir))
    meta = {
        "format-version": 3,
        "table-uuid": "0000-v3",
        "location": str(root),
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{
            "type": "struct", "schema-id": 0,
            "fields": fields or [
                {"id": 1, "name": "id", "required": True, "type": "long"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": -1,
        "snapshots": snapshots or [],
        "snapshot-log": [], "metadata-log": [],
    }
    meta.update(extra_meta or {})
    with open(str(mdir / "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return IcebergLiteTable(str(root))


def test_v3_refusal_names_row_lineage_types_defaults_dvs(spark, tmp_path):
    t = _v3_table(
        tmp_path, "full",
        extra_meta={"next-row-id": 4096, "row-lineage": True},
        fields=[
            {"id": 1, "name": "id", "required": True, "type": "long",
             "initial-default": 0, "write-default": 0},
            {"id": 2, "name": "payload", "required": False,
             "type": "variant"},
            {"id": 3, "name": "ts", "required": False,
             "type": "timestamp_ns"},
        ],
        snapshots=[{
            "snapshot-id": 1, "timestamp-ms": 0, "first-row-id": 0,
            "summary": {"operation": "append", "added-dvs": "2",
                        "total-dvs": "2"},
            "manifest-list": "x.avro",
        }],
    )
    with pytest.raises(IcebergProtocolError) as ei:
        t.metadata()
    msg = str(ei.value)
    assert "format-version=3" in msg
    assert "row lineage" in msg
    assert "variant" in msg and "timestamp_ns" in msg
    assert "default values" in msg
    assert "deletion vectors" in msg


def test_v3_refusal_plain_table_suggests_downgrade(spark, tmp_path):
    t = _v3_table(tmp_path, "plain")
    with pytest.raises(
        IcebergProtocolError, match="no v3-specific constructs"
    ):
        t.metadata()


def test_v2_tables_unaffected(spark, tmp_path):
    t = IcebergLiteTable(str(tmp_path / "v2"))
    t.write(spark.createDataFrame([(1, "a")], "id int, v string"))
    assert t.metadata()["format-version"] == 2
