"""Puffin reader/writer (r10): the Iceberg v3 deletion-vector carrier
— footer round-trip, DV blob CRC + magic verification, byte-level
compatibility with the Delta roaring serialization the spec reuses."""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from data_lakehouse_platform_spark.sources.delta_lite import (
    serialize_roaring_bitmap_array,
)
from data_lakehouse_platform_spark.sources.puffin import (
    DV_MAGIC,
    MAGIC,
    PuffinFormatError,
    dv_blob,
    dv_positions,
    read_dv_positions,
    read_footer,
    write_dv_file,
    write_file,
)


def test_footer_round_trip(tmp_path):
    p = str(tmp_path / "f.puffin")
    doc = write_file(
        p,
        [({"type": "x", "fields": [1]}, b"AAAA"),
         ({"type": "y", "fields": []}, b"BB")],
        properties={"created-by": "dlp-spark"},
    )
    got = read_footer(p)
    assert got == doc
    b0, b1 = got["blobs"]
    assert (b0["offset"], b0["length"]) == (4, 4)  # right after magic
    assert (b1["offset"], b1["length"]) == (8, 2)
    assert got["properties"] == {"created-by": "dlp-spark"}
    # physical layout: leading magic, trailing magic, footer-start magic
    raw = open(p, "rb").read()
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    (psize,) = struct.unpack_from("<i", raw, len(raw) - 12)
    assert raw[len(raw) - 12 - psize - 4 : len(raw) - 12 - psize] == MAGIC


def test_dv_blob_round_trip_and_delta_compat():
    positions = [0, 1, 5, 70000, (3 << 32) | 7, (3 << 32) | 4096]
    blob = dv_blob(positions)
    assert dv_positions(blob) == sorted(positions)
    # spec layout: BE length covers magic+vector; vector bytes are
    # EXACTLY Delta's RoaringBitmapArray serialization
    (ln,) = struct.unpack_from(">i", blob, 0)
    ser = blob[4 : 4 + ln]
    assert ser == serialize_roaring_bitmap_array(positions)
    assert ser[:4] == DV_MAGIC
    (crc,) = struct.unpack_from(">I", blob, 4 + ln)
    assert crc == zlib.crc32(ser) & 0xFFFFFFFF


def test_dv_crc_and_magic_guard():
    blob = bytearray(dv_blob([1, 2, 3]))
    blob[10] ^= 0xFF  # corrupt the vector
    with pytest.raises(PuffinFormatError, match="CRC"):
        dv_positions(bytes(blob))
    blob2 = bytearray(dv_blob([1, 2, 3]))
    blob2[4] ^= 0xFF  # corrupt the magic AND fix the CRC over it
    ser = bytes(blob2[4:-4])
    blob2[-4:] = struct.pack(">I", zlib.crc32(ser) & 0xFFFFFFFF)
    with pytest.raises(PuffinFormatError, match="magic"):
        dv_positions(bytes(blob2))
    with pytest.raises(PuffinFormatError, match="too short"):
        dv_positions(b"xx")


def test_write_dv_file_manifest_properties(tmp_path):
    p = str(tmp_path / "dv.puffin")
    metas = write_dv_file(
        p,
        {"/data/a.parquet": [3, 1, 1, 2], "/data/b.parquet": [0]},
        snapshot_id=7,
        sequence_number=4,
    )
    assert [m["properties"]["referenced-data-file"] for m in metas] == [
        "/data/a.parquet", "/data/b.parquet",
    ]
    assert metas[0]["properties"]["cardinality"] == "3"  # deduped
    assert all(m["type"] == "deletion-vector-v1" for m in metas)
    assert all(
        (m["snapshot-id"], m["sequence-number"]) == (7, 4) for m in metas
    )
    # range-addressed decode matches
    a = read_dv_positions(p, metas[0]["offset"], metas[0]["length"])
    assert a == [1, 2, 3]
    b = read_dv_positions(p, metas[1]["offset"], metas[1]["length"])
    assert b == [0]
    # footer agrees with the returned metadata
    assert read_footer(p)["blobs"] == metas


def test_footer_refusals(tmp_path):
    p = str(tmp_path / "bad.puffin")
    with open(p, "wb") as fh:
        fh.write(b"NOPE" + b"\x00" * 30)
    with pytest.raises(PuffinFormatError, match="leading magic"):
        read_footer(p)

    # compressed-footer flag refuses loudly
    good = str(tmp_path / "good.puffin")
    write_file(good, [({"type": "x"}, b"A")])
    raw = bytearray(open(good, "rb").read())
    raw[-8] |= 1  # flags byte 0 bit 0
    comp = str(tmp_path / "comp.puffin")
    open(comp, "wb").write(bytes(raw))
    with pytest.raises(PuffinFormatError, match="compressed footer"):
        read_footer(comp)

    # truncated / corrupt payload size
    raw2 = bytearray(open(good, "rb").read())
    struct.pack_into("<i", raw2, len(raw2) - 12, 9999)
    trunc = str(tmp_path / "trunc.puffin")
    open(trunc, "wb").write(bytes(raw2))
    with pytest.raises(PuffinFormatError):
        read_footer(trunc)


def test_crash_leaves_no_half_file(tmp_path, monkeypatch):
    p = str(tmp_path / "crash.puffin")
    real_replace = os.replace

    def boom(src, dst):
        raise RuntimeError("simulated crash at rename")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError):
        write_file(p, [({"type": "x"}, b"A")])
    monkeypatch.setattr(os, "replace", real_replace)
    assert not os.path.exists(p)  # only the .tmp exists, never the name


def test_footer_payload_is_plain_json(tmp_path):
    """The payload must parse as UTF-8 JSON with a blobs list — pin the
    wire shape other engines will read."""
    p = str(tmp_path / "j.puffin")
    write_file(p, [({"type": "x"}, b"ZZ")], {"k": "v"})
    raw = open(p, "rb").read()
    (psize,) = struct.unpack_from("<i", raw, len(raw) - 12)
    payload = raw[len(raw) - 12 - psize : len(raw) - 12]
    doc = json.loads(payload.decode("utf-8"))
    assert isinstance(doc["blobs"], list) and doc["properties"] == {"k": "v"}
