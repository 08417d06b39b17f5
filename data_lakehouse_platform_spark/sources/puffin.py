"""Puffin file format — reader/writer for the subset Iceberg v3
deletion vectors need (public Apache Iceberg Puffin spec,
https://iceberg.apache.org/puffin-spec/).

Layout::

    Magic (PFA1)
    Blob_1 ... Blob_n          (raw bytes, byte-addressed by footer)
    Magic (PFA1)               -- footer starts
    FooterPayload              (UTF-8 JSON: {"blobs": [...], "properties": {...}})
    FooterPayloadSize          (int32 little-endian)
    Flags                      (4 bytes; byte 0 bit 0 = payload compressed)
    Magic (PFA1)

Each blob's footer entry carries ``type``, ``fields``, ``snapshot-id``,
``sequence-number``, ``offset``, ``length`` and free-form
``properties``.  The one blob type implemented end-to-end is
``deletion-vector-v1`` (Iceberg v3 spec, "Deletion vectors")::

    int32 big-endian   combined length of magic + vector
    4 bytes            magic D1 D3 39 64
    vector             64-bit RoaringBitmapArray, portable serialization
    int32 big-endian   CRC-32 of magic + vector

The magic bytes are exactly the little-endian encoding of Delta's
RoaringBitmapArray magic (0x6439D3D1 == 1681511377) and the portable
vector layout is byte-identical to Delta deletion vectors — Iceberg
chose the format for cross-ecosystem compatibility, so this module
reuses :func:`delta_lite.roaring_bitmap_array_values` /
:func:`delta_lite.serialize_roaring_bitmap_array` verbatim.  Round-trip
pinned in tests/test_puffin.py.

Scale posture: a Puffin DV blob is metadata for ONE data file (its
offset/length live in the manifest entry), so decode cost is bounded by
that file's deleted-row count; :meth:`IcebergLiteTable._read_files`
decodes blobs in EXECUTOR tasks (mapInPandas over the descriptor list),
never a driver loop.

Reference analog: the reference's lakehouse layers append and rewrite
whole tables (scripts/batch/silver_facts.py:91 writes mode("append")
to MinIO); an engine mutating 100 TB in place needs file-scoped bitmap
deletes instead — this is the v3 form of that capability.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from data_lakehouse_platform_spark.sources.delta_lite import (
    roaring_bitmap_array_values,
    serialize_roaring_bitmap_array,
)

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"  # struct.pack('<i', 1681511377)
DV_BLOB_TYPE = "deletion-vector-v1"


class PuffinFormatError(ValueError):
    """Structurally invalid / unsupported Puffin content."""


def read_footer(path: str) -> dict:
    """Parse a Puffin file's footer: returns the payload dict
    (``{"blobs": [...], "properties": {...}}``) after verifying all
    three magic markers.  Compressed footer payloads are refused
    loudly (this writer never produces them; supporting a codec here
    without a cross-engine sample to pin against would be a guess)."""
    size = os.path.getsize(path)
    if size < 4 + 4 + 12:
        raise PuffinFormatError(f"{path}: too small for a Puffin file")
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise PuffinFormatError(f"{path}: missing leading magic")
        fh.seek(size - 12)
        tail = fh.read(12)
        if tail[8:12] != MAGIC:
            raise PuffinFormatError(f"{path}: missing trailing magic")
        (payload_size,) = struct.unpack_from("<i", tail, 0)
        flags = tail[4:8]
        if flags[0] & 1:
            raise PuffinFormatError(
                f"{path}: compressed footer payload unsupported — "
                "refusing rather than misparse"
            )
        if any(flags[1:]) or flags[0] & ~1:
            raise PuffinFormatError(
                f"{path}: unknown footer flag bits {flags.hex()}"
            )
        start = size - 12 - payload_size
        if payload_size < 0 or start - 4 < 4:
            raise PuffinFormatError(
                f"{path}: footer payload size {payload_size} does not "
                f"fit a {size}-byte file"
            )
        fh.seek(start - 4)
        if fh.read(4) != MAGIC:
            raise PuffinFormatError(
                f"{path}: missing footer-start magic (corrupt "
                "FooterPayloadSize?)"
            )
        payload = fh.read(payload_size)
    doc = json.loads(payload.decode("utf-8"))
    if not isinstance(doc, dict) or "blobs" not in doc:
        raise PuffinFormatError(f"{path}: footer payload has no blobs")
    return doc


def write_file(
    path: str,
    blobs: list[tuple[dict, bytes]],
    properties: dict | None = None,
) -> dict:
    """Write a Puffin file: ``blobs`` is a list of (metadata, bytes)
    where metadata carries at least ``type`` (``offset``/``length``
    are stamped here).  Returns the footer payload written.  The write
    is tmp-then-rename so a crashed writer never leaves a readable
    half-file."""
    metas: list[dict] = []
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(MAGIC)
        for meta, data in blobs:
            if "type" not in meta:
                raise PuffinFormatError("blob metadata needs a type")
            off = fh.tell()
            fh.write(data)
            m = dict(meta)
            m["offset"] = off
            m["length"] = len(data)
            metas.append(m)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(properties or {})},
            sort_keys=True,
        ).encode("utf-8")
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: uncompressed
        fh.write(MAGIC)
    os.replace(tmp, path)
    return {"blobs": metas, "properties": dict(properties or {})}


def dv_blob(positions) -> bytes:
    """Serialize row positions as a ``deletion-vector-v1`` blob body:
    big-endian length, DV magic + portable 64-bit roaring vector
    (byte-identical to Delta's serialization, magic included), CRC-32
    (big-endian) of magic + vector."""
    ser = serialize_roaring_bitmap_array(positions)
    assert ser[:4] == DV_MAGIC  # shared-format invariant
    return (
        struct.pack(">i", len(ser))
        + ser
        + struct.pack(">I", zlib.crc32(ser) & 0xFFFFFFFF)
    )


def dv_positions(blob: bytes, *, where: str = "<blob>") -> list[int]:
    """Decode a ``deletion-vector-v1`` blob body to sorted row
    positions, CRC-verified."""
    if len(blob) < 12:
        raise PuffinFormatError(f"{where}: DV blob too short")
    (ln,) = struct.unpack_from(">i", blob, 0)
    if ln < 4 or 4 + ln + 4 > len(blob):
        raise PuffinFormatError(
            f"{where}: DV length {ln} exceeds blob of {len(blob)} bytes"
        )
    ser = blob[4 : 4 + ln]
    (crc,) = struct.unpack_from(">I", blob, 4 + ln)
    if zlib.crc32(ser) & 0xFFFFFFFF != crc:
        raise PuffinFormatError(
            f"{where}: DV CRC mismatch — refusing rather than "
            "resurrect or over-delete rows"
        )
    if ser[:4] != DV_MAGIC:
        raise PuffinFormatError(
            f"{where}: DV magic {ser[:4].hex()} != {DV_MAGIC.hex()}"
        )
    return roaring_bitmap_array_values(ser)


def read_dv_positions(path: str, offset: int, length: int) -> list[int]:
    """Read one DV blob by byte range (the manifest entry's
    ``content_offset`` / ``content_size_in_bytes``) and decode it.
    Range-addressed so executors fetch only their blob, never the
    whole Puffin file."""
    with open(path, "rb") as fh:
        fh.seek(int(offset))
        blob = fh.read(int(length))
    if len(blob) != int(length):
        raise PuffinFormatError(
            f"{path}@{offset}: short read ({len(blob)} of {length} "
            "bytes)"
        )
    return dv_positions(blob, where=f"{path}@{offset}")


def write_dv_file(
    path: str,
    dvs: dict[str, list[int]],
    snapshot_id: int,
    sequence_number: int,
    properties: dict | None = None,
) -> list[dict]:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob per
    referenced data file (the shape an Iceberg v3 writer commits: one
    Puffin per snapshot, many DVs).  Returns the blob metadata list,
    each entry carrying ``offset``/``length`` plus the
    ``referenced-data-file`` / ``cardinality`` properties a manifest
    entry needs.  Per spec, DV blobs are never compressed and
    ``fields`` is empty (the vector indexes rows, not columns)."""
    blobs = []
    for ref, positions in sorted(dvs.items()):
        pos = sorted(set(int(p) for p in positions))
        blobs.append(
            (
                {
                    "type": DV_BLOB_TYPE,
                    "fields": [],
                    "snapshot-id": int(snapshot_id),
                    "sequence-number": int(sequence_number),
                    "properties": {
                        "referenced-data-file": ref,
                        "cardinality": str(len(pos)),
                    },
                },
                dv_blob(pos),
            )
        )
    doc = write_file(path, blobs, properties)
    return doc["blobs"]
