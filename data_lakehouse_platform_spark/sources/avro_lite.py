"""Dependency-free Avro Object Container File codec.

Iceberg's manifest lists and manifest files are Avro (spec:
https://iceberg.apache.org/spec/#manifests), and this container ships
neither the spark-avro datasource module nor a Python avro package
(JARS.md documents the acquisition attempt).  The Avro 1.x binary
encoding and container format are small, public, and stable
(https://avro.apache.org/docs/current/specification/): zigzag-varint
ints/longs, length-prefixed bytes/strings, block-structured arrays and
maps, union-index prefixes, and a container file of
``magic | metadata map | sync`` followed by
``count | size | payload | sync`` blocks with null or deflate
(raw DEFLATE, no zlib header — stdlib ``zlib`` with wbits=-15) codecs.

Decoding is WRITER-SCHEMA-DRIVEN: every container file embeds the
schema its records were written with, and :func:`read_container`
decodes against exactly that schema — so real Iceberg metadata written
by any engine decodes without this module knowing Iceberg's schemas at
all.  Encoding exists for fixtures and for writing spec-shaped
metadata; it supports the same type subset Iceberg uses (null, boolean,
int, long, float, double, bytes, string, fixed, enum, record, array,
map, unions).  Logical types ride their underlying primitive untouched.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


class AvroFormatError(RuntimeError):
    """Malformed container file or unsupported schema construct."""


# -- primitive binary codec ---------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroFormatError("EOF inside varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise AvroFormatError("EOF inside bytes")
    return data


# -- schema-driven record codec -----------------------------------------


class _Codec:
    """Resolves named types once, then en/decodes records against the
    (writer) schema."""

    def __init__(self, schema):
        self.named: dict[str, dict] = {}
        self._index(schema)
        self.schema = schema

    def _index(self, s) -> None:
        if isinstance(s, dict):
            t = s.get("type")
            if t in ("record", "enum", "fixed"):
                self.named[s["name"]] = s
                ns = s.get("namespace")
                if ns:
                    self.named[f"{ns}.{s['name']}"] = s
            if t == "record":
                for f in s.get("fields", []):
                    self._index(f["type"])
            elif t == "array":
                self._index(s["items"])
            elif t == "map":
                self._index(s["values"])
        elif isinstance(s, list):
            for b in s:
                self._index(b)

    def _resolve(self, s):
        if isinstance(s, str) and s in self.named:
            return self.named[s]
        if isinstance(s, dict) and isinstance(s.get("type"), (dict, list)):
            # {"type": {...}} wrapper (common in field declarations)
            return self._resolve(s["type"])
        return s

    # decode ------------------------------------------------------------

    def decode(self, buf: io.BytesIO, s):
        s = self._resolve(s)
        if isinstance(s, list):  # union: branch index then value
            idx = _read_long(buf)
            if not 0 <= idx < len(s):
                raise AvroFormatError(f"union index {idx} out of range")
            return self.decode(buf, s[idx])
        t = s["type"] if isinstance(s, dict) else s
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        if t == "fixed":
            return buf.read(s["size"])
        if t == "enum":
            return s["symbols"][_read_long(buf)]
        if t == "record":
            return {
                f["name"]: self.decode(buf, f["type"])
                for f in s["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block size prefix variant
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(self.decode(buf, s["items"]))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = self.decode(buf, s["values"])
        raise AvroFormatError(f"unsupported avro type {t!r}")

    # encode ------------------------------------------------------------

    def encode(self, out: bytearray, s, v) -> None:
        s = self._resolve(s)
        if isinstance(s, list):
            idx = self._pick_branch(s, v)
            _write_long(out, idx)
            self.encode(out, s[idx], v)
            return
        t = s["type"] if isinstance(s, dict) else s
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            _write_long(out, int(v))
        elif t == "float":
            out += struct.pack("<f", v)
        elif t == "double":
            out += struct.pack("<d", v)
        elif t == "bytes":
            _write_long(out, len(v))
            out += v
        elif t == "string":
            b = v.encode("utf-8")
            _write_long(out, len(b))
            out += b
        elif t == "fixed":
            if len(v) != s["size"]:
                raise AvroFormatError(
                    f"fixed {s['name']}: {len(v)} != {s['size']} bytes"
                )
            out += v
        elif t == "enum":
            _write_long(out, s["symbols"].index(v))
        elif t == "record":
            for f in s["fields"]:
                if f["name"] in v:
                    self.encode(out, f["type"], v[f["name"]])
                elif "default" in f:
                    # Avro writer-schema default (spec §Schema Record):
                    # lets optional fields (e.g. manifest column stats)
                    # be omitted by builders that have nothing to say
                    self.encode(out, f["type"], f["default"])
                else:
                    raise AvroFormatError(
                        f"record {s.get('name')}: missing field {f['name']}"
                    )
        elif t == "array":
            if v:
                _write_long(out, len(v))
                for item in v:
                    self.encode(out, s["items"], item)
            _write_long(out, 0)
        elif t == "map":
            if v:
                _write_long(out, len(v))
                for k, val in v.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out += kb
                    self.encode(out, s["values"], val)
            _write_long(out, 0)
        else:
            raise AvroFormatError(f"unsupported avro type {t!r}")

    def _pick_branch(self, union: list, v) -> int:
        def matches(branch) -> bool:
            b = self._resolve(branch)
            bt = b["type"] if isinstance(b, dict) else b
            if bt == "null":
                return v is None
            if v is None:
                return False
            if bt == "boolean":
                return isinstance(v, bool)
            if bt in ("int", "long"):
                return isinstance(v, int) and not isinstance(v, bool)
            if bt in ("float", "double"):
                return isinstance(v, float)
            if bt in ("bytes", "fixed"):
                return isinstance(v, (bytes, bytearray))
            if bt in ("string", "enum"):
                return isinstance(v, str)
            if bt == "record":
                return isinstance(v, dict)
            if bt == "array":
                return isinstance(v, list)
            if bt == "map":
                return isinstance(v, dict)
            return False

        for i, b in enumerate(union):
            if matches(b):
                return i
        raise AvroFormatError(f"no union branch for {type(v).__name__}")


# -- container files -----------------------------------------------------


def read_container(path: str) -> tuple[dict, list]:
    """Read an Avro Object Container File; returns
    (writer schema, decoded records)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise AvroFormatError(f"{path}: not an Avro container file")
    meta_codec = _Codec({"type": "map", "values": "bytes"})
    meta = meta_codec.decode(buf, meta_codec.schema)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroFormatError(f"{path}: unsupported codec {codec!r}")
    sync = buf.read(16)
    rec_codec = _Codec(schema)
    records = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(rec_codec.decode(block, schema))
        if buf.read(16) != sync:
            raise AvroFormatError(f"{path}: sync marker mismatch")
    return schema, records


def write_container(
    path: str,
    schema: dict,
    records: list,
    codec: str = "deflate",
    extra_metadata: dict[str, bytes] | None = None,
) -> None:
    """Write an Avro Object Container File (one block).
    ``extra_metadata`` adds file-level metadata entries — Iceberg
    manifests carry ``schema`` / ``partition-spec`` / ``format-version``
    keys that strict readers consult."""
    if codec not in ("null", "deflate"):
        raise AvroFormatError(f"unsupported codec {codec!r}")
    rec_codec = _Codec(schema)
    payload = bytearray()
    for r in records:
        rec_codec.encode(payload, schema, r)
    body = bytes(payload)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    sync = os.urandom(16)
    out = bytearray(MAGIC)
    meta_codec = _Codec({"type": "map", "values": "bytes"})
    meta_codec.encode(
        out,
        meta_codec.schema,
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
            **(extra_metadata or {}),
        },
    )
    out += sync
    _write_long(out, len(records))
    _write_long(out, len(body))
    out += body
    out += sync
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)
