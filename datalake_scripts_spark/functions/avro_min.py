"""Minimal Avro object-container codec (writer + reader) for the
Iceberg metadata layer (operators/iceberg_interop.py).

The image bundles Spark's avro JARs but not the external avro
DataSource module, and no Python avro package — yet Iceberg manifests
and manifest lists are REQUIRED to be Avro (public Iceberg table
spec). This implements exactly the Avro 1.x binary subset those
schemas need, from the public Avro specification:

- container file: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema``/``avro.codec``), 16-byte sync marker, data blocks
  (count, size, records, sync);
- binary encoding: zigzag-varint int/long, length-prefixed
  string/bytes, 1-byte boolean, little-endian float/double, records
  (field order), unions (varint branch + value), arrays and maps
  (counted blocks, zero terminator);
- codec ``null`` only (written and read); ``deflate`` is read.

Schema handling is structural (the JSON schema passed in), not a
registry — extra JSON attributes like Iceberg's ``field-id`` ride
along untouched, which is the point: Iceberg readers resolve manifest
columns by field-id.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ------------------------------------------------------------ encode


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_varint(out: io.BytesIO, n: int) -> None:
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_long(out: io.BytesIO, n: int) -> None:
    _write_varint(out, _zigzag(int(n)))


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_datum(out: io.BytesIO, schema, value) -> None:
    t = _type_name(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            bt = _type_name(branch)
            if value is None and bt == "null":
                _write_long(out, i)
                return
            if value is not None and bt != "null":
                _write_long(out, i)
                write_datum(out, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, value)
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "bytes" or t == "fixed":
        out.write(value) if t == "fixed" else _write_bytes(out, value)
    elif t == "record":
        for f in schema["fields"]:
            try:
                write_datum(out, f["type"], value[f["name"]])
            except KeyError:
                raise ValueError(
                    f"record {schema.get('name')} missing field "
                    f"{f['name']!r}"
                ) from None
    elif t == "array":
        items = list(value or [])
        if items:
            _write_long(out, len(items))
            for item in items:
                write_datum(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, k.encode("utf-8"))
                write_datum(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    sync: bytes = b"\x00" * 16,
) -> None:
    """One-block Avro object container file (codec null)."""
    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    payload = body.getvalue()
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema),
        "avro.codec": "null",
        **(metadata or {}),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v.encode("utf-8"))
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out.getvalue())
    os.replace(tmp, path)


# ------------------------------------------------------------ decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def read_datum(r: _Reader, schema):
    t = _type_name(schema)
    if t == "union":
        return read_datum(r, schema[r.read_long()])
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "bytes":
        return r.read_bytes()
    if t == "fixed":
        return r.read(schema["size"])
    if t == "record":
        return {
            f["name"]: read_datum(r, f["type"]) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()  # block byte size, unused
                n = -n
            out.extend(read_datum(r, schema["items"]) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = read_datum(r, schema["values"])
    raise ValueError(f"unsupported Avro type {t!r}")


def read_container(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """-> (schema, file metadata, records)."""
    with open(path, "rb") as fh:
        r = _Reader(fh.read())
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path} is not an Avro object container")
    meta: dict[str, str] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes().decode("utf-8", "replace")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = r.read(16)
    records: list[dict] = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(read_datum(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
