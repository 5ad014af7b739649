"""Minimal Apache Avro Object Container File writer/reader.

The Iceberg spec stores manifests and manifest lists as AVRO container
files (https://avro.apache.org/docs/1.11.1/specification/ — magic
``Obj\\x01``, file-metadata map, 16-byte sync marker, then blocks of
binary-encoded records).  Nothing in this environment ships a Python
Avro codec (no fastavro / avro-python3, and Spark's avro DATASOURCE
module is external), so the lakehouse fallback implements the small,
fully-public subset of the spec its manifests need:

- primitives: null, boolean, int, long (zigzag varint), float, double
  (IEEE little-endian), bytes, string (length-prefixed);
- complex: record, array, map, union (branch-index-prefixed);
- container: null codec, single-or-multi block, deferred-length blocks.

The point is INTEROP-SHAPED metadata: a real Avro reader (e.g. the JVM
``avro-1.12`` jar Spark bundles, or fastavro on a real cluster) can
open these manifests — pinned by the byte-level pytest assertions on
magic/metadata/sync and by symmetric round-trips here.

Schemas are plain Avro JSON-schema dicts; unknown schema attributes
(``field-id`` — the Iceberg column-identity convention) are carried in
the schema document and ignored by the codec, exactly as Avro
specifies for custom attributes.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

_MAGIC = b"Obj\x01"


# --- binary encoding -------------------------------------------------------

def _write_long(out: io.BytesIO, n: int) -> None:
    """Avro long: zigzag then little-endian base-128 varint (python ints
    are arbitrary precision, so zigzag is spelled portably rather than
    with the 64-bit ``(n << 1) ^ (n >> 63)`` idiom)."""
    z = (n << 1) if n >= 0 else (((-n) << 1) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            break


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    z = 0
    while True:
        (b,) = buf.read(1)
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) if not z & 1 else -((z + 1) >> 1)


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _union_branch(schema: list, value) -> int:
    """Pick the union branch for a value (our manifests only union with
    null, so the match rules stay simple: None → 'null', else the first
    non-null branch)."""
    for i, s in enumerate(schema):
        if (s == "null") == (value is None):
            return i
    raise ValueError(f"no union branch in {schema} for {value!r}")


def _encode(out: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union
        i = _union_branch(schema, value)
        _write_long(out, i)
        _encode(out, schema[i], value)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, str(value).encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], value.get(f["name"]))
    elif t == "array":
        items = list(value or [])
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(out, schema["items"], it)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _decode(buf: io.BytesIO, schema):
    if isinstance(schema, list):  # union
        i = _read_long(buf)
        return _decode(buf, schema[i])
    t = schema["type"] if isinstance(schema, dict) else schema
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
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                _read_long(buf)
                n = -n
            out.extend(_decode(buf, schema["items"]) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
        return out
    raise ValueError(f"unsupported avro type {t!r}")


# --- container file --------------------------------------------------------

def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    meta: dict[str, str] | None = None,
) -> str:
    """Write an Avro Object Container File (null codec, one data block).
    ``meta``: extra file-metadata entries (Iceberg puts manifest-level
    attributes like ``content``/``partition-spec-id`` here).  Atomic via
    unique-tmp + rename.  Returns ``path``."""
    out = io.BytesIO()
    out.write(_MAGIC)
    metadata = {"avro.schema": json.dumps(schema).encode("utf-8"),
                "avro.codec": b"null"}
    for k, v in (meta or {}).items():
        metadata[k] = str(v).encode("utf-8")
    _write_long(out, len(metadata))
    for k, v in metadata.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = uuid.uuid4().bytes  # 16 bytes
    out.write(sync)
    if records:
        payload = io.BytesIO()
        for r in records:
            _encode(payload, schema, r)
        body = payload.getvalue()
        _write_long(out, len(records))
        _write_long(out, len(body))
        out.write(body)
        out.write(sync)
    tmp = path + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
    return path


def read_ocf(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Read an Avro OCF written by any null-codec writer.  Returns
    ``(schema, file_metadata, records)`` — metadata values decoded as
    UTF-8 strings (avro.schema excluded from the metadata dict)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    metadata: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            metadata[k] = _read_bytes(buf)
    schema = json.loads(metadata.pop("avro.schema").decode("utf-8"))
    codec = metadata.pop("avro.codec", b"null").decode("utf-8")
    if codec != "null":
        raise ValueError(f"{path}: unsupported codec {codec!r}")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        _read_long(buf)  # block byte size (null codec: informational)
        for _ in range(count):
            records.append(_decode(buf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    meta = {k: v.decode("utf-8", errors="replace") for k, v in metadata.items()}
    return schema, meta, records
