"""Minimal from-scratch Apache Avro binary writer/reader (no deps).

The Iceberg spec requires manifest lists and manifest files to be Avro
Object Container Files; this sandbox has no Avro library (fastavro /
avro absent — verified, see BENCH/BASELINE.md jar/package hunt). Avro's
binary encoding is small and fully specified, so rather than shipping
JSON stand-ins the exporter uses this from-scratch encoder: zigzag
varint ints/longs, length-prefixed strings/bytes, index-prefixed
unions, single-block arrays/maps, and the OCF framing (magic, file
metadata map, sync-marker-delimited data blocks, null codec).

Scope is exactly the subset Iceberg's metadata layer needs — records of
primitives, nullable (union-with-null) fields, nested records, arrays,
maps with string keys, bytes — not a general Avro implementation
(no enums/fixed/recursion/schema-resolution, null codec only). A
symmetric decoder ships alongside so tests round-trip every file and
the exporter can self-verify what external readers will parse.

Spec: https://avro.apache.org/docs/1.11.1/specification/ (public).
Reference analog: the neo4j-admin interchange boundary
(workflow/scripts/graph_build/create_master_import.py:69-88) — the
point where the engine's layout must meet an external format exactly.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- encode


def _write_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag + little-endian base-128 varint (Avro int and long)."""
    u = (n << 1) ^ (n >> 63)  # two's-complement zigzag for 64-bit range
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _is_nullable_union(schema) -> bool:
    return isinstance(schema, list)


def _write_datum(buf: io.BytesIO, schema, datum) -> None:
    """Encode ``datum`` per the (writer) ``schema`` node. Schema nodes are
    the parsed Avro JSON forms: primitive name str, dict (record / array /
    map / annotated primitive), or list (union)."""
    if isinstance(schema, list):  # union: index, then value
        if datum is None:
            if "null" not in schema:
                raise ValueError(f"None for non-nullable union {schema}")
            _write_long(buf, schema.index("null"))
            return
        # first non-null branch (exporter only uses [null, X] unions)
        idx, branch = next((i, s) for i, s in enumerate(schema)
                           if s != "null")
        _write_long(buf, idx)
        _write_datum(buf, branch, datum)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                try:
                    v = datum[f["name"]] if f["name"] in datum else None
                except TypeError:
                    raise ValueError(f"record datum must be a dict, got "
                                     f"{type(datum).__name__}")
                if v is None and not _is_nullable_union(f["type"]) \
                        and f["type"] != "null":
                    raise ValueError(
                        f"missing required field {f['name']!r}")
                _write_datum(buf, f["type"], v)
            return
        if t == "array":
            if datum:
                _write_long(buf, len(datum))
                for item in datum:
                    _write_datum(buf, schema["items"], item)
            _write_long(buf, 0)  # end of blocks
            return
        if t == "map":
            if datum:
                _write_long(buf, len(datum))
                for k, v in datum.items():
                    _write_bytes(buf, k.encode("utf-8"))
                    _write_datum(buf, schema["values"], v)
            _write_long(buf, 0)
            return
        # annotated primitive, e.g. {"type": "long", "field-id": 501}
        _write_datum(buf, t, datum)
        return
    # primitive name
    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif schema in ("int", "long"):
        _write_long(buf, int(datum))
    elif schema == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif schema == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif schema == "bytes":
        _write_bytes(buf, bytes(datum))
    elif schema == "string":
        _write_bytes(buf, datum.encode("utf-8"))
    else:
        raise ValueError(f"unsupported Avro type {schema!r}")


def write_ocf(path: str, schema: dict, records: list,
              metadata: dict | None = None) -> None:
    """Write an Avro Object Container File: magic, file-metadata map
    (``avro.schema`` + ``avro.codec: null`` + caller entries), sync
    marker, then one data block. The sync marker is derived from the
    schema + record count so identical exports are byte-stable."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    sync = hashlib.md5(
        schema_json.encode() + str(len(records)).encode()).digest()

    body = io.BytesIO()
    for rec in records:
        _write_datum(body, schema, rec)
    payload = body.getvalue()

    out = io.BytesIO()
    out.write(MAGIC)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# ---------------------------------------------------------------- decode


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated Avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift, u = 0, 0
        while True:
            b = self.read(1)[0]
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _read_datum(r: _Reader, schema):
    if isinstance(schema, list):
        return _read_datum(r, schema[r.read_long()])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _read_datum(r, f["type"])
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    r.read_long()
                out.extend(_read_datum(r, schema["items"])
                           for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = _read_datum(r, schema["values"])
        return _read_datum(r, t)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) == b"\x01"
    if schema in ("int", "long"):
        return r.read_long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.read_bytes()
    if schema == "string":
        return r.read_bytes().decode("utf-8")
    raise ValueError(f"unsupported Avro type {schema!r}")


def read_ocf(path: str):
    """Read an OCF written by any null-codec Avro writer; returns
    ``(schema, records, metadata)``. Used by tests to round-trip every
    exported manifest and by the exporter's self-verification."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = r.read(16)
    records = []
    while r.pos < len(r.data):
        count = r.read_long()
        r.read_long()  # block byte size (unused with null codec)
        records.extend(_read_datum(r, schema) for _ in range(count))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records, meta
