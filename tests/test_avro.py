"""From-scratch Avro OCF writer: encoding-level checks + round-trips.

No Avro library ships in this sandbox (fastavro/avro absent), so the
decoder used for round-trips is the module's own symmetric reader —
these tests therefore also pin the *byte layout* of the primitives
against the Avro spec's published examples (zigzag varints, OCF magic)
so a writer/reader bug cannot cancel itself out silently.
"""

from __future__ import annotations

import io
import json

import pytest

from epigraphdb_graph_spark.plans.avro import (
    _Reader, _write_long, read_ocf, write_ocf,
)


def _long_bytes(n: int) -> bytes:
    buf = io.BytesIO()
    _write_long(buf, n)
    return buf.getvalue()


def test_zigzag_varint_spec_bytes():
    # the Avro spec's own table of example encodings
    assert _long_bytes(0) == b"\x00"
    assert _long_bytes(-1) == b"\x01"
    assert _long_bytes(1) == b"\x02"
    assert _long_bytes(-2) == b"\x03"
    assert _long_bytes(2) == b"\x04"
    assert _long_bytes(-64) == b"\x7f"
    assert _long_bytes(64) == b"\x80\x01"
    # int64 extremes survive the two's-complement zigzag
    for n in (2**63 - 1, -(2**63), 12345678901234, -987654321):
        r = _Reader(_long_bytes(n))
        assert r.read_long() == n


def test_ocf_roundtrip_all_supported_types(tmp_path):
    schema = {
        "type": "record", "name": "t", "fields": [
            {"name": "s", "type": "string"},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "b", "type": "boolean"},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {"name": "nested", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "x", "type": "long", "field-id": 1},
                    {"name": "empty", "type": {
                        "type": "record", "name": "r102", "fields": []}},
                ]}},
            {"name": "by", "type": "bytes"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
        ],
    }
    recs = [
        {"s": "héllo 世界", "opt": None, "b": True,
         "arr": [1, -2, 3], "m": {"a": 1.5, "b": -2.25},
         "nested": {"x": -(2**63), "empty": {}},
         "by": b"\x00\xff\x10", "f": 1.25, "d": -3.5},
        {"s": "", "opt": 2**63 - 1, "b": False, "arr": [], "m": {},
         "nested": {"x": 0, "empty": {}}, "by": b"", "f": -0.5, "d": 0.0},
    ]
    p = str(tmp_path / "t.avro")
    write_ocf(p, schema, recs, metadata={"k": "v", "raw": b"\x01\x02"})
    schema2, recs2, meta = read_ocf(p)
    assert schema2 == schema
    assert recs2 == recs
    assert meta["k"] == b"v" and meta["raw"] == b"\x01\x02"
    assert meta["avro.codec"] == b"null"
    assert json.loads(meta["avro.schema"]) == schema

    with open(p, "rb") as f:
        assert f.read(4) == b"Obj\x01"  # OCF magic, spec section "Object
        # Container Files": 'O', 'b', 'j', version byte 1


def test_ocf_empty_file_and_errors(tmp_path):
    schema = {"type": "record", "name": "e", "fields": [
        {"name": "x", "type": "long"}]}
    p = str(tmp_path / "e.avro")
    write_ocf(p, schema, [])
    _, recs, _ = read_ocf(p)
    assert recs == []

    with pytest.raises(ValueError, match="missing required field"):
        write_ocf(str(tmp_path / "bad.avro"), schema, [{"y": 1}])

    notavro = str(tmp_path / "n.avro")
    with open(notavro, "wb") as f:
        f.write(b"PAR1....")
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(notavro)


def test_ocf_deterministic_bytes(tmp_path):
    """Identical export inputs produce byte-identical files (the sync
    marker derives from schema + count, not a random source)."""
    schema = {"type": "record", "name": "d", "fields": [
        {"name": "x", "type": "long"}]}
    recs = [{"x": i} for i in range(100)]
    p1, p2 = str(tmp_path / "1.avro"), str(tmp_path / "2.avro")
    write_ocf(p1, schema, recs)
    write_ocf(p2, schema, recs)
    assert open(p1, "rb").read() == open(p2, "rb").read()
