"""Iceberg metadata exporter: spec-shape validation + documented limits."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from epigraphdb_graph_spark.plans.avro import read_ocf
from epigraphdb_graph_spark.plans.iceberg_export import to_iceberg_metadata
from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.replay import replay
from epigraphdb_graph_spark.schema import PAGES_SCHEMA
from epigraphdb_graph_spark.sources.events import generate_change_events

REQUIRED_V2_KEYS = {
    "format-version", "table-uuid", "location", "last-sequence-number",
    "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
    "default-spec-id", "partition-specs", "last-partition-id",
    "default-sort-order-id", "sort-orders", "properties",
    "current-snapshot-id", "snapshots", "snapshot-log", "metadata-log",
}


def test_export_shape_and_file_chain(spark, tmp_path):
    path = str(tmp_path / "t")
    ev = generate_change_events(spark, 3000, seed=11, n_domains=20,
                                pages_per_domain=8)
    replay(spark, path, ev, n_batches=2, n_buckets=4, mode="mor")
    t = LakeTable(spark, path)

    # MOR refusal: pending deltas are resolve-on-read LWW upserts, not
    # expressible as Iceberg deletes — export must refuse until compacted
    assert t.pending_delta_files() > 0
    with pytest.raises(ValueError, match="compact"):
        to_iceberg_metadata(t)

    t.compact()
    out = to_iceberg_metadata(t)
    with open(out) as f:
        meta = json.load(f)

    # --- TableMetadata v2 shape
    assert REQUIRED_V2_KEYS <= set(meta)
    assert meta["format-version"] == 2
    assert meta["location"] == os.path.abspath(path)
    schema = meta["schemas"][meta["current-schema-id"]]
    assert schema["type"] == "struct"
    ids = [f["id"] for f in schema["fields"]]
    assert ids == list(range(1, len(ids) + 1))  # unique, dense field ids
    names = [f["name"] for f in schema["fields"]]
    for col in ("url", "warc_ts", "html", "text", "_seq", "_ts", "_deleted"):
        assert col in names
    assert meta["last-column-id"] == len(ids)
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    snap = meta["snapshots"][0]
    assert snap["snapshot-id"] == meta["current-snapshot-id"]
    assert meta["refs"]["main"]["snapshot-id"] == snap["snapshot-id"]

    # --- snapshot -> manifest list -> manifest -> data files chain resolves
    # (both levels are spec Avro object container files, written by the
    # from-scratch encoder and decoded here by its symmetric reader;
    # human-readable JSON mirrors sit alongside with the same basename)
    assert snap["manifest-list"].endswith(".avro")
    mlist_schema, mlist, mlist_meta = read_ocf(snap["manifest-list"])
    assert mlist_schema["name"] == "manifest_file"
    assert {f["name"]: f["field-id"] for f in mlist_schema["fields"]}[
        "manifest_path"] == 500  # spec v2 field ids ride in the schema
    assert mlist_meta["format-version"] == b"2"
    assert len(mlist) == 1 and mlist[0]["content"] == 0
    assert os.path.isfile(snap["manifest-list"][:-5] + ".json")

    man_schema, entries, man_meta = read_ocf(mlist[0]["manifest_path"])
    assert mlist[0]["manifest_path"].endswith(".avro")
    assert mlist[0]["manifest_length"] == os.path.getsize(
        mlist[0]["manifest_path"])
    assert man_schema["name"] == "manifest_entry"
    assert json.loads(man_meta["schema"]) == schema  # table schema rides
    assert man_meta["content"] == b"data"
    with open(mlist[0]["manifest_path"][:-5] + ".json") as f:
        assert json.load(f)["entries"] == entries  # mirror agrees exactly

    assert entries and all(e["data_file"]["file_format"] == "PARQUET"
                           for e in entries)
    for e in entries:
        df = e["data_file"]
        assert os.path.isfile(df["file_path"])
        assert df["file_size_in_bytes"] == os.path.getsize(df["file_path"])
        assert df["record_count"] >= 0
    assert mlist[0]["added_data_files_count"] == len(entries)

    # --- an external reader following the chain sees the exact snapshot:
    # raw rows == manifest record counts; applying the documented residual
    # predicate (_deleted = false) reproduces the engine's visible state
    files = [e["data_file"]["file_path"] for e in entries]
    raw = spark.read.parquet(*files)
    assert raw.count() == sum(e["data_file"]["record_count"] for e in entries)
    visible = raw.filter("NOT _deleted")
    assert visible.count() == t.read().count()
    got = (visible.select("url", "text").toPandas()
           .sort_values("url").reset_index(drop=True))
    want = (t.read().select("url", "text").toPandas()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # version-hint resolves HadoopTables-style
    hint = os.path.join(path, "metadata", "version-hint.text")
    with open(hint) as f:
        assert int(f.read()) == t.current_version()


def test_export_type_mapping_and_evolution(spark, tmp_path):
    """Additive evolution lands in the exported schema; decimal/long/etc
    map to spec type strings."""
    from pyspark.sql import types as T

    path = str(tmp_path / "t2")
    ev = generate_change_events(spark, 500, seed=3, n_domains=5,
                                pages_per_domain=4)
    replay(spark, path, ev, n_batches=1, n_buckets=2, mode="mor")
    t = LakeTable(spark, path)
    t.evolve(T.StructType([
        T.StructField("lang", T.StringType(), True),
        T.StructField("score", T.DecimalType(18, 2), True),
        T.StructField("fetched", T.TimestampType(), True),
    ]))
    t.compact()
    out = to_iceberg_metadata(t)
    with open(out) as f:
        meta = json.load(f)
    types = {f["name"]: f["type"]
             for f in meta["schemas"][0]["fields"]}
    assert types["lang"] == "string"
    assert types["score"] == "decimal(18, 2)"
    assert types["fetched"] == "timestamptz"  # session-TZ == timestamptz
    assert types["html"] == "binary"
    assert types["_seq"] == "long"
