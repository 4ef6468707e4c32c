"""Additive schema evolution: a new column (lang) appears mid-replay.

north_rule: "schema evolution (new columns like lang propagated via
Iceberg schema updates)" — here via the manifest schema union; pre-evolution
data files lack the column and are null-filled on read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.replay import apply_batch
from epigraphdb_graph_spark.schema import ContractError, merge_schemas
from epigraphdb_graph_spark.sources.events import generate_change_events


def test_lang_added_mid_replay(spark, tmp_path):
    path = str(tmp_path / "pages_evolve")
    old = generate_change_events(spark, 500, seed=42, with_lang=False)
    new = generate_change_events(spark, 1000, seed=42, with_lang=True).filter(
        F.col("event_seq") >= 500
    )

    base_schema = T.StructType(
        [f for f in __import__(
            "epigraphdb_graph_spark.schema", fromlist=["PAGES_SCHEMA"]
        ).PAGES_SCHEMA.fields if f.name != "lang"]
    )
    table = LakeTable.create(spark, path, base_schema, key="url", n_buckets=8)
    apply_batch(table, old, batch_id="pre-evolution", watermark_seq=499)
    assert "lang" not in [f.name for f in table.schema().fields]

    # events now carry lang -> implicit additive evolution inside merge()
    apply_batch(table, new, batch_id="post-evolution", watermark_seq=999)
    assert "lang" in [f.name for f in table.schema().fields]

    state = table.read(with_system_cols=True)
    # rows whose last writer predates evolution read as NULL lang;
    # rows last written post-evolution carry it
    pre = state.filter(F.col("_seq") < 500)
    post = state.filter(F.col("_seq") >= 500)
    assert pre.filter(F.col("lang").isNotNull()).count() == 0
    assert post.filter(F.col("lang").isNull()).count() == 0
    assert post.count() > 0 and pre.count() > 0

    # time travel back to the pre-evolution snapshot: no lang column at all
    v1 = table.read(version=1)
    assert "lang" not in v1.columns


def test_explicit_evolve_and_incompatible_change(spark, tmp_path):
    path = str(tmp_path / "pages_evolve2")
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
    ])
    table = LakeTable.create(spark, path, schema, key="url", n_buckets=4)
    table.evolve(T.StructType([T.StructField("lang", T.StringType(), True)]))
    assert [f.name for f in table.schema().fields] == ["url", "warc_ts", "lang"]

    with pytest.raises(ContractError):
        merge_schemas(
            table.schema(),
            T.StructType([T.StructField("lang", T.LongType(), True)]),
        )
