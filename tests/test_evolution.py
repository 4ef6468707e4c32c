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


def test_type_widening_evolution(spark, tmp_path):
    """Widening evolution (Iceberg rules): a payload column arriving with
    a safely wider type (int -> long, float -> double) widens the table
    schema in place; pre-widening files read through the wider schema
    without rewrite; a later NARROWER batch up-casts into the table type."""
    import pandas as pd

    from epigraphdb_graph_spark.schema import PAGES_SCHEMA, widens

    # unit surface first
    assert widens(T.IntegerType(), T.LongType())
    assert widens(T.FloatType(), T.DoubleType())
    assert widens(T.DecimalType(5, 2), T.DecimalType(10, 2))
    assert not widens(T.LongType(), T.IntegerType())
    assert not widens(T.DecimalType(10, 2), T.DecimalType(10, 4))  # digit loss
    assert not widens(T.StringType(), T.LongType())

    def batch(seq, url, ts, views, vtype):
        pdf = pd.DataFrame(
            [(seq, "insert", url, pd.Timestamp(ts), b"<p>x</p>", views)],
            columns=["event_seq", "op", "url", "warc_ts", "html", "views"])
        df = spark.createDataFrame(pdf)
        return df.withColumn("views", F.col("views").cast(vtype))

    path = str(tmp_path / "widen")
    table = LakeTable.create(spark, path, PAGES_SCHEMA, key="url", n_buckets=4)
    apply_batch(table, batch(1, "a", "2024-01-01", 7, "int"), batch_id="w1")
    assert dict((f.name, f.dataType) for f in table.schema().fields)[
        "views"] == T.IntegerType()

    # long arrives -> schema widens; the old int-written file reads back
    apply_batch(table, batch(2, "b", "2024-01-02", 2**40, "long"),
                batch_id="w2")
    assert dict((f.name, f.dataType) for f in table.schema().fields)[
        "views"] == T.LongType()
    got = {r["url"]: r["views"] for r in table.read().collect()}
    assert got == {"a": 7, "b": 2**40}

    # a narrower (int) batch after widening: up-cast, schema stays long
    apply_batch(table, batch(3, "c", "2024-01-03", 11, "int"), batch_id="w3")
    assert dict((f.name, f.dataType) for f in table.schema().fields)[
        "views"] == T.LongType()
    got = {r["url"]: r["views"] for r in table.read().collect()}
    assert got == {"a": 7, "b": 2**40, "c": 11}

    # truly incompatible change still rejected
    with pytest.raises(ContractError, match="incompatible"):
        merge_schemas(table.schema(),
                      T.StructType([T.StructField("views", T.StringType())]))
