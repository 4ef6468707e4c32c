"""Incremental materialized-view maintenance (streaming/matview.py) +
the CDF update-pre-image feed mode it consumes.

Exactness contract: after every refresh the incrementally maintained
view equals a full recompute over the table's visible state — across
inserts, superseding updates, deletes, and revivals."""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.replay import replay
from epigraphdb_graph_spark.sources.events import generate_change_events
from epigraphdb_graph_spark.streaming.matview import (
    maintain_aggregate,
    read_view,
)

N_EVENTS = 3000


def _recompute(table):
    return (
        table.read().groupBy("lang")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.length("text")).alias("text_chars"))
        .toPandas().set_index("lang").sort_index()
    )


def _view(spark, view_dir):
    return (
        read_view(spark, view_dir).toPandas()
        .set_index("lang").sort_index()
    )


def _assert_view_exact(spark, table, view_dir):
    got, want = _view(spark, view_dir), _recompute(table)
    assert list(got.index) == list(want.index)
    assert list(got["n_rows"]) == list(want["n_rows"])
    assert list(got["text_chars"]) == list(want["text_chars"])


def test_incremental_view_tracks_table_exactly(spark, tmp_path):
    events = generate_change_events(
        spark, N_EVENTS, seed=21, n_domains=20, pages_per_domain=8,
        with_lang=True).cache()
    events.count()
    path = str(tmp_path / "pages")
    view_dir = str(tmp_path / "view")
    table_args = dict(n_batches=1, n_buckets=8)

    # phase 1: first third of the log -> initial build (from v0, all inserts)
    replay(spark, path, events.filter(F.col("event_seq") < 1000), **table_args)
    table = LakeTable(spark, path)
    r1 = maintain_aggregate(
        table, view_dir, group_col="lang",
        sum_exprs={"text_chars": F.length("text")})
    assert r1["refreshed"] and r1["from_version"] == 0
    _assert_view_exact(spark, table, view_dir)

    # phase 2: rest of the log (updates + deletes + revivals) -> DIFFERENTIAL
    replay(spark, path, events, **table_args)
    r2 = maintain_aggregate(
        table, view_dir, group_col="lang",
        sum_exprs={"text_chars": F.length("text")})
    assert r2["refreshed"] and r2["from_version"] > 0
    _assert_view_exact(spark, table, view_dir)

    # no new commits -> no-op refresh
    r3 = maintain_aggregate(table, view_dir, group_col="lang",
                            sum_exprs={"text_chars": F.length("text")})
    assert not r3["refreshed"]

    # crash-resume: roll the cursor back one refresh (its state dir is
    # retained by keep_last) and re-run — must converge to the same view
    with open(os.path.join(view_dir, "_cursor.json"), "w") as f:
        json.dump({"last_version": r2["from_version"]}, f)
    r4 = maintain_aggregate(table, view_dir, group_col="lang",
                            sum_exprs={"text_chars": F.length("text")})
    assert r4["refreshed"]
    _assert_view_exact(spark, table, view_dir)


def test_changes_update_images_both(spark, tmp_path):
    """CDF pairs: every update contributes a preimage (old image, old
    ordering keys) and a postimage; inserts/deletes are unchanged."""
    rows = [
        (1, "insert", "u1", "2024-01-01", b"<p>v1</p>"),
        (2, "insert", "u2", "2024-01-01", b"<p>w1</p>"),
    ]
    rows2 = [
        (3, "update", "u1", "2024-01-02", b"<p>v2 longer</p>"),
        (4, "delete", "u2", "2024-01-02", None),
        (5, "insert", "u3", "2024-01-02", b"<p>x1</p>"),
    ]

    def df(r):
        pdf = pd.DataFrame(
            r, columns=["event_seq", "op", "url", "warc_ts", "html"])
        pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
        return spark.createDataFrame(pdf)

    from epigraphdb_graph_spark.replay import apply_batch
    from epigraphdb_graph_spark.schema import PAGES_SCHEMA

    path = str(tmp_path / "cdf")
    table = LakeTable.create(spark, path, PAGES_SCHEMA, key="url", n_buckets=4)
    apply_batch(table, df(rows), batch_id="b1")
    v1 = table.current_version()
    apply_batch(table, df(rows2), batch_id="b2")

    feed = table.changes(v1, update_images="both").toPandas()
    by = feed.groupby("_change_type")["url"].apply(list).to_dict()
    assert by["update_preimage"] == ["u1"]
    assert by["update_postimage"] == ["u1"]
    assert by["delete"] == ["u2"]
    assert by["insert"] == ["u3"]
    pre = feed[feed["_change_type"] == "update_preimage"].iloc[0]
    post = feed[feed["_change_type"] == "update_postimage"].iloc[0]
    assert pre["text"] == "v1" and post["text"] == "v2 longer"
    assert pre["_seq"] == 1 and post["_seq"] == 3
    # default mode is unchanged: single update row
    feedp = table.changes(v1).toPandas()
    assert sorted(feedp["_change_type"]) == ["delete", "insert", "update"]
