"""Bucket-spec evolution (rebucketing compaction) + auto-compact policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.replay import replay
from epigraphdb_graph_spark.sources.events import generate_change_events

from .oracle import replay_oracle


def test_rebucket_preserves_state_and_new_spec(spark, tmp_path):
    ev = generate_change_events(spark, 2000, seed=17, n_domains=20,
                                pages_per_domain=8).cache()
    path = str(tmp_path / "t")
    replay(spark, path, ev, n_batches=2, n_buckets=4, mode="mor")
    table = LakeTable(spark, path)
    before = table.read().select("url", "warc_ts", "text").toPandas() \
        .sort_values("url").reset_index(drop=True)

    v = table.compact(n_buckets=16)
    m = table.manifest()
    assert m["n_buckets"] == 16
    assert len(m["files"]) > 4           # spread over the new spec
    after = table.read().select("url", "warc_ts", "text").toPandas() \
        .sort_values("url").reset_index(drop=True)
    assert before.equals(after)

    # old snapshot still reads under its original spec (time travel)
    assert table.read(version=v - 1).count() == len(before)

    # subsequent merges use the new spec
    more = generate_change_events(spark, 3000, seed=17, n_domains=20,
                                  pages_per_domain=8).filter(
        F.col("event_seq") >= 2000)
    replay(spark, path, more, n_batches=1, n_buckets=999, mode="mor")  # n_buckets ignored for existing table
    want = replay_oracle(
        generate_change_events(spark, 3000, seed=17, n_domains=20,
                               pages_per_domain=8).toPandas()
    )[["url", "warc_ts", "text"]]
    table.compact()
    got = table.read().select("url", "warc_ts", "text").toPandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])


def test_maybe_compact_threshold(spark, tmp_path):
    ev = generate_change_events(spark, 1200, seed=19, n_domains=10,
                                pages_per_domain=4).cache()
    path = str(tmp_path / "t2")
    replay(spark, path, ev, n_batches=3, n_buckets=4, mode="mor")
    table = LakeTable(spark, path)
    n_pending = table.pending_delta_files()
    assert n_pending > 0

    assert table.maybe_compact(max_delta_files=n_pending) is None  # <= threshold
    assert table.pending_delta_files() == n_pending
    v = table.maybe_compact(max_delta_files=n_pending - 1)
    assert v is not None
    assert table.pending_delta_files() == 0
