"""Optimistic-concurrency CAS on the metadata pointer."""

from __future__ import annotations

import pandas as pd
import pytest

from epigraphdb_graph_spark.plans.lake import ConcurrentWriteError, LakeTable
from epigraphdb_graph_spark.replay import apply_batch
from epigraphdb_graph_spark.schema import PAGES_SCHEMA

COLS = ["event_seq", "op", "url", "warc_ts", "html"]


def _ev(spark, seq, url="https://a.org/p", ts="2024-01-01"):
    return spark.createDataFrame(pd.DataFrame(
        [(seq, "insert", url, pd.Timestamp(ts), b"<p>x</p>")], columns=COLS))


def test_concurrent_writer_detected(spark, tmp_path):
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, PAGES_SCHEMA, key="url", n_buckets=2)
    # two handles simulating two writers reading the same snapshot
    w1 = LakeTable(spark, path)
    w2 = LakeTable(spark, path)
    m1 = w1.manifest()  # both derive from v0
    m2 = w2.manifest()

    w1._commit({**m1, "version": 1, "parent": 0, "metrics": {"op": "evolve"}})
    with pytest.raises(ConcurrentWriteError):
        w2._commit({**m2, "version": 1, "parent": 0, "metrics": {"op": "evolve"}})


def test_sequential_commits_unaffected(spark, tmp_path):
    path = str(tmp_path / "t2")
    table = LakeTable.create(spark, path, PAGES_SCHEMA, key="url", n_buckets=2)
    apply_batch(table, _ev(spark, 1), batch_id="b1")
    apply_batch(table, _ev(spark, 2, ts="2024-01-02"), batch_id="b2", mode="mor")
    table.compact()
    assert table.current_version() == 3
    assert table.read().count() == 1
