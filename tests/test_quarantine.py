"""Dead-letter quarantine: malformed events split out, persisted, counted
(accounted analog of --skip-bad-relationships, SURVEY J8/K2)."""

from __future__ import annotations

import pandas as pd
import pytest

from epigraphdb_graph_spark.operators.quarantine import quarantine, split_valid
from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.replay import apply_batch
from epigraphdb_graph_spark.schema import PAGES_SCHEMA


COLS = ["event_seq", "op", "url", "warc_ts", "html"]


@pytest.fixture()
def mixed_events(spark):
    ts = pd.Timestamp("2024-03-01")
    rows = [
        (1, "insert", "https://a.org/p1", ts, b"<p>ok1</p>"),
        (2, "insert", None, ts, b"<p>no url</p>"),                 # null_url
        (3, "insert", "not-a-url", ts, b"<p>bad</p>"),             # malformed_url
        (4, "upsert", "https://a.org/p2", ts, b"<p>x</p>"),        # bad_op
        (5, "insert", "https://a.org/p3", None, b"<p>y</p>"),      # null_ts
        (6, "insert", "https://a.org/p4", ts, None),               # null_html
        (7, "delete", "https://a.org/p5", ts, None),               # valid delete
        (8, "update", "https://a.org/p1", ts + pd.Timedelta("1h"), b"<p>ok2</p>"),
    ]
    pdf = pd.DataFrame(rows, columns=COLS)
    return spark.createDataFrame(pdf)


def test_split_valid_reasons(spark, mixed_events):
    s = split_valid(mixed_events)
    assert s.valid.count() == 3  # 1, 7, 8
    reasons = {r["event_seq"]: r["_reason"] for r in s.dead.collect()}
    assert reasons == {2: "null_url", 3: "malformed_url", 4: "bad_op",
                       5: "null_ts", 6: "null_html"}


def test_quarantine_sink_and_counts(spark, tmp_path, mixed_events):
    dl = str(tmp_path / "dead")
    valid, counts = quarantine(mixed_events, dl)
    assert valid.count() == 3
    assert counts == {"null_url": 1, "malformed_url": 1, "bad_op": 1,
                      "null_ts": 1, "null_html": 1}
    written = spark.read.parquet(dl)
    assert written.count() == 5
    assert "_reason" in written.columns


def test_apply_batch_with_dead_letter(spark, tmp_path, mixed_events):
    path = str(tmp_path / "pages")
    dl = str(tmp_path / "dead")
    table = LakeTable.create(spark, path, PAGES_SCHEMA, key="url", n_buckets=4)
    apply_batch(table, mixed_events, batch_id="b1", dead_letter_dir=dl)
    # only the 3 valid events applied: p1 (updated image) alive, p5 tombstoned
    state = table.read().toPandas().sort_values("url").reset_index(drop=True)
    assert list(state["url"]) == ["https://a.org/p1"]
    assert state.loc[0, "text"] == "ok2"
    # counts recorded in commit lineage
    m = table.manifest()
    assert m["metrics"]["quarantined"] == {
        "null_url": 1, "malformed_url": 1, "bad_op": 1,
        "null_ts": 1, "null_html": 1}
    assert spark.read.parquet(dl).count() == 5


def test_streaming_tailer_dead_letter(spark, tmp_path, mixed_events):
    """The tailer's quarantine path: malformed events in the change log
    land in the dead-letter sink (namespaced per micro-batch subdir),
    valid events merge, and the commit metrics carry the counts."""
    from epigraphdb_graph_spark.streaming.tailer import tail_change_log

    log_dir = str(tmp_path / "log")
    mixed_events.write.parquet(log_dir)
    dl = str(tmp_path / "dead")
    q = tail_change_log(spark, log_dir, str(tmp_path / "pages"),
                        str(tmp_path / "ckpt"), n_buckets=4, mode="mor",
                        available_now=True, dead_letter_dir=dl)
    q.awaitTermination()
    table = LakeTable(spark, str(tmp_path / "pages"))
    assert sorted(r["url"] for r in table.read().collect()) == [
        "https://a.org/p1"]
    dead = spark.read.parquet(dl)
    assert dead.count() == 5
    assert "batch" in dead.columns  # per-micro-batch lineage subdir
    hist = [m for m in table.history()
            if m["metrics"].get("op") == "merge"]
    assert sum(m["metrics"]["quarantined"]["bad_op"] for m in hist
               if m["metrics"].get("quarantined")) == 1


def test_clean_batch_no_dead_letter_write(spark, tmp_path):
    ts = pd.Timestamp("2024-03-01")
    clean = spark.createDataFrame(pd.DataFrame(
        [(1, "insert", "https://a.org/x", ts, b"<p>z</p>")], columns=COLS))
    valid, counts = quarantine(clean, str(tmp_path / "dl"))
    assert counts == {} and valid.count() == 1
    import os
    assert not os.path.exists(str(tmp_path / "dl"))  # nothing written
