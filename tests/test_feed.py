"""Change-feed relay: incremental lake->lake replication and parquet
change shipping (reference K5 backup/replication, done incrementally)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.replay import replay
from epigraphdb_graph_spark.sources.events import generate_change_events
from epigraphdb_graph_spark.streaming import replicate, sync_changes

from .oracle import replay_oracle

N_EVENTS = 1600


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(
        spark, N_EVENTS, seed=27, n_domains=16, pages_per_domain=6
    ).cache()
    df.count()
    return df


def _state(spark, path) -> pd.DataFrame:
    return (
        LakeTable(spark, path).read()
        .select("url", "warc_ts", "text")
        .toPandas().sort_values("url").reset_index(drop=True)
    )


def test_replicate_converges_and_is_idempotent(spark, tmp_path, events):
    primary_path = str(tmp_path / "primary")
    replica_path = str(tmp_path / "replica")
    cursor = str(tmp_path / "cursor.json")

    # stage 1: first 60% of the log -> primary, then relay to replica
    first = events.filter(F.col("event_seq") < int(N_EVENTS * 0.6))
    replay(spark, primary_path, first, n_batches=2, n_buckets=8)
    primary = LakeTable(spark, primary_path)
    r1 = replicate(primary, replica_path, state_file=cursor, n_buckets=4)
    assert r1["to_version"] == primary.current_version()
    assert _state(spark, primary_path).equals(_state(spark, replica_path))

    # relay again with no new commits -> no-op
    r2 = replicate(primary, replica_path, state_file=cursor, n_buckets=4)
    assert r2["applied"] == 0

    # stage 2: rest of the log (updates + deletes) -> relay -> converged
    rest = events.filter(F.col("event_seq") >= int(N_EVENTS * 0.6))
    replay(spark, primary_path, rest, n_batches=2, n_buckets=8)
    r3 = replicate(primary, replica_path, state_file=cursor, n_buckets=4)
    got = _state(spark, replica_path)
    assert got.equals(_state(spark, primary_path))
    want = replay_oracle(events.toPandas())[["url", "warc_ts", "text"]]
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])

    # deletes crossed the feed as tombstone merges, not silent absences
    assert r3["merge"]["deleted"] > 0
    rep = LakeTable(spark, replica_path)
    assert rep._read_resolved(rep.manifest()).filter("_deleted").count() > 0


def test_replicate_redelivery_is_noop(spark, tmp_path, events):
    """Losing the cursor (fresh state file) re-ships an old range; the
    replica's ledger + per-row stale guards keep the state unchanged."""
    primary_path = str(tmp_path / "p2")
    replica_path = str(tmp_path / "r2")
    replay(spark, primary_path, events, n_batches=2, n_buckets=8)
    primary = LakeTable(spark, primary_path)
    replicate(primary, replica_path, state_file=str(tmp_path / "c1.json"))
    before = _state(spark, replica_path)
    v = LakeTable(spark, replica_path).current_version()
    # fresh cursor -> full range re-shipped under a DIFFERENT batch id is
    # not possible (id = feed:{to_version}) -> ledger no-op
    res = replicate(primary, replica_path, state_file=str(tmp_path / "c2.json"))
    assert res["merge"]["noop"] is True
    assert LakeTable(spark, replica_path).current_version() == v
    assert _state(spark, replica_path).equals(before)


def test_replicate_across_schema_evolution(spark, tmp_path):
    """Primary evolves (lang appears mid-stream); the feed carries the new
    column and the replica's MERGE evolves additively — replication needs
    zero schema coordination."""
    from pyspark.sql import functions as F

    pre = generate_change_events(spark, 300, seed=31, with_lang=False)
    post = generate_change_events(spark, 600, seed=31, with_lang=True).filter(
        F.col("event_seq") >= 300)
    primary_path, replica_path = str(tmp_path / "p"), str(tmp_path / "r")
    cursor = str(tmp_path / "c.json")

    replay(spark, primary_path, pre, n_batches=1, n_buckets=4)
    primary = LakeTable(spark, primary_path)
    replicate(primary, replica_path, state_file=cursor, n_buckets=4)
    assert "lang" not in [f.name for f in LakeTable(spark, replica_path)
                          .schema().fields]

    replay(spark, primary_path, post, n_batches=1, n_buckets=4)
    replicate(primary, replica_path, state_file=cursor, n_buckets=4)
    replica = LakeTable(spark, replica_path)
    assert "lang" in [f.name for f in replica.schema().fields]
    p = primary.read().select("url", "text", "lang").toPandas() \
        .sort_values("url").reset_index(drop=True)
    r = replica.read().select("url", "text", "lang").toPandas() \
        .sort_values("url").reset_index(drop=True)
    assert p.equals(r)
    assert r["lang"].notna().any()


def test_sync_changes_ships_ranges_exactly_once(spark, tmp_path, events):
    primary_path = str(tmp_path / "p3")
    out = str(tmp_path / "downstream")
    first = events.filter(F.col("event_seq") < 800)
    replay(spark, primary_path, first, n_batches=1, n_buckets=4)
    primary = LakeTable(spark, primary_path)

    s1 = sync_changes(primary, out)
    assert s1["shipped_files"] > 0 and s1["from_version"] == 0
    assert os.path.isdir(s1["path"])
    # nothing new -> nothing shipped
    assert sync_changes(primary, out)["shipped"] == 0

    rest = events.filter(F.col("event_seq") >= 800)
    replay(spark, primary_path, rest, n_batches=1, n_buckets=4)
    s2 = sync_changes(primary, out)
    assert s2["from_version"] == s1["to_version"]

    # the shipped ranges reconstruct the final state when folded in order
    feed = spark.read.option("basePath", out).parquet(
        s1["path"], s2["path"])
    # later range wins per key; within-range rows are already net per key
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy(F.desc("_ts"), F.desc("_seq"))
    folded = (feed.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1").filter("_change_type != 'delete'")
              .select("url", "warc_ts", "text")
              .toPandas().sort_values("url").reset_index(drop=True))
    assert folded.equals(_state(spark, primary_path))
