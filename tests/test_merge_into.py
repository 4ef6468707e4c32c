"""Generic clause-style MERGE INTO (plans/merge_into.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from epigraphdb_graph_spark.plans.lake import LakeTable
from epigraphdb_graph_spark.plans.merge_into import merge_into
from epigraphdb_graph_spark.replay import replay
from epigraphdb_graph_spark.sources.events import generate_change_events

def TS():
    return F.lit("2026-01-01 00:00:00").cast("timestamp")


@pytest.fixture()
def pages(spark, tmp_path):
    t = str(tmp_path / "pages")
    replay(spark, t, generate_change_events(spark, 3000, seed=5),
           n_batches=1, n_buckets=8)
    return LakeTable(spark, t)


def test_update_delete_insert_clauses(spark, pages):
    before = {r["url"]: r for r in pages.read().collect()}
    urls = sorted(before)
    upd, dele, ins = urls[0], urls[1], "https://new.example.org/fresh"
    src = spark.createDataFrame(
        [(upd, "UPDATED", 0), (dele, "x", 1), (ins, "INSERTED", 0)],
        "url string, text string, kill int")

    r = merge_into(
        pages, src,
        when_matched_update={"text": F.col("s.text")},
        when_matched_delete=F.col("s.kill") == 1,
        when_not_matched_insert={"url": F.col("s.url"),
                                 "text": F.col("s.text")},
        event_time=TS(),
    )
    assert (r.inserted, r.updated, r.deleted) == (1, 1, 1)

    after = {x["url"]: x for x in pages.read().collect()}
    assert after[upd]["text"] == "UPDATED"
    assert after[upd]["html"] == before[upd]["html"]  # unnamed cols kept
    assert dele not in after                          # tombstoned
    assert after[ins]["text"] == "INSERTED"
    assert after[ins]["html"] is None                 # null-filled
    # untouched keys carried verbatim
    assert len(after) == len(before)  # -1 delete +1 insert
    other = urls[2]
    assert after[other] == before[other]


def test_conditions_and_all_update(spark, pages):
    rows = pages.read().limit(3).collect()
    src = spark.createDataFrame(
        [(r["url"], f"t{i}", r["html"], r["warc_ts"],
          datetime.datetime(2026, 1, 1)) for i, r in enumerate(rows)],
        "url string, text string, html binary, warc_ts timestamp, extra_ts timestamp")
    r = merge_into(
        pages, src.drop("extra_ts"),
        when_matched_update="all",
        matched_condition=F.col("s.text") != "t1",   # skip the middle row
        when_not_matched_insert=None,
        event_time=TS(),
    )
    assert r.updated == 2 and r.inserted == 0 and r.deleted == 0
    after = {x["url"]: x for x in pages.read().collect()}
    assert after[rows[0]["url"]]["text"] == "t0"
    assert after[rows[1]["url"]]["text"] != "t1"     # condition skipped it
    assert after[rows[2]["url"]]["text"] == "t2"


def test_tombstone_counts_as_not_matched(spark, pages):
    victim = sorted(r["url"] for r in pages.read().collect())[0]
    src1 = spark.createDataFrame([(victim,)], "url string")
    merge_into(pages, src1, when_matched_delete=True,
               when_not_matched_insert=None, event_time=TS())
    assert victim not in {r["url"] for r in pages.read().collect()}

    # revive via insert clause (tombstoned key == NOT MATCHED)
    src2 = spark.createDataFrame([(victim, "BACK")], "url string, text string")
    r = merge_into(
        pages, src2,
        when_not_matched_insert={"url": F.col("s.url"),
                                 "text": F.col("s.text")},
        event_time=F.lit("2026-01-02 00:00:00").cast("timestamp"),
    )
    assert r.inserted == 1
    got = pages.read().filter(F.col("url") == victim).collect()
    assert len(got) == 1 and got[0]["text"] == "BACK"


def test_exactly_once_ledger(spark, pages):
    url = pages.read().limit(1).collect()[0]["url"]
    src = spark.createDataFrame([(url, "once")], "url string, text string")
    r1 = merge_into(pages, src, when_matched_update={"text": F.col("s.text")},
                    when_not_matched_insert=None, batch_id="mi:1",
                    event_time=TS())
    r2 = merge_into(pages, src, when_matched_update={"text": F.col("s.text")},
                    when_not_matched_insert=None, batch_id="mi:1",
                    event_time=TS())
    assert not r1.noop and r2.noop
    assert pages.current_version() == r1.version


def test_unknown_clause_column_rejected(spark, pages):
    src = spark.createDataFrame([("u", "t")], "url string, text string")
    with pytest.raises(ValueError, match="not in the table schema"):
        merge_into(pages, src,
                   when_matched_update={"nope": F.col("s.text")},
                   when_not_matched_insert=None)
    with pytest.raises(ValueError, match="must be a dict"):
        merge_into(pages, src, when_matched_update="everything",
                   when_not_matched_insert=None)


def test_not_matched_by_source_clauses(spark, pages):
    """Delta sync-form: WHEN NOT MATCHED BY SOURCE DELETE/UPDATE apply
    to visible target rows absent from the source — delete first (SQL
    clause order), update gated by its condition; tombstones stay
    untouched; matched rows still follow the matched clauses."""
    before = {r["url"]: r for r in pages.read().collect()}
    urls = sorted(before)
    keep, gone = urls[0], urls[1]
    src = spark.createDataFrame([(keep, "KEPT")], "url string, text string")

    r = merge_into(
        pages, src,
        when_matched_update={"text": F.col("s.text")},
        when_not_matched_insert=None,
        # delete rows sharing gone's domain; mark the rest stale
        when_not_matched_by_source_delete=F.col("t.url") == gone,
        when_not_matched_by_source_update={
            "text": F.concat(F.lit("stale:"), F.col("t.text"))},
        event_time=TS(),
    )
    after = {x["url"]: x for x in pages.read().collect()}
    assert after[keep]["text"] == "KEPT"
    assert gone not in after                      # BY SOURCE DELETE
    assert r.deleted == 1
    assert r.updated == 1 + (len(before) - 2)     # matched + stale marks
    for u in urls[2:]:
        assert after[u]["text"] == "stale:" + (before[u]["text"] or "")
        assert after[u]["html"] == before[u]["html"]  # unnamed cols kept
    assert len(after) == len(before) - 1

    # delete-only sync with empty source: an empty batch must still
    # evaluate BY SOURCE (everything unconditional-deletes)
    empty = spark.createDataFrame([], "url string, text string")
    r2 = merge_into(
        pages, empty,
        when_not_matched_insert=None,
        when_not_matched_by_source_delete=True,
        event_time=TS(),
    )
    assert r2.deleted == len(after)
    assert pages.read().count() == 0


def test_by_source_update_requires_dict(spark, pages):
    with pytest.raises(ValueError, match="by_source_update"):
        merge_into(pages, spark.createDataFrame([("u",)], "url string"),
                   when_not_matched_by_source_update="all")
