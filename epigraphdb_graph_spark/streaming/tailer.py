"""Structured Streaming change-log tailer.

The reference pipeline's "incrementality" is Snakemake file-target
memoization plus a full drop-and-rebuild import (workflow/Snakefile:135-139,
156-163). This module replaces it with a real tailer: a Structured
Streaming file source over the change-log directory (the sandbox stand-in
for a binlog/Kafka topic — same micro-batch surface), applying each
micro-batch through the same ``prepare_batch -> LakeTable.merge`` path the
batch replayer uses.

Exactly-once story (north_rule), two independent layers:

1. **Source offsets**: the streaming checkpoint records which log files
   each micro-batch consumed; after a crash, Spark re-delivers the same
   batch with the same ``batch_id``.
2. **Idempotent sink**: ``LakeTable.merge`` records ``stream-{ns}:{seq}``
   in the table's bounded batch ledger (per-namespace high watermark — the
   manifest does not grow with replay length) — a re-delivered micro-batch
   is a committed no-op, and even a *manually* re-applied event is a
   per-row stale no-op via the ``(warc_ts, event_seq)`` guard (COW) /
   read-resolution tie-dedup (MOR).

Together: end-to-end exactly-once into the lake table, resumable by simply
restarting the query with the same checkpoint dir.

Late data: the MERGE semantics make watermarks unnecessary for correctness
(state lives in the table, not the stream — SURVEY.md §2.11); a late stale
event loses the per-row LWW comparison no matter which batch it arrives in.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lake import LakeTable
from ..replay import prepare_batch
from ..schema import CHANGE_EVENT_SCHEMA, PAGES_SCHEMA


#: exchange-width policy target: rows per post-exchange task. Below this
#: the per-task Arrow/python-worker setup of the dedup+extraction stage
#: outweighs the parallelism it buys (measured ~20-25% per-micro-batch
#: win narrowing 32 -> 8 at ~12k rows on local[32]).
_MIN_ROWS_PER_EXCHANGE_TASK = 2_000


def _pick_exchange_width(rows: int, n_buckets: int, parallelism: int) -> int | None:
    """Width for prepare_batch's fused exchange on a micro-batch of
    ``rows`` events: the largest power-of-two divisor of ``n_buckets``
    that keeps >= _MIN_ROWS_PER_EXCHANGE_TASK rows per task, floored at 4
    (below that the lost parallelism costs more than the setup saved).
    Returns None (full width) when the batch is big enough — large
    batches always exchange at n_buckets so partition == bucket exactly."""
    if rows <= 0:
        return None
    want = max(rows // _MIN_ROWS_PER_EXCHANGE_TASK, 4)
    if want >= min(n_buckets, parallelism):
        return None
    w = n_buckets
    while w > 4 and w % 2 == 0 and w // 2 >= want:
        w //= 2
    return w if w < n_buckets else None


def tail_change_log(
    spark: SparkSession,
    log_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    n_buckets: int = 32,
    schema=None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    mode: str = "cow",
    dead_letter_dir: str | None = None,
    auto_compact_delta_files: int | None = None,
    mor_dedup: bool | str = "auto",
    compactor=None,
):
    """Tail ``log_dir`` (parquet change-event files) into the lake table at
    ``table_path``. Returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the log and
    stops — the batch-ish mode tests and the sandbox use; pass False for a
    continuously running tailer (prod shape). ``max_files_per_trigger``
    bounds micro-batch size for steady incremental progress.

    Compaction cadence, two shapes: ``auto_compact_delta_files=k`` runs
    ``maybe_compact`` INLINE after each micro-batch (simple, but the next
    micro-batch waits out the rewrite); a ``compactor``
    (streaming.compactor.BackgroundCompactor) is only NOTIFIED here and
    folds deltas on its own thread, overlapped with subsequent
    micro-batches — safe by construction via the OCC rebase machinery,
    and the production shape (Hudi async compaction analog). Passing
    both uses the compactor.
    """
    if LakeTable.exists(table_path):
        table = LakeTable(spark, table_path)
    else:
        table = LakeTable.create(
            spark, table_path, schema or PAGES_SCHEMA, key="url", n_buckets=n_buckets
        )

    reader = spark.readStream.schema(schema_for_stream(schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(log_dir)

    # Spark micro-batch ids are unique only within one checkpoint; namespace
    # the sink's exactly-once ledger by checkpoint so (a) a restart from the
    # same checkpoint dedupes, while (b) a *fresh* checkpoint re-reading the
    # log is re-applied (and lands as per-row stale no-ops), never silently
    # skipped against a stale ledger entry.
    ns = hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]

    # previous micro-batch's observed (rows, distinct keys): CDC streams
    # are key-mix-stationary at micro-batch cadence, so last batch's
    # supersede ratio is the right prior for this batch's strategy pick —
    # and it makes the pick FREE (no stats job; the Observation below
    # fills it during the merge's own write job). A wrong pick costs only
    # a wasted (or skipped) dedup shuffle — state is identical either way.
    prev_stats: list[tuple[int, int] | None] = [None]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        # watermark = true log position (max seq in the RAW batch — LWW
        # dedup may drop the max-seq event) + next batch's policy stats,
        # all piggybacked on the merge write job via Observation: the
        # whole micro-batch is ONE Spark job in the aligned-agg shape
        raw_obs = Observation()
        events = batch_df.observe(
            raw_obs,
            F.max("event_seq").alias("wm"),
            F.count("*").alias("n"),
            F.approx_count_distinct("url").alias("k"),
        )
        extra = None
        cached = None
        if dead_letter_dir is not None:
            from ..operators.quarantine import quarantine

            # quarantine splits + counts in side jobs: cache the scanned
            # batch so those jobs and the merge share one source pass
            cached = events.persist()
            events, counts = quarantine(cached, dead_letter_dir,
                                        batch_tag=f"{ns}-{batch_id}")
            extra = {"quarantined": counts}
        par = batch_df.sparkSession.sparkContext.defaultParallelism
        m = table.manifest()
        if mode == "cow":
            from ..replay import choose_cow_dedup

            dedup: bool | str = choose_cow_dedup(
                n_buckets=m["n_buckets"], parallelism=par)
        elif mor_dedup == "auto":
            from ..replay import choose_mor_dedup

            if prev_stats[0] is not None:
                dedup = choose_mor_dedup(
                    events, stats=prev_stats[0],
                    n_buckets=m["n_buckets"], parallelism=par)
            else:
                # first batch: assume supersede-bearing (the normal CDC
                # shape) and pick by geometry alone
                from ..replay import choose_cow_dedup

                dedup = choose_cow_dedup(
                    n_buckets=m["n_buckets"], parallelism=par)
        else:
            # explicit override — e.g. "filter" for column-prunable sources
            # with KB-scale payloads (see replay.choose_mor_dedup docstring)
            dedup = mor_dedup
        aligned = m.get("bucket_hash") == "murmur3"

        def _wm_from_obs() -> int:
            got = raw_obs.get  # filled by the completed merge job
            prev_stats[0] = (int(got.get("n") or 0), int(got.get("k") or 0))
            wm = got.get("wm")
            return int(wm) if wm is not None else -1

        width = None
        if aligned and prev_stats[0] is not None:
            width = _pick_exchange_width(
                prev_stats[0][0], m["n_buckets"], par)
        table.merge(
            prepare_batch(events, dedup=dedup, key=m["key"],
                          bucket_into=m["n_buckets"] if aligned else None,
                          exchange_width=width),
            batch_id=f"stream-{ns}:{batch_id:012d}",
            watermark_seq=None,
            deferred_watermark=_wm_from_obs,
            mode=mode,
            extra_metrics=extra,
            src_aligned=aligned,
        )
        if compactor is not None:
            compactor.notify()  # non-blocking; folds on its own thread
        elif auto_compact_delta_files is not None:
            table.maybe_compact(max_delta_files=auto_compact_delta_files)
        if cached is not None:
            cached.unpersist()

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def schema_for_stream(table_schema=None):
    """Change-event schema for the stream source: CHANGE_EVENT_SCHEMA plus
    any extra payload columns the target table carries (e.g. ``lang`` after
    evolution). File streams need an explicit schema."""
    if table_schema is None:
        return CHANGE_EVENT_SCHEMA
    base_names = {f.name for f in CHANGE_EVENT_SCHEMA.fields}
    extra = [
        f for f in table_schema.fields
        if f.name not in base_names and f.name not in ("text",)
    ]
    return type(CHANGE_EVENT_SCHEMA)(list(CHANGE_EVENT_SCHEMA.fields) + extra)


def stream_metrics(table: LakeTable) -> DataFrame:
    """Per-commit lineage metrics as a DataFrame (the reference's
    import-report-check analog, graph_build/import-report-check.py:15-36 —
    skipped/applied accounting, queryable instead of a text report)."""
    rows = []
    for h in table.history():
        m = h.get("metrics", {})
        actions = m.get("actions", {})
        rows.append(
            {
                "version": h["version"],
                "op": m.get("op"),
                "batch_id": m.get("batch_id"),
                "watermark_seq": h.get("watermark_seq", -1),
                "inserted": actions.get("insert", 0) + actions.get("revive", 0),
                "updated": actions.get("update", 0),
                "deleted": actions.get("delete", 0) + actions.get("tombstone_new", 0),
                "stale_skipped": actions.get("stale", 0),
                "kept": actions.get("keep", 0),
                "late_events": m.get("late_events", 0),
            }
        )
    return table.spark.createDataFrame(
        rows,
        "version int, op string, batch_id string, watermark_seq long, "
        "inserted long, updated long, deleted long, stale_skipped long, "
        "kept long, late_events long",
    )
