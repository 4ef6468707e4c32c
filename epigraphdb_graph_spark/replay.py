"""Batch replay orchestration: change log → extract → LWW dedup → MERGE.

This is the engine's equivalent of the reference's full build entry point
(``snakemake -r all`` — workflow/Snakefile:34-266): instead of
re-processing every dataset and drop-rebuilding the store, it tails a
change log in ordered batches and applies each with an idempotent MERGE.

Key state invariant (what makes the oracle simple and batching-agnostic):
after replaying any prefix of the log in any batch split, each key's row
is the row-image of its max-(warc_ts, event_seq) event seen so far —
deleted keys are read-invisible tombstones. So the final table state is a
pure function of the event *set*, not the batch boundaries; the
replay-equality tests exploit this.

Resumability: each batch commit records its batch_id in the table
manifest; re-running a killed replay skips already-committed batches
(exactly-once at the batch level) and re-applied individual events are
stale no-ops (exactly-once at the row level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.extract import extract_text_udf
from .operators.lww import lww_dedup_agg
from .plans.lake import LakeTable, MergeResult
from .schema import PAGES_SCHEMA


def prepare_batch(events: DataFrame, *, dedup: bool = True) -> DataFrame:
    """Prepare a raw change-event batch: optional per-key LWW dedup, then
    html→text extraction.

    ``dedup=True`` (COW requirement: the MERGE join picks exactly one
    source row per key) also means extraction only runs on surviving rows.
    ``dedup=False`` is the MOR fast path: delta resolution happens at
    read/compact anyway, so the in-batch dedup shuffle (full row images!)
    is pure overhead — skipping it halves merge-time shuffle volume at the
    cost of extracting superseded events too (bounded by batch size)."""
    if dedup:
        events = lww_dedup_agg(events, key="url", ts_col="warc_ts", seq_col="event_seq")
    return events.withColumn("text", extract_text_udf(F.col("html")))


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    *,
    batch_id: str | None = None,
    watermark_seq: int | None = None,
    mode: str = "cow",
    dead_letter_dir: str | None = None,
) -> MergeResult:
    """Apply one change batch. With ``dead_letter_dir``, malformed events
    are quarantined there (parquet, with a _reason column) instead of
    poisoning the merge, and the per-reason counts land in the commit's
    lineage metrics — the accounted version of the reference's
    --skip-bad-relationships + import-report check (SURVEY J8/K2)."""
    extra = None
    if dead_letter_dir is not None:
        from .operators.quarantine import quarantine

        events, counts = quarantine(events, dead_letter_dir)
        extra = {"quarantined": counts}
    return table.merge(
        prepare_batch(events, dedup=(mode == "cow")),
        batch_id=batch_id, watermark_seq=watermark_seq,
        mode=mode, extra_metrics=extra,
    )


def replay(
    spark: SparkSession,
    table_path: str,
    events: DataFrame,
    *,
    n_batches: int = 1,
    n_buckets: int = 32,
    schema=None,
    mode: str = "cow",
    compact_every: int | None = None,
    dead_letter_dir: str | None = None,
) -> list[MergeResult]:
    """Replay a change log into a (possibly new) pages table in
    ``n_batches`` ordered micro-batches split on event_seq ranges —
    the batch-mode emulation of tailing a binlog. Resumable: committed
    batch ids are skipped.

    ``mode="mor"`` appends delta commits (O(batch) each) instead of COW
    rewrites; ``compact_every=k`` folds deltas into the base every k
    batches (the production cadence that bounds read amplification)."""
    if LakeTable.exists(table_path):
        table = LakeTable(spark, table_path)
    else:
        base = schema
        if base is None:
            base = PAGES_SCHEMA
            if "lang" not in events.columns:
                base = type(base)([f for f in base.fields if f.name != "lang"])
        table = LakeTable.create(spark, table_path, base, key="url", n_buckets=n_buckets)

    bounds = events.agg(
        F.min("event_seq").alias("lo"), F.max("event_seq").alias("hi")
    ).first()
    if bounds["lo"] is None:
        return []
    lo, hi = bounds["lo"], bounds["hi"]
    span = hi - lo + 1
    step = max(1, (span + n_batches - 1) // n_batches)

    results = []
    for b in range(n_batches):
        start, end = lo + b * step, min(lo + (b + 1) * step, hi + 1)
        if start >= end:
            break
        chunk = events.filter((F.col("event_seq") >= start) & (F.col("event_seq") < end))
        results.append(
            apply_batch(
                table,
                chunk,
                # "ns:seq" structured id -> O(1) ledger entry (per-namespace
                # high watermark); batches apply in ascending start order
                batch_id=f"replay:{start:012d}",
                watermark_seq=end - 1,
                mode=mode,
                dead_letter_dir=dead_letter_dir,
            )
        )
        if compact_every and (b + 1) % compact_every == 0 and not results[-1].noop:
            table.compact()
    return results
