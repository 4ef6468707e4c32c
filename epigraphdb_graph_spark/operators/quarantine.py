"""Malformed-event quarantine (dead-letter) — skip-bad-rows, accounted.

Reference parity: ``neo4j-admin import --skip-bad-relationships`` silently
drops relationship rows with dangling endpoints and the build then counts
the skips from the import report (graph_build/create_master_import.py:74-77,
graph_build/import-report-check.py:15-36); CSV scans use
``error_bad_lines=False`` (nodes/drug/cpic.py:29). The engine inverts the
"silently" part: invalid change events are split out BEFORE the merge,
written to a dead-letter parquet sink with a reason column, and counted —
nothing is dropped invisibly.

Validity rules for a change event (schema.CHANGE_EVENT_SCHEMA):
  - url non-null and non-empty, parseable as http(s)://host/...
  - event_seq non-null
  - warc_ts non-null
  - op in (insert, update, delete)
  - html may be null only for deletes
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import OPS

_URL_RE = r"^https?://[^/\s]+/.*"


def invalid_reason() -> F.Column:
    """NULL for valid rows, else the first failed rule's tag."""
    return (
        F.when(F.col("url").isNull() | (F.col("url") == ""), "null_url")
        .when(~F.col("url").rlike(_URL_RE), "malformed_url")
        .when(F.col("event_seq").isNull(), "null_seq")
        .when(F.col("warc_ts").isNull(), "null_ts")
        .when(~F.col("op").isin(*OPS), "bad_op")
        .when(F.col("html").isNull() & (F.col("op") != "delete"), "null_html")
    )


@dataclass
class SplitResult:
    valid: DataFrame
    dead: DataFrame  # original columns + _reason


def split_valid(events: DataFrame) -> SplitResult:
    """Tag and split one pass: the reason column is computed once; both
    branches are filters over the same lineage, so with the batch cached
    (or parquet-backed) this costs one scan each, no shuffle."""
    tagged = events.withColumn("_reason", invalid_reason())
    return SplitResult(
        valid=tagged.filter(F.col("_reason").isNull()).drop("_reason"),
        dead=tagged.filter(F.col("_reason").isNotNull()),
    )


def quarantine(
    events: DataFrame,
    dead_letter_dir: str | None = None,
    batch_tag: str | None = None,
) -> tuple[DataFrame, dict]:
    """Split, persist the dead letters if a sink dir is given, and return
    (valid_df, counts_by_reason). The counts dict goes into the commit's
    lineage metrics (import-report-check parity — queryable instead of a
    text report).

    Each call writes its dead letters under its OWN hive-style
    subdirectory ``batch=<tag>`` rather than appending to the root:
    concurrent Spark append jobs to one output path share the
    FileOutputCommitter's ``_temporary/0`` staging dir, and the first
    job's cleanup deletes the other's in-flight task output — the
    pipelined replay (replay.pipeline_depth > 1) quarantines batches
    concurrently, so per-batch paths are required for correctness, and
    they double as per-batch lineage: ``spark.read.parquet(dir)``
    partition-discovers the subdirs and exposes a ``batch`` column."""
    split = split_valid(events)
    counts_rows = split.dead.groupBy("_reason").count().collect()
    counts = {r["_reason"]: r["count"] for r in counts_rows}
    if dead_letter_dir is not None and counts:
        from urllib.parse import quote
        from uuid import uuid4

        tag = batch_tag if batch_tag is not None else uuid4().hex
        sub = f"{dead_letter_dir.rstrip('/')}/batch={quote(tag, safe='')}"
        split.dead.write.mode("append").parquet(sub)
    return split.valid, counts
