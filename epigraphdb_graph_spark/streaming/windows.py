"""Streaming event-time window aggregations over the change log.

The streaming-native side of SURVEY St5 (batch tumbling metrics are
oracle-checked as q25): a ``readStream`` file source over the change-log
directory, event-time windows on ``warc_ts`` with a real watermark, so
state for closed windows is dropped and append-mode sinks emit each
window exactly once when the watermark passes its end — the standard
Structured Streaming late-data story (late events within the horizon
still count; later ones are dropped FROM THE AGGREGATE, never from the
table, whose correctness is per-row LWW and needs no watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import CHANGE_EVENT_SCHEMA


def windowed_event_counts(
    spark: SparkSession,
    log_dir: str,
    *,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-window event counts (tumbling, or sliding with
    ``slide``), grouped by op. Append-output-compatible: aggregation is
    keyed on the event-time window under a watermark, so each window
    finalizes once. Attach a sink with ``.writeStream`` (tests drain via
    availableNow into a memory sink)."""
    reader = spark.readStream.schema(schema or CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(log_dir)
    win = (F.window("warc_ts", window, slide) if slide
           else F.window("warc_ts", window))
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(win.alias("w"), "op")
        .agg(F.count("*").alias("n_events"),
             F.approx_count_distinct("url").alias("approx_urls"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "op", "n_events", "approx_urls")
    )
