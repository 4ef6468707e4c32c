"""Custom stateful streaming operator: per-domain crawl statistics.

SURVEY.md §2.11: the reference has no streaming operators; the engine adds
them. This module shows the engine's pattern for operators Spark lacks as
built-ins — ``applyInPandasWithState`` keeping a small per-key state dict
across micro-batches (GroupState), emitting an updated summary row per
domain per batch:

    domain, n_events, n_deletes, last_seq, last_ts, batches_seen

Used operationally as a cheap online "crawl health" rollup (sudden
delete-ratio spikes, stalled domains) without touching the lake table.
State is bounded: O(#domains) rows of fixed width — the watermark-free
design is safe because state never grows with events, only with keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events LONG, n_deletes LONG, last_seq LONG, batches_seen LONG"
OUTPUT_SCHEMA = (
    "domain STRING, n_events LONG, n_deletes LONG, last_seq LONG, "
    "batches_seen LONG"
)


def _update_domain_stats(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (domain,) = key
    if state.exists:
        n_events, n_deletes, last_seq, batches_seen = state.get
    else:
        n_events = n_deletes = batches_seen = 0
        last_seq = -1
    for pdf in pdfs:
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "delete").sum())
        if len(pdf):
            last_seq = max(last_seq, int(pdf["event_seq"].max()))
    batches_seen += 1
    state.update((n_events, n_deletes, last_seq, batches_seen))
    yield pd.DataFrame([{
        "domain": domain,
        "n_events": n_events,
        "n_deletes": n_deletes,
        "last_seq": last_seq,
        "batches_seen": batches_seen,
    }])


def domain_stats_stream(events: DataFrame) -> DataFrame:
    """events (streaming df, CHANGE_EVENT_SCHEMA) -> stateful per-domain
    stats stream. Output mode must be 'update'."""
    with_domain = events.withColumn(
        "domain", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )
    return (
        with_domain.groupBy("domain")
        .applyInPandasWithState(
            _update_domain_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_domain_stats(
    spark,
    log_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    *,
    schema=None,
    available_now: bool = True,
):
    """Wire the stateful operator over a parquet change-log dir, appending
    each update wave to a parquet sink. Returns the StreamingQuery."""
    from ..schema import CHANGE_EVENT_SCHEMA

    events = spark.readStream.schema(schema or CHANGE_EVENT_SCHEMA).parquet(log_dir)
    stats = domain_stats_stream(events)
    writer = (
        stats.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(sink_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
