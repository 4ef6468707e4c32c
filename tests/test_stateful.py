"""Stateful streaming operator: per-domain stats via applyInPandasWithState
(state persists across micro-batches and survives a checkpoint restart)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from epigraphdb_graph_spark.sources.events import generate_change_events
from epigraphdb_graph_spark.streaming.stateful import run_domain_stats


def _latest_per_domain(spark, sink_dir) -> pd.DataFrame:
    df = spark.read.parquet(sink_dir)
    # latest update wave per domain = max batches_seen
    w = df.groupBy("domain").agg(F.max("batches_seen").alias("b"))
    return (
        df.join(w, ["domain"]).filter(F.col("batches_seen") == F.col("b"))
        .drop("b").toPandas().set_index("domain")
    )


def test_domain_stats_accumulate_and_resume(spark, tmp_path):
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    ev = generate_change_events(spark, 2000, seed=13, n_domains=10,
                                pages_per_domain=4).cache()
    first = ev.filter(F.col("event_seq") < 1000)
    rest = ev.filter(F.col("event_seq") >= 1000)

    first.repartition(2).write.mode("overwrite").parquet(log)
    q = run_domain_stats(spark, log, ckpt, sink)
    q.awaitTermination(120)

    got1 = _latest_per_domain(spark, sink)
    pdf1 = first.withColumn(
        "domain", F.regexp_extract("url", r"https?://([^/]+)/", 1)).toPandas()
    want1 = pdf1.groupby("domain").agg(
        n_events=("event_seq", "size"),
        n_deletes=("op", lambda s: (s == "delete").sum()),
        last_seq=("event_seq", "max"))
    for d, row in want1.iterrows():
        assert got1.loc[d, "n_events"] == row["n_events"]
        assert got1.loc[d, "n_deletes"] == row["n_deletes"]
        assert got1.loc[d, "last_seq"] == row["last_seq"]

    # append more events, resume from the same checkpoint: state carries
    # over (counts are cumulative, not restarted)
    rest.repartition(2).write.mode("append").parquet(log)
    q2 = run_domain_stats(spark, log, ckpt, sink)
    q2.awaitTermination(120)

    got2 = _latest_per_domain(spark, sink)
    pdf_all = ev.withColumn(
        "domain", F.regexp_extract("url", r"https?://([^/]+)/", 1)).toPandas()
    want2 = pdf_all.groupby("domain").agg(
        n_events=("event_seq", "size"),
        n_deletes=("op", lambda s: (s == "delete").sum()),
        last_seq=("event_seq", "max"))
    for d, row in want2.iterrows():
        assert got2.loc[d, "n_events"] == row["n_events"], d
        assert got2.loc[d, "last_seq"] == row["last_seq"], d
    assert (got2["batches_seen"] > got1["batches_seen"].reindex(got2.index).fillna(0)).all()
