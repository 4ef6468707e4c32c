#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the flagship CDC replay plus a headline subset of the operator
queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the end-to-end CDC replay wall time (generate ->
LWW dedup -> extract -> bucket-pruned MERGE commits), from which
``events_per_sec`` (the BASELINE.json metric) is derived and reported as
an extra key. Event count scales with sf: 5M * sf (500k at sf0.1).

Scaling-efficiency evidence (north_rule two-cluster-size criterion) is
produced by ``scripts/bench_scaling.py`` which runs this same replay at
two parallelism levels; results are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline queries benched per round (subset of __spark_entry__.queries():
# relational core, LWW state, dedup family, text analytics, ANN)
HEADLINE = [
    "q01_pricing_summary",
    "q03_join_broadcast",
    "q06_anti_join_audit",
    "q07_top1_per_group",
    "q09_distinct_count",
    "q16_full_outer_consolidate",
    "q22_cdc_lww_state",
    "q26_multi_join_star",
    "q30_token_stats",
    "q31_exact_dedup",
    "q32_lang_id",
    "q34_minhash_bands",
    "q35_ngram_jaccard",
    "q36_ann_cosine_topk",
    "q40_extraction_udf",
    "q41_simhash",
    # round-3 operators
    "q58_ivf_ann_topk",
    "q60_session_windows",
    "q61_asof_join",
    "q62_range_join_bins",
]

EVENTS_PER_SF = 5_000_000  # 500k change events at sf0.1


def bench_replay(spark, n_events: int, n_batches: int = 4, n_buckets: int = 32,
                 mode: str = "mor", compact_every: int | None = None,
                 body_repeat: int = 1, repeats: int = 1,
                 pipeline_depth: int = 1):
    """Time the full CDC replay path; returns (wall_s, n_events, applied_rows).

    Default mode is merge-on-read with no mid-replay compaction: each commit
    is O(batch); the final state count at the end exercises the resolving
    read. COW mode is benched separately for the comparison table.

    ``repeats`` reports the BEST of N complete runs (fresh lake each time):
    this VM shows 1.5-2x same-job wall swings from hypervisor steal
    (BENCH/BASELINE.md), so a single sample conflates host weather with
    engine changes; min-of-N is the standard estimator for the engine's
    actual cost on a machine with external interference."""
    from epigraphdb_graph_spark.replay import replay
    from epigraphdb_graph_spark.plans.lake import LakeTable
    from epigraphdb_graph_spark.sources.events import generate_change_events

    best = None
    final_rows = 0
    for _ in range(repeats):
        lake_dir = tempfile.mkdtemp(prefix="bench_lake_")
        try:
            # batches x cores partitions: each contiguous event_seq batch
            # slice must span all cores (see cli.py note)
            events = generate_change_events(
                spark, n_events, seed=42, n_domains=200, pages_per_domain=256,
                body_repeat=body_repeat,
                num_partitions=n_batches * spark.sparkContext.defaultParallelism,
            )
            t0 = time.perf_counter()
            replay(spark, os.path.join(lake_dir, "pages"), events,
                   n_batches=n_batches, n_buckets=n_buckets, mode=mode,
                   compact_every=compact_every, pipeline_depth=pipeline_depth)
            table = LakeTable(spark, os.path.join(lake_dir, "pages"))
            if mode == "mor":
                table.compact()  # end-to-end: fold deltas into a clean base
            wall = time.perf_counter() - t0
            final_rows = table.read().count()
            best = wall if best is None else min(best, wall)
        finally:
            shutil.rmtree(lake_dir, ignore_errors=True)
    return best, n_events, final_rows


def bench_stream(spark, n_events: int, n_buckets: int = 32,
                 micro_batches: int = 8, files_per_trigger: int = 4,
                 async_compact: int | None = None):
    """Time the Structured Streaming tailer path (the north-rule surface):
    parquet change-log -> file-stream source -> foreachBatch MERGE into the
    lake, drained with availableNow over ``micro_batches`` micro-batches,
    then compaction. Returns (wall_s, n_events).

    ``async_compact=k`` runs a BackgroundCompactor (threshold k delta
    files) overlapped with the drain — compaction leaves the micro-batch
    critical path and by drain end is mostly done; None = one inline
    compaction after the drain (the round-4 shape). Micro-batch count =
    ``micro_batches`` at ``files_per_trigger`` files each (the log is
    written as micro_batches x files_per_trigger files); the
    files_per_trigger sweep for this host is recorded in
    BENCH/BASELINE.md.

    Also exercises checkpoint resume (untimed): restarting the same
    checkpoint consumes nothing and commits nothing."""
    from epigraphdb_graph_spark.plans.lake import LakeTable
    from epigraphdb_graph_spark.sources.events import generate_change_events
    from epigraphdb_graph_spark.streaming.compactor import BackgroundCompactor
    from epigraphdb_graph_spark.streaming.tailer import tail_change_log

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        log_dir = os.path.join(work, "log")
        table_path = os.path.join(work, "pages")
        ckpt = os.path.join(work, "ckpt")
        n_files = micro_batches * files_per_trigger
        generate_change_events(
            spark, n_events, seed=42, n_domains=200, pages_per_domain=256,
            num_partitions=n_files,
        ).write.parquet(log_dir)  # log materialization is not the tailer

        t0 = time.perf_counter()
        comp = (BackgroundCompactor(spark, table_path,
                                    max_delta_files=async_compact)
                if async_compact is not None else None)
        try:
            q = tail_change_log(spark, log_dir, table_path, ckpt,
                                n_buckets=n_buckets, mode="mor",
                                max_files_per_trigger=files_per_trigger,
                                available_now=True, compactor=comp)
            q.awaitTermination()
        finally:
            if comp is not None:
                comp.close()
        table = LakeTable(spark, table_path)
        table.compact()  # fold whatever remains (end-to-end clean state)
        wall = time.perf_counter() - t0

        # resume probe: same checkpoint, nothing new -> no new commits
        v = table.current_version()
        q2 = tail_change_log(spark, log_dir, table_path, ckpt,
                             n_buckets=n_buckets, mode="mor",
                             max_files_per_trigger=files_per_trigger,
                             available_now=True)
        q2.awaitTermination()
        assert table.current_version() == v, "checkpoint resume re-applied data"
        return wall, n_events
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from epigraphdb_graph_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{cpus}]")
    # ERROR-only logging for the bench: the streaming phase's Observation
    # accumulators can emit a benign WARN-with-stack from
    # DAGScheduler.updateAccumulators when a speculative/late task update
    # lands after its stage completed (accumulator already garbage-
    # collected); it is log noise, not a failure — keep the headline
    # bench log free of JVM stacks
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entrymod.queries()
    # session warmup (scheduler, codegen, file listing) so the first timed
    # query doesn't absorb JVM ramp
    qmap[HEADLINE[0]](spark, sf_dir).count()
    timings: dict[str, float] = {}
    # best-of-2 per query, matching bench_replay's repeats=2 estimator:
    # a query's FIRST execution in a session carries per-plan codegen +
    # broadcast-thread + scan-listing ramp (measured 2-2.5x on q03/q06 —
    # the r1->r3 "drift" was exactly this single-sample noise, see
    # BENCH/BASELINE.md), and the host adds hypervisor-steal spikes;
    # min-of-2 reports the engine's steady cost
    for name in HEADLINE:
        fn = qmap[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            assert n >= 0
        timings[name] = round(best, 3)

    # fresh executor state for the replay phase: the 16-query phase leaves
    # JVM residue (cached relations, codegen classes, python workers, GC
    # debt) that measured +40-60% on the replay keys when sharing the
    # session; a restart isolates the headline metric from it
    spark.stop()
    spark = get_spark("bench-replay", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")  # see note above

    n_events = max(int(EVENTS_PER_SF * sf), 10_000)
    bench_replay(spark, 10_000, n_batches=2)  # warmup (JIT/codegen/python workers)
    # MOR phases run pipeline_depth=2 — the production MOR config: batch
    # b+1's delta-write job overlaps batch b's commit bookkeeping, commits
    # stay ordered (state-identical to serial, tests/test_replay_pipeline).
    # Round-5 interleaved A/B at this exact shape: 500k 89.8k -> 107.0k
    # ev/s (+19%), 7KB 15.5k -> 19.2k (+24%); depth 3 adds nothing (the
    # overlap already hides the full serial term). COW keeps depth 1:
    # its rewrite reads the predecessor's committed state, so batches
    # are data-dependent and cannot overlap.
    replay_s, n_ev, final_rows = bench_replay(spark, n_events, mode="mor",
                                              repeats=2, pipeline_depth=2)
    cow_s, _, _ = bench_replay(spark, n_events, mode="cow", repeats=2)
    # CC-realistic page size (7KB bodies): fewer events so the bench stays
    # bounded; throughput is per-event
    heavy_n = max(n_events // 5, 10_000)
    heavy_s, heavy_ev, _ = bench_replay(spark, heavy_n, mode="mor",
                                        body_repeat=100, repeats=2,
                                        pipeline_depth=2)
    # streaming tailer path (binlog-tail surface of the north rule):
    # micro-batched file-stream drain + checkpoint-resume probe. Same
    # event volume as the batch replay, drained in 4 micro-batches of 8
    # files — the round-5 maxFilesPerTrigger sweep's winner among shapes
    # that still exercise a real multi-micro-batch drain (8x4: 52.5k,
    # 4x8: 100.3k, 2x16: 153.6k ev/s at 500k events; per-micro-batch
    # fixed cost ~0.9s is the whole difference — see the sweep table in
    # BENCH/BASELINE.md). Inline post-drain compaction: the overlapped
    # BackgroundCompactor is measurably neutral-to-negative at this
    # scale where compaction is ~1s (its value is cluster-scale
    # compaction walls); it stays correctness-tested in
    # tests/test_concurrency.py.
    # best-of-2, the same estimator every other phase of this bench uses
    # (cold runs 10 min apart measured 6.85s vs 8.70s for identical code —
    # host-weather spread, not engine state)
    stream_s, stream_ev = bench_stream(spark, n_events,
                                       micro_batches=4, files_per_trigger=8)
    s2, _ = bench_stream(spark, n_events, micro_batches=4,
                         files_per_trigger=8)
    stream_s = min(stream_s, s2)
    timings["cdc_replay"] = round(replay_s, 3)
    timings["cdc_replay_cow"] = round(cow_s, 3)
    timings["cdc_replay_7kb"] = round(heavy_s, 3)
    timings["cdc_stream"] = round(stream_s, 3)

    out = {
        "metric": "cdc_replay_wall",
        "value": round(replay_s, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "events": n_ev,
        "events_per_sec": round(n_ev / replay_s, 1),
        "events_per_sec_cow": round(n_ev / cow_s, 1),
        "events_per_sec_7kb": round(heavy_ev / heavy_s, 1),
        "events_per_sec_stream": round(stream_ev / stream_s, 1),
        "final_rows": final_rows,
        "parallelism": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
