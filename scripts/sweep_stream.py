#!/usr/bin/env python
"""Streaming-tailer micro-batch sweep (round-4 verdict ask #5): wall vs
maxFilesPerTrigger (micro-batch size) x compaction placement (inline
after drain vs BackgroundCompactor overlapped with the drain), at the
driver bench's prod shape (500k events, local[32], MOR). Appends nothing;
prints one JSON line per variant — results are transcribed into
BENCH/BASELINE.md and the winning shape becomes bench.py's default.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import bench_stream  # noqa: E402


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from epigraphdb_graph_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sweep-stream", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: full-shape dress rehearsal (codegen + python workers + the
    # streaming machinery itself)
    bench_stream(spark, 20_000, micro_batches=2, files_per_trigger=4)

    variants = [
        # (micro_batches, files_per_trigger, async_compact_threshold)
        (8, 4, None),   # round-4 bench shape
        (8, 4, 64),     # + background compactor
        (4, 8, None),   # bigger micro-batches
        (4, 8, 64),
        (2, 16, None),  # near-batch-sized micro-batches
        (2, 16, 64),
    ]
    for mb, fpt, ac in variants:
        best = None
        for _ in range(repeats):
            wall, n = bench_stream(spark, n_events, micro_batches=mb,
                                   files_per_trigger=fpt, async_compact=ac)
            best = wall if best is None else min(best, wall)
        print(json.dumps({
            "micro_batches": mb, "files_per_trigger": fpt,
            "async_compact": ac, "wall_s": round(best, 3),
            "events_per_sec": round(n_events / best, 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
