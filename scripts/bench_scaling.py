#!/usr/bin/env python
"""Two-parallelism scaling-efficiency evidence (north_rule criterion).

No real cluster exists in this sandbox, so the N -> 4N executor scaling
criterion is evidenced the way the driver mandates: the IDENTICAL job
(deterministic synthetic change log, same seed/size/batching) run at
local[8] and local[32], throughput reported at both, efficiency =
(throughput@32 / throughput@8) / 4.

Each level runs in its own subprocess (fresh JVM) through the packaged
CLI surface (python -m epigraphdb_graph_spark.cli replay), so the numbers
include the real MERGE path end-to-end but exclude JVM startup (the CLI
times only the replay).

Writes/updates BENCH/BASELINE.md. Usage:
    python scripts/bench_scaling.py [n_events] [mode]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, n_events: int, mode: str, body_repeat: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"scale_{cores}_")
    try:
        cmd = [
            sys.executable, "-m", "epigraphdb_graph_spark.cli", "replay",
            "--table", os.path.join(tmp, "pages"),
            "--events", str(n_events),
            # key universe scales with events (CC-style crawl); page size is
            # CC-realistic (~KBs via --body-repeat) so the measured region is
            # compute/shuffle-bound — the scaling criterion grades the
            # engine, not task-launch latency on toy 200-byte rows
            "--domains", str(max(200, n_events // 2000)),
            "--body-repeat", str(body_repeat),
            "--batches", "4", "--buckets", "32",
            "--mode", mode, "--master", f"local[{cores}]", "--warmup",
        ]
        if mode == "mor":
            cmd += ["--compact-every", "4"]
        env = {**os.environ, "PYTHONPATH": ROOT}
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             cwd=ROOT, timeout=3600)
        if out.returncode != 0:
            raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "mor"
    body_repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    results = {}
    for cores in (8, 32):
        # fresh JVM per level; --warmup keeps JIT/worker startup out of the
        # timed region so the ratio reflects steady-state throughput
        r = run_level(cores, n_events, mode, body_repeat)
        results[cores] = r
        print(f"local[{cores}]: {r['wall_s']}s  {r['events_per_sec']} events/sec  "
              f"final_rows={r['final_rows']}")

    tp8 = results[8]["events_per_sec"]
    tp32 = results[32]["events_per_sec"]
    eff = (tp32 / tp8) / 4.0
    print(f"scaling efficiency (8 -> 32 cores, x4): {eff:.3f}")
    assert results[8]["final_rows"] == results[32]["final_rows"], "nondeterministic state!"

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE.md — measured scaling evidence\n\n"
                "north_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N\n"
                "executors. Sandbox evidence: identical deterministic replay job at two\n"
                "parallelism levels (local[8] vs local[32]), fresh JVM per level, timed\n"
                "region = replay only. efficiency = (events_per_sec@32 / events_per_sec@8) / 4.\n\n"
                "| run (UTC) | mode | events | ~page B | local[8] ev/s | local[32] ev/s | efficiency | final rows |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {mode} | {n_events} | {70 * body_repeat} | {tp8} | {tp32} | {eff:.3f} "
            f"| {results[32]['final_rows']} |\n"
        )
    print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
