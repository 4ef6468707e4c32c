"""CLI surface smoke tests (subprocess — the spark-submit-shaped entry)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str], timeout: int = 420) -> str:
    env = {**os.environ, "PYTHONPATH": ROOT}
    out = subprocess.run(
        [sys.executable, "-m", "epigraphdb_graph_spark.cli", *args],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def _last_json(stdout: str) -> dict:
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


@pytest.mark.slow
def test_cli_replay_show_compact_roundtrip(tmp_path):
    table = str(tmp_path / "pages")
    r = _last_json(_run([
        "replay", "--table", table, "--events", "5000", "--batches", "2",
        "--mode", "mor", "--buckets", "8", "--master", "local[4]",
    ]))
    assert r["events"] == 5000 and r["final_rows"] > 0
    assert len(r["batches"]) == 2 and r["events_per_sec"] > 0

    s = _last_json(_run(["show", "--table", table, "--master", "local[4]"]))
    assert s["rows"] == r["final_rows"]
    assert s["pending_delta_files"] > 0
    assert s["applied_batches"] == 2

    c = _last_json(_run(["compact", "--table", table, "--master", "local[4]"]))
    assert c["rows"] == r["final_rows"]
    s2 = _last_json(_run(["show", "--table", table, "--master", "local[4]"]))
    assert s2["pending_delta_files"] == 0


@pytest.mark.slow
def test_cli_replay_resume(tmp_path):
    table = str(tmp_path / "pages")
    args = ["replay", "--table", table, "--events", "4000", "--batches", "2",
            "--master", "local[4]"]
    r1 = _last_json(_run(args))
    r2 = _last_json(_run(args))  # identical rerun -> all batches noop
    assert all(b["noop"] for b in r2["batches"])
    assert r2["final_rows"] == r1["final_rows"]


@pytest.mark.slow
def test_cli_genlog_replay_expire_roundtrip(tmp_path):
    """gen-log -> replay --log-dir -> expire: the production-shaped flow
    (tail an existing log, then bound metadata)."""
    log = str(tmp_path / "log")
    table = str(tmp_path / "pages")
    g = _last_json(_run(["gen-log", "--out", log, "--events", "3000",
                         "--partitions", "8", "--master", "local[4]"]))
    assert g["events"] == 3000
    r = _last_json(_run(["replay", "--table", table, "--log-dir", log,
                         "--batches", "3", "--mode", "mor",
                         "--buckets", "4", "--master", "local[4]"]))
    assert r["events"] == 3000 and r["final_rows"] > 0
    _run(["compact", "--table", table, "--master", "local[4]"])
    e = _last_json(_run(["expire", "--table", table, "--keep-last", "2",
                         "--master", "local[4]"]))
    assert e["expired_manifests"] >= 1
    s = _last_json(_run(["show", "--table", table, "--master", "local[4]"]))
    assert s["rows"] == r["final_rows"]


@pytest.mark.slow
def test_cli_lookup_pruned_point_read(tmp_path):
    table = str(tmp_path / "pages")
    _run(["replay", "--table", table, "--events", "4000", "--batches", "2",
          "--mode", "mor", "--buckets", "8", "--master", "local[4]"])
    # discover a real key via show+read is overkill; the generator's url
    # shape is deterministic, so probe a handful and require >=1 hit
    probes = [f"https://d{d}.example.org/p/{p}.html"
              for d in range(3) for p in range(3)]
    out = _last_json(_run(["lookup", "--table", table, "--master", "local[4]"]
                          + sum((["--key", k] for k in probes), [])))
    assert out["files_total"] > 0
    # bucket pruning must cut the scan set (9 keys over 8 buckets can at
    # most touch 8 buckets; with bounds it is typically far fewer files)
    assert out["files_scanned"] <= out["files_total"]
    assert out["found"] == len(out["rows"])
    # d0 is the Zipf head: its low-numbered pages are all but certain to
    # exist (and survive LWW) in a 4000-event log
    assert out["found"] >= 1


@pytest.mark.slow
def test_cli_profile_writes_versioned_report(tmp_path):
    """K6 report artifact: `cli profile` persists the per-column stats
    frame as versioned parquet + a JSON report carrying lineage metrics
    (reference's per-dataset pandas-profiling sink,
    utils/pandas-profiling.sh:7-17, utils/writers.py:276-284)."""
    table = str(tmp_path / "pages")
    _run(["replay", "--table", table, "--events", "3000", "--batches", "1",
          "--mode", "mor", "--master", "local[4]"])
    p = _last_json(_run(["profile", "--table", table, "--master", "local[4]"]))
    assert p["columns"] > 0 and p["version"] >= 1
    assert os.path.isdir(p["parquet"])
    with open(p["report"]) as f:
        rep = json.load(f)
    assert rep["version"] == p["version"]
    assert rep["n_rows"] > 0
    cols = {c["column"]: c for c in rep["columns"]}
    assert "url" in cols and cols["url"]["n_null"] == 0
    assert rep["applied_batches"] == 1
    # report is versioned: a second run after another commit makes a new one
    _run(["compact", "--table", table, "--master", "local[4]"])
    p2 = _last_json(_run(["profile", "--table", table, "--master", "local[4]"]))
    assert p2["version"] > p["version"]
    assert os.path.exists(p["report"]) and os.path.exists(p2["report"])
