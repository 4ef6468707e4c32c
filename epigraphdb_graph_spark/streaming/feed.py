"""Incremental change-feed relay: lake -> downstream, exactly-once.

The CDC-*out* counterpart of the tailer (which is CDC-*in*): downstream
consumers follow a LakeTable's committed snapshots and receive each
version range's net changes exactly once — the engine's replication /
backup story (reference K5, `utils/general.py:193-212` rsync'd CSV
copies + neo4j-admin backup) done incrementally instead of by full copy.

Two consumers are provided:

- ``sync_changes``: emit the pending change range as parquet files into a
  downstream log directory (one directory per version range, atomic
  rename — a crashed emit leaves only an invisible temp dir). The cursor
  (last shipped version) lives in a small JSON state file next to the
  output, so the relay is resumable and idempotent.
- ``replicate``: apply the pending changes directly into another
  LakeTable via the normal MERGE path (deletes become tombstones). Since
  changes() emits net per-key diffs with their original (_ts, _seq),
  the replica converges to the primary's exact visible state, and
  re-applying a shipped range is a per-row stale no-op — the same
  idempotence layering the ingest side uses.

Both are driver-side *poll* loops by design: a lake table's commit
stream is its version counter, so "tailing" it is reading an integer —
no Structured Streaming source machinery needed. Run them on a cadence
(cron / the tailer's foreachBatch hook) for continuous replication.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

from ..plans.lake import LakeTable


def _read_cursor(state_file: str) -> int:
    if os.path.exists(state_file):
        with open(state_file) as f:
            return json.load(f)["last_version"]
    return 0


def _write_cursor(state_file: str, version: int) -> None:
    tmp = f"{state_file}.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"last_version": version}, f)
    os.replace(tmp, state_file)  # atomic cursor advance


def sync_changes(table: LakeTable, out_dir: str, *,
                 state_file: str | None = None) -> dict:
    """Ship net changes since the last sync into ``out_dir`` as parquet.

    Emits to ``out_dir/changes-{from:08d}-{to:08d}/`` via write-then-
    rename: a consumer listing ``out_dir`` never sees a partial range,
    and a crash before the cursor write re-ships the same range under
    the same directory name (overwritten — idempotent)."""
    state_file = state_file or os.path.join(out_dir, "_cursor.json")
    os.makedirs(out_dir, exist_ok=True)
    last = _read_cursor(state_file)
    current = table.current_version()
    if current <= last:
        return {"shipped": 0, "shipped_files": 0,
                "from_version": last, "to_version": last}
    feed = table.changes(last, current)
    final = os.path.join(out_dir, f"changes-{last:08d}-{current:08d}")
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    feed.write.mode("overwrite").parquet(tmp)
    if os.path.exists(final):  # crashed previous emit of the same range
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)
    n = sum(1 for f in os.listdir(final) if f.endswith(".parquet"))
    _write_cursor(state_file, current)
    return {"shipped_files": n, "from_version": last, "to_version": current,
            "path": final}


def replicate(primary: LakeTable, replica_path: str, *,
              state_file: str, n_buckets: int = 32) -> dict:
    """Apply the primary's pending changes into a replica LakeTable.

    Change rows carry their original (_ts, _seq), so the replica's MERGE
    sees the true event ordering: stale/duplicate shipments are per-row
    no-ops and the replica's visible state converges to the primary's.
    The batch id ``feed:{to_version}`` rides the bounded exactly-once
    ledger — a re-run of an already-applied range is a committed no-op."""
    spark = primary.spark
    last = _read_cursor(state_file)
    current = primary.current_version()
    if current <= last:
        return {"applied": 0, "from_version": last, "to_version": last}
    if LakeTable.exists(replica_path):
        replica = LakeTable(spark, replica_path)
    else:
        replica = LakeTable.create(
            spark, replica_path, primary.schema(), key=primary.manifest()["key"],
            n_buckets=n_buckets)
    feed = primary.changes(last, current)
    updates = feed.select(
        F.col("_seq").alias("event_seq"),
        F.when(F.col("_change_type") == "delete", "delete")
        .otherwise("update").alias("op"),
        # ordering key from the feed's authoritative (_ts, _seq) — for
        # deletes that is the tombstone's, not the pre-image payload's
        F.col("_ts").alias("warc_ts"),
        *[c for c in feed.columns
          if c not in ("_change_type", "_seq", "_ts", "_deleted", "warc_ts")],
    )
    res = replica.merge(updates, batch_id=f"feed:{current:d}")
    _write_cursor(state_file, current)
    return {"from_version": last, "to_version": current,
            "merge": res.as_dict()}
