"""LakeTable — snapshot-versioned parquet table with bucket-pruned
copy-on-write MERGE, time travel, additive schema evolution, and
exactly-once batch bookkeeping.

This is the engine's sink, replacing the reference pipeline's
drop-and-rebuild ``neo4j-admin import`` (workflow/Snakefile:156-163,
workflow/scripts/graph_build/create_master_import.py:69-88) with
incremental MERGE commits. The design mirrors Iceberg's public layout
(metadata pointer + manifests referencing immutable data files); the
iceberg-spark-runtime jar is not available in this sandbox, so the same
semantics are implemented directly over parquet. The public API is kept
Iceberg-shaped (merge / snapshot / time travel / evolve) so a real Iceberg
catalog can be bound later without changing callers.

Layout::

    <root>/
      _meta/VERSION          # text: current version int (atomic rename commit)
      _meta/v{N:08d}.json    # manifest: schema, per-bucket file lists,
                             # applied batch ids, watermark, commit metrics
      data/snap-{N:08d}/_bucket=K/part-*.parquet

Scale design (what holds at 100 TB / 1000 executors):

- **Hash-on-key bucketing**: every data file holds rows of exactly one
  bucket ``pmod(xxhash64(url), n_buckets)``. A MERGE batch touches only
  the buckets its keys hash into; untouched buckets' files are *referenced*
  from the parent snapshot (zero copy). The rewrite cost per commit is
  O(touched data), not O(table).
- **LWW dedup via partial aggregation** (``max_by`` over a (warc_ts,
  event_seq) struct): map-side combine collapses hot keys before the
  shuffle, so Zipf-skewed domains don't create straggler reducers
  (see operators/lww.py; window variant kept for parity).
- **Exactly-once**: a batch id recorded in the manifest makes re-applied
  micro-batches no-ops, and per-row ``(_ts, _seq)`` guards make replayed
  *events* no-ops — both levels are idempotent (north_rule).
- **Delete tombstones are retained** (``_deleted`` flag, filtered from
  reads): a late stale update arriving after a delete must stay dead, and
  a genuinely newer insert must revive the key. Tombstones older than the
  lateness horizon can be dropped by ``compact()``.

Reference parity notes: the unique-key constraint the reference enforces at
QC time (utils/qc.py:74-84) is structural here (MERGE key); the reference's
first-load fast path (``neo4j-admin import`` vs ``LOAD CSV``, README.md:10)
maps to ``overwrite()`` vs ``merge()``.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import merge_schemas

SYS_COLS = ["_seq", "_ts", "_deleted"]
_META = "_meta"
_DATA = "data"


def _parquet_num_rows(path: str) -> int:
    """Row count from the parquet footer — metadata only, no data read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


class ConcurrentWriteError(RuntimeError):
    """A second writer committed between this writer's read and commit."""


@dataclass
class MergeResult:
    version: int
    inserted: int
    updated: int
    deleted: int
    stale_skipped: int
    touched_buckets: int
    noop: bool = False

    def as_dict(self) -> dict:
        return dict(self.__dict__)


class LakeTable:
    """Single-writer snapshot table. Not thread-safe across writers (the
    streaming tailer is the single writer, like a binlog applier)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ------------------------------------------------------------------ meta
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.path, _META)

    def current_version(self) -> int:
        with open(os.path.join(self._meta_dir, "VERSION")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self._meta_dir, f"v{v:08d}.json")) as f:
            return json.load(f)

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.manifest(version)["schema"])

    def _commit(self, manifest: dict) -> None:
        """Atomic pointer swap with an optimistic-concurrency check
        (Iceberg-style CAS on the metadata pointer): the commit only lands
        if the table is still at the snapshot this manifest was derived
        from. The tailer is the intended single writer; this turns an
        accidental second writer into a loud error instead of lost commits."""
        v = manifest["version"]
        parent = manifest.get("parent")
        if parent is not None:
            current = self.current_version()
            if current != parent:
                raise ConcurrentWriteError(
                    f"commit of v{v} derived from v{parent}, but table is at "
                    f"v{current} — concurrent writer detected"
                )
        mpath = os.path.join(self._meta_dir, f"v{v:08d}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = os.path.join(self._meta_dir, f".VERSION.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self._meta_dir, "VERSION"))  # atomic

    # ---------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        *,
        key: str = "url",
        n_buckets: int = 32,
        properties: dict | None = None,
    ) -> "LakeTable":
        t = cls(spark, path)
        os.makedirs(t._meta_dir, exist_ok=True)
        os.makedirs(os.path.join(t.path, _DATA), exist_ok=True)
        if os.path.exists(os.path.join(t._meta_dir, "VERSION")):
            raise FileExistsError(f"table already exists at {path}")
        manifest = {
            "version": 0,
            "parent": None,
            "key": key,
            "n_buckets": n_buckets,
            "schema": schema.jsonValue(),
            "files": {},   # bucket(str) -> [relative paths] (base files)
            "deltas": {},  # bucket(str) -> [relative paths] (MOR deltas)
            "applied_batches": [],
            "watermark_seq": -1,
            "properties": properties or {},
            "metrics": {},
        }
        t._commit(manifest)
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, _META, "VERSION"))

    # ------------------------------------------------------------------ read
    def _file_schema(self, manifest: dict) -> T.StructType:
        s = T.StructType.fromJson(manifest["schema"])
        fields = list(s.fields)
        fields += [
            T.StructField("_seq", T.LongType(), True),
            T.StructField("_ts", T.TimestampType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
        return T.StructType(fields)

    def _read_files(
        self,
        manifest: dict,
        buckets: list[int] | None = None,
        file_schema: T.StructType | None = None,
        *,
        which: str = "files",
    ) -> DataFrame:
        files = manifest.get(which, {})
        wanted = files.keys() if buckets is None else [str(b) for b in buckets]
        paths = [os.path.join(self.path, p) for b in wanted for p in files.get(str(b), [])]
        fschema = file_schema or self._file_schema(manifest)
        if not paths:
            return self.spark.createDataFrame([], fschema)
        # explicit schema: files from pre-evolution snapshots lack new
        # columns; Spark null-fills them (additive evolution read path)
        return self.spark.read.schema(fschema).parquet(*paths)

    def _read_resolved(
        self,
        manifest: dict,
        buckets: list[int] | None = None,
        file_schema: T.StructType | None = None,
    ) -> DataFrame:
        """Base ∪ delta files with per-key LWW resolution (merge-on-read).

        When no deltas are pending (pure COW history) this is a plain scan —
        no resolution shuffle is paid. With deltas, the winner per key is
        max (_ts, _seq) across base+delta rows, exactly the same total order
        MERGE uses, so COW and MOR histories converge to identical states.
        """
        base = self._read_files(manifest, buckets, file_schema)
        deltas = manifest.get("deltas", {})
        wanted = deltas.keys() if buckets is None else [str(b) for b in buckets]
        if not any(deltas.get(str(b)) for b in wanted):
            return base
        delta_df = self._read_files(manifest, buckets, file_schema, which="deltas")
        key = manifest["key"]
        union = base.unionByName(delta_df)

        # Two-pass resolution that never shuffles full row images:
        # 1. winners: column-pruned scan (key, _ts, _seq only — parquet
        #    reads 3 columns) -> HASH agg on a single packed decimal
        #    ordering key (max over struct would fall back to a
        #    SortAggregate — struct buffers aren't mutable), tiny shuffle;
        # 2. join winners back on (key, _ord) — _seq is unique, so exactly
        #    one row survives per key. AQE sees the small winner relation
        #    at runtime and converts the join to broadcast, so the full
        #    rows stream map-side without an exchange or sort.
        #
        # Packing: ord = unix_micros(_ts) * 10^18 + _seq. Lexicographic
        # (ts, seq) order is preserved for any seq in (-10^18, 10^18)
        # (covers 10^10-event logs and the base-load _seq = -1); max micros
        # ~1.7e15 keeps the product < 10^34 (decimal cap is 10^38).
        ord_expr = (
            F.unix_micros(F.col("_ts")).cast("decimal(38,0)")
            * F.lit(1_000_000_000_000_000_000)
            + F.col("_seq")
        )
        tagged = union.withColumn("_ord", ord_expr)
        winners = tagged.groupBy(F.col(key).alias("_wk")).agg(
            F.max("_ord").alias("_word")
        )
        # Explicit broadcast: AQE does not reliably convert this SMJ even
        # when winners are tiny, and a sort-merge join here sort-shuffles
        # every full row image — the exact thing this two-pass design
        # avoids. Winners are (key, decimal) pairs; at true cluster scale
        # with ~10^9+ keys per read, swap this for bucket-local resolution
        # (both sides are already bucket-pure files, so the join can run
        # per bucket without any global broadcast).
        return (
            tagged.join(
                F.broadcast(winners),
                (F.col(key) == F.col("_wk")) & (F.col("_ord") == F.col("_word")),
            )
            .drop("_wk", "_word", "_ord")
        )

    def read(self, version: int | None = None, *, with_system_cols: bool = False) -> DataFrame:
        """Current (or time-travel) state. Tombstones filtered out; pending
        merge-on-read deltas resolved."""
        m = self.manifest(version)
        df = self._read_resolved(m).filter(~F.col("_deleted"))
        if not with_system_cols:
            df = df.drop(*SYS_COLS)
        return df

    def bucket_expr(self, key_col, n_buckets: int | None = None):
        n = n_buckets or self.manifest()["n_buckets"]
        return F.pmod(F.xxhash64(key_col), F.lit(n)).cast("int")

    # ----------------------------------------------------------------- write
    def _write_snapshot(
        self, df: DataFrame, version: int, *, kind: str = "snap"
    ) -> dict[str, list[str]]:
        """Write df (must carry _bucket) hive-partitioned by _bucket; return
        per-bucket relative file lists."""
        snap_rel = os.path.join(_DATA, f"{kind}-{version:08d}")
        out_dir = os.path.join(self.path, snap_rel)
        (
            df.write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out_dir)
        )
        files: dict[str, list[str]] = {}
        if os.path.exists(out_dir):
            for d in sorted(os.listdir(out_dir)):
                if not d.startswith("_bucket="):
                    continue
                b = d.split("=", 1)[1]
                files[b] = sorted(
                    os.path.join(snap_rel, d, f)
                    for f in os.listdir(os.path.join(out_dir, d))
                    if f.endswith(".parquet")
                )
        return files

    def overwrite(self, df: DataFrame, *, batch_id: str | None = None) -> MergeResult:
        """Bulk first-load fast path (no MERGE join) — analog of the
        reference's neo4j-admin bulk import vs transactional LOAD CSV."""
        m = self.manifest()
        key = m["key"]
        new_schema = merge_schemas(T.StructType.fromJson(m["schema"]), df.schema)
        version = m["version"] + 1
        typ = {f.name: f.dataType for f in new_schema.fields}
        full = df
        for c in new_schema.fieldNames():
            if c not in df.columns:
                full = full.withColumn(c, F.lit(None).cast(typ[c]))
            elif full.schema[c].dataType != typ[c]:
                # e.g. an all-null column arriving as NullType/boolean from
                # pandas inference — conform to the declared type
                full = full.withColumn(c, F.col(c).cast(typ[c]))
        full = (
            full.select(*new_schema.fieldNames())
            .withColumn("_seq", F.lit(-1).cast("long"))
            .withColumn("_ts", F.col("warc_ts") if "warc_ts" in df.columns else F.lit(None).cast("timestamp"))
            .withColumn("_deleted", F.lit(False))
            .withColumn("_bucket", self.bucket_expr(F.col(key), m["n_buckets"]))
        )
        files = self._write_snapshot(full.repartition(m["n_buckets"], "_bucket"), version)
        manifest = {
            **m,
            "version": version,
            "parent": m["version"],
            "schema": new_schema.jsonValue(),
            "files": files,
            "applied_batches": m["applied_batches"] + ([batch_id] if batch_id else []),
            "metrics": {"op": "overwrite"},
        }
        self._commit(manifest)
        return MergeResult(version, 0, 0, 0, 0, len(files))

    # ----------------------------------------------------------------- merge
    def merge(
        self,
        updates: DataFrame,
        *,
        batch_id: str | None = None,
        collect_metrics: bool = True,
        watermark_seq: int | None = None,
        mode: str = "cow",
        extra_metrics: dict | None = None,
    ) -> MergeResult:
        """Apply a deduplicated change batch with MERGE semantics.

        ``updates`` contract: one row per key (pre-deduplicated via
        operators.lww), columns = [key, event_seq(op ordering long),
        op(insert|update|delete), warc_ts] + payload columns. Payload
        columns not yet in the table trigger additive schema evolution.

        Semantics per key (north_rule):
          - no target row                  -> insert (unless delete: tombstone)
          - target newer ((_ts,_seq) >= (warc_ts,event_seq)) -> stale no-op
          - op in (insert, update)         -> replace row image
          - op == delete                   -> tombstone (read-invisible)

        ``mode``:
          - ``"cow"`` (copy-on-write): full-outer MERGE join against the
            touched buckets, rewrite them. Commit cost O(touched data);
            reads stay plain scans. Right when batches are large relative
            to update locality or reads dominate.
          - ``"mor"`` (merge-on-read): append the batch as per-bucket delta
            files — commit cost O(batch), **no join, no target read**; the
            per-key LWW resolution is deferred to read()/compact(), exactly
            like Iceberg v2 / Hudi MOR tables. Right for high-throughput
            CDC tailing; run ``compact()`` on a cadence to re-bound read
            cost. Both modes converge to identical table states because
            resolution uses the same (_ts, _seq) total order.
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge mode {mode!r}")
        extra = dict(extra_metrics or {})
        m = self.manifest()
        if batch_id is not None and batch_id in m["applied_batches"]:
            # exactly-once: replayed micro-batch is a committed no-op
            return MergeResult(m["version"], 0, 0, 0, 0, 0, noop=True)

        key, n_buckets = m["key"], m["n_buckets"]
        payload_cols = [c for c in updates.columns if c not in ("event_seq", "op")]
        payload_schema = T.StructType([updates.schema[c] for c in payload_cols])
        new_schema = merge_schemas(T.StructType.fromJson(m["schema"]), payload_schema)
        all_cols = new_schema.fieldNames()
        typ = {f.name: f.dataType for f in new_schema.fields}

        src = updates
        for c in all_cols:
            if c not in src.columns:
                src = src.withColumn(c, F.lit(None).cast(typ[c]))
            elif src.schema[c].dataType != typ[c]:
                # e.g. an all-null (NullType) column in a delete-only batch
                src = src.withColumn(c, F.col(c).cast(typ[c]))
        src = src.withColumn("_bucket", self.bucket_expr(F.col(key), n_buckets))

        if mode == "mor":
            # no persist: the write pass streams source->UDF->parquet once,
            # and the metrics/watermark passes are column-pruned recomputes
            # (no html, no UDF) — caching full row images here would add
            # O(batch) memory traffic for nothing
            return self._merge_mor(
                m, src, all_cols, new_schema,
                batch_id=batch_id, collect_metrics=collect_metrics,
                watermark_seq=watermark_seq, extra_metrics=extra,
            )

        # persist (COW): the updates lineage (dedup + extraction UDF) is
        # consumed by three actions (touched-buckets, merge write, metrics
        # recompute's source side) — run the expensive upstream exactly once
        src = src.persist()

        # ---- bucket pruning: only read buckets this batch touches.
        # Read with the *evolved* file schema: pre-evolution files null-fill
        # the new columns (additive evolution read path).
        touched = [r[0] for r in src.select("_bucket").distinct().collect()]
        if not touched:
            # empty batch: no snapshot rewrite; still record the batch id so
            # the exactly-once ledger stays accurate
            src.unpersist()
            if batch_id is not None:
                version = m["version"] + 1
                self._commit({**m, "version": version, "parent": m["version"],
                              "applied_batches": m["applied_batches"] + [batch_id],
                              "metrics": {"op": "merge", "batch_id": batch_id,
                                          "empty": True, **extra}})
                return MergeResult(version, 0, 0, 0, 0, 0)
            return MergeResult(m["version"], 0, 0, 0, 0, 0, noop=True)
        evolved_manifest = {**m, "schema": new_schema.jsonValue()}
        # resolved read: if earlier MOR commits left deltas in these buckets,
        # they are folded in here and this COW rewrite retires them
        target = (
            self._read_resolved(m, buckets=touched,
                                file_schema=self._file_schema(evolved_manifest))
            .withColumn("_bucket", self.bucket_expr(F.col(key), n_buckets))
        )

        s_cols = F.struct(
            *[F.col(f"s.{c}").alias(c) for c in all_cols],
            F.col("s.event_seq").alias("_seq"),
            F.col("s.warc_ts").alias("_ts"),
            (F.col("s.op") == "delete").alias("_deleted"),
            F.col("s._bucket").alias("_bucket"),
        )
        t_cols = F.struct(
            *[F.col(f"t.{c}").alias(c) for c in all_cols],
            F.col("t._seq"), F.col("t._ts"), F.col("t._deleted"), F.col("t._bucket"),
        )
        s_key = F.col(f"s.{key}")
        t_key = F.col(f"t.{key}")
        # stale iff (s.warc_ts, s.event_seq) <= (t._ts, t._seq)
        stale = (F.col("s.warc_ts") < F.col("t._ts")) | (
            (F.col("s.warc_ts") == F.col("t._ts"))
            & (F.col("s.event_seq") <= F.col("t._seq"))
        )

        joined = target.alias("t").join(src.alias("s"), t_key == s_key, "full_outer")
        action = (
            F.when(s_key.isNull(), F.lit("keep"))
            .when(t_key.isNull() & (F.col("s.op") == "delete"), F.lit("tombstone_new"))
            .when(t_key.isNull(), F.lit("insert"))
            .when(stale, F.lit("stale"))
            .when(F.col("s.op") == "delete", F.lit("delete"))
            .when(F.col("t._deleted"), F.lit("revive"))
            .otherwise(F.lit("update"))
        )
        row = (
            F.when(action.isin("keep", "stale"), t_cols)
            .otherwise(s_cols)
        )
        resolved = joined.select(action.alias("_action"), row.alias("r")).select(
            "_action", "r.*"
        )

        version = m["version"] + 1
        out = resolved.drop("_action")
        # action counts piggyback on the write job (Observation — no extra
        # pass over the join); per-bucket row counts come from the written
        # parquet footers (metadata only). An earlier design ran a separate
        # column-pruned metrics job per commit — one whole extra job.
        obs = None
        if collect_metrics:
            from pyspark.sql import Observation

            obs = Observation()
            out = resolved.observe(
                obs,
                *[
                    F.sum(F.when(F.col("_action") == a, 1).otherwise(0)).alias(a)
                    for a in ("keep", "insert", "update", "delete",
                              "tombstone_new", "revive", "stale")
                ],
            ).drop("_action")
        n_parts = max(len(touched), 1)
        new_files = self._write_snapshot(out.repartition(n_parts, "_bucket"), version)

        metrics = {}
        if collect_metrics and obs is not None:
            got = obs.get
            agg = {a: int(v) for a, v in got.items() if v}
            by_bucket = {
                b: {"rows": sum(_parquet_num_rows(os.path.join(self.path, f))
                                for f in fl)}
                for b, fl in new_files.items()
            }
            metrics = {"actions": agg, "by_bucket": by_bucket}

        files = dict(m["files"])
        deltas = dict(m.get("deltas", {}))
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)  # rewrite folded these deltas in
        # watermark: log position processed. If the caller doesn't supply the
        # batch's end position, fall back to max seq in the (deduped) batch —
        # note LWW by (warc_ts, seq) may have dropped the max-seq event, so
        # the explicit parameter is the accurate form (replay.py passes it).
        if watermark_seq is None:
            wm_row = src.agg(F.max("event_seq")).first()
            watermark_seq = wm_row[0] if wm_row[0] is not None else -1
        watermark = max(m["watermark_seq"], watermark_seq)
        src.unpersist()

        manifest = {
            **m,
            "version": version,
            "parent": m["version"],
            "schema": new_schema.jsonValue(),
            "files": files,
            "deltas": deltas,
            "applied_batches": m["applied_batches"] + ([batch_id] if batch_id else []),
            "watermark_seq": watermark,
            "metrics": {"op": "merge", "batch_id": batch_id, **metrics, **extra},
        }
        self._commit(manifest)
        a = metrics.get("actions", {})
        return MergeResult(
            version,
            inserted=a.get("insert", 0) + a.get("revive", 0),
            updated=a.get("update", 0),
            deleted=a.get("delete", 0) + a.get("tombstone_new", 0),
            stale_skipped=a.get("stale", 0),
            touched_buckets=len(touched),
        )

    def _merge_mor(
        self,
        m: dict,
        src: DataFrame,
        all_cols: list[str],
        new_schema: T.StructType,
        *,
        batch_id: str | None,
        collect_metrics: bool,
        watermark_seq: int | None,
        extra_metrics: dict | None = None,
    ) -> MergeResult:
        """Merge-on-read commit: append the batch as per-bucket delta
        files. O(batch) — no target read, no join; per-key LWW resolution
        is deferred to _read_resolved/compact (Hudi/Iceberg-v2 MOR analog).
        ``src`` arrives bucketed and schema-conformed, NOT persisted (side
        passes below are column-pruned recomputes — no html, no UDF), and
        may hold multiple rows per key (the fast path skips in-batch
        dedup; resolution orders by (_ts,_seq) regardless)."""
        extra = dict(extra_metrics or {})
        version = m["version"] + 1
        out = (
            src.withColumn("_seq", F.col("event_seq"))
            .withColumn("_ts", F.col("warc_ts"))
            .withColumn("_deleted", F.col("op") == "delete")
            .select(*all_cols, "_seq", "_ts", "_deleted", "_bucket")
        )
        # metrics piggyback on the write job itself (Observation fills when
        # the action runs) — a separate metrics pass was a whole extra job
        # per commit; per-bucket row counts come from parquet footers below
        obs = None
        if collect_metrics:
            from pyspark.sql import Observation

            obs = Observation()
            out = out.observe(
                obs,
                F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("deletes"),
                F.sum(F.when(F.col("_deleted"), 0).otherwise(1)).alias("upserts"),
            )
        new_files = self._write_snapshot(
            out.repartition(m["n_buckets"], "_bucket"), version, kind="delta"
        )
        if not new_files:  # empty batch: ledger-only commit (cf. COW path)
            if batch_id is not None:
                self._commit({**m, "version": version, "parent": m["version"],
                              "applied_batches": m["applied_batches"] + [batch_id],
                              "metrics": {"op": "merge", "mode": "mor",
                                          "batch_id": batch_id, "empty": True,
                                          **extra}})
                return MergeResult(version, 0, 0, 0, 0, 0)
            return MergeResult(m["version"], 0, 0, 0, 0, 0, noop=True)

        metrics: dict = {"mode": "mor"}
        n_upserts = n_deletes = 0
        if collect_metrics and obs is not None:
            got = obs.get  # filled by the completed write job — no new job
            n_upserts = int(got.get("upserts") or 0)
            n_deletes = int(got.get("deletes") or 0)
            metrics["actions"] = {"append_upsert": n_upserts, "append_delete": n_deletes}
            # per-bucket lineage from parquet footers: pure metadata reads,
            # no executors involved
            metrics["by_bucket"] = {
                b: {"rows": sum(_parquet_num_rows(os.path.join(self.path, f))
                                for f in fl)}
                for b, fl in new_files.items()
            }

        if watermark_seq is None:
            wm_row = src.agg(F.max("event_seq")).first()
            watermark_seq = wm_row[0] if wm_row[0] is not None else -1
        watermark = max(m["watermark_seq"], watermark_seq)

        deltas = dict(m.get("deltas", {}))
        for b, fl in new_files.items():
            deltas[b] = list(deltas.get(b, [])) + fl
        self._commit({
            **m,
            "version": version,
            "parent": m["version"],
            "schema": new_schema.jsonValue(),
            "deltas": deltas,
            "applied_batches": m["applied_batches"] + ([batch_id] if batch_id else []),
            "watermark_seq": watermark,
            "metrics": {"op": "merge", "batch_id": batch_id, **metrics, **extra},
        })
        return MergeResult(
            version, inserted=n_upserts, updated=0, deleted=n_deletes,
            stale_skipped=0, touched_buckets=len(new_files),
        )

    # ------------------------------------------------------------- evolution
    def evolve(self, new_columns: T.StructType) -> int:
        """Explicit additive ALTER TABLE ADD COLUMNS (merge() also evolves
        implicitly when updates carry new payload columns)."""
        m = self.manifest()
        new_schema = merge_schemas(T.StructType.fromJson(m["schema"]), new_columns)
        version = m["version"] + 1
        self._commit({**m, "version": version, "parent": m["version"],
                      "schema": new_schema.jsonValue(),
                      "metrics": {"op": "evolve"}})
        return version

    # ------------------------------------------------------------ housekeeping
    def history(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self._meta_dir)):
            if fn.startswith("v") and fn.endswith(".json"):
                with open(os.path.join(self._meta_dir, fn)) as f:
                    mm = json.load(f)
                out.append({"version": mm["version"], "parent": mm["parent"],
                            "metrics": mm.get("metrics", {}),
                            "watermark_seq": mm.get("watermark_seq", -1)})
        return out

    def compact(self, *, drop_tombstones: bool = False,
                n_buckets: int | None = None) -> int:
        """Fold pending MOR deltas into a clean base snapshot and rewrite
        all buckets (small-file compaction); optionally drop tombstones
        (safe once the lateness horizon has passed). This is the cadence
        job that re-bounds MOR read cost.

        ``n_buckets`` rebuckets the table (partition-spec evolution): the
        key universe outgrowing the bucket count is the classic
        hash-partitioned-table aging problem — a rebucketing compaction is
        one full rewrite, after which every new commit uses the new spec.
        Old snapshots stay readable (time travel keeps their manifests)."""
        m = self.manifest()
        new_n = n_buckets or m["n_buckets"]
        df = self._read_resolved(m).withColumn(
            "_bucket", self.bucket_expr(F.col(m["key"]), new_n)
        )
        if drop_tombstones:
            df = df.filter(~F.col("_deleted"))
        version = m["version"] + 1
        files = self._write_snapshot(df.repartition(new_n, "_bucket"), version)
        self._commit({**m, "version": version, "parent": m["version"],
                      "n_buckets": new_n, "files": files, "deltas": {},
                      "metrics": {"op": "compact", "n_buckets": new_n}})
        return version

    def pending_delta_files(self) -> int:
        return sum(len(v) for v in self.manifest().get("deltas", {}).values())

    def maybe_compact(self, *, max_delta_files: int = 64,
                      drop_tombstones: bool = False) -> int | None:
        """Compaction policy hook for the tailer: compact when pending MOR
        delta files exceed the threshold (bounds read amplification to
        O(max_delta_files) extra file opens per read). Returns the new
        version or None if below threshold."""
        if self.pending_delta_files() <= max_delta_files:
            return None
        return self.compact(drop_tombstones=drop_tombstones)
