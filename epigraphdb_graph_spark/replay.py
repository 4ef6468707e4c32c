"""Batch replay orchestration: change log → extract → LWW dedup → MERGE.

This is the engine's equivalent of the reference's full build entry point
(``snakemake -r all`` — workflow/Snakefile:34-266): instead of
re-processing every dataset and drop-rebuilding the store, it tails a
change log in ordered batches and applies each with an idempotent MERGE.

Key state invariant (what makes the oracle simple and batching-agnostic):
after replaying any prefix of the log in any batch split, each key's row
is the row-image of its max-(warc_ts, event_seq) event seen so far —
deleted keys are read-invisible tombstones. So the final table state is a
pure function of the event *set*, not the batch boundaries; the
replay-equality tests exploit this.

Resumability: each batch commit records its batch_id in the table
manifest; re-running a killed replay skips already-committed batches
(exactly-once at the batch level) and re-applied individual events are
stale no-ops (exactly-once at the row level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.extract import extract_text_udf
from .operators.lww import lww_dedup_agg, lww_winner_filter
from .plans.lake import LakeTable, MergeResult
from .schema import PAGES_SCHEMA


def prepare_batch(events: DataFrame, *, dedup: bool | str = True,
                  bucket_into: int | None = None,
                  exchange_width: int | None = None,
                  key: str = "url",
                  winners: DataFrame | None = None) -> DataFrame:
    """Prepare a raw change-event batch: per-key LWW winner selection,
    then html→text extraction (on surviving rows only).

    ``dedup`` strategies:
      - ``True`` (COW requirement: the MERGE join needs exactly one source
        row per key): ``lww_dedup_agg`` — max_by aggregation, shuffles one
        combined row per (task, key).
      - ``"filter"`` (column-prunable sources, e.g. a parquet/Kafka log):
        ``lww_winner_filter`` — winners from a column-pruned agg +
        broadcast join-back, so loser payloads are dropped at the scan and
        never shuffle; extraction runs only on winners (at a 10:1
        supersede ratio, ~90% less UDF CPU and ~90% smaller delta files).
        May keep re-delivered ties; MOR read-resolution collapses them.
      - ``False``: no winner selection — extract everything (MOR remains
        correct via read-resolution; use when batches are too large for
        the winner broadcast).

    ``bucket_into=n`` (murmur3-bucketed tables — apply_batch sets it)
    FUSES the table's bucket layout into this preparation with a single
    payload exchange: winner selection (broadcast filter — no payload
    movement) and html→text extraction run in the narrow pre-exchange
    stage, then ``repartition(n, key)`` places every surviving row in
    partition == bucket (see LakeTable.create), so the downstream
    MERGE/delta write needs no exchange at all.

    ``exchange_width=w`` (must divide ``bucket_into``) narrows that
    exchange for SMALL batches: murmur3 placement nests modularly —
    ``pmod(h, n) = b`` implies ``pmod(h, w) = b mod w`` whenever
    ``w | n`` — so bucket ``b``'s rows all land in partition ``b mod
    w``, key-clustering (and thus partition-local dedup) still holds,
    and the partitioned write still emits exactly one bucket-pure file
    per touched bucket; the post-exchange agg+UDF stage just runs ``w``
    tasks instead of ``n`` (measured ~20-25% per-micro-batch win at
    ~12k rows, where per-task Arrow/python setup dominates — see the
    tailer's width policy). For ``dedup=True`` the
    COW exactly-one-row-per-key contract is restored by a
    partition-local dedup of re-delivered ties on the far side of the
    exchange (HashPartitioning(key, n) satisfies the clustering — no
    extra shuffle). ``dedup="agg"`` exchanges the raw batch instead and
    dedups partition-locally — one job, no winner broadcast, correct at
    any batch size; the choose_*_dedup policies pick between the forms
    by cluster/bucket geometry."""
    if bucket_into is None:
        if dedup is True or dedup == "agg":
            events = lww_dedup_agg(events, key=key, ts_col="warc_ts",
                                   seq_col="event_seq")
        elif dedup == "filter":
            events = lww_winner_filter(events, key=key, ts_col="warc_ts",
                                       seq_col="event_seq", winners=winners)
        return events.withColumn("text", extract_text_udf(F.col("html")))
    width = bucket_into
    if exchange_width is not None:
        if exchange_width < 1 or bucket_into % exchange_width != 0:
            raise ValueError(
                f"exchange_width ({exchange_width}) must be a positive "
                f"divisor of bucket_into ({bucket_into}) for the modular "
                "bucket-purity guarantee to hold")
        width = exchange_width
    if dedup == "agg":
        # exchange first, partition-local agg dedup, extraction AFTER (on
        # winners only) — the whole batch is ONE job with no broadcast
        # collect, and correct at any batch size. The UDF stage is
        # n_buckets tasks wide, each paying Arrow/python setup (~0.25
        # s/task at 1 core), so the geometry policies pick this form only
        # when cores amortize those rounds (choose_mor_dedup /
        # choose_cow_dedup); from 4 cores up it is the fastest measured
        # shape on both 70 B and 7 KB pages.
        events = events.repartition(width, F.col(key))
        events = lww_dedup_agg(events, key=key, ts_col="warc_ts",
                               seq_col="event_seq")
        return events.withColumn("text", extract_text_udf(F.col("html")))
    if dedup in (True, "filter"):
        # winner-select with zero payload movement (column-pruned agg +
        # broadcast join-back) — losers are dropped at the scan
        events = lww_winner_filter(events, key=key, ts_col="warc_ts",
                                   seq_col="event_seq", winners=winners)
    if dedup is not False:
        # extraction in the NARROW pre-exchange stage (width = input
        # splits, pipelined with the scan): a post-exchange UDF stage
        # would be n_buckets tasks wide and pay per-task python overhead
        events = events.withColumn("text", extract_text_udf(F.col("html")))
        events = events.repartition(width, F.col(key))
        if dedup is True:
            # exact one-row-per-key (COW MERGE contract): collapse
            # re-delivered ties partition-locally — HashPartitioning(key,
            # n) satisfies the clustering, no further exchange
            events = events.dropDuplicates([key])
        return events
    events = events.withColumn("text", extract_text_udf(F.col("html")))
    return events.repartition(width, F.col(key))


#: auto MOR policy threshold: distinct(key)/rows above this means the
#: batch is effectively append-only — winner selection would collapse
#: (almost) nothing, so its shuffle is pure overhead and append-all wins.
#: Below it, superseded rows exist in material volume and winner-side
#: dedup pays for itself several times over: winners-only extraction,
#: ~1/ratio smaller delta files, and a compaction that folds winners
#: instead of the raw log.
MOR_DEDUP_MAX_DISTINCT_FRAC = 0.9

#: between the two supersede-bearing strategies the cost driver is the
#: post-exchange UDF stage width: "agg" (exchange raw events first,
#: partition-local winner agg, extraction on winners only — ONE job per
#: batch, no broadcast collect) runs its extraction n_buckets tasks wide,
#: each paying Arrow/python-worker setup, so it needs enough cores to
#: amortize those rounds; the broadcast winner filter (True) keeps
#: extraction in the narrow pre-exchange stage but costs a second
#: full-scan job per batch. Measured crossover on this engine (500k
#: events 10:1 @70 B and 100k @7 KB, 32 buckets): agg 80.8k/14.5k ev/s
#: vs True 46.1k/7.5k at 32 cores; agg ≈ True at 4 cores (7.0k vs 6.6k
#: on the 100k shape); True 1.7× faster at 1 core. The threshold below
#: (agg when n_buckets <= 8 * cores, i.e. at most ~8 serial UDF-task
#: rounds) encodes that crossover.
MOR_AGG_MAX_BUCKETS_PER_CORE = 8


def choose_cow_dedup(
    *, n_buckets: int | None = None, parallelism: int | None = None
) -> bool | str:
    """Pick the COW winner-selection form. COW always needs exactly one
    source row per key (the MERGE full-outer join contract), so the only
    question is WHICH dedup shape: the same geometry rule as the MOR
    policy applies — ``"agg"`` (one job: exchange raw events, partition-
    local winner agg, winners-only extraction) when the n_buckets-wide
    UDF stage amortizes over the cores, else ``True`` (broadcast winner
    filter + partition-local tie collapse; extraction stays in the narrow
    pre-exchange stage). Both produce exactly one row per key — measured
    61.8k vs 33.3k ev/s on the 500k/10:1/32-bucket shape at 32 cores."""
    if (
        n_buckets is not None
        and parallelism is not None
        and n_buckets <= MOR_AGG_MAX_BUCKETS_PER_CORE * parallelism
    ):
        return "agg"
    return True


def choose_mor_dedup(
    events: DataFrame, *, stats: tuple[int, int] | None = None,
    n_buckets: int | None = None, parallelism: int | None = None,
) -> bool | str:
    """Pick the MOR winner-selection strategy from the batch's supersede
    ratio and the cluster/bucket geometry. Returns ``False`` (append-all,
    read-resolution dedups) when the batch is effectively append-only
    (distinct keys ≈ rows) — winner selection would collapse nothing, so
    its shuffle is pure overhead. For supersede-bearing batches:
    ``"agg"`` (single-job exchange-first dedup with winners-only
    extraction) when the post-exchange UDF stage width amortizes over the
    available cores (``n_buckets <= MOR_AGG_MAX_BUCKETS_PER_CORE *
    parallelism``), else ``True`` (broadcast winner filter — extraction
    stays in the narrow pre-exchange stage). Correctness is identical in
    every branch — this is purely a cost choice.

    ``stats=(n_rows, n_distinct_keys)``, when the caller already has them,
    makes this free; otherwise one column-pruned, map-side-combinable agg
    over the key column runs (replay() folds the stats into its existing
    log-bounds job, so the batch path never pays an extra pass).
    ``n_buckets``/``parallelism`` default to "geometry unknown", which
    keeps the broadcast-filter choice (safe at any width).

    ``"filter"`` (broadcast winner filter without the partition-local tie
    collapse) is never auto-chosen: it beats the agg only when the source
    supports real column pruning (parquet/Kafka with lazy payload), where
    its pruned winner pass skips payload IO and payload columns never
    shuffle — callers with such sources and KB-scale pages should pass
    ``mor_dedup="filter"`` explicitly."""
    if stats is None:
        row = events.agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("url").alias("k"),
        ).first()
        stats = (row["n"], row["k"])
    n_rows, n_keys = stats
    if n_rows == 0:
        return False
    if n_keys / n_rows > MOR_DEDUP_MAX_DISTINCT_FRAC:
        return False
    if (
        n_buckets is not None
        and parallelism is not None
        and n_buckets <= MOR_AGG_MAX_BUCKETS_PER_CORE * parallelism
    ):
        return "agg"
    return True


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    *,
    batch_id: str | None = None,
    watermark_seq: int | None = None,
    mode: str = "cow",
    dead_letter_dir: str | None = None,
    mor_dedup: bool | str = "auto",
    delta_layout: str = "clustered",
    winners: DataFrame | None = None,
    pre_commit=None,
) -> MergeResult:
    """Apply one change batch. With ``dead_letter_dir``, malformed events
    are quarantined there (parquet, with a _reason column) instead of
    poisoning the merge, and the per-reason counts land in the commit's
    lineage metrics — the accounted version of the reference's
    --skip-bad-relationships + import-report check (SURVEY J8/K2).

    ``delta_layout="scattered"`` (MOR only) skips prepare_batch's fused
    bucket exchange AND the merge-side repartition: the commit is one
    fused scan->winner-filter->extract->write stage with no shuffle and
    no stage barrier (see LakeTable.merge).

    Batch-level OCC retry: merge() absorbs MOR commit races internally by
    re-committing the already-written delta files against the fresh
    manifest, but some races require a full RE-PREPARE — a COW lost race
    (the rewrite referenced superseded base files), a bucket-spec change
    under an in-flight MOR append, or an abandoned half-commit that got
    rolled forward. Those surface as ConcurrentWriteError; re-running the
    whole prepare+merge against the fresh snapshot is then both correct
    (exactly-once holds: the batch ledger skips a batch a competing
    writer landed, and re-applied rows are per-row stale no-ops) and the
    only sound recovery — so do it here, bounded."""
    from .plans.lake import CommitInFlightError, ConcurrentWriteError

    extra = None
    if dead_letter_dir is not None:
        from .operators.quarantine import quarantine

        events, counts = quarantine(events, dead_letter_dir,
                                    batch_tag=batch_id)
        extra = {"quarantined": counts}
    par = events.sparkSession.sparkContext.defaultParallelism
    last_err: ConcurrentWriteError | None = None
    for _ in range(3):
        m = table.manifest()
        if mode == "cow":
            dedup: bool | str = choose_cow_dedup(
                n_buckets=m["n_buckets"], parallelism=par)
        elif mor_dedup == "auto":
            dedup = choose_mor_dedup(
                events, n_buckets=m["n_buckets"], parallelism=par)
        else:
            dedup = mor_dedup
        scattered = mode == "mor" and delta_layout == "scattered"
        aligned = m.get("bucket_hash") == "murmur3" and not scattered
        try:
            return table.merge(
                prepare_batch(events, dedup=dedup, key=m["key"],
                              bucket_into=m["n_buckets"] if aligned else None,
                              winners=winners if dedup in (True, "filter")
                              else None),
                batch_id=batch_id, watermark_seq=watermark_seq,
                mode=mode, extra_metrics=extra, src_aligned=aligned,
                delta_layout=delta_layout, pre_commit=pre_commit,
            )
        except CommitInFlightError:
            # a possibly-live writer holds the next version (within the
            # abandoned-commit grace) — merge() already rebased with
            # backoff; re-preparing in a tight loop just spins. Surface it.
            raise
        except ConcurrentWriteError as e:
            last_err = e
    raise last_err


def replay(
    spark: SparkSession,
    table_path: str,
    events: DataFrame,
    *,
    n_batches: int = 1,
    n_buckets: int = 32,
    schema=None,
    mode: str = "cow",
    compact_every: int | None = None,
    dead_letter_dir: str | None = None,
    mor_dedup: bool | str = "auto",
    delta_layout: str = "clustered",
    pipeline_depth: int = 1,
) -> list[MergeResult]:
    """Replay a change log into a (possibly new) pages table in
    ``n_batches`` ordered micro-batches split on event_seq ranges —
    the batch-mode emulation of tailing a binlog. Resumable: committed
    batch ids are skipped.

    ``mode="mor"`` appends delta commits (O(batch) each) instead of COW
    rewrites; ``compact_every=k`` folds deltas into the base every k
    batches (the production cadence that bounds read amplification).

    ``pipeline_depth=d`` (MOR only): keep up to ``d`` batches in flight —
    batch b+1's delta-write job overlaps batch b's straggler tail and
    commit bookkeeping; manifest commits stay strictly ordered (see
    _replay_batches_pipelined). Final state is identical to serial
    replay for every depth (state is a pure function of the event set;
    asserted by tests/test_replay_pipeline.py)."""
    if LakeTable.exists(table_path):
        table = LakeTable(spark, table_path)
    else:
        base = schema
        if base is None:
            base = PAGES_SCHEMA
            if "lang" not in events.columns:
                base = type(base)([f for f in base.fields if f.name != "lang"])
        table = LakeTable.create(spark, table_path, base, key="url", n_buckets=n_buckets)

    # one column-pruned pass yields the batch-split bounds AND (only when
    # the auto policy needs them) the supersede stats — no extra job
    need_stats = mode == "mor" and mor_dedup == "auto"
    aggs = [F.min("event_seq").alias("lo"), F.max("event_seq").alias("hi")]
    if need_stats:
        aggs += [F.count("*").alias("n"),
                 F.approx_count_distinct("url").alias("k")]
    bounds = events.agg(*aggs).first()
    if bounds["lo"] is None:
        return []
    if need_stats:
        # one whole-log decision (per-batch ratios track the log's at this
        # generator's stationary key mix; a real tailer decides per batch)
        mor_dedup = choose_mor_dedup(
            events, stats=(bounds["n"], bounds["k"]),
            n_buckets=table.manifest()["n_buckets"],
            parallelism=spark.sparkContext.defaultParallelism)
    lo, hi = bounds["lo"], bounds["hi"]
    span = hi - lo + 1
    step = max(1, (span + n_batches - 1) // n_batches)

    # Amortize the per-batch winner agg: with the broadcast-filter
    # strategies (True/"filter"), each batch otherwise runs its own small
    # 2-stage winner job whose fixed costs (stage scheduling, planning,
    # broadcast build) are constant in wall time — at high parallelism
    # they dominate the shrunk batch wall and cap scaling efficiency
    # (measured: 4 x ~0.4s of per-batch winner jobs at local[4] vs one
    # ~0.7s combined job; BENCH/BASELINE.md round 5). One column-pruned
    # pass over the whole replay range computes every batch's winner set
    # (grouped by the same floor((seq - lo)/step) ranges the loop cuts),
    # cached — per-batch broadcast builds then read O(batch keys) from
    # cache instead of re-scanning the log. Winner semantics are
    # identical: winners are within-batch either way (cross-batch
    # supersedes resolve at read/merge), and the packed ordering decimal
    # is the shared lww._pack_ord. Skipped for a single batch (nothing to
    # amortize) and for non-broadcast strategies (agg/False never build
    # winner sets). Cache is O(distinct keys) rows of key+decimal.
    winners_all = None
    # mor_dedup is already policy-resolved here when mode == "mor" (the
    # need_stats branch above); COW's per-batch choose_cow_dedup picks
    # "agg" at every sane local geometry, so precomputing for it would
    # usually be a wasted pass — gate on the MOR broadcast strategies.
    if n_batches > 1 and mode == "mor" and mor_dedup in (True, "filter"):
        from .operators.lww import lww_batch_winners

        batch_expr = F.floor((F.col("event_seq") - F.lit(lo)) / F.lit(step))
        winners_all = lww_batch_winners(
            events, batch_expr, key=table.manifest()["key"],
            ts_col="warc_ts", seq_col="event_seq").persist()
        winners_all.count()

    results = []
    try:
        return _replay_batches(
            table, events, results, lo=lo, step=step, hi=hi,
            n_batches=n_batches, winners_all=winners_all, mode=mode,
            dead_letter_dir=dead_letter_dir, mor_dedup=mor_dedup,
            delta_layout=delta_layout, compact_every=compact_every,
            pipeline_depth=pipeline_depth)
    finally:
        if winners_all is not None:
            winners_all.unpersist()


def _replay_batches(table, events, results, *, lo, step, hi, n_batches,
                    winners_all, mode, dead_letter_dir, mor_dedup,
                    delta_layout, compact_every, pipeline_depth=1):
    if pipeline_depth > 1 and mode == "mor" and n_batches > 1:
        return _replay_batches_pipelined(
            table, events, results, lo=lo, step=step, hi=hi,
            n_batches=n_batches, winners_all=winners_all,
            dead_letter_dir=dead_letter_dir, mor_dedup=mor_dedup,
            delta_layout=delta_layout, compact_every=compact_every,
            depth=pipeline_depth)
    for b in range(n_batches):
        start, end = lo + b * step, min(lo + (b + 1) * step, hi + 1)
        if start >= end:
            break
        chunk = events.filter((F.col("event_seq") >= start) & (F.col("event_seq") < end))
        results.append(
            apply_batch(
                table,
                chunk,
                winners=(winners_all.filter(F.col("_b") == b).drop("_b")
                         if winners_all is not None else None),
                # "ns:seq" structured id -> O(1) ledger entry (per-namespace
                # high watermark). The id encodes the range END so that
                # "seq <= hwm" truly means "every log position <= hwm is
                # applied" regardless of batching: batches are contiguous
                # ascending ranges from the log's minimum, and the log is
                # append-only (event_seq only grows at the tail), so a
                # re-run over a GROWN log — whose shifted boundaries would
                # have broken start-encoded ids — skips exactly the batches
                # it fully covered before and re-applies straddlers, whose
                # already-applied rows are per-row stale no-ops (COW) /
                # resolution tie-collapsed (MOR).
                batch_id=f"replay:{end - 1:012d}",
                watermark_seq=end - 1,
                mode=mode,
                dead_letter_dir=dead_letter_dir,
                mor_dedup=mor_dedup,
                delta_layout=delta_layout,
            )
        )
        if compact_every and (b + 1) % compact_every == 0 and not results[-1].noop:
            table.compact()
    return results


def _replay_batches_pipelined(table, events, results, *, lo, step, hi,
                              n_batches, winners_all, dead_letter_dir,
                              mor_dedup, delta_layout, compact_every, depth):
    """Pipelined MOR replay: up to ``depth`` batches in flight at once.

    The expensive part of a MOR batch — scan -> winner filter -> extract
    -> delta-file write — is independent across batches (winner sets are
    within-batch; cross-batch supersedes resolve at read/compact, so the
    final state is a pure function of the event SET). Only the manifest
    commits must stay ORDERED, because the ledger's per-namespace high
    watermark means "every log position <= hwm is applied": committing
    batch b+1 before batch b would let a crash between the two lose
    batch b on resume. So batch b+1's write job runs concurrently with
    batch b's straggler tail and driver-side commit bookkeeping (the
    constant-wall serial term that otherwise caps scaling efficiency —
    BENCH/BASELINE.md round 5), and its merge blocks only at the
    ``pre_commit`` barrier until batch b has committed. Commit races
    that slip through anyway (e.g. a concurrent compactor) are absorbed
    by the MOR OCC rebase, which re-commits the already-written files
    with zero Spark re-run (plans/lake.py).

    Compaction cadence stays on the caller's thread and quiesces the
    window first (waits for the cadence batch's commit); a deeper
    overlap is legal (compactor-vs-tailer rebase is tested) but buys
    nothing at the cadences the bench uses.
    """
    from concurrent.futures import ThreadPoolExecutor

    def _one(b, prev_fut):
        start, end = lo + b * step, min(lo + (b + 1) * step, hi + 1)
        if start >= end:
            if prev_fut is not None:
                prev_fut.result()  # propagate predecessor failures
            return None
        chunk = events.filter(
            (F.col("event_seq") >= start) & (F.col("event_seq") < end))
        return apply_batch(
            table,
            chunk,
            winners=(winners_all.filter(F.col("_b") == b).drop("_b")
                     if winners_all is not None else None),
            batch_id=f"replay:{end - 1:012d}",
            watermark_seq=end - 1,
            mode="mor",
            dead_letter_dir=dead_letter_dir,
            mor_dedup=mor_dedup,
            delta_layout=delta_layout,
            # ordered-commit barrier: predecessor committed (or failed)
            pre_commit=(prev_fut.result if prev_fut is not None else None),
        )

    futs = []
    with ThreadPoolExecutor(max_workers=depth) as ex:
        prev = None
        for b in range(n_batches):
            prev = ex.submit(_one, b, prev)
            futs.append(prev)
            if compact_every and (b + 1) % compact_every == 0:
                r = prev.result()  # quiesce the window up to the cadence
                if r is not None and not r.noop:
                    table.compact()
    for f in futs:
        r = f.result()
        if r is not None:
            results.append(r)
    return results
