"""Deterministic distributed change-event generator.

The engine's native input is a binlog/WAL-style change log over
Common-Crawl-like pages (BASELINE.json input_hint). The reference pipeline's
analog of "input data" is its per-dataset CSV drops; its consolidation step
(workflow/scripts/graph_build/merge_sources.py:131-198) resolves multiple
writes to one key — here, multiple change events per url, resolved by
last-writer-wins over (warc_ts, event_seq).

Design constraints:
- **Deterministic** for a given (n_events, seed): every column is a pure
  function of the row id via xxhash64 — re-running yields byte-identical
  events, which the replay-equality oracle and resume tests rely on.
- **Distributed**: built from ``spark.range(n)`` with JVM-side column
  expressions only (no Python UDFs) — generation itself scales to 10^10.
- **Zipf-skewed domains** (FIXTURES.md: s≈1): domain_id = floor(D**u) - 1
  for uniform u gives p(d) ∝ 1/d — heavy hitters for skew/salting tests.
- **Out-of-order arrival within bounded lateness**: warc_ts gets a signed
  jitter so event_seq order and timestamp order disagree locally.
- **Delete-then-reinsert** sequences arise naturally from op sampling;
  ``insert``/``update`` both upsert (standard CDC row-image semantics),
  ``delete`` tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Small word pool for deterministic pseudo-HTML payloads.
_WORDS = (
    "spark shuffle parquet window merge upsert snapshot lineage schema "
    "bucket salt skew broadcast catalyst tungsten arrow pandas stream "
    "checkpoint manifest tombstone replay crawl page domain anchor body "
    "title header footer column partition cluster executor driver task"
).split()

_LANGS = ["en", "es", "de", "fr", "zh", "pt", "it", "nl"]


def _h(col, salt: int, seed: int):
    """Deterministic 64-bit hash of a column with a salt/seed."""
    return F.xxhash64(col, F.lit(salt), F.lit(seed))


def _pm(col, salt: int, seed: int, mod: int):
    """Deterministic value in [0, mod)."""
    return F.pmod(_h(col, salt, seed), F.lit(mod))


def generate_change_events(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_domains: int = 100,
    pages_per_domain: int = 64,
    delete_pct: int = 10,
    update_pct: int = 35,
    lateness_s: int = 3600,
    with_lang: bool = False,
    num_partitions: int | None = None,
    body_repeat: int = 1,
) -> DataFrame:
    """Return a DataFrame of ``n_events`` change events (schema:
    ``schema.CHANGE_EVENT_SCHEMA`` + optional ``lang``).

    ``event_seq`` == row id (globally monotone). Key universe is
    ``n_domains * pages_per_domain`` urls with Zipf(s≈1) skew across
    domains, so a few domains absorb most updates (hot keys).

    ``body_repeat`` repeats the body paragraph to reach realistic
    Common-Crawl page sizes (~70 bytes x repeat): benchmark runs use
    100-150 (KB-scale pages) so shuffle/extraction/write are sized like
    production; the default 1 keeps test fixtures small and preserves
    their historical byte-exact content.
    """
    rng = spark.range(0, n_events, numPartitions=num_partitions)
    i = F.col("id")

    # Zipf-ish domain pick: u ~ U(0,1) from hash; d = floor(D**u) - 1
    u = (_pm(i, 1, seed, 1_000_000) + F.lit(0.5)) / F.lit(1_000_000.0)
    domain = (F.floor(F.pow(F.lit(float(n_domains)), u)) - 1).cast("long")
    page = _pm(i, 2, seed, pages_per_domain)
    url = F.concat(
        F.lit("https://d"), domain, F.lit(".example.org/p/"), page, F.lit(".html")
    )

    op_roll = _pm(i, 3, seed, 100)
    op = (
        F.when(op_roll < delete_pct, F.lit("delete"))
        .when(op_roll < delete_pct + update_pct, F.lit("update"))
        .otherwise(F.lit("insert"))
    )

    # warc_ts: monotone base + bounded signed jitter => locally out of order
    jitter = _pm(i, 4, seed, 2 * lateness_s) - F.lit(lateness_s)
    warc_ts = F.timestamp_seconds(F.lit(1_700_000_000) + i + jitter)

    # deterministic pseudo-HTML: title (2 words) + body (4..15 words)
    words = F.array(*[F.lit(w) for w in _WORDS])
    nw = len(_WORDS)

    def word_at(salt: int, extra=None):
        key = i if extra is None else i * F.lit(131) + extra
        return F.element_at(words, (F.pmod(F.xxhash64(key, F.lit(salt), F.lit(seed)), F.lit(nw)) + 1).cast("int"))

    n_body = (_pm(i, 5, seed, 12) + 4).cast("int")
    body = F.array_join(
        F.transform(F.sequence(F.lit(1), n_body), lambda k: word_at(6, k)), " "
    )
    title = F.concat_ws(" ", word_at(7), word_at(8))
    paragraph = F.concat(F.lit("<p>"), body, F.lit("</p>"))
    if body_repeat > 1:
        paragraph = F.repeat(paragraph, body_repeat)
    html_str = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit('</title></head><body><h1 class="hd">'), title,
        F.lit("</h1>"), paragraph,
        F.lit("<p>page "), page, F.lit(" of d"), domain,
        F.lit("</p></body></html>"),
    )
    html = F.when(op == "delete", F.lit(None).cast("binary")).otherwise(
        F.encode(html_str, "UTF-8")
    )

    cols = [
        i.alias("event_seq"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
    ]
    if with_lang:
        langs = F.array(*[F.lit(x) for x in _LANGS])
        lang = F.when(
            op == "delete", F.lit(None).cast("string")
        ).otherwise(F.element_at(langs, (_pm(i, 9, seed, len(_LANGS)) + 1).cast("int")))
        cols.append(lang.alias("lang"))
    return rng.select(*cols)


def read_change_log(
    spark,
    path: str,
    *,
    target_splits: int | None = None,
    min_bytes: int = 1 << 20,
):
    """Read a materialized parquet change log with scan parallelism sized
    to the cluster, not to the file sizes.

    CDC logs compress hard (zstd on repetitive page bodies), so Spark's
    default file-packing (``spark.sql.files.maxPartitionBytes`` = 128 MB
    of *compressed* bytes) can fold a whole multi-GB-decoded log into a
    handful of splits — a 4-task scan stage starving a 32-core cluster
    (measured 28% wall on the 1M x 7 KB from-log replay at local[32]).
    This helper lists the log once (one FS call) and, ONLY when default
    packing would yield fewer splits than ``target_splits`` (default:
    ``defaultParallelism``), lowers ``maxPartitionBytes`` so the scan
    reaches that width. It never narrows below Spark's default: measured
    at local[4], over-splitting LOSES ~20% — every extra scan task pays
    python-UDF/Arrow setup in the downstream extraction stage — so the
    floor is "one wave of cores", not "many small splits". Splits are
    floored at per-file granularity by parquet row-group semantics, and
    batch replays filtering on ``event_seq`` prune non-matching splits
    via row-group stats in milliseconds.

    The conf is session-scoped by Spark's design; it is sized here for
    the log scan and is a sane general setting for sessions whose main
    input is this log.
    """
    jvm = spark.sparkContext._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    p = Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = [
        st.getLen()
        for st in fs.globStatus(Path(path, "*.parquet")) or []
        if st.isFile()
    ]
    if sizes:
        if target_splits is None:
            import os as _os

            waves = int(_os.environ.get("SPARK_GRAFT_SCAN_WAVES", "1"))
            target_splits = spark.sparkContext.defaultParallelism * max(waves, 1)
        default_max = 128 << 20
        open_cost = 4 << 20  # spark.sql.files.openCostInBytes default
        padded = sum(s + open_cost for s in sizes)  # packing-effective bytes
        est_default = max(1, int(padded // default_max))
        if est_default < target_splits:
            per_split = max(min_bytes, padded // max(target_splits, 1))
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(int(per_split)))
    return spark.read.parquet(path)
