"""As-of (point-in-time) join — an operator Spark's join zoo lacks.

For each left row, attach the single most recent right row whose
timestamp is <= the left row's timestamp, per key (the "backward" as-of
of kdb/pandas/QuestDB/DuckDB). The reference pipeline's analog is its
"latest snapshot wins" per-key consolidation (merge_sources.py sort+head
— the same top-1-per-group shape as operators/lww.py), generalized to a
time-aligned lookup between two tables.

Scale shape — why NOT a range join: the naive formulation
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` explodes to O(|matches|)
per key before the per-left-row max is taken (a hot key with 10^5 right
rows multiplies every left row by 10^5), and Spark plans inequality
joins as broadcast-nested-loop when one side is small or sort-merge with
a residual filter otherwise. Instead, the classic streaming-merge form:

1. union both sides into one stream tagged (0=right, 1=left), with only
   the right side carrying payload columns (left rows carry nulls);
2. one hash exchange on the key + one per-partition sort on
   (ts, tag, seq) — rights sort before lefts at equal ts, so ``<=``
   semantics fall out of the order;
3. ``last(payload, ignorenulls=True)`` over the running window fills
   each left row with the latest preceding right payload;
4. keep the left rows.

Cost: ONE shuffle of |L| + |R| rows and a partition-local sort — the
same price as the sort-merge join Spark would plan for an equi-join,
with no multiplication. Skew follows the key distribution exactly like
any keyed window; salt upstream if one key dominates both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_seq: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join (latest right row with ts <= left ts, per key).

    Returns every left row (left-outer semantics: no preceding right row
    -> null payload) plus the matched right payload columns renamed with
    ``suffix``. ``right_seq`` breaks ties among right rows sharing a
    timestamp (highest seq wins — the LWW convention); without it, equal-
    timestamp winners are nondeterministic, exactly as in pandas
    merge_asof.
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns
               if c not in keys and c != right_ts and c != right_seq]
    if not payload:
        return left
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    # Payload travels as ONE struct so last(ignorenulls) picks the whole
    # winning right ROW: per-column last() would backfill a legitimately
    # NULL field of the true as-of match from an OLDER right row — a
    # mixed old/new output pandas merge_asof / DuckDB ASOF never produce.
    pay_t = T.StructType([T.StructField(c, rtypes[c]) for c in payload])

    seq = (F.col(right_seq).cast("long") if right_seq is not None
           else F.lit(0).cast("long"))
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        seq.alias("_aseq"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_apay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        F.lit(0).cast("long").alias("_aseq"),
        F.lit(None).cast(pay_t).alias("_apay"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    merged = r2.unionByName(l2)
    # rights before lefts at equal ts (tag 0 < 1) => inclusive <= matching;
    # among equal-ts rights the highest _aseq is the last non-null seen
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_tag", "_aseq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "_tag",
        *left.columns,
        F.last("_apay", ignorenulls=True).over(w).alias("_apay"),
    )
    return filled.filter(F.col("_tag") == 1).select(
        *left.columns,
        *[F.col("_apay")[c].alias(c + suffix) for c in payload],
    )
