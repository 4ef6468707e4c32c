"""Multi-source consolidation — the reference's merge engine, Spark-first.

The reference consolidates N per-source tables of one node label with a
reduce of full-outer pandas merges on the index column, then repairs the
fallout: ``_source_x/_source_y`` columns re-joined with ';'
(merge_sources.py:169-179), conflicting property columns resolved
first-non-empty via a multiprocessing-parallel applymap
(merge_sources.py:69-116), stringified ints de-``.0``-ed
(merge_sources.py:119-128).

The Spark-first shape avoids the N-way join entirely:
``unionByName(allowMissingColumns) -> groupBy(key)`` with
- ``first(col, ignorenulls=True)`` per property in *priority order* (the
  union preserves per-source ordering via an explicit priority column —
  pandas merge order dependence made explicit and deterministic), and
- ``array_distinct(flatten(collect_list(_source)))`` for provenance.

One shuffle, no conflict-column repair, no string round-trips. At scale:
partial aggregation combines map-side; skew on a hot key collapses before
the exchange (same property as lww_dedup_agg).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOURCE_COL = "_source"
_PRIO = "_src_priority"


def consolidate_sources(
    sources: list[tuple[str, DataFrame]],
    key: str,
    *,
    source_col: str = SOURCE_COL,
) -> DataFrame:
    """Consolidate per-source tables into one row per ``key``.

    ``sources``: (source_name, df) in priority order — for a property
    present in several sources, the first non-null value in list order
    wins (the deterministic version of the reference's first-non-empty
    resolution, merge_sources.py:51-67). Provenance is collected into an
    ``ArrayType`` ``_source`` column (reference packs ';'-joined strings,
    writers.py:230-231 — we keep a real array).
    """
    if not sources:
        raise ValueError("no sources")
    tagged = [
        df.withColumn(source_col, F.array(F.lit(name)))
        .withColumn(_PRIO, F.lit(i))
        for i, (name, df) in enumerate(sources)
    ]
    unioned = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged
    )
    value_cols = [c for c in unioned.columns if c not in (key, source_col, _PRIO)]

    # first non-null by priority: min_by over (priority) among rows where
    # the property is non-null — expressed as min_by(struct, masked prio)
    aggs = [
        F.min_by(F.col(c), F.when(F.col(c).isNotNull(), F.col(_PRIO))).alias(c)
        for c in value_cols
    ] + [
        F.array_distinct(F.flatten(F.collect_list(source_col))).alias(source_col)
    ]
    return unioned.groupBy(key).agg(*aggs)
