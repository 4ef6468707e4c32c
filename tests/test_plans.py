"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan — pushdown to the parquet scan, broadcast of
dim sides, partial (map-side) aggregation, codegen, column pruning.
A regression here is a silent 10-100x at scale even while results stay
correct, so it's tested like correctness."""

from __future__ import annotations

import pytest

import __spark_entry__ as em


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def qmap():
    return em.queries()


def test_filter_pushdown_to_scan(spark, sf_dir, qmap):
    plan = _plan(qmap["q02_filter_project"](spark, sf_dir))
    assert "PushedFilters:" in plan
    # both predicates reach the parquet reader
    assert "GreaterThanOrEqual(l_quantity,45" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning_reads_only_needed(spark, sf_dir, qmap):
    plan = _plan(qmap["q02_filter_project"](spark, sf_dir))
    # ReadSchema must not include untouched wide columns
    seg = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_comment" not in seg and "l_shipinstruct" not in seg


def test_dim_join_broadcasts(spark, sf_dir, qmap):
    plan = _plan(qmap["q03_join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    plan26 = _plan(qmap["q26_multi_join_star"](spark, sf_dir))
    assert plan26.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan26


def test_partial_aggregation_present(spark, sf_dir, qmap):
    """Partial+final hash agg: map-side combine is the skew defense for
    hot keys (SURVEY §2.5 note); codegen spans confirmed in simple mode."""
    df = qmap["q01_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_lww_agg_partial_combines_before_shuffle(spark):
    """lww_dedup_agg's skew defense: partial max_by combines per map task
    BEFORE the exchange, so a hot key contributes one row per task to the
    shuffle — never a Window (which shuffles every raw row to one reducer).
    (max_by over a struct with binary payload lowers to SortAggregate —
    local sort, but the combine still happens; that's the property that
    matters for skew.)"""
    from epigraphdb_graph_spark.operators.lww import lww_dedup_agg
    from epigraphdb_graph_spark.sources.events import generate_change_events

    ev = generate_change_events(spark, 100, seed=1)
    import re

    plan = _plan(lww_dedup_agg(ev))
    assert "partial_max_by" in plan      # map-side combine exists
    assert "Window" not in plan
    # single post-combine shuffle (formatted mode lists each node once in
    # the tree and once in the details -> count detail headers)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_no_cartesian_in_lsh_candidates(spark, sf_dir, qmap):
    """LSH candidate generation must join on bucket keys — a cartesian
    product here means the operator silently degenerated to all-pairs."""
    for q in ("q28_minhash_lsh_pairs", "q29_simhash_pairs"):
        plan = _plan(qmap[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_extraction_udf_is_arrow(spark, sf_dir, qmap):
    """The html->text stage must run as an Arrow-vectorized python eval,
    never row-at-a-time BatchEvalPython (input_hint: no per-row Python)."""
    plan = _plan(qmap["q40_extraction_udf"](spark, sf_dir))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """§4 physical execution: two tables bucketed on the join key
    (registry.ddl_for's CLUSTERED BY spec) join with ZERO exchanges —
    the co-location pattern that makes repeated big-table joins viable
    at 100 TB (shuffle once at write time, never again at read)."""
    import re

    from pyspark.sql import functions as F

    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1"))
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2"))
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, "k").sortBy("k")
         .option("path", str(tmp_path / name)).saveAsTable(name))
    try:
        # hint forces SMJ (the demo tables are small enough to broadcast,
        # which would also be shuffle-free but isn't the pattern under test)
        j = spark.table("bkt_left").hint("merge").join(
            spark.table("bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert j.count() == 5_000
    finally:
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
