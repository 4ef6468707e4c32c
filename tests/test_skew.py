"""Skew handling: hot-key detection sketch + salted repartition semantics
on a Zipf-skewed change log (north_rule: 'hash-on-url, salted for
hot-domain skew')."""

from __future__ import annotations

from pyspark.sql import functions as F

from epigraphdb_graph_spark.operators.skew import (
    detect_hot_keys,
    salted_repartition,
    with_salt,
)
from epigraphdb_graph_spark.sources.events import generate_change_events


def _skewed_events(spark, n=20_000):
    """Zipf s~1 over few domains -> domain 0 absorbs ~ half the traffic."""
    ev = generate_change_events(spark, n, seed=5, n_domains=50, pages_per_domain=4)
    return ev.withColumn(
        "domain", F.regexp_extract("url", r"https://(d\d+)\.", 1)
    )


def test_detect_hot_keys_finds_zipf_head(spark):
    ev = _skewed_events(spark)
    hot = detect_hot_keys(ev, "domain", sample_fraction=0.5, hot_multiplier=5.0)
    assert "d0" in hot
    # the Zipf tail must not be flagged
    assert len(hot) < 10


def test_with_salt_spreads_only_hot_keys(spark):
    ev = _skewed_events(spark)
    salted = with_salt(ev, "domain", n_salts=8, hot_keys=["d0"])
    dist = (
        salted.groupBy("domain")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .collect()
    )
    by_domain = {r["domain"]: r["n_salts"] for r in dist}
    assert by_domain["d0"] == 8              # hot key spread across salts
    cold = [v for k, v in by_domain.items() if k != "d0"]
    assert all(v == 1 for v in cold)         # cold keys untouched (salt 0)


def test_salted_repartition_balances_partitions(spark):
    """With one dominant key, plain hash partitioning puts ~half the rows
    in one partition; salting must spread the hot key."""
    ev = _skewed_events(spark)
    plain = ev.repartition(8, "domain")
    plain_sizes = [
        r["count"] for r in
        plain.groupBy(F.spark_partition_id().alias("p")).count().collect()
    ]
    hot = detect_hot_keys(ev, "domain", sample_fraction=1.0, hot_multiplier=3.0)
    salted = salted_repartition(ev, "domain", n_partitions=8, n_salts=8,
                                hot_keys=hot)
    salted_sizes = [
        r["count"] for r in
        salted.groupBy(F.spark_partition_id().alias("p")).count().collect()
    ]
    n = sum(plain_sizes)
    assert max(plain_sizes) > n * 0.3        # the skew is real
    assert max(salted_sizes) < max(plain_sizes) * 0.7   # and salting fixed it
    # correctness: salting only changes placement, never the row set
    assert sum(salted_sizes) == n


def test_two_phase_agg_over_salt_equals_direct(spark):
    """The canonical use: partial agg on (key, salt), final on key — result
    must equal the direct group-by (operators/skew.py docstring contract)."""
    ev = _skewed_events(spark)
    direct = {r["domain"]: r["n"] for r in
              ev.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    salted = with_salt(ev, "domain", n_salts=8, hot_keys=["d0"])
    partial = salted.groupBy("domain", "_salt").agg(F.count("*").alias("pn"))
    final = {r["domain"]: r["n"] for r in
             partial.groupBy("domain").agg(F.sum("pn").alias("n")).collect()}
    assert direct == final


def test_salted_join_equals_plain_join(spark):
    """Salted join must be result-identical to the plain join while
    spreading each hot key across n_salts sub-keys."""
    from epigraphdb_graph_spark.operators.skew import salted_join, with_salt

    # skewed left: key 'hot' dominates; right: small dim with dup rows
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [(f"k{i}", i) for i in range(50)],
        "k string, lv int")
    right = spark.createDataFrame(
        [("hot", "H1"), ("hot", "H2"), ("k1", "A"), ("k2", "B"), ("zz", "Z")],
        "k string, rv string")

    for how in ("inner", "left"):
        want = left.join(right, "k", how).toPandas() \
            .sort_values(["k", "lv", "rv"], na_position="last") \
            .reset_index(drop=True)
        got = salted_join(left, right, "k", hot_keys=["hot"], n_salts=8,
                          how=how).toPandas() \
            .sort_values(["k", "lv", "rv"], na_position="last") \
            .reset_index(drop=True)
        assert got.equals(want), f"{how} join mismatch"

    # the hot key really spreads: >1 distinct salt on the left side
    salts = (with_salt(left, "k", n_salts=8, hot_keys=["hot"])
             .filter(F.col("k") == "hot")
             .select("_salt").distinct().count())
    assert salts > 1
