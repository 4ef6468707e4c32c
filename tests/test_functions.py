"""Extraction byte-identity + LWW strategy equivalence + contract checks."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from epigraphdb_graph_spark.functions.extract import (
    extract_text,
    extract_text_udf,
    guess_lang,
    guess_lang_udf,
)
from epigraphdb_graph_spark.operators.lww import lww_dedup_agg, lww_dedup_window
from epigraphdb_graph_spark.operators.skew import (
    detect_hot_keys,
    salted_repartition,
)
from epigraphdb_graph_spark.schema import (
    CHANGE_EVENT_SCHEMA,
    ContractError,
    TableContract,
    check_contract,
)
from epigraphdb_graph_spark.sources.events import generate_change_events


def test_extract_text_pure_fn():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body><!-- c --><p>Hello &amp; "
        b"world</p>\n<div>tab\there</div></body></html>"
    )
    assert extract_text(html) == "T Hello & world tab here"
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    # non-utf8 bytes decode deterministically with replacement
    assert extract_text(b"<p>\xff\xfe</p>") == "��"


def test_extract_udf_byte_identical_vs_oracle(spark):
    """input_hint invariant: byte-identical extracted text per url — the UDF
    and the row-wise oracle share one function object."""
    events = generate_change_events(spark, 800, seed=7).filter("op != 'delete'")
    got = events.select("url", "html", extract_text_udf("html").alias("text")).toPandas()
    want = got["html"].map(lambda b: extract_text(bytes(b)))
    assert list(got["text"]) == list(want)
    assert got["text"].map(lambda s: isinstance(s, str)).all()


def test_session_scoped_udf_rebinds_on_context_change(spark):
    """The cached _judf must be keyed on context IDENTITY (weakref), not
    id(sc): CPython reuses object ids after GC, so a new SparkContext can
    alias a collected one's id and keep a stale _judf bound to the dead
    accumulator server. A dead weakref (old context collected) and a
    different live object must BOTH force a rewrap; the same live context
    must NOT."""
    import gc
    import weakref

    from epigraphdb_graph_spark.functions.extract import (
        _extract_text_series,
        _SessionScopedPandasUDF,
    )

    u = _SessionScopedPandasUDF(_extract_text_series, T.StringType())
    col1 = u(F.col("html"))
    cached = u._udf
    assert u._ctx_ref() is spark.sparkContext  # bound to the live context
    assert col1 is not None

    # same live context -> no rewrap (the one-time-wrap economics)
    u(F.col("html"))
    assert u._udf is cached

    # simulate "creating context was collected, id possibly reused":
    # a dead weakref is the post-GC state regardless of id aliasing
    class _Ephemeral:
        __slots__ = ("__weakref__",)

    e = _Ephemeral()
    u._ctx_ref = weakref.ref(e)
    del e
    gc.collect()
    assert u._ctx_ref() is None  # dead, as after a real context GC
    u(F.col("html"))
    assert u._ctx_ref() is spark.sparkContext  # rebound to the live context

    # different LIVE object (old context alive-but-stopped while a new one
    # is active — the `is` comparison, never id()) -> rewrap too
    keeper = _Ephemeral()
    u._ctx_ref = weakref.ref(keeper)
    u._udf = cached
    u(F.col("html"))
    assert u._ctx_ref() is spark.sparkContext


def test_guess_lang(spark):
    assert guess_lang("the cat and the hat is of note") == "en"
    assert guess_lang("el que de la los") == "es"
    assert guess_lang("zzz qqq") == "und"
    pdf = pd.DataFrame({"t": ["the and of", "der und das", None]})
    out = spark.createDataFrame(pdf).select(guess_lang_udf("t").alias("g")).collect()
    assert [r["g"] for r in out] == ["en", "de", None]


def test_lww_agg_equals_window(spark):
    """The skew-resistant max_by aggregation and the classic window form
    must produce identical winners (total order via unique event_seq)."""
    events = generate_change_events(spark, 3000, seed=3)
    a = lww_dedup_agg(events).orderBy("url").toPandas()
    b = lww_dedup_window(events).orderBy("url").toPandas()
    assert list(a["url"]) == list(b["url"])
    assert list(a["event_seq"]) == list(b["event_seq"])


def test_lww_preserves_columns_and_one_row_per_key(spark):
    events = generate_change_events(spark, 2000, seed=5, with_lang=True)
    out = lww_dedup_agg(events)
    assert out.columns == events.columns
    assert out.groupBy("url").count().filter("count > 1").count() == 0


def test_skew_detection_and_salting(spark):
    events = generate_change_events(spark, 20000, seed=11, n_domains=50)
    dom = events.withColumn(
        "domain", F.regexp_extract("url", r"https://(d\d+)\.", 1)
    )
    hot = detect_hot_keys(dom, "domain", sample_fraction=0.5, hot_multiplier=3.0)
    # Zipf: d0 must be the hottest domain
    assert "d0" in hot
    salted = salted_repartition(dom, "domain", n_partitions=16, hot_keys=hot, n_salts=8)
    assert salted.count() == 20000
    assert "_salt" not in salted.columns


def test_contract_checks(spark):
    contract = TableContract(
        name="change_events",
        schema=CHANGE_EVENT_SCHEMA,
        key="event_seq",
        required=["event_seq", "op", "url", "warc_ts"],
    )
    events = generate_change_events(spark, 200, seed=1)
    ok = check_contract(events, contract)
    assert ok.columns == [f.name for f in CHANGE_EVENT_SCHEMA.fields]

    with pytest.raises(ContractError, match="missing required"):
        check_contract(events.drop("op"), contract)
    with pytest.raises(ContractError, match="undeclared"):
        check_contract(events.withColumn("extra", F.lit(1)), contract)
    with pytest.raises(ContractError, match="duplicate keys"):
        check_contract(events.unionAll(events), contract)


def test_generator_deterministic(spark):
    a = generate_change_events(spark, 300, seed=42).toPandas()
    b = generate_change_events(spark, 300, seed=42).toPandas()
    pd.testing.assert_frame_equal(a, b)
    c = generate_change_events(spark, 300, seed=43).toPandas()
    assert not a["url"].equals(c["url"])


def test_url_parts_and_canonicalization(spark):
    from epigraphdb_graph_spark.functions.urls import with_url_parts

    rows = [
        ("https://a.example.org/p/1/x.html?utm_source=f&ref=2&utm_campaign=c",),
        ("https://b.example.org/q?utm_source=f",),
        ("https://c.example.org/",),
        ("http://d.example.org/deep/n/est/ed?id=9",),
    ]
    out = {
        r["url"]: r
        for r in with_url_parts(
            spark.createDataFrame(rows, "url string")
        ).collect()
    }
    r = out[rows[0][0]]
    assert (r["host"], r["depth"]) == ("a.example.org", 3)
    assert r["canonical"] == "a.example.org/p/1/x.html?ref=2"
    # query entirely consumed by tracking params -> dropped, no dangling '?'
    assert out[rows[1][0]]["canonical"] == "b.example.org/q"
    # no query at all
    assert out[rows[2][0]]["canonical"] == "c.example.org/"
    assert out[rows[2][0]]["depth"] == 0
    # scheme is dropped; non-tracking query survives verbatim
    assert out[rows[3][0]]["canonical"] == "d.example.org/deep/n/est/ed?id=9"
    assert out[rows[3][0]]["depth"] == 4
