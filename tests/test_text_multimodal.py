"""Text-analytics column functions + multimodal mapInPandas plumbing."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from epigraphdb_graph_spark.functions.multimodal import (
    _decode_image_stub,
    extract_features,
    synthesize_media,
)
from epigraphdb_graph_spark.functions.text import (
    bpe_token_count,
    punct_ratio,
    quality_score,
    rolling_fingerprints,
    stopword_ratio,
    ws_token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("it's 42 degrees, really!",)], "text string")
    got = df.select(
        ws_token_count("text").alias("ws"), bpe_token_count("text").alias("bpe")
    ).collect()
    assert got[0]["ws"] == 3 and got[0]["bpe"] == 3
    # it|'s|42|degrees|,|really|!  -> 7
    assert got[1]["ws"] == 4 and got[1]["bpe"] == 7


def test_ratios_and_quality(spark):
    prose = "the quick brown fox jumps over the lazy dog and runs to the hills " * 5
    noise = "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!! " * 10
    df = spark.createDataFrame([(1, prose), (2, noise)], "id long, text string")
    got = df.select(
        "id",
        punct_ratio("text").alias("punct"),
        stopword_ratio("text").alias("sw"),
        quality_score("text").alias("q"),
    ).toPandas().set_index("id")
    assert got.loc[1, "punct"] < 0.05 and got.loc[2, "punct"] > 0.3
    assert got.loc[1, "sw"] > 0.2 and got.loc[2, "sw"] == 0.0
    assert got.loc[1, "q"] > got.loc[2, "q"]
    short = spark.createDataFrame([("tiny",)], "text string")
    assert short.select(quality_score("text").alias("q")).first()["q"] == 0.0


def test_rolling_fingerprints_detect_shared_passage(spark):
    shared = " ".join(f"s{i}" for i in range(60))
    a = "intro words here " + shared + " trailing stuff"
    b = "completely different opening " + shared
    c = " ".join(f"u{i}" for i in range(80))
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "id long, text string")
    fp = df.select("id", rolling_fingerprints("text", window=8, keep_mod=4).alias("fp")) \
           .toPandas().set_index("id")["fp"]
    assert set(fp[1]) & set(fp[2]), "shared passage must share fingerprints"
    assert not (set(fp[1]) & set(fp[3]))


def test_multimodal_feature_extraction(spark):
    media = synthesize_media(spark, 200, seed=9)
    feats = extract_features(media, batch_rows=64)
    pdf = feats.toPandas()
    assert len(pdf) == 200
    assert set(pdf["kind"]) <= {"image", "audio", "video"}
    assert all(len(f) == 16 for f in pdf["feature"])
    # plumbing is deterministic end-to-end and matches the shared stub fn
    raw = media.select("id", "payload").toPandas().set_index("id")["payload"]
    for _, row in pdf.head(20).iterrows():
        assert list(row["feature"]) == _decode_image_stub(bytes(raw[row["id"]]))
    assert (pdf["n_bytes"] > 0).all()


def test_multimodal_schema_stable(spark):
    media = synthesize_media(spark, 10)
    feats = extract_features(media)
    assert [f.name for f in feats.schema.fields] == ["id", "kind", "n_bytes", "feature"]
