"""Text-analytics column functions + multimodal mapInPandas plumbing."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from epigraphdb_graph_spark.functions.multimodal import (
    _decode_image_stub,
    extract_features,
    make_gif,
    make_jpeg,
    make_png,
    parse_image_header,
    probe_media,
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


def test_parse_image_header_round_trips_all_formats():
    """Real container parsing: dimensions recovered from the bytes alone
    for every builder, across edge sizes."""
    for w, h in ((1, 1), (16, 480), (641, 16), (1920, 1080), (65535, 3)):
        assert parse_image_header(make_png(w, h)) == ("png", w, h)
        assert parse_image_header(make_jpeg(w, h)) == ("jpeg", w, h)
        if w <= 65535 and h <= 65535:
            assert parse_image_header(make_gif(w, h)) == ("gif", w, h)


def test_parse_image_header_png_is_spec_valid():
    """The synthesized PNG is not just parser-compatible: its chunk CRCs
    and zlib IDAT verify independently."""
    import struct
    import zlib

    p = make_png(23, 7)
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    i, chunks = 8, []
    while i < len(p):
        (length,) = struct.unpack(">I", p[i:i + 4])
        tag = p[i + 4:i + 8]
        body = p[i + 8:i + 8 + length]
        (crc,) = struct.unpack(">I", p[i + 8 + length:i + 12 + length])
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
        chunks.append((tag, body))
        i += 12 + length
    assert [t for t, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    raster = zlib.decompress(dict(chunks)[b"IDAT"])
    assert len(raster) == (23 + 1) * 7  # filter byte + pixels per scanline


def test_parse_image_header_jpeg_skips_leading_segments():
    """The SOFn walk must skip APPn/COM/DQT segments before the frame."""
    img = make_jpeg(300, 200)
    # splice an extra COM segment after APP0 (SOI 2 + APP0 marker 2 +
    # APP0 length-field+body 16 = offset 20)
    com = b"\xff\xfe\x00\x0chello jpeg"
    spliced = img[:20] + com + img[20:]
    assert parse_image_header(spliced) == ("jpeg", 300, 200)


def test_parse_image_header_rejects_garbage_and_truncation():
    assert parse_image_header(None) is None
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(make_png(5, 5)[:15]) is None   # truncated IHDR
    assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00\x00\x00\x00\x00") is None


def test_probe_media_over_spark(spark):
    """Arrow-batched probe: mixed real formats + one garbage payload ->
    typed columns with nulls for the unparseable row."""
    rows = [
        (0, make_png(64, 32)),
        (1, make_jpeg(640, 480)),
        (2, make_gif(13, 11)),
        (3, b"\x00\x01garbage"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in probe_media(df, batch_rows=2).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 64, 32)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 13, 11)
    assert got[3]["format"] is None and got[3]["width"] is None
    assert got[3]["n_bytes"] == 9


def test_parse_av_header_wav_and_mp4():
    from epigraphdb_graph_spark.functions.multimodal import (
        make_mp4, make_wav, parse_av_header)

    # WAV: duration = data bytes / byte-rate, exact at sample multiples
    assert parse_av_header(make_wav(8000, 8000)) == ("wav", 1000)
    assert parse_av_header(make_wav(44100, 44100 * 3,
                                    channels=2)) == ("wav", 3000)
    # odd data size exercises the word-alignment skip
    w = make_wav(8000, 1001)
    assert parse_av_header(w) == ("wav", 1001 * 2 * 1000 // 16000)
    # MP4 mvhd v0
    assert parse_av_header(make_mp4(65_432)) == ("mp4", 65_432)
    assert parse_av_header(make_mp4(250, timescale=90000)) == ("mp4", 250)
    # garbage / truncation
    assert parse_av_header(b"RIFFxxxxNOPE") is None
    assert parse_av_header(make_mp4(1000)[:12]) is None
    assert parse_av_header(None) is None


def test_probe_media_covers_all_five_formats(spark):
    from epigraphdb_graph_spark.functions.multimodal import make_mp4, make_wav

    rows = [
        (0, make_png(8, 9)),
        (1, make_wav(8000, 16000)),
        (2, make_mp4(1234)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in probe_media(df).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["duration_ms"]) == ("png", 8, None)
    assert (got[1]["format"], got[1]["duration_ms"]) == ("wav", 2000)
    assert (got[2]["format"], got[2]["duration_ms"]) == ("mp4", 1234)
