"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; transforms
run as Arrow-batched functions over ``mapInPandas`` so payload bytes never
round-trip through Python row objects.

Two tiers of "decode" here:

- **Container/header probing is REAL**: :func:`parse_image_header` reads
  PNG IHDR / JPEG SOFn / GIF screen-descriptor bytes directly — format,
  width, height need no codec library, just the published file layouts
  (PNG RFC 2083 §11.2.2, JPEG ISO/IEC 10918-1 B.2.2, GIF89a §18).
  :func:`probe_media` runs it over Arrow batches; :func:`make_png` /
  :func:`make_jpeg` / :func:`make_gif` synthesize real byte streams
  (valid zlib IDAT for PNG) for tests and oracles.
- **Pixel decoding is STUBBED**: rasterizing/resampling needs PIL/
  libjpeg/ffmpeg, which this environment lacks — the feature kernel is
  ``_decode_image_stub`` (deterministic fake, clearly marked). Replace
  with a real decode+model call in production; the call sites, batching,
  schemas, and partition sizing do not change.

Schema convention (media table)::

    id: long, kind: string (image|audio|video), payload: binary,
    meta: struct<mime:string, width:int, height:int, duration_ms:long>
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    # double, not float: the stub contract is exact-match against the shared
    # python function (float32 round-tripping would break determinism tests)
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])

_FEATURE_DIM = 16

PROBE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])

# JPEG frame-header (SOFn) markers that carry dimensions — all variants
# except DHT/JPG/DAC which share the 0xC range but are not frames
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF})


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from raw image bytes — REAL parsing of the
    published container layouts, no codec library:

    - PNG: 8-byte signature, then the IHDR chunk is mandatory-first; width
      and height are big-endian u32 at offsets 16 and 20.
    - GIF: 'GIF87a'/'GIF89a', then the logical screen descriptor's
      little-endian u16 width/height at offsets 6 and 8.
    - JPEG: SOI then a marker-segment walk to the first SOFn frame header
      (height/width big-endian u16 at segment offsets +5/+7), skipping
      padding and standalone markers.

    Returns None for unrecognized/truncated payloads (the quarantine
    path, not an exception — malformed media must not poison a batch)."""
    if payload is None or len(payload) < 10:
        return None
    p = bytes(payload)
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        if len(p) >= 24 and p[12:16] == b"IHDR":
            return ("png",
                    int.from_bytes(p[16:20], "big"),
                    int.from_bytes(p[20:24], "big"))
        return None
    if p[:3] == b"GIF" and p[3:6] in (b"87a", b"89a"):
        return ("gif",
                int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"))
    if p[:2] == b"\xff\xd8":
        i = 2
        n = len(p)
        while i + 1 < n:
            if p[i] != 0xFF:
                return None  # lost sync: not a marker where one must be
            marker = p[i + 1]
            if marker == 0xFF:      # fill byte padding
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2              # standalone marker (TEM/RSTn/EOI/SOI)
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(p[i + 2:i + 4], "big")
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                return ("jpeg",
                        int.from_bytes(p[i + 7:i + 9], "big"),
                        int.from_bytes(p[i + 5:i + 7], "big"))
            i += 2 + seg_len
    return None


def parse_av_header(payload: bytes) -> tuple[str, int] | None:
    """(format, duration_ms) from raw audio/video container bytes — WAV
    (RIFF chunk walk: fmt's byte-rate + data chunk size) and MP4 (box walk
    to moov/mvhd: timescale + duration). Same REAL-parsing tier as
    :func:`parse_image_header`; codec payloads stay opaque."""
    if payload is None or len(payload) < 16:
        return None
    p = bytes(payload)
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        i, byte_rate, data_size = 12, None, None
        n = len(p)
        while i + 8 <= n:
            tag = p[i:i + 4]
            size = int.from_bytes(p[i + 4:i + 8], "little")
            if tag == b"fmt " and i + 16 + 12 <= n:
                byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
            elif tag == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return ("wav", data_size * 1000 // byte_rate)
        return None
    if p[4:8] == b"ftyp":
        # ISO BMFF box walk at the top level; mvhd is moov's first child
        # in every real muxer's output, so scan for it inside moov's span
        i, n = 0, len(p)
        while i + 8 <= n:
            size = int.from_bytes(p[i:i + 4], "big")
            tag = p[i + 4:i + 8]
            if size < 8:
                return None
            if tag == b"moov":
                j, end = i + 8, min(i + size, n)
                while j + 8 <= end:
                    bsize = int.from_bytes(p[j:j + 4], "big")
                    btag = p[j + 4:j + 8]
                    if bsize < 8:
                        return None
                    if btag == b"mvhd" and j + 8 + 24 <= n:
                        version = p[j + 8]
                        if version == 1:  # 64-bit times
                            ts = int.from_bytes(p[j + 28:j + 32], "big")
                            dur = int.from_bytes(p[j + 32:j + 40], "big")
                        else:
                            ts = int.from_bytes(p[j + 20:j + 24], "big")
                            dur = int.from_bytes(p[j + 24:j + 28], "big")
                        if ts == 0:
                            return None
                        return ("mp4", dur * 1000 // ts)
                    j += bsize
                return None
            i += size
    return None


def make_wav(sample_rate: int, n_samples: int, *, channels: int = 1,
             bits: int = 16) -> bytes:
    """A real, spec-valid PCM WAV of ``n_samples`` silence — stdlib only."""
    import struct

    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_mp4(duration_ms: int, *, timescale: int = 1000) -> bytes:
    """Minimal ISO BMFF stream: ftyp + moov{mvhd(v0)} with the given
    duration — a header-probe target, not a playable movie."""
    import struct

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    mvhd = (b"\x00\x00\x00\x00"                      # version 0 + flags
            + struct.pack(">II", 0, 0)               # ctime, mtime
            + struct.pack(">II", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80)                          # rate..next_track_id
    return (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + box(b"moov", box(b"mvhd", mvhd)))


def make_png(width: int, height: int) -> bytes:
    """A real, spec-valid grayscale PNG of the given dimensions (zlib
    IDAT of zero scanlines, correct CRCs) — stdlib only."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raster = (b"\x00" + b"\x00" * width) * height  # filter byte + pixels
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster, 1))
            + chunk(b"IEND", b""))


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG byte stream with a real SOF0 frame header carrying the
    dimensions (JFIF APP0 + SOF0 + EOI; entropy data omitted — a header
    probe target, not a renderable photo)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xd9")


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a header + logical screen descriptor + trailer."""
    import struct

    return (b"GIF89a" + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + b"\x3b")


def probe_media(media: DataFrame, *, batch_rows: int = 256) -> DataFrame:
    """Media table -> (id, format, width, height, n_bytes) via Arrow
    batches — real container probing (see :func:`parse_image_header`),
    unknown formats surface as nulls for the quarantine/audit path."""

    def probe_one(pl):
        img = parse_image_header(pl)
        if img is not None:
            return (img[0], img[1], img[2], None)
        av = parse_av_header(pl)
        if av is not None:
            return (av[0], None, None, av[1])
        return (None, None, None, None)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                parsed = chunk["payload"].map(probe_one)
                yield pd.DataFrame({
                    "id": chunk["id"],
                    "format": parsed.map(lambda r: r[0]),
                    "width": parsed.map(lambda r: r[1]),
                    "height": parsed.map(lambda r: r[2]),
                    "duration_ms": parsed.map(lambda r: r[3]),
                    "n_bytes": chunk["payload"].map(
                        lambda pl: len(pl) if pl is not None else 0),
                })

    return media.select("id", "payload").mapInPandas(fn, PROBE_SCHEMA)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB — no image libs in this container (would be PIL/turbojpeg).
    Deterministic fake 'embedding': byte-histogram moments of the payload.
    Exact IEEE int/int division, no rounding — so the values are
    recomputable bit-for-bit by any engine (q42's DuckDB oracle). Replace
    with a real decode+model call in production; the call site, batching,
    and schema do not change."""
    if payload is None:
        return None
    acc = [0] * _FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % _FEATURE_DIM] += b
    n = max(len(payload), 1)
    return [a / n for a in acc]


def extract_features(media: DataFrame, *, batch_rows: int = 256) -> DataFrame:
    """Media table -> feature table via mapInPandas (Arrow batches).

    ``batch_rows`` caps rows per pandas batch so a partition of large
    payloads doesn't materialize gigabytes in one Arrow chunk — the
    executor-memory knob for binary-heavy tables (pair with a smaller
    ``spark.sql.files.maxPartitionBytes`` when payloads are big)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                yield pd.DataFrame({
                    "id": chunk["id"],
                    "kind": chunk["kind"],
                    "n_bytes": chunk["payload"].map(
                        lambda p: len(p) if p is not None else 0),
                    "feature": chunk["payload"].map(_decode_image_stub),
                })

    return media.select("id", "kind", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def synthesize_media(spark, n: int, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = repeated hash bytes) for
    tests/benches — JVM-side generation, no Python loop."""
    i = F.col("id")
    h = F.xxhash64(i, F.lit(seed))
    payload = F.encode(
        F.concat_ws("", F.array_repeat(F.base64(F.encode(h.cast("string"), "UTF-8")),
                                       (F.pmod(h, F.lit(6)) + 2).cast("int"))),
        "UTF-8",
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(h, F.lit(3)) + 1).cast("int"),
    )
    return spark.range(n).select(
        i.alias("id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.pmod(h, F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(h, F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
