"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; transforms
run as Arrow-batched functions over ``mapInPandas`` so payload bytes never
round-trip through Python row objects. The actual codec work (PIL/ffmpeg
et al.) is NOT available in this environment — the decode kernels are
stubbed behind ``_decode_image_stub`` (deterministic fake, clearly
marked), while everything Spark-side — schemas, batch iteration,
partition sizing, column pruning — is real and tested.

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
