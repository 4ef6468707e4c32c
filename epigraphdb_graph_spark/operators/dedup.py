"""Document deduplication at scale: exact, MinHash-LSH, SimHash, Jaccard.

Training-data-pipeline operators over a ``documents``-shaped table
(id, text). The reference's only dedup is unique-key enforcement
(utils/qc.py:74-84) and per-key consolidation (merge_sources.py); these
operators generalize to *content* dedup, designed for the 100 TB path:

- **exact_dedup**: one shuffle on a 64-bit content hash; no sort.
- **minhash LSH**: shingle -> K minhashes -> B bands; candidate pairs
  come from a self-join on (band_id, band_hash) buckets — shuffle is on
  band buckets, never an all-pairs crossjoin. O(docs x K) + bucket join.
- **simhash64**: 64 weighted bit-sums per doc (single hash aggregation,
  map-side combinable); near-dups are pairs within hamming distance d on
  the fingerprint — candidates again via banded buckets of the fingerprint.
- **jaccard_pairs**: exact word-set Jaccard via explode + equi-join on
  token (shuffle on token), for verifying LSH candidates.

All hashes are xxhash64-based JVM expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one deterministic representative (min id) per exact content.
    Single hash-shuffle on the 64-bit digest; collisions are acceptable
    for dedup (or verify with a follow-up equality check on text)."""
    return (
        df.withColumn("_h", F.xxhash64(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("r"))
        .select("r.*")
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per doc (n=1 -> word set)."""
    toks = F.split(F.col(text_col), r"\s+")
    if n == 1:
        sh = F.explode(toks)
    else:
        # sliding window of n tokens, joined with '\x1f'
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        sh = F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), "\x1f"))
        )
    return df.select(F.col(id_col).alias("_id"), sh.alias("_sh")).distinct()


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_n: int = 1,
) -> DataFrame:
    """(_id, sig: array<long>[n_hashes]) — sig[i] = min over shingles of
    xxhash64(shingle, i). One explode + one hash aggregation (map-side
    combinable; skew-immune)."""
    sh = _shingles(df, id_col, text_col, shingle_n)
    mins = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"_m{i}")
        for i in range(n_hashes)
    ]
    agg = sh.groupBy("_id").agg(*mins)
    return agg.select(
        "_id", F.array(*[F.col(f"_m{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_n: int = 1,
) -> DataFrame:
    """LSH banding: split each signature into ``n_bands`` bands of
    ``n_hashes/n_bands`` rows; docs sharing any band hash become a
    candidate pair (id_a < id_b). The join key is (band_id, band_hash) —
    bucket-local, so cost scales with bucket occupancy, not docs²."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, n_hashes=n_hashes, shingle_n=shingle_n
    )
    bands = sigs.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]).alias("bh"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def simhash64(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(_id, simhash: long) 64-bit SimHash: per token-hash bit, sum +w/-w
    (w = token frequency); fingerprint bit i is 1 iff the sum > 0."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_t"),
    )
    weighted = toks.groupBy("_id", "_t").agg(F.count("*").alias("_w"))
    h = F.xxhash64(F.col("_t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("_w"))
            .otherwise(-F.col("_w"))
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    agg = weighted.groupBy("_id").agg(*bit_sums)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else bit * F.lit(-(1 << 63))
        fp = term if fp is None else fp + term
    return agg.select("_id", fp.alias("simhash"))


def simhash_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs within ``max_hamming`` bits, via the pigeonhole
    banding trick: split the 64-bit fingerprint into ``n_bands`` chunks —
    any pair within distance < n_bands must agree exactly on >=1 chunk, so
    bucket-join on (band, chunk) then verify hamming distance exactly
    with bit_count(xor). Requires n_bands > max_hamming."""
    if n_bands <= max_hamming:
        raise ValueError("need n_bands > max_hamming for pigeonhole completeness")
    fps = simhash64(df, id_col=id_col, text_col=text_col)
    width = 64 // n_bands
    chunks = fps.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
            )
            for b in range(n_bands)
        ])).alias("c"),
    ).select("_id", "simhash", "c.band", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact word-set Jaccard >= threshold via token equi-join (shuffle on
    token). Used standalone at moderate scale or as the verify stage after
    minhash_candidate_pairs."""
    words = _shingles(df, id_col, text_col, shingle_n)
    sizes = words.groupBy("_id").agg(F.count("*").alias("n"))
    a, b = words.alias("a"), words.alias("b")
    inter = (
        a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    j = (
        inter.join(sa, F.col("sa._id") == F.col("id_a"))
        .join(sb, F.col("sb._id") == F.col("id_b"))
        .select(
            "id_a", "id_b", "n_common",
            (F.col("n_common") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")))
            .alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= min_jaccard)
