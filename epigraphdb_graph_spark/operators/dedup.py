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
    """Distinct word n-gram shingles per doc (n=1 -> word set). Standard
    n-gram semantics: a doc with fewer than n tokens has NO n-shingles
    (explode of an empty array drops the doc) — no truncated final gram."""
    toks = F.split(F.col(text_col), r"\s+")
    if n == 1:
        sh = F.explode(toks)
    else:
        # sliding window of n tokens, joined with '\x1f'; empty index array
        # (not a clamped one) when size < n, else sequence() would count
        # DOWN to a negative stop and emit short grams
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
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
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(_id, sig: array<long>[n_hashes]) — sig[i] = min over shingles of
    xxhash64(shingle, i). One explode + one hash aggregation (map-side
    combinable; skew-immune). Pass ``shingles`` (a precomputed/
    checkpointed ``(_id, _sh)`` frame) to share one tokenization pass
    across pipeline stages instead of re-exploding the corpus."""
    sh = shingles if shingles is not None else _shingles(df, id_col, text_col, shingle_n)
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
    bucket_cap: int | None = 1024,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``n_bands`` bands of
    ``n_hashes/n_bands`` rows; docs sharing any band hash become a
    candidate pair (id_a < id_b). The join key is (band_id, band_hash) —
    bucket-local, so cost scales with bucket occupancy, not docs².

    ``bucket_cap`` bounds the quadratic intra-bucket cost: a bucket with
    occupancy k emits k(k-1)/2 pairs, and pathological buckets (an
    exact-dup cluster of 10^5 copies shares *every* band) would emit
    10^10 pairs per band. Buckets above the cap degrade to a
    connectivity-preserving star — every member pairs with the bucket's
    min id (k-1 pairs) — so downstream union-find/verify still sees one
    connected component per dup cluster, while per-bucket output drops
    from O(k²) to O(k). Buckets at or below the cap are exhaustive, so
    candidates for ordinary distinct near-dups are unaffected."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, n_hashes=n_hashes,
        shingle_n=shingle_n, shingles=shingles,
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
    if bucket_cap is None:
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
    # bucket occupancy + representative in one map-side-combinable agg;
    # the join back is on the same (band, bh) key -> one shuffle partition
    # chain, no extra exchange for the annotated side
    occ = bands.groupBy("band", "bh").agg(
        F.count("*").alias("_n"), F.min("_id").alias("_rep")
    )
    annotated = bands.join(occ, ["band", "bh"])
    small = annotated.filter(F.col("_n") <= bucket_cap)
    a, b = small.alias("a"), small.alias("b")
    exhaustive = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    # oversized buckets: star to the representative — a projection, no join
    star = (
        annotated.filter((F.col("_n") > bucket_cap) & (F.col("_id") != F.col("_rep")))
        .select(F.col("_rep").alias("id_a"), F.col("_id").alias("id_b"))
    )
    return exhaustive.unionByName(star).distinct()


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


def simhash_portable(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 16,
) -> DataFrame:
    """(_id, simhash) with a **cross-engine-reproducible** hash family:
    bit i of a token's hash is the high bit of hex digit i of md5(token)
    (md5 hex is identical in every engine, so a DuckDB/Trino oracle can
    recompute the exact fingerprint — the portability trick q34 uses for
    MinHash). Same weighted bit-sum aggregation as :func:`simhash64`;
    ``width`` <= 31 keeps the fingerprint in non-negative int range on
    every engine. Use simhash64 (xxhash64, one hash call per token) for
    production; this variant exists for verifiability."""
    if not 1 <= width <= 31:
        raise ValueError("portable simhash width must be in [1, 31]")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_t"),
    )
    weighted = toks.groupBy("_id", "_t").agg(F.count("*").alias("_w"))
    h = F.md5(F.col("_t"))
    bit_sums = [
        F.sum(
            F.when(F.substring(h, i + 1, 1).isin(*"89abcdef"), F.col("_w"))
            .otherwise(-F.col("_w"))
        ).alias(f"_b{i}")
        for i in range(width)
    ]
    agg = weighted.groupBy("_id").agg(*bit_sums)
    fp = None
    for i in range(width):
        term = F.when(F.col(f"_b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return agg.select("_id", fp.alias("simhash"))


def simhash_pairs_from_fp(
    fps: DataFrame,
    *,
    width: int = 64,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs within ``max_hamming`` bits of a precomputed
    ``(_id, simhash)`` frame, via the pigeonhole banding trick: split the
    ``width``-bit fingerprint into ``n_bands`` chunks — any pair within
    distance < n_bands must agree exactly on >=1 chunk, so bucket-join on
    (band, chunk) then verify hamming distance exactly with
    bit_count(xor). Requires n_bands > max_hamming; the candidate set is
    then provably a superset of all pairs within the bound (recall = 1,
    no probabilistic miss — unlike MinHash banding)."""
    if n_bands <= max_hamming:
        raise ValueError("need n_bands > max_hamming for pigeonhole completeness")
    cw = width // n_bands
    chunks = fps.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * cw)
                .bitwiseAND(F.lit((1 << cw) - 1)).alias("chunk"),
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


def simhash_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """64-bit xxhash64 SimHash near-dup pairs within ``max_hamming`` bits
    (see :func:`simhash_pairs_from_fp` for the banding guarantee)."""
    fps = simhash64(df, id_col=id_col, text_col=text_col)
    return simhash_pairs_from_fp(
        fps, width=64, max_hamming=max_hamming, n_bands=n_bands
    )


def jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    shingle_n: int = 1,
    max_token_df: int | None = None,
    share_scan: bool = False,
) -> DataFrame:
    """Exact word-set Jaccard >= threshold via token equi-join (shuffle on
    token). Used standalone at moderate scale or as the verify stage after
    minhash_candidate_pairs.

    ``max_token_df`` is the hot-token skew guard for corpus scale: a raw
    token equi-join makes every document pair sharing "the" collide —
    O(posting_list²) pairs on one reducer per stopword. With the cap set,
    **candidate pairs are generated only from tokens whose document
    frequency is <= the cap** (per rare token at most cap·(cap-1)/2 pairs
    — bounded, skew-immune), and each candidate's Jaccard is then computed
    **exactly over the full token sets** (hot tokens included) by a
    per-candidate intersection pass. Values are exact; completeness is
    "every pair sharing at least one token with DF <= cap" — the standard
    near-dup contract (a pair overlapping *only* in ubiquitous stopwords is
    not a near-dup worth finding). Choosing cap >= the corpus doc count
    provably disables the filter (DF can never exceed it).

    ``share_scan=True`` materializes the tokenized ``(_id, token)``
    relation once and shares it across the 4-8 downstream consumers;
    without it every consumer re-scans and re-tokenizes the corpus.
    **Opt-in** (off by default) because it is an eager localCheckpoint:
    it runs a job at *call* time (even if the result is never executed)
    and pins the token relation in executor storage (lineage truncated;
    lost on executor failure) — side effects a plan-builder caller must
    ask for, not inherit. At extreme scale prefer precomputing shingles
    into a lake table and passing them via the minhash-style ``shingles``
    parameter pattern — same idea, durable medium.
    """
    words = _shingles(df, id_col, text_col, shingle_n)
    if share_scan:
        words = words.localCheckpoint(eager=True)
    sizes = words.groupBy("_id").agg(F.count("*").alias("n"))
    if max_token_df is None:
        a, b = words.alias("a"), words.alias("b")
        inter = (
            a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count("*").alias("n_common"))
        )
    else:
        # 1. rare tokens (DF <= cap): map-side-combinable DF agg, then a
        #    same-key join back — the candidate join's per-token fan-out is
        #    bounded by the cap, so no stopword straggler reducer exists
        tok_df = words.groupBy("_sh").agg(F.count("*").alias("_df"))
        rare = words.join(
            tok_df.filter(F.col("_df") <= max_token_df).select("_sh"), "_sh"
        )
        a, b = rare.alias("a"), rare.alias("b")
        cand = (
            a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
        # 2. exact intersection for candidates over the FULL token sets:
        #    fan candidate pairs out over id_a's tokens (O(|A|) per pair),
        #    then semi-join against id_b's tokens on (id, token)
        wa = words.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
        fan = cand.join(wa, "id_a")
        wb = words.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sha"))
        inter = (
            fan.join(wb, ["id_b", "_sha"], "left_semi")
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    j = (
        inter.join(sa, F.col("sa._id") == F.col("id_a"))
        .join(sb, F.col("sb._id") == F.col("id_b"))
        .select(
            "id_a", "id_b", "n_common",
            (F.col("sa.n") + F.col("sb.n") - F.col("n_common")).alias("n_union"),
            (F.col("n_common") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")))
            .alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= min_jaccard)
