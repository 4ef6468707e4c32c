"""Embedding similarity search: brute-force cosine top-k + LSH scale path.

Reference analog: the trait-embedding pairwise cosine precompute
(source/get_gwas_nlp.py:86-120 — scipy pdist over all pairs on one node,
~15 min for 30k traits). At 10^8+ vectors all-pairs is impossible; the
engine provides:

- **cosine_topk**: brute-force scan against one (broadcast) query vector —
  the exact baseline; JVM-side higher-order functions, no UDF, no shuffle
  (scan + single top-k reduction).
- **rp_lsh_buckets / cosine_topk_lsh**: random-hyperplane (sign) LSH —
  vectors bucketed by an n-bit signature; a query probes only its bucket
  (optionally multi-probe neighbors by flipping low-margin bits). Planes
  are generated driver-side from a seeded RNG (deterministic) and shipped
  as array literals — executors do pure columnar math.
- **cosine_neardup_pairs**: all near-dup pairs above a cosine threshold,
  candidates restricted to same-bucket (the crossjoin never materializes
  globally, only within buckets).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(x):
    return F.sqrt(_dot(x, x))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs one query vector. Single scan; the only
    exchange is the final k-row reduction (orderBy+limit is optimized to
    TakeOrderedAndProject — no full sort materialized)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))).alias("cosine")
    return (
        df.select(id_col, cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def random_planes(dim: int, n_planes: int, *, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplane normals (driver-side; Gaussian so bucket
    collision probability is 1 - theta/pi per plane)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _signature(vec_col, planes: list[list[float]]):
    """n-bit sign signature as a long (bit p = 1 iff dot(v, plane_p) > 0)."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        bit = F.when(_dot(vec_col, arr) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + bit * F.lit(1 << p).cast("long")
    return sig


def lcg_planes_int(dim: int, n_planes: int) -> list[list[int]]:
    """Deterministic *integer* hyperplane normals in [-1024, 1023] from a
    pure-arithmetic LCG (no RNG object): plane[p][j] depends only on
    (p, j). Integer components + integer-quantized vectors make the sign
    test exact integer arithmetic — bit-identical in ANY engine
    (the cross-engine-reproducible LSH used by the q39 oracle). Uniform
    (not Gaussian) components still give a symmetric sign hash."""
    out = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            k = p * dim + j + 1
            m = (1103515245 * k + 12345) % 2147483648
            row.append((m % 2048) - 1024)
        out.append(row)
    return out


_QUANT = 1_000_000  # embedding quantization for the integer sign test


def int_signature(vec_col, planes: list[list[int]]):
    """Integer-exact sign signature: bit p = 1 iff
    sum_j floor(v[j] * 1e6) * plane[p][j] > 0. All int64 arithmetic after
    the (deterministic, cross-engine-identical) floor quantization — no
    float-summation-order hazard, so an external oracle recomputes the
    exact same buckets. Magnitude bound: |term| <= 1e6*1024, so dims up
    to ~10^6 stay within int64."""
    q = F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(_QUANT))).cast("long")
    )
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(int(w)).cast("long") for w in plane])
        dp = F.aggregate(
            F.zip_with(q, arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dp > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def int_signature_py(vec: list[float], planes: list[list[int]]) -> int:
    """Driver-side twin of :func:`int_signature` (for query vectors) —
    same floor-quantized integer arithmetic, guaranteed to agree."""
    import math

    sig = 0
    for p, plane in enumerate(planes):
        dp = sum(int(math.floor(v * _QUANT)) * w for v, w in zip(vec, plane))
        if dp > 0:
            sig |= 1 << p
    return sig


def rp_lsh_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Add ``_lsh_bucket`` (random-projection sign signature). Partitioning
    the table by this column co-locates similar vectors — the ANN index."""
    if dim is None:
        first = df.select(F.size(vec_col)).first()
        if first is None:
            raise ValueError("empty dataframe and no dim given")
        dim = first[0]
    planes = random_planes(dim, n_planes, seed=seed)
    return df.withColumn("_lsh_bucket", _signature(F.col(vec_col), planes))


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket matches the
    query's signature or differs in <= multiprobe_bits bits (multi-probe
    recovers most of the recall lost to boundary effects). At scale the
    bucketed table is pre-materialized & partitioned by bucket, so this
    probes a handful of partitions instead of scanning everything."""
    bucketed = rp_lsh_buckets(
        df, vec_col=vec_col, n_planes=n_planes, seed=seed, dim=len(query_vec)
    )
    planes = random_planes(len(query_vec), n_planes, seed=seed)
    qsig = 0
    for p, plane in enumerate(planes):
        dp = sum(a * b for a, b in zip(query_vec, plane))
        if dp > 0:
            qsig |= 1 << p
    cand = bucketed.filter(
        F.bit_count(F.col("_lsh_bucket").bitwiseXOR(F.lit(qsig))) <= multiprobe_bits
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def lcg_centroids(dim: int, k: int, *, scale: int = 500) -> list[list[int]]:
    """Deterministic *integer* IVF centroids from the same pure-arithmetic
    LCG family as :func:`lcg_planes_int` (salt 7 decorrelates them from
    the LSH planes): component in [-1024, 1023] * ``scale`` — pick scale
    so centroids span the quantized embedding range (|v|<=1 vectors
    quantize to +-10^6; scale 500 spans +-5.1*10^5). Integer centroids +
    floor-quantized vectors make assignment exact int64 arithmetic —
    bit-identical in any engine (the q58 oracle recomputes it)."""
    out = []
    for c in range(k):
        row = []
        for j in range(dim):
            m = (1103515245 * (c * dim + j + 7) + 12345) % 2147483648
            row.append(((m % 2048) - 1024) * scale)
        out.append(row)
    return out


def ivf_assign(
    df: DataFrame,
    centroids: list[list[int]],
    *,
    vec_col: str = "embedding",
    cell_col: str = "_ivf_cell",
) -> DataFrame:
    """Add the IVF cell id (nearest centroid by squared L2, ties to the
    lower cell id). One scan, pure JVM expressions, no shuffle — at scale
    the assigned table is written partitioned/clustered by cell so a
    query touches n_probe cells instead of everything (the IVF analog of
    the LSH bucket layout).

    The centroid matrix travels as DATA (a broadcast one-row cross join
    of ``array<array<long>>``), not as k*dim literal expressions: an
    8x64 literal tree made Catalyst analysis + codegen the dominant cost
    (~2.5s per plan compile) while this form is O(1) plan size — nested
    higher-order functions iterate the matrix at runtime. Per element,
    packed = dist * k + cell, so ``array_min`` is the (min dist, min
    cell) lexicographic winner — a deterministic argmin. Magnitude:
    dist <= dim * (2.1e6)^2; safe in int64 for dim <= ~10^6/k.

    Contract: every centroid must have the embedding dimension —
    ``zip_with`` null-pads a length mismatch, which nulls the whole
    distance and the cell id (surfacing as an unassignable row, not a
    wrong assignment)."""
    k = len(centroids)
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [([[int(w) for w in row] for row in centroids],)],
        "_ivf_cents array<array<long>>",
    )
    qcol = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(_QUANT))).cast("long"),
    )
    packed = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda c: F.aggregate(
            F.zip_with(
                F.col("_ivf_q"),
                F.element_at(F.col("_ivf_cents"), c + 1),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ) * k + c.cast("long"),
    )
    return (
        df.crossJoin(F.broadcast(cent_df))
        .withColumn("_ivf_q", qcol)
        .withColumn(cell_col, (F.array_min(packed) % k).cast("int"))
        .drop("_ivf_q", "_ivf_cents")
    )


def ivf_probe_cells(
    vec: list[float], centroids: list[list[int]], *, n_probe: int = 2
) -> list[int]:
    """Driver-side twin of :func:`ivf_assign`'s distance math for query
    vectors: the ``n_probe`` nearest cells, same floor-quantized integer
    arithmetic, guaranteed to agree with the executor-side assignment."""
    import math

    k = len(centroids)
    q = [int(math.floor(v * _QUANT)) for v in vec]
    packed = sorted(
        sum((a - b) * (a - b) for a, b in zip(q, cent)) * k + c
        for c, cent in enumerate(centroids)
    )
    return [p % k for p in packed[:n_probe]]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[int]],
    *,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k by cosine: score only vectors whose cell is
    among the query's ``n_probe`` nearest centroids. With the table
    pre-partitioned by cell this reads n_probe/k of the data; recall is
    tuned by n_probe exactly as in FAISS-style IVF-Flat."""
    cells = ivf_probe_cells(query_vec, centroids, n_probe=n_probe)
    cand = ivf_assign(df, centroids, vec_col=vec_col).filter(
        F.col("_ivf_cell").isin(cells))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def cosine_neardup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """Near-dup pairs (cosine >= threshold), candidate-restricted to
    same-LSH-bucket — the distributable form of the reference's all-pairs
    pdist. Lower n_planes => higher recall, bigger buckets.

    ``bucket_cap`` bounds the quadratic intra-bucket cost (the analog of
    operators/dedup.py's MinHash bucket cap): a dense cluster of k
    near-identical embeddings lands in ONE bucket and would emit O(k²)
    pairs on one reducer — 10^5 copies of a boilerplate page's embedding
    is 5·10^9 pairs. Buckets above the cap degrade to a
    connectivity-preserving star: every member is scored only against the
    bucket's min-id representative (k-1 pairs, O(k) per bucket), so a
    union-find/cluster consumer still sees one connected component per
    dup cluster. Pairs inside at-or-below-cap buckets are exhaustive, so
    ordinary near-dup recall is unaffected; ``bucket_cap=None`` disables
    the cap (exhaustive everywhere — only safe when no bucket is huge)."""
    b = rp_lsh_buckets(df, vec_col=vec_col, n_planes=n_planes, seed=seed)

    def _cos(lv, rv):
        return _dot(lv, rv) / (_norm(lv) * _norm(rv))

    def _pairs(left, right, extra_cond=None):
        cond = (F.col("l._lsh_bucket") == F.col("r._lsh_bucket")) & (
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        if extra_cond is not None:
            cond = cond & extra_cond
        cos = _cos(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
        return (
            left.alias("l").join(right.alias("r"), cond)
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                cos.alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    if bucket_cap is None:
        return _pairs(b, b)
    # occupancy + min-id representative per bucket in one map-side-
    # combinable agg; joined back on the same bucket key (one shuffle
    # partition chain, mirrors dedup.minhash_candidate_pairs)
    occ = b.groupBy("_lsh_bucket").agg(
        F.count("*").alias("_n"), F.min(id_col).alias("_rep"))
    annotated = b.join(occ, "_lsh_bucket")
    small = annotated.filter(F.col("_n") <= bucket_cap).drop("_n", "_rep")
    exhaustive = _pairs(small, small)
    # over-cap buckets: members score against the representative only.
    # The rep-vector relation is one row per over-cap bucket — tiny by
    # construction — so the join is a broadcast, never a shuffle.
    reps = (
        annotated.filter((F.col("_n") > bucket_cap) & (F.col(id_col) == F.col("_rep")))
        .select("_lsh_bucket", F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("_rep_vec"))
    )
    members = annotated.filter(
        (F.col("_n") > bucket_cap) & (F.col(id_col) != F.col("_rep")))
    star = (
        members.join(F.broadcast(reps), "_lsh_bucket")
        .select(
            "id_a",
            F.col(id_col).alias("id_b"),
            _cos(F.col("_rep_vec"), F.col(vec_col)).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return exhaustive.unionByName(star)
