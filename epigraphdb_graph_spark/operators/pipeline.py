"""Composed training-data cleaning pipeline: quality -> exact-dedup ->
near-dedup.

The training-data story the individual operators exist for, composed the
way a 100 TB corpus actually gets cleaned (the C4/CCNet-style recipe):

1. **quality gate** — cheap columnar predicates first (length, token
   count): pure whole-stage-codegen filters prune the corpus before any
   expensive stage runs (functions/text.py for richer scores);
2. **exact dedup** — one hash shuffle on the content digest
   (operators/dedup.exact_dedup), deterministic min-id representative;
3. **near-dup removal** — MinHash-LSH banded candidates (bucket joins,
   never all-pairs) + exact-Jaccard verify, then the *greedy-by-id*
   rule: drop every doc that has a verified near-dup with a smaller id.
   Non-recursive by design — deterministic, one anti-join, and
   SQL-expressible so the whole pipeline stays oracle-checkable
   (a chained/union-find variant keeps slightly more docs but needs an
   iterative connected-components pass; the greedy rule is the standard
   one-shot approximation).

Each stage strictly shrinks the data the next stage sees, and every
shuffle key is content-derived (digest / band hash / token) — no skew by
construction except hot bands/tokens, which the underlying operators cap
(bucket_cap, max_token_df).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup, minhash_candidate_pairs


def clean_corpus(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 100,
    min_tokens: int = 20,
    near_dup_jaccard: float = 0.8,
    n_hashes: int = 32,
    n_bands: int = 16,
    max_token_df: int | None = None,
) -> DataFrame:
    """Return the cleaned corpus (schema preserved). See module doc."""
    # 1. quality gate — codegen-only predicates
    gated = df.filter(
        (F.length(text_col) >= min_chars)
        & (F.size(F.split(F.col(text_col), r"\s+")) >= min_tokens)
    )
    # 2. exact dedup — min-id representative per identical content
    exact = exact_dedup(gated, text_col=text_col, id_col=id_col)
    # 3. near-dup candidates (banded LSH) -> exact Jaccard verify.
    # bucket_cap=None: the cap's over-cap star fallback only preserves
    # *connectivity* (pairs to the bucket's min-id representative), which
    # is sound for union-find consumers but NOT for the greedy direct-pair
    # rule below — two near-dups in an over-cap bucket whose Jaccard to
    # the representative is sub-threshold would both survive. Exhaustive
    # intra-bucket pairs keep the greedy rule exact; occupancy is already
    # bounded in practice by stages 1-2 (exact dup clusters — the
    # pathological bucket filler — are gone before LSH runs). A capped +
    # connected-components variant is the escape hatch if a corpus still
    # produces mega-buckets of *distinct* near-identical docs.
    cand = minhash_candidate_pairs(
        exact, id_col=id_col, text_col=text_col,
        n_hashes=n_hashes, n_bands=n_bands, bucket_cap=None,
    )
    words = exact.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_w"),
    ).distinct()
    if max_token_df is not None:
        tok_df = words.groupBy("_w").agg(F.count("*").alias("_df"))
        words = words.join(
            tok_df.filter(F.col("_df") <= max_token_df).select("_w"), "_w")
    sizes = words.groupBy("_id").agg(F.count("*").alias("_n"))
    wa = words.select(F.col("_id").alias("id_a"), "_w")
    wb = words.select(F.col("_id").alias("id_b"), "_w")
    inter = (
        cand.join(wa, "id_a").join(wb, ["id_b", "_w"], "left_semi")
        .groupBy("id_a", "id_b").agg(F.count("*").alias("_c"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    # integer milli-threshold: c/union >= j  <=>  1000c >= 1000j * union —
    # exact integer arithmetic, identical in any engine (oracle parity)
    jm = int(round(near_dup_jaccard * 1000))
    dups = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .filter(F.col("_c") * 1000
                >= F.lit(jm) * (F.col("_na") + F.col("_nb") - F.col("_c")))
        .select("id_b")  # greedy-by-id: the larger id of a near-dup pair dies
        .distinct()
    )
    # 4. anti-join the victims out
    return exact.join(
        dups.withColumnRenamed("id_b", id_col), id_col, "left_anti")
