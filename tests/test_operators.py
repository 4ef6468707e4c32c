"""Operator-library tests: consolidation, dedup family, similarity, text
analytics, multimodal plumbing — verified against brute-force/pandas
oracles on the driver testdata + synthetic corpora."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epigraphdb_graph_spark.operators.consolidate import consolidate_sources
from epigraphdb_graph_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash64,
    simhash_candidate_pairs,
)
from epigraphdb_graph_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    cosine_topk_lsh,
    rp_lsh_buckets,
)


# ----------------------------------------------------------- consolidation

def test_consolidate_sources_priority_and_provenance(spark):
    """Reference semantics (merge_sources.py:162-195): full-outer key union,
    first-non-empty property resolution, _source aggregation — but ordered
    by explicit priority, not merge order side effects."""
    a = spark.createDataFrame(
        [("k1", "nameA", None), ("k2", "nameA2", 10)], "id string, name string, x int")
    b = spark.createDataFrame(
        [("k1", "nameB", 5), ("k3", None, 7)], "id string, name string, x int")
    out = consolidate_sources([("srcA", a), ("srcB", b)], key="id").toPandas()
    out = out.set_index("id").sort_index()
    assert list(out.index) == ["k1", "k2", "k3"]
    assert out.loc["k1", "name"] == "nameA"      # priority: srcA wins
    assert out.loc["k1", "x"] == 5               # srcA null -> srcB fills
    assert out.loc["k2", "x"] == 10
    assert out.loc["k3", "name"] is None or pd.isna(out.loc["k3", "name"])
    assert sorted(out.loc["k1", "_source"]) == ["srcA", "srcB"]
    assert list(out.loc["k2", "_source"]) == ["srcA"]


# ------------------------------------------------------------------- dedup

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_exact_dedup(spark, docs):
    pdf = docs.select("doc_id", "text").toPandas()
    want = pdf.loc[pdf.groupby("text")["doc_id"].idxmin()]
    got = exact_dedup(docs, text_col="text", id_col="doc_id").toPandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_minhash_signatures_shape_and_determinism(spark, docs):
    s1 = minhash_signatures(docs.limit(50), n_hashes=16).toPandas()
    s2 = minhash_signatures(docs.limit(50), n_hashes=16).toPandas()
    assert len(s1) == 50 and all(len(x) == 16 for x in s1["sig"])
    m1 = dict(zip(s1["_id"], s1["sig"].map(tuple)))
    m2 = dict(zip(s2["_id"], s2["sig"].map(tuple)))
    assert m1 == m2


def test_minhash_candidates_find_near_dupes(spark):
    """Construct docs with known overlap; LSH candidates must include the
    high-Jaccard pair and (overwhelmingly likely) not the disjoint one."""
    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(f"w{i}" for i in range(5, 205))           # J ≈ 195/205
    far = " ".join(f"z{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string")
    pairs = minhash_candidate_pairs(df, n_hashes=64, n_bands=16).toPandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_jaccard_pairs_exact(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "x y z w")],
        "doc_id long, text string")
    got = jaccard_pairs(df, min_jaccard=0.5).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["id_a"], row["id_b"]) == (0, 1)
    assert math.isclose(row["jaccard"], 3 / 5)


def test_shingles_standard_ngram_semantics(spark):
    """Docs with fewer than n tokens emit NO n-shingles (no truncated
    final gram); a doc with exactly n tokens emits exactly one."""
    from epigraphdb_graph_spark.operators.dedup import _shingles

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b c"), (2, "a b c d")],
        "doc_id long, text string")
    got = _shingles(df, "doc_id", "text", 3).toPandas()
    by_id = got.groupby("_id")["_sh"].apply(list).to_dict()
    assert 0 not in by_id                       # 2 tokens < n=3: nothing
    assert by_id[1] == ["a\x1fb\x1fc"]          # exactly n: one full gram
    assert sorted(by_id[2]) == ["a\x1fb\x1fc", "b\x1fc\x1fd"]


def test_simhash_near_dup_pairs(spark):
    words = [f"tok{i}" for i in range(300)]
    d0 = " ".join(words)
    d1 = " ".join(words[:298] + ["altered", "words"])   # tiny perturbation
    d2 = " ".join(f"other{i}" for i in range(300))
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], "doc_id long, text string")
    fps = simhash64(df).toPandas().set_index("_id")["simhash"]
    ham = bin(int(fps[0]) ^ int(fps[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
    pairs = simhash_candidate_pairs(df, max_hamming=16, n_bands=32).toPandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got, f"hamming(d0,d1)={ham}, pairs={got}"
    assert (0, 2) not in got


def test_simhash_portable_matches_reference_impl(spark):
    """The md5-high-bit portable fingerprint must equal a direct python
    recomputation (the same property the q41 DuckDB oracle relies on)."""
    import hashlib

    from epigraphdb_graph_spark.operators.dedup import simhash_portable

    rows = [(0, "alpha beta beta gamma"), (1, "delta alpha alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_portable(df, width=16).toPandas().set_index("_id")["simhash"]

    def py_simhash(text, width=16):
        from collections import Counter

        w = Counter(text.split())
        fp = 0
        for i in range(width):
            s = sum((cnt if hashlib.md5(t.encode()).hexdigest()[i] in "89abcdef"
                     else -cnt) for t, cnt in w.items())
            fp |= (1 << i) if s > 0 else 0
        return fp

    for _id, text in rows:
        assert int(got[_id]) == py_simhash(text)


def test_clean_corpus_pipeline_semantics(spark):
    """Composed cleaning pipeline: quality gate, exact dedup (min-id rep),
    greedy-by-id near-dup removal — each stage's semantics asserted."""
    from epigraphdb_graph_spark.operators.pipeline import clean_corpus

    long_a = " ".join(f"w{i}" for i in range(40))          # 40 tokens
    near_a = " ".join(f"w{i}" for i in range(1, 41))       # J = 39/41 ≈ 0.95
    other = " ".join(f"z{i}" for i in range(40))
    short = "too short"
    rows = [
        (0, long_a), (1, long_a),      # exact dups -> keep 0
        (2, near_a),                   # near-dup of 0 -> removed (greedy)
        (3, other),                    # distinct -> kept
        (4, short),                    # fails quality gate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, min_chars=50, min_tokens=20,
                       near_dup_jaccard=0.8, n_hashes=32, n_bands=16)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 3]


def test_jaccard_hot_token_cap_bounded_and_exact(spark):
    """Stopword-heavy corpus: with max_token_df set, (a) candidate
    generation never joins on the hot token — per-token pair fan-out is
    bounded by the cap — and (b) Jaccard values for surviving pairs are
    EXACT over the full token sets (hot tokens included)."""
    # 40 docs all sharing the stopword 'the'; docs 0/1 share rare tokens
    rows = [(0, "the quick brown fox"), (1, "the quick brown wolf")] + [
        (i, f"the unique{i}a unique{i}b unique{i}c") for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = jaccard_pairs(df, min_jaccard=0.5, max_token_df=10).toPandas()
    # only (0,1) shares a rare token; all 40 docs share 'the' but no pair
    # is generated from it (uncapped would consider all 780 pairs)
    assert len(capped) == 1
    row = capped.iloc[0]
    assert (row["id_a"], row["id_b"]) == (0, 1)
    # exact value includes the hot token: |A∩B|=3 ('the quick brown'),
    # |A∪B|=5 -> 0.6 — NOT the rare-only 2/4
    assert math.isclose(row["jaccard"], 3 / 5)
    # uncapped reference agrees on the overlapping pair set ∩ rare-sharing
    uncapped = jaccard_pairs(df, min_jaccard=0.5).toPandas()
    assert math.isclose(
        uncapped.set_index(["id_a", "id_b"]).loc[(0, 1), "jaccard"], 3 / 5)


def test_minhash_bucket_cap_star_degradation(spark):
    """A pathological exact-dup cluster (k identical docs) must emit O(k)
    star pairs, not O(k²), while ordinary near-dup candidates from
    small buckets are unaffected."""
    k = 2000
    dup_text = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(2, 52))
    rows = [(i, dup_text) for i in range(k)] + [
        (k, near), (k + 1, " ".join(f"z{i}" for i in range(50)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_candidate_pairs(
        df, n_hashes=32, n_bands=8, bucket_cap=64).toPandas()
    # star: every dup links to representative 0 -> exactly k-1 dup pairs
    dup_pairs = pairs[(pairs["id_a"] < k) & (pairs["id_b"] < k)]
    assert len(dup_pairs) == k - 1
    assert set(dup_pairs["id_a"]) == {0}
    # connectivity preserved: all k dup docs form one component via 0
    # and the distinct near-dup is still found against some cluster member
    near_pairs = pairs[(pairs["id_b"] == k) | (pairs["id_a"] == k)]
    assert len(near_pairs) > 0
    # the unrelated doc never appears
    assert not ((pairs["id_a"] == k + 1) | (pairs["id_b"] == k + 1)).any()


# -------------------------------------------------------------- similarity

@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_int_signature_matches_python_twin(spark, embs):
    """The integer-exact LSH signature (JVM higher-order fns) must agree
    bit-for-bit with its driver-side python twin — the property the q39
    cross-engine oracle rests on."""
    from epigraphdb_graph_spark.operators.similarity import (
        int_signature, int_signature_py, lcg_planes_int)

    planes = lcg_planes_int(64, 8)
    got = (
        embs.limit(50)
        .select("vec_id", int_signature(F.col("embedding"), planes).alias("sig"))
        .toPandas().set_index("vec_id")["sig"]
    )
    raw = embs.limit(50).select("vec_id", "embedding").toPandas()
    for _, r in raw.iterrows():
        want = int_signature_py([float(x) for x in r["embedding"]], planes)
        assert int(got[r["vec_id"]]) == want


def test_cosine_topk_matches_bruteforce(spark, embs):
    pdf = embs.toPandas()
    q = list(pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0])

    def cos(v):
        d = sum(a * b for a, b in zip(v, q))
        return d / (math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in q)))

    pdf["cos"] = pdf["embedding"].map(lambda v: cos(list(v)))
    want = pdf.sort_values(["cos", "vec_id"], ascending=[False, True]).head(5)
    got = cosine_topk(embs, q, k=5).toPandas()
    assert list(got["vec_id"]) == list(want["vec_id"])
    for g, w in zip(got["cosine"], want["cos"]):
        # float32 source values promote to double at different points in the
        # two pipelines (numpy accumulates in float32; Spark casts first)
        assert math.isclose(g, w, rel_tol=1e-6)


def test_lsh_topk_recall(spark, embs):
    pdf = embs.toPandas()
    q = list(pdf.loc[pdf["vec_id"] == 7, "embedding"].iloc[0])
    exact = set(cosine_topk(embs, q, k=10).toPandas()["vec_id"])
    approx = set(
        cosine_topk_lsh(embs, q, k=10, n_planes=8, multiprobe_bits=2)
        .toPandas()["vec_id"]
    )
    # the query vector itself (vec_id=7) is in its own bucket: must be found
    assert 7 in approx
    recall = len(exact & approx) / 10
    assert recall >= 0.3, f"recall {recall} too low even for LSH"


def test_lsh_buckets_deterministic(spark, embs):
    b1 = rp_lsh_buckets(embs.limit(100), n_planes=8).toPandas()
    b2 = rp_lsh_buckets(embs.limit(100), n_planes=8).toPandas()
    assert dict(zip(b1["vec_id"], b1["_lsh_bucket"])) == dict(
        zip(b2["vec_id"], b2["_lsh_bucket"]))


def test_cosine_neardup_pairs_self_similarity(spark):
    import random
    rng = random.Random(3)
    v0 = [rng.gauss(0, 1) for _ in range(16)]
    v1 = [x + rng.gauss(0, 0.01) for x in v0]          # near-dup of v0
    v2 = [rng.gauss(0, 1) for _ in range(16)]
    df = spark.createDataFrame(
        [(0, v0), (1, v1), (2, v2)], "vec_id long, embedding array<double>")
    got = cosine_neardup_pairs(df, threshold=0.95, n_planes=4).toPandas()
    assert (0, 1) in set(zip(got["id_a"], got["id_b"]))


def test_cosine_neardup_bucket_cap_star_degradation(spark):
    """Skew guard: a dense cluster of near-identical embeddings lands in
    one LSH bucket; with bucket_cap the output is O(k) star pairs to the
    min-id representative (connectivity preserved), not O(k²)."""
    import random
    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    k = 10_000
    rows = [
        (i, [x + rng.gauss(0, 1e-4) for x in base]) for i in range(k)
    ] + [(k, [rng.gauss(0, 1) for _ in range(16)])]  # one unrelated vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = cosine_neardup_pairs(df, threshold=0.99, n_planes=4,
                                  bucket_cap=100).toPandas()
    # O(k) star, never O(k²): every cluster member pairs with vec_id 0
    assert len(capped) <= k
    assert set(capped["id_a"]) == {0}
    assert set(capped["id_b"]) == set(range(1, k))
    assert (capped["cosine"] >= 0.99).all()

    # below-cap buckets stay exhaustive (tiny corpus, cap above occupancy)
    small = df.filter(F.col("vec_id") < 4)
    exhaustive = cosine_neardup_pairs(small, threshold=0.99, n_planes=4,
                                      bucket_cap=1024).toPandas()
    assert set(zip(exhaustive["id_a"], exhaustive["id_b"])) == {
        (a, b) for a in range(4) for b in range(a + 1, 4)}


def test_ivf_assignment_matches_python_twin(spark, embs):
    """Executor-side integer-exact cell assignment agrees with the
    driver-side twin row for row (the cross-engine determinism the q58
    oracle relies on)."""
    import math

    from epigraphdb_graph_spark.operators.similarity import (
        _QUANT, ivf_assign, lcg_centroids)

    cents = lcg_centroids(64, 8, scale=500)
    sub = embs.limit(100)
    got = {r["vec_id"]: r["_ivf_cell"]
           for r in ivf_assign(sub, cents).collect()}
    for row in sub.collect():
        q = [int(math.floor(float(x) * _QUANT)) for x in row["embedding"]]
        packed = sorted(
            sum((a - b) * (a - b) for a, b in zip(q, c)) * len(cents) + i
            for i, c in enumerate(cents))
        assert got[row["vec_id"]] == packed[0] % len(cents)


def test_ivf_topk_probes_subset_and_finds_neighbors(spark, embs):
    """IVF top-k scans only the probed cells (strictly fewer candidates
    than the table) yet recalls a reasonable share of the exact top-10."""
    from epigraphdb_graph_spark.operators.similarity import (
        ivf_assign, ivf_probe_cells, ivf_topk, lcg_centroids)

    cents = lcg_centroids(64, 8, scale=500)
    qvec = [float(x) for x in
            embs.filter(F.col("vec_id") == 7).first()["embedding"]]
    cells = ivf_probe_cells(qvec, cents, n_probe=2)
    assert len(cells) == 2 and len(set(cells)) == 2
    n_cand = ivf_assign(embs, cents).filter(
        F.col("_ivf_cell").isin(cells)).count()
    assert 0 < n_cand < embs.count()

    exact = set(
        cosine_topk(embs, qvec, k=10).toPandas()["vec_id"])
    approx = set(
        ivf_topk(embs, qvec, cents, k=10, n_probe=2).toPandas()["vec_id"])
    assert 7 in approx  # the query's own cell is always probed
    assert len(exact & approx) / 10 >= 0.3


# ------------------------------------------------------------------- as-of

def test_asof_join_semantics(spark):
    """Backward as-of: latest right row with ts <= left ts per key;
    left-outer nulls before any right row; equal-ts rows match
    (inclusive); equal-ts right ties break by right_seq (highest wins)."""
    import datetime as dt

    from epigraphdb_graph_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("a", t(5), 1), ("a", t(10), 2), ("a", t(1), 3), ("b", t(7), 4)],
        "k string, ts timestamp, lid int")
    right = spark.createDataFrame(
        [("a", t(2), 100, 1), ("a", t(5), 200, 2), ("a", t(5), 201, 3),
         ("a", t(9), 300, 4), ("c", t(1), 400, 5)],
        "k string, ts timestamp, rv int, seq int")

    out = {r["lid"]: r for r in asof_join(
        left, right, on="k", right_seq="seq").collect()}
    assert out[3]["rv_r"] is None          # t=1: before any right row
    assert out[1]["rv_r"] == 201           # t=5: inclusive, seq tiebreak
    assert out[2]["rv_r"] == 300           # t=10: latest preceding (t=9)
    assert out[4]["rv_r"] is None          # key b: no right rows at all
    assert len(out) == 4                   # every left row exactly once


# -------------------------------------------------------------- range join

def test_bin_range_join_semantics(spark):
    """Bin-rewrite range join: exact [lo, hi) matching incl. boundary
    values, overlapping ranges multi-match, left mode keeps misses."""
    from epigraphdb_graph_spark.operators.ranges import bin_range_join

    fact = spark.createDataFrame(
        [(1, 0.0), (2, 4.999), (3, 5.0), (4, 9.0), (5, 42.0), (6, -1.0)],
        "fid long, v double")
    ranges = spark.createDataFrame(
        [(0.0, 5.0, "a"), (5.0, 10.0, "b"), (8.0, 12.0, "c")],
        "lo double, hi double, tag string")

    got = (bin_range_join(fact, ranges, value_col="v", bin_width=3.0)
           .groupBy("fid").agg(F.sort_array(F.collect_list("tag")).alias("t"))
           .toPandas().set_index("fid")["t"].map(list).to_dict())
    assert got == {1: ["a"], 2: ["a"], 3: ["b"], 4: ["b", "c"]}

    left = bin_range_join(fact, ranges, value_col="v", bin_width=3.0,
                          how="left").toPandas()
    assert len(left) == 7  # 5 matches + 2 unmatched (42.0, -1.0)
    miss = left[left["tag"].isna()]
    assert sorted(miss["fid"]) == [5, 6]


def test_bin_range_join_left_nullable_fact_no_duplicates(spark):
    """ADVICE r3 regression: a matched fact row carrying a NULL column
    must appear exactly once in left mode (the old anti-join on all fact
    columns used null-unsafe equality, so NULL-bearing rows never equaled
    themselves and came out both matched AND null-extended)."""
    from epigraphdb_graph_spark.operators.ranges import bin_range_join

    fact = spark.createDataFrame(
        [(1, 2.0, None), (2, 2.5, "x"), (3, 99.0, None)],
        "fid long, v double, note string")
    ranges = spark.createDataFrame(
        [(0.0, 5.0, "a")], "lo double, hi double, tag string")

    left = bin_range_join(fact, ranges, value_col="v", bin_width=3.0,
                          how="left").toPandas()
    assert len(left) == 3                       # one row per fact row
    counts = left["fid"].value_counts().to_dict()
    assert counts == {1: 1, 2: 1, 3: 1}
    by_fid = left.set_index("fid")
    assert by_fid.loc[1, "tag"] == "a"          # matched despite NULL note
    assert pd.isna(by_fid.loc[3, "tag"])        # true miss null-extended


def test_asof_join_null_payload_not_backfilled(spark):
    """ADVICE r3 regression: a legitimately NULL payload field in the
    true as-of match must stay NULL — per-column last(ignorenulls) used
    to backfill it from an OLDER right row, producing a mixed old/new
    row pandas merge_asof / DuckDB ASOF never emit."""
    import datetime as dt

    from epigraphdb_graph_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [("a", t(10), 1)], "k string, ts timestamp, lid int")
    # older row has rv=100, extra='old'; the TRUE match (t=9) has
    # rv=300 but extra NULL — output must be (300, None), never
    # (300, 'old')
    right = spark.createDataFrame(
        [("a", t(2), 100, "old"), ("a", t(9), 300, None)],
        "k string, ts timestamp, rv int, extra string")

    row = asof_join(left, right, on="k").collect()[0]
    assert row["rv_r"] == 300
    assert row["extra_r"] is None
