"""Hot-key detection + salted repartition (north_rule: "hash-on-url,
salted for hot-domain skew").

The reference never needed this (pandas is single-process); at cluster
scale a Zipf domain distribution makes naive hash partitioning produce
straggler tasks. Three mitigations compose in this engine:

1. AQE skew-join splitting (session.py turns it on) for joins;
2. partial-aggregation LWW (operators/lww.py) for the dedup shuffle;
3. this module's explicit two-phase salting, for stages where a
   partition-by-key shuffle is unavoidable (e.g. per-key ordered history
   replay via window).

``detect_hot_keys`` is a cheap sampled sketch (analog of the reference's
diagnostic value_counts, utils/qc.py:82): sample → count → threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame,
    key_col: str,
    *,
    sample_fraction: float = 0.05,
    hot_multiplier: float = 20.0,
    max_keys: int = 1000,
) -> list:
    """Keys whose sampled frequency exceeds hot_multiplier × mean. Cheap:
    one pass over a sample, tiny collect."""
    sampled = df.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else df
    counts = sampled.groupBy(key_col).count()
    stats = counts.agg(F.avg("count").alias("mean")).first()
    if stats is None or stats["mean"] is None:
        return []
    threshold = stats["mean"] * hot_multiplier
    return [
        r[0]
        for r in counts.filter(F.col("count") > threshold)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .select(key_col)
        .collect()
    ]


def with_salt(df: DataFrame, key_col: str, *, n_salts: int = 16,
              hot_keys: list | None = None, salt_col: str = "_salt") -> DataFrame:
    """Add a salt column: hot keys get a spread in [0, n_salts), cold keys
    salt 0 (so their grouping is unchanged and no second phase is needed
    for them). Salt is derived deterministically from a row-unique hash."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    if hot_keys is None:
        salt = F.pmod(row_hash, F.lit(n_salts)).cast("int")
    else:
        salt = F.when(
            F.col(key_col).isin(hot_keys),
            F.pmod(row_hash, F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0))
    return df.withColumn(salt_col, salt)


def salted_repartition(
    df: DataFrame,
    key_col: str,
    *,
    n_partitions: int,
    n_salts: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so one hot key spreads over n_salts
    partitions. Callers doing per-key aggregation must run two phases
    (partial agg on (key, salt), final agg on key) — see lww_dedup_agg,
    which achieves the same effect implicitly via map-side combine."""
    salted = with_salt(df, key_col, n_salts=n_salts, hot_keys=hot_keys)
    return salted.repartition(n_partitions, F.col(key_col), F.col("_salt")).drop("_salt")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    hot_keys: list,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big/skewed ``left`` side salts its hot
    keys across ``n_salts`` sub-keys; the ``right`` side REPLICATES its
    hot-key rows once per salt (explode — cold rows get salt 0 only).
    The join key becomes (key, salt), so one hot key's probe work spreads
    over n_salts tasks instead of one straggler reducer.

    This is the manual form of what AQE skew-join does adaptively at
    runtime (session.py enables it); use it when the skew is KNOWN ahead
    of plan time (detect_hot_keys on a sample) or when the join feeds a
    stage AQE cannot re-balance (e.g. a downstream window over the same
    key). Replication factor is n_salts x |hot right rows| — bounded by
    choosing hot_keys narrowly, which detect_hot_keys' threshold does.

    Supports inner and left joins (the salted left side is lossless:
    every left row carries exactly one salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    l2 = with_salt(left, on, n_salts=n_salts, hot_keys=hot_keys)
    replicas = F.when(
        F.col(on).isin(hot_keys),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    r2 = right.withColumn("_salt", F.explode(replicas))
    return l2.join(r2, [on, "_salt"], how).drop("_salt")
