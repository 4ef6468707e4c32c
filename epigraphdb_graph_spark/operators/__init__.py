from .lww import lww_dedup_agg, lww_dedup_window  # noqa: F401
from .skew import detect_hot_keys, salted_repartition, with_salt  # noqa: F401
from .consolidate import consolidate_sources  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash64,
    simhash_candidate_pairs,
    simhash_pairs_from_fp,
    simhash_portable,
)
from .similarity import (  # noqa: F401
    cosine_neardup_pairs,
    cosine_topk,
    cosine_topk_lsh,
    rp_lsh_buckets,
)
from .quarantine import quarantine, split_valid  # noqa: F401
from .pipeline import clean_corpus  # noqa: F401
