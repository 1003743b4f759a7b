from .dedup import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from .simsearch import cosine_topk, lsh_bucket_topk
from .textstats import fingerprint, language_id, quality_features

__all__ = [
    "MINHASH_COEFFS",
    "MINHASH_PRIME",
    "exact_dedup_groups",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash",
    "cosine_topk",
    "lsh_bucket_topk",
    "fingerprint",
    "language_id",
    "quality_features",
]
