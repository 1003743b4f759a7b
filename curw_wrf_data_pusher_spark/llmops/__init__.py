from .dedup import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    estimated_jaccard_pairs,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from .clusters import connected_components
from .curation import (
    chunk_documents,
    duplicated_line_stats,
    pack_sequences,
    redact_pii,
    remove_duplicated_lines,
    shingle_contamination,
    stratified_sample,
    upsample_by_group,
)
from .pipeline import CurationConfig, curate_corpus, curation_report
from .simsearch import (
    banded_neardup_pairs,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
    neardup_pairs,
)
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
    "banded_neardup_pairs",
    "connected_components",
    "cosine_topk",
    "estimated_jaccard_pairs",
    "ivf_topk",
    "lsh_bucket_topk",
    "neardup_pairs",
    "fingerprint",
    "language_id",
    "quality_features",
    "chunk_documents",
    "duplicated_line_stats",
    "pack_sequences",
    "redact_pii",
    "remove_duplicated_lines",
    "shingle_contamination",
    "stratified_sample",
    "upsample_by_group",
    "CurationConfig",
    "curate_corpus",
    "curation_report",
]
