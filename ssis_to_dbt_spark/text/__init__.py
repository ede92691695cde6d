from .analysis import (
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from .dedup import (
    exact_dedup,
    exact_duplicate_groups,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle,
    simhash,
)
from .similarity import brute_force_topk, lsh_bucket_candidates, lsh_topk

__all__ = [
    "shingle",
    "exact_dedup",
    "exact_duplicate_groups",
    "minhash_signatures",
    "minhash_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "lsh_bucket_candidates",
    "lsh_topk",
    "language_id",
    "quality_score",
    "token_count",
    "document_fingerprint",
]
