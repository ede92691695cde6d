from .analysis import (
    document_fingerprint,
    language_id,
    quality_score,
    regex_token_count,
    rolling_hash,
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
    simhash_candidates,
)
from .multimodal import (
    attach_metadata,
    content_fingerprint,
    decode_image_features,
    sample_frames,
)
from .similarity import (
    brute_force_topk,
    cosine_similarity,
    hyperplane_bucket,
    knn_join,
    lsh_bucket_candidates,
    lsh_topk,
)

__all__ = [
    "shingle",
    "exact_dedup",
    "exact_duplicate_groups",
    "minhash_signatures",
    "minhash_candidates",
    "simhash",
    "simhash_candidates",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "cosine_similarity",
    "hyperplane_bucket",
    "knn_join",
    "lsh_bucket_candidates",
    "lsh_topk",
    "language_id",
    "quality_score",
    "token_count",
    "regex_token_count",
    "rolling_hash",
    "document_fingerprint",
    "attach_metadata",
    "content_fingerprint",
    "decode_image_features",
    "sample_frames",
]
