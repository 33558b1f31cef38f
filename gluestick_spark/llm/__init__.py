from .text import (
    tokens_expr,
    chunk_documents,
    word_count_expr,
    bpe_token_count_expr,
    lang_id_expr,
    lang_scores_expr,
    quality_score_expr,
    fingerprint_expr,
    shingles_expr,
    rolling_hashes_expr,
    winnow_fingerprint_expr,
    winnow_fp_from_hashes,
    token_frequencies,
    build_vocab,
    unigram_nll,
)
from .dedup import (
    minhash_signatures,
    exact_dedup,
    minhash_signature_expr,
    minhash_lsh_candidates,
    minhash_dedup,
    simhash_expr,
    simhash_near_dups,
    jaccard_expr,
    embedding_near_dups,
    embedding_dedup,
)
from .dedup import cluster_dedup, connected_components, lsh_geometry
from .sketch import (
    kll_sketch,
    kll_merge,
    kll_quantiles,
    kmv_distinct,
    kmv_estimate,
    kmv_hash_expr,
    kmv_merge,
    kmv_sketch,
)
from .sampling import (
    hash_sample,
    hash_sample_expr,
    hash_split,
    mix_corpora,
    priority_sample,
    shuffle_write,
    stratified_sample,
    unimax_sample,
)
from .packing import pack_documents
from .bloom import bloom_words, bloom_prefilter
from .decontam import ngrams_expr, ngram_hashes_expr, contamination_pairs, decontaminate, novelty_scores, novelty_scores_against, corpus_gram_overlap, corpus_jaccard_kmv, corpus_drift_matrix
from .pii import PII_PATTERNS, redact_pii_expr, pii_counts_expr
from .retrieval import bm25_topk
from .repetition import repetition_stats
from .similarity import (
    cosine_expr,
    cosine_similarity,
    cosine_topk,
    lsh_ann_topk,
    ivf_assign,
    ivf_topk,
    materialize_ivf,
    ivf_topk_indexed,
    train_ivf_centroids,
    random_hyperplanes,
    train_pca,
    pca_project,
)
from .multimodal import (
    fake_phash,
    compute_phash,
    phash_near_dups,
    phash_cluster_dedup,
    attach_binary_metadata,
    decode_image_features,
    resize_images,
    sample_frames,
    fake_image_decoder,
    fake_image_resizer,
)
