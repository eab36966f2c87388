"""Large-scale data-pipeline operators — flat re-exports for discoverability.

Each family lives in its own module (full docs there); this namespace
exposes the headline entry points so ``from
legend_community_delta_spark.operators import minhash_dedup`` works
without memorizing the module map.
"""

from .asof import asof_join, range_join
from .curation import (
    curate_corpus,
    curate_provenance,
    mixture_weights,
    pack_plan,
    repetition_metrics,
    stratified_sample_exact,
    stratum_token_budget,
    token_budget_cut,
)
from .dedup import (
    hamming_pairs,
    containment_pairs,
    contamination_report,
    cross_ngram_jaccard_pairs,
    decontaminate,
    dedup_stats,
    deterministic_sample,
    embedding_dedup,
    exact_dedup,
    incremental_minhash_pairs,
    minhash_dedup,
    minhash_signatures_df,
    ngram_jaccard_pairs,
    simhash_dedup,
    stratified_sample,
    verified_near_dup_pairs,
    winnow_candidate_pairs,
    write_signature_store,
)
from .graph import (
    cluster_representatives,
    connected_components,
    pagerank,
    drop_near_dups,
    drop_near_dups_keep_best,
)
from .joins import broadcast_join, salted_join, write_bucketed
from .multimodal import (
    audio_fingerprint,
    audio_near_dup_pairs,
    image_ahash,
    image_near_dup_pairs,
    video_frame_hashes,
    video_near_dup_pairs,
    audio_features,
    decode_images,
    extract_image_features,
    resize_images,
    sample_video_frames,
)
from .similarity import (
    ann_recall,
    build_ivf_index,
    build_lsh_index,
    build_pq_index,
    cosine_topk,
    cosine_topk_many,
    ivf_topk,
    lsh_topk,
    pq_encode,
    pq_topk,
    pq_topk_refined,
    pq_train,
    query_ivf_index,
    query_lsh_index,
    query_pq_index,
    semantic_contamination,
    semdedup,
    semdedup_pairs,
)
from .scoring import (
    bigram_surprisal,
    boilerplate_ngrams,
    boilerplate_stats,
    chunk_docs,
    dsir_logratios,
    dsir_select,
    dsir_weights,
    embedding_drift,
    lm_surprisal,
    robust_scores,
    source_tv_distance,
    top_n_per_group,
    write_lm_store,
    unigram_counts,
    unigram_surprisal,
)
from .classify import nb_confusion, nb_score, nb_train
from .retrieval import bm25_topk, doc_postings
from .sketches import (
    cms_cells,
    cms_estimate,
    cms_merge,
    read_cms,
    write_cms_store,
    bottomk_sample,
    hll_shard_sketches,
    merged_distinct,
    read_sample,
    read_sketch_estimates,
    sample_quantiles,
    write_sample_store,
    write_sketch_store,
)
from .spans import (
    dedup_spans,
    duplicate_span_stats,
    incremental_dup_spans,
    write_span_store,
)
from .splits import (
    leakage_safe_split,
    shuffle_shards,
    split_leakage_report,
    write_training_shards,
)

__all__ = [
    "ann_recall", "asof_join", "audio_features", "boilerplate_ngrams",
    "boilerplate_stats", "broadcast_join",
    "build_ivf_index", "build_lsh_index", "build_pq_index", "chunk_docs",
    "cluster_representatives", "connected_components",
    "contamination_report", "cosine_topk", "cosine_topk_many",
    "cross_ngram_jaccard_pairs",
    "curate_corpus", "curate_provenance", "decode_images",
    "decontaminate", "dedup_spans", "dedup_stats", "duplicate_span_stats",
    "bigram_surprisal", "dsir_logratios", "dsir_select", "dsir_weights",
    "incremental_dup_spans", "write_span_store", "bottomk_sample",
    "lm_surprisal", "read_sample", "robust_scores", "write_lm_store", "sample_quantiles", "write_sample_store",
    "embedding_drift", "leakage_safe_split", "semantic_contamination", "semdedup", "semdedup_pairs",
    "shuffle_shards", "split_leakage_report", "write_training_shards",
    "deterministic_sample", "drop_near_dups", "drop_near_dups_keep_best",
    "embedding_dedup",
    "exact_dedup", "extract_image_features", "hamming_pairs", "hll_shard_sketches",
    "image_ahash", "image_near_dup_pairs", "audio_fingerprint", "audio_near_dup_pairs", "video_frame_hashes", "video_near_dup_pairs",
    "incremental_minhash_pairs", "ivf_topk", "lsh_topk",
    "merged_distinct", "minhash_dedup", "minhash_signatures_df",
    "mixture_weights",
    "ngram_jaccard_pairs", "pack_plan", "pq_encode", "pq_topk",
    "pq_topk_refined", "pq_train", "query_ivf_index",
    "query_lsh_index", "query_pq_index",
    "range_join", "read_sketch_estimates", "repetition_metrics",
    "resize_images", "salted_join", "sample_video_frames",
    "simhash_dedup", "source_tv_distance", "stratified_sample",
    "stratified_sample_exact", "stratum_token_budget",
    "token_budget_cut", "top_n_per_group", "unigram_counts",
    "unigram_surprisal", "verified_near_dup_pairs",
    "winnow_candidate_pairs", "write_bucketed", "write_signature_store",
    "write_sketch_store",
    "bm25_topk", "doc_postings", "nb_confusion", "nb_score", "nb_train",
    "pagerank",
    "cms_cells", "cms_estimate", "cms_merge", "read_cms",
    "write_cms_store", "containment_pairs",
]
