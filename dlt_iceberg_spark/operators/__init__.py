"""Training-data pipeline operators (beyond the reference's surface).

Designed for 100 TB corpora: every operator is a DataFrame plan whose
shuffles are keyed by content hashes / LSH buckets (bounded fan-in), with
no driver-side state. See BASELINE.json north_star.
"""

from dlt_iceberg_spark.operators.dedup import (
    append_novel_classes,
    batch_vs_corpus_dedup,
    build_dedup_index,
    char_ngram_jaccard_pairs,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    minhash_verified_pairs,
    simhash,
    write_dedup_index,
    simhash_near_dup_pairs,
    token_jaccard_pairs,
)
from dlt_iceberg_spark.operators.similarity import (
    all_pairs_cosine_blas,
    all_pairs_cosine_blocked,
    cosine_topk_bruteforce,
    hyperplane_lsh_topk,
    ivf_topk,
    knn_classify,
    embedding_near_duplicates,
)
from dlt_iceberg_spark.operators.multimodal import (
    attach_media_metadata,
    audio_windows,
    decode_image_features,
    resize_images,
    sample_frames,
)
from dlt_iceberg_spark.operators.asof import asof_join
from dlt_iceberg_spark.operators.range_join import interval_join
from dlt_iceberg_spark.operators.graph import connected_components, dedup_clusters
from dlt_iceberg_spark.operators.quantization import ivfpq_topk, pq_encode, pq_topk, pq_train
from dlt_iceberg_spark.operators.vector_index import (
    append_vectors,
    build_vector_index,
    index_stats,
    ivf_pq_topk_persisted,
    ivf_topk_persisted,
    load_centroids,
    load_codebooks,
    write_vector_index,
)
from dlt_iceberg_spark.operators.skew import salted_agg, salted_join, with_salt
from dlt_iceberg_spark.operators.text import (
    token_stats,
    quality_score,
    language_id,
    repetition_stats,
    rolling_fingerprint,
    chunk_documents,
    c4_rules,
    dedup_lines,
    gopher_rules,
)
from dlt_iceberg_spark.operators.features import (
    nb_classify,
    nb_score,
    nb_train,
    tfidf_top_terms,
)
from dlt_iceberg_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_cap,
    weighted_mixture,
    select_top_tokens,
    shuffle_shards,
)
from dlt_iceberg_spark.operators.packing import pack_sequences

__all__ = [
    "asof_join",
    "interval_join",
    "connected_components",
    "dedup_clusters",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "append_vectors",
    "build_vector_index",
    "index_stats",
    "ivf_pq_topk_persisted",
    "ivf_topk_persisted",
    "load_centroids",
    "load_codebooks",
    "write_vector_index",
    "char_ngram_jaccard_pairs",
    "minhash_verified_pairs",
    "batch_vs_corpus_dedup",
    "attach_media_metadata",
    "audio_windows",
    "decode_image_features",
    "resize_images",
    "sample_frames",
    "build_dedup_index",
    "write_dedup_index",
    "append_novel_classes",
    "gopher_rules",
    "c4_rules",
    "dedup_lines",
    "tfidf_top_terms",
    "nb_train",
    "nb_score",
    "nb_classify",
    "knn_classify",
    "all_pairs_cosine_blas",
    "all_pairs_cosine_blocked",
    "repetition_stats",
    "salted_agg",
    "salted_join",
    "with_salt",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "simhash",
    "simhash_near_dup_pairs",
    "token_jaccard_pairs",
    "cosine_topk_bruteforce",
    "hyperplane_lsh_topk",
    "ivf_topk",
    "embedding_near_duplicates",
    "token_stats",
    "quality_score",
    "language_id",
    "rolling_fingerprint",
    "chunk_documents",
    "deterministic_sample",
    "hash_split",
    "stratified_cap",
    "weighted_mixture",
    "select_top_tokens",
    "shuffle_shards",
    "pack_sequences",
]
