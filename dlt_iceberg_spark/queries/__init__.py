"""Query/operator registry package — the engine's graded analytics
surface, split per domain (VERDICT r7 task 8).

Import order below reproduces the original single-file registration order
exactly (sections A, B, C, C2, D); the rotation reorder then puts the
driver-gate window first.  Public surface unchanged:
``REGISTRY`` / ``get_queries`` / ``get_oracles`` / ``rnd`` plus every
query function by name.
"""

from __future__ import annotations

from dlt_iceberg_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    QueryFn,
    QuerySpec,
    _sql_rnd,
    _t,
    get_oracles,
    get_queries,
    query,
    rnd,
)
from dlt_iceberg_spark.queries.tpch import *  # noqa: F401,F403,E402
from dlt_iceberg_spark.queries.events import *  # noqa: F401,F403,E402
from dlt_iceberg_spark.queries.textops import *  # noqa: F401,F403,E402
from dlt_iceberg_spark.queries.dedup import *  # noqa: F401,F403,E402
from dlt_iceberg_spark.queries.lake import *  # noqa: F401,F403,E402


# ---------------------------------------------------------------------------
# Registry ordering.  The driver's correctness gate checks a fixed-size prefix
# of the registry (every round's artifact stops at exactly 50 entries), so
# iteration order decides which queries get a driver-verified row.
#
# ROTATION POLICY (codified per VERDICT r6 task 1): with 124 registered
# queries and a 50-slot gate window, the freshness horizon is
# ceil(124 / 50) = 3 rounds — every query must have a driver row at most
# 3 rounds old.  Each round, order the window by staleness: queries with
# NO driver row ever go first, then queries whose newest driver row is
# oldest.  Ties (same newest round) break alphabetically so the rotation
# stays mechanical and reviewable.
#
# Round-10 window (per VERDICT r9 task 1, staleness recomputed from the
# union of CORRECTNESS_r01-r09 this round: histogram 36×r7, 50×r8,
# 50×r9 — plus the 3 r10 additions):
#   slots 1-5   — the 5 round-10 additions (ann_delete_lifecycle,
#                 ann_rebuild, ann_sq, ann_sq_persisted,
#                 stream_vector_cdc), never driver-verified, oracle-green
#                 locally.
#   slots 6-41  — ALL 36 rows whose newest driver row is r07 (they hit
#                 the 3-round limit this round): the 34 deferred from r9
#                 plus doc_fingerprint and dsir_select.
#   slots 42-50 — the 9 stalest r08 rows (alphabetical prefix of the
#                 50: ann_cosine_topk … events_retention_cohorts).
# Round-11 plan (mechanical): never-driver-verified r11 additions first,
# then the 41 remaining r08 rows (they hit the limit at r11), then the
# stalest r09 rows alphabetically.

_GATE_PRIORITY = [
    # -- never driver-verified (round-10 additions, alphabetical) — front -
    "ann_delete_lifecycle", "ann_rebuild", "ann_sq", "ann_sq_persisted",
    "stream_vector_cdc",
    # -- newest driver row is r07 — all 36, 3-round limit hits now --------
    "doc_fingerprint", "dsir_select", "embedding_label_stats",
    "embedding_near_dup", "events_asof_last_signup", "events_gapfill",
    "events_heavy_hitters", "events_hourly", "events_interval_join",
    "events_sessions", "knn_label_vote", "lake_add_column_default",
    "lake_cdc_changelog", "lake_expectations", "lake_iceberg_roundtrip",
    "lake_multi_table_txn", "lake_promote_type", "lake_rollup_incremental",
    "lake_spec_evolution", "multimodal_audio_windows", "multimodal_decode",
    "multimodal_frames", "multimodal_image_dedup", "multimodal_meta",
    "multimodal_resize", "pack_documents", "q1_pricing_summary",
    "q21_waiting_suppliers", "q9_product_type_profit", "stream_lake_changes",
    "stream_lake_mirror", "stream_lake_sink", "stream_lake_tail",
    "text_bpe_pairs", "text_nb_language", "text_tfidf_terms",
    # -- stalest r08 rows — alphabetical prefix of the 50 -----------------
    "ann_cosine_topk", "ann_filtered", "cap_docs_per_lang",
    "cube_brand_size", "dedup_exact", "dedup_minhash_lsh", "events_funnel",
    "events_json_props", "events_retention_cohorts",
]
# The 41 r08 rows deferred to the r11 window (3-round limit hits then):
# events_user_latest, groupingsets_priority_status, hybrid_search,
# lake_bucket_pruning, lake_clone_divergence,
# lake_count_pushdown, lake_matview_chain, lake_matview_full,
# lake_matview_join, lake_matview_left, lake_merge_roundtrip,
# lake_minmax_pushdown, lake_ndv_stats, lake_partition_aggregate,
# lake_partition_ndv, lake_position_delete, lake_rename_column,
# lake_rollup_minmax, lake_sketch_overlap, lake_stats_pushdown,
# lm_perplexity, merge_hard_delete, merge_upsert, mixture_by_source,
# redact_pii, select_quality_budget, semantic_dedup, shuffle_shards,
# sql_delegated_join, stream_dedup_corpus, stream_dedup_users,
# stream_windowed_counts, substring_dup_profile, text_bm25_topk,
# text_gopher_rules, text_language_id, text_quality_score,
# text_repetition, text_rolling_fingerprint, text_token_stats,
# window_customer_rank.


def _reorder_registry() -> None:
    snapshot = dict(REGISTRY)
    missing = [n for n in _GATE_PRIORITY if n not in snapshot]
    if missing:  # a rename must update the priority list, loudly
        raise RuntimeError(f"_GATE_PRIORITY names unknown queries: {missing}")
    ordered = _GATE_PRIORITY + [n for n in snapshot if n not in set(_GATE_PRIORITY)]
    REGISTRY.clear()
    for n in ordered:
        REGISTRY[n] = snapshot[n]


_reorder_registry()

