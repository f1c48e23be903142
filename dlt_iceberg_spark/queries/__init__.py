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
# Round-9 window (per VERDICT r8 task 2, staleness recomputed from the
# union of CORRECTNESS_r01-r08 this round):
#   slots 1-5   — the 5 round-9 additions (ann_ivf_persisted,
#                 ann_pq_persisted, lake_clone_retention,
#                 stream_sink_partitioned, stream_vector_index), never
#                 driver-verified, oracle-green locally.
#   slots 6-36  — ALL 31 rows whose newest driver row is r06 (they hit
#                 the 3-round limit this round): the q2-q22 TPC-H block
#                 plus nation_order_stats, part_brand_stats,
#                 pctl_order_value, pivot_priority_status,
#                 rollup_nation_status, sample/split, setop, text_c4,
#                 text_lang_profile, text_quality, window_running_total.
#   slots 37-50 — the 14 stalest r07 rows (alphabetical prefix of the
#                 50; doc_fingerprint and dsir_select slip past the
#                 cutoff to r10).
# Round-10 plan (mechanical): never-driver-verified r10 additions first,
# then the 34 remaining r07 rows PLUS doc_fingerprint and dsir_select
# (they hit the limit at r10), then the stalest r08 rows alphabetically.

_GATE_PRIORITY = [
    # -- never driver-verified (round-9 additions, alphabetical) — front --
    "ann_ivf_persisted", "ann_pq_persisted", "lake_clone_retention",
    "stream_sink_partitioned", "stream_vector_index",
    # -- newest driver row is r06 — all 31, 3-round limit hits now --------
    "nation_order_stats", "part_brand_stats", "pctl_order_value",
    "pivot_priority_status", "q10_returned_customers", "q11_important_parts",
    "q12_late_shipping_priority", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_count",
    "q17_small_quantity_revenue", "q18_large_orders", "q19_bracket_revenue",
    "q20_top_volume_suppliers", "q22_idle_customers",
    "q2_min_unit_price_supplier", "q3_unshipped_revenue", "q4_order_priority",
    "q5_nation_revenue", "q6_revenue_delta", "q7_volume_shipping",
    "q8_market_share", "rollup_nation_status", "sample_documents",
    "setop_customer_segments", "split_documents", "text_c4_rules",
    "text_lang_profile", "text_quality", "window_running_total",
    # -- stalest r07 rows — alphabetical prefix of the 50 -----------------
    "ann_ivf", "ann_pq", "chunk_documents", "contamination_check",
    "corpus_overlap_kmv", "corpus_prep", "dedup_boilerplate_lines",
    "dedup_incremental", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_substring_removal", "dedup_token_jaccard",
    "dedup_transitive_clusters",
]
# The 34 r07 rows deferred to the r10 window (3-round limit hits then):
# embedding_label_stats, embedding_near_dup, events_asof_last_signup,
# events_gapfill, events_heavy_hitters, events_hourly,
# events_interval_join, events_sessions, knn_label_vote,
# lake_add_column_default, lake_cdc_changelog, lake_expectations,
# lake_iceberg_roundtrip, lake_multi_table_txn, lake_promote_type,
# lake_rollup_incremental, lake_spec_evolution, multimodal_audio_windows,
# multimodal_decode, multimodal_frames, multimodal_image_dedup,
# multimodal_meta, multimodal_resize, pack_documents, q1_pricing_summary,
# q21_waiting_suppliers, q9_product_type_profit, stream_lake_changes,
# stream_lake_mirror, stream_lake_sink, stream_lake_tail, text_bpe_pairs,
# text_nb_language, text_tfidf_terms.


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

