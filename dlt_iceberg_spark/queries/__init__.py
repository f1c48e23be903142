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
# ROTATION POLICY (codified per VERDICT r6 task 1): with 144 registered
# queries and a 50-slot gate window, the freshness horizon is
# ceil(144 / 50) = 3 rounds — every query must have a driver row at most
# 3 rounds old.  Each round, order the window by staleness: queries with
# NO driver row ever go first, then queries whose newest driver row is
# oldest.  Ties (same newest round) break alphabetically so the rotation
# stays mechanical and reviewable.
#
# Round-12 window (per VERDICT r11 task 8, staleness recomputed from the
# union of CORRECTNESS_r01-r11 this round: histogram 45×r9, 50×r10,
# 50×r11; no never-verified rows — r12 is an optimization round, no new
# queries):
#   slots 1-45  — ALL 45 rows whose newest driver row is r09 (they hit
#                 the 3-round limit this round — the 44 the r11 comment
#                 pre-planned plus contamination_check, which r11's
#                 window cut at slot 51): contamination_check …
#                 window_running_total, alphabetical.
#   slots 46-50 — the 5 stalest r10 rows (alphabetical prefix:
#                 ann_cosine_topk … ann_sq).
# Round-13 plan (mechanical): never-driver-verified additions first, then
# the 45 remaining r10 rows (limit hits then), then the stalest r11 rows
# alphabetically.

_GATE_PRIORITY = [
    # -- newest driver row is r09 — all 45, 3-round limit hits now --------
    "contamination_check", "corpus_overlap_kmv", "corpus_prep",
    "dedup_boilerplate_lines", "dedup_incremental", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_substring_removal",
    "dedup_token_jaccard", "dedup_transitive_clusters",
    "lake_clone_retention", "nation_order_stats", "part_brand_stats",
    "pctl_order_value", "pivot_priority_status", "q10_returned_customers",
    "q11_important_parts", "q12_late_shipping_priority",
    "q13_order_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_count", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_bracket_revenue", "q20_top_volume_suppliers",
    "q22_idle_customers", "q2_min_unit_price_supplier",
    "q3_unshipped_revenue", "q4_order_priority", "q5_nation_revenue",
    "q6_revenue_delta", "q7_volume_shipping", "q8_market_share",
    "rollup_nation_status", "sample_documents", "setop_customer_segments",
    "split_documents", "stream_sink_partitioned", "stream_vector_index",
    "text_c4_rules", "text_lang_profile", "text_quality",
    "window_running_total",
    # -- stalest r10 rows — alphabetical prefix of the 50 -----------------
    "ann_cosine_topk", "ann_delete_lifecycle", "ann_filtered",
    "ann_rebuild", "ann_sq",
]
# The 45 r10 rows deferred to the r13 window (3-round limit hits then):
# ann_sq_persisted, cap_docs_per_lang, cube_brand_size, dedup_exact,
# dedup_minhash_lsh, doc_fingerprint, dsir_select, embedding_label_stats,
# embedding_near_dup, events_asof_last_signup, events_funnel,
# events_gapfill, events_heavy_hitters, events_hourly,
# events_interval_join, events_json_props, events_retention_cohorts,
# events_sessions, knn_label_vote, lake_add_column_default,
# lake_cdc_changelog, lake_expectations, lake_iceberg_roundtrip,
# lake_multi_table_txn, lake_promote_type, lake_rollup_incremental,
# lake_spec_evolution, multimodal_audio_windows, multimodal_decode,
# multimodal_frames, multimodal_image_dedup, multimodal_meta,
# multimodal_resize, pack_documents, q1_pricing_summary,
# q21_waiting_suppliers, q9_product_type_profit, stream_lake_changes,
# stream_lake_mirror, stream_lake_sink, stream_lake_tail,
# stream_vector_cdc, text_bpe_pairs, text_nb_language, text_tfidf_terms.


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

