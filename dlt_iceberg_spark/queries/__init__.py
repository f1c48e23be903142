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
# Round-11 window (per VERDICT r10 task 1, staleness recomputed from the
# union of CORRECTNESS_r01-r10 this round: histogram 41×r8, 50×r9,
# 50×r10 — plus the r11 additions):
#   slots 1-4   — the round-11 additions (ann_rebalance — incremental
#                 list split; ann_pq_residual — residual IVF-PQ; ann_opq
#                 — OPQ-rotated residual IVF-PQ; lake_bloom_pruning —
#                 manifest Bloom file skipping), never driver-verified,
#                 oracle-green locally.
#   slots 5-45  — ALL 41 rows whose newest driver row is r08 (they hit
#                 the 3-round limit this round — exactly the list the r10
#                 comment pre-planned): events_user_latest …
#                 window_customer_rank.
#   slots 46-50 — the 5 stalest r09 rows (alphabetical prefix of the 50:
#                 ann_ivf … chunk_documents; contamination_check drops
#                 to slot 51, still r09-fresh).
# Round-12 plan (mechanical): never-driver-verified r12 additions first,
# then the 44 remaining r09 rows (they hit the limit at r12;
# corpus_overlap_kmv and corpus_prep now among them), then the stalest
# r10 rows alphabetically.

_GATE_PRIORITY = [
    # -- never driver-verified (round-11 additions) — front ---------------
    "ann_rebalance", "ann_pq_residual", "ann_opq", "lake_bloom_pruning",
    # -- newest driver row is r08 — all 41, 3-round limit hits now --------
    "events_user_latest", "groupingsets_priority_status", "hybrid_search",
    "lake_bucket_pruning", "lake_clone_divergence", "lake_count_pushdown",
    "lake_matview_chain", "lake_matview_full", "lake_matview_join",
    "lake_matview_left", "lake_merge_roundtrip", "lake_minmax_pushdown",
    "lake_ndv_stats", "lake_partition_aggregate", "lake_partition_ndv",
    "lake_position_delete", "lake_rename_column", "lake_rollup_minmax",
    "lake_sketch_overlap", "lake_stats_pushdown", "lm_perplexity",
    "merge_hard_delete", "merge_upsert", "mixture_by_source", "redact_pii",
    "select_quality_budget", "semantic_dedup", "shuffle_shards",
    "sql_delegated_join", "stream_dedup_corpus", "stream_dedup_users",
    "stream_windowed_counts", "substring_dup_profile", "text_bm25_topk",
    "text_gopher_rules", "text_language_id", "text_quality_score",
    "text_repetition", "text_rolling_fingerprint", "text_token_stats",
    "window_customer_rank",
    # -- stalest r09 rows — alphabetical prefix of the 50 -----------------
    "ann_ivf", "ann_ivf_persisted", "ann_pq", "ann_pq_persisted",
    "chunk_documents", "contamination_check",
]
# The 44 r09 rows deferred to the r12 window (3-round limit hits then;
# recomputed from the CORRECTNESS_r01-r10 union this round):
# corpus_overlap_kmv, corpus_prep,
# dedup_boilerplate_lines, dedup_incremental, dedup_ngram_jaccard,
# dedup_simhash, dedup_simhash_pairs, dedup_substring_removal,
# dedup_token_jaccard, dedup_transitive_clusters, lake_clone_retention,
# nation_order_stats, part_brand_stats, pctl_order_value,
# pivot_priority_status, q10_returned_customers, q11_important_parts,
# q12_late_shipping_priority, q13_order_distribution, q14_promo_revenue,
# q15_top_supplier, q16_supplier_part_count, q17_small_quantity_revenue,
# q18_large_orders, q19_bracket_revenue, q20_top_volume_suppliers,
# q22_idle_customers, q2_min_unit_price_supplier, q3_unshipped_revenue,
# q4_order_priority, q5_nation_revenue, q6_revenue_delta,
# q7_volume_shipping, q8_market_share, rollup_nation_status,
# sample_documents, setop_customer_segments, split_documents,
# stream_sink_partitioned, stream_vector_index, text_c4_rules,
# text_lang_profile, text_quality, window_running_total.


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

