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
# Round-8 window (per VERDICT r7 task 1, extended with this round's
# additions — new queries landed BEFORE the gate froze this time, so
# they go straight into the front of the window):
#   slots 1-6   — the 6 late-r8 additions (hybrid_search,
#                 lake_clone_divergence, lake_ndv_stats,
#                 lake_partition_ndv, lake_sketch_overlap,
#                 text_bm25_topk), never driver-verified, oracle-green
#                 locally.
#   slots 7-11  — the 5 earlier round-8 additions (lake_partition_aggregate,
#                 lake_matview_chain, stream_dedup_corpus, ann_filtered,
#                 lake_minmax_pushdown), never driver-verified,
#                 oracle-green locally.
#   slots 12-16 — the 5 round-7 additions that had never had a driver
#                 row (all 5 passed the judge's oracle replica in r7).
#   slots 17-31 — the 15 rows whose newest driver row is CORRECTNESS_r05
#                 (they hit the 3-round limit this round).
#   slots 32-50 — 19 of the 50 rows whose newest driver row is r06
#                 (alphabetical prefix; the last 6 of the previous
#                 prefix — q10_returned_customers, q11_important_parts,
#                 nation_order_stats, part_brand_stats,
#                 pivot_priority_status, pctl_order_value — slip past the
#                 cutoff and defer to r9 with the rest).
# Round-9 plan (write it down now so the rotation stays mechanical):
#   never-driver-verified r9 additions first, then the r06 rows that have
#   hit the 3-round limit (the 25 listed below PLUS the 6 displaced from
#   this window's tail), then the stalest r07 rows.

_GATE_PRIORITY = [
    # -- never driver-verified (late-r8 additions, alphabetical) — front --
    "hybrid_search", "lake_clone_divergence", "lake_ndv_stats",
    "lake_partition_ndv", "lake_sketch_overlap", "text_bm25_topk",
    # -- never driver-verified (earlier r8 additions, then r7's) ---------
    "lake_partition_aggregate", "lake_matview_chain", "stream_dedup_corpus",
    "ann_filtered", "lake_minmax_pushdown",
    "lake_count_pushdown", "lake_matview_join", "lake_matview_left",
    "lake_matview_full", "lake_rollup_minmax",
    # -- newest driver row is r05 — all 15, 3-round limit hits now -------
    "redact_pii", "select_quality_budget", "semantic_dedup",
    "shuffle_shards", "sql_delegated_join", "stream_dedup_users",
    "stream_windowed_counts", "substring_dup_profile", "text_gopher_rules",
    "text_language_id", "text_quality_score", "text_repetition",
    "text_rolling_fingerprint", "text_token_stats", "window_customer_rank",
    # -- newest driver row is r06 — alphabetical prefix of the 50 --------
    "ann_cosine_topk", "cap_docs_per_lang", "cube_brand_size",
    "dedup_exact", "dedup_minhash_lsh", "events_funnel",
    "events_json_props", "events_retention_cohorts", "events_user_latest",
    "groupingsets_priority_status", "lake_bucket_pruning",
    "lake_merge_roundtrip", "lake_position_delete", "lake_rename_column",
    "lake_stats_pushdown", "lm_perplexity", "merge_hard_delete",
    "merge_upsert", "mixture_by_source", "nation_order_stats",
    "part_brand_stats", "pctl_order_value", "pivot_priority_status",
    "q10_returned_customers", "q11_important_parts",
]
# The 25 r06 rows deferred to the r9 window (3-round limit hits then):
# q12_late_shipping_priority, q13_order_distribution, q14_promo_revenue,
# q15_top_supplier, q16_supplier_part_count,
# q17_small_quantity_revenue, q18_large_orders, q19_bracket_revenue,
# q20_top_volume_suppliers, q22_idle_customers, q2_min_unit_price_supplier,
# q3_unshipped_revenue, q4_order_priority, q5_nation_revenue,
# q6_revenue_delta, q7_volume_shipping, q8_market_share,
# rollup_nation_status, sample_documents, setop_customer_segments,
# split_documents, text_c4_rules, text_lang_profile, text_quality,
# window_running_total.


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

