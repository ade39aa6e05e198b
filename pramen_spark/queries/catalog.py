"""Query catalog facade: re-exports the registry built by the per-domain
modules under ``pramen_spark/queries/`` (split from a 14.7k-line monolith
in round 9) and applies the driver correctness-window ordering.

Import side effects are the registration mechanism: each submodule import
below registers its queries into the shared ``QUERIES`` dict (defined in
``base.py``) via the ``@query`` decorator, in the exact order of the
original monolith, so the post-sort driver window is byte-stable across
the refactor.
"""

from __future__ import annotations

from pramen_spark.queries.base import (  # noqa: F401  (public re-exports)
    QUERIES,
    QuerySpec,
    load_documents_spread,
    load_events,
    load_table,
    query,
)

# Registration order = original chronological order — do not reorder.
from pramen_spark.queries import core as _core  # noqa: F401,E402
from pramen_spark.queries import tpch_extended as _tpch  # noqa: F401,E402
from pramen_spark.queries import ops_graph as _ops  # noqa: F401,E402
from pramen_spark.queries import curation_advanced as _cur  # noqa: F401,E402
from pramen_spark.queries import business as _biz  # noqa: F401,E402
from pramen_spark.queries import stats_quality as _stats  # noqa: F401,E402
from pramen_spark.queries import kpi as _kpi  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver correctness-window ordering.
#
# The driver's per-round correctness gate checks the FIRST 50 entries of
# ``QUERIES`` in iteration order. Restructured in round 12 (VERDICT r11
# ask #1): the old fixed tiers (11 §2 gates + 22 TPC-H) had been green in
# EVERY driver window since round 6 while holding 33 of the 50 slots, so
# at 17 first-time rows per round the never-driver-checked backlog
# (168 of 314 after r11) would have taken ~10 more rounds to drain. The
# window is now:
#
#   tier S — a 10-slot ROTATING SENTINEL (4 §2 gates + 6 TPC-H), sliced
#     round-robin from the fixed orders below so every gate re-audits
#     every ~3 rounds (ceil(11/4)) and every TPC-H shape every ~4
#     (ceil(22/6)). Round 12 takes slice 0 of each (gates[0:4],
#     tpch[0:6]); round 13 takes gates[4:8] + tpch[6:12]; and so on,
#     wrapping. Out-of-sentinel gates/TPC-H stay oracle-checked every
#     round by tools/check_oracle.py + pytest's full-catalog sweep.
#
#   tier B — 40 slots of NEVER-driver-checked queries (no row in any
#     committed CORRECTNESS_r* record), led by the round-11 debut
#     operators image_pixel_stats_jpeg and bpe_encode_large_ruleset,
#     then draining the backlog oldest-registration-first. After the
#     CORRECTNESS_r12 record lands, the backlog drops 168 -> 129
#     (40 drained, +1 for the round-12 debut audio_sample_stats_adpcm);
#     round 13 takes sentinel slice 2 (gates[4:8] + tpch[6:12]) and
#     refills tier B led by audio_sample_stats_adpcm, then the next 39
#     never-checked in registration order (~3 more rounds to zero).
#
# Everything below the 50-entry window keeps the prior ordering rule:
# oracle-checked queries before rows-only ones, stable by registration
# order, and any query not named falls into its tier automatically —
# adding a new query never silently drops an audited one out of order.
# ---------------------------------------------------------------------------

# Fixed rotation orders for the sentinel (do not reorder; the round-robin
# slice arithmetic above depends on these being stable).
_SENTINEL_S2_GATES = [
    "projection", "schema_transform", "filter_macro", "infodate_injection",
    "batchid_injection", "column_sanitation", "record_count",
    "date_range_read", "latest_partition", "incremental_offset",
    "offset_minmax",
]
_SENTINEL_TPCH = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_revenue_forecast",
    "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_by_linestatus",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q20_promotable_suppliers", "q21_waiting_suppliers",
    "q22_dormant_customers",
]

_DRIVER_WINDOW_PRIORITY = [
    # tier S (10): round-12 sentinel = gates[0:4] + tpch[0:6]
    *_SENTINEL_S2_GATES[0:4],
    *_SENTINEL_TPCH[0:6],
    # tier B (40): never-driver-checked, r11 debuts first, then
    # oldest-registration-first from the 168-query backlog
    "image_pixel_stats_jpeg", "bpe_encode_large_ruleset",
    "dedup_representatives", "doc_length_histogram",
    "cube_events_type_day", "moving_avg_user_value",
    "daily_revenue_running_total", "heavy_hitter_tokens",
    "tfidf_top_terms", "domain_histogram_documents",
    "chunk_documents", "ngram_novelty_documents",
    "snapshot_diff_documents", "bucket_gapfill_hourly",
    "rollup_orders_priority_status", "approx_aggregates_selfcheck",
    "customer_value_ranks", "profile_documents_table",
    "cohort_retention_events", "funnel_events",
    "incremental_agg_lineitem", "quantize_embeddings_int8",
    "stream_sliding_counts", "incremental_distinct_hll",
    "value_percentiles_daily", "trend_slope_daily",
    "event_transitions_markov", "curriculum_buckets_documents",
    "json_props_events", "grouping_sets_revenue",
    "twap_events", "cusum_changepoint_daily",
    "zorder_cluster_lineitem", "orders_pivot_status",
    "lineitem_unpivot_charges", "burst_dedup_events",
    "label_centroid_cohesion", "hard_negatives_embeddings",
    "stream_session_counts", "winsorize_lineitem",
]


def _query_order(item):
    name, spec = item
    if name in _DRIVER_WINDOW_PRIORITY:
        return (0, _DRIVER_WINDOW_PRIORITY.index(name))
    # oracle-checked queries before rows-only ones; stable otherwise
    return (1 if spec.oracle is not None else 2, 0)


_sorted = dict(sorted(QUERIES.items(), key=lambda kv: (_query_order(kv),)))
QUERIES.clear()
QUERIES.update(_sorted)
