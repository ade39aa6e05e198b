#!/usr/bin/env python3
"""Benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop-format write (full computation, no driver
transfer).  Each query runs $SPARK_GRAFT_BENCH_REPS times (default 5) and
the reported time is the per-query MEDIAN, so one co-tenant hiccup or JIT
warm-up does not masquerade as a plan regression; per-rep raw times are
included under "reps"."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pramen_spark.queries.catalog import QUERIES
from pramen_spark.session import build_session

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "cube_events_type_day",
    "moving_avg_user_value",
    "window_topn_orders",
    "agg_events_daily",
    "incremental_offset",
    "dedup_exact",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "q9_product_type_profit",
    "lang_id",
    "text_quality",
    "text_repetition",
    "doc_fingerprint",
    "decontaminate_ngram",
    "curate_corpus",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
    "embedding_near_dups_lsh",
    "sessionize_events",
    "asof_join_purchases",
    "range_join_error_windows",
    # round-6 curation additions (shuffle-light; tracked so regressions in
    # the new operators show up in round-over-round bench comparisons)
    "gopher_quality_filter",
    "canonical_url_dedup",
    "mixture_weights",
    # round-6 wave 2: passage dedup, LM quality scoring, shard export audit
    "paragraph_dedup_documents",
    "char_lm_quality",
    "shard_assignment",
    # round-6 wave 3: semantic dedup, ops/monitoring, time grid
    "semdedup_embeddings",
    "incremental_dedup_batch",
    "upsample_epoch_mix",
    "validate_documents",
    "value_drift_psi",
    "bucket_gapfill_hourly",
    # round-7: substring-granularity dedup + learned classifier gate,
    # novelty audit, snapshot diff
    "substring_dedup_documents",
    "quality_classifier",
    "ngram_novelty_documents",
    "snapshot_diff_documents",
    "minhash_incremental_batch",
    # round-7 wave 2: streaming parity, retrieval scoring, MOSS
    # fingerprints, cluster-aware eval split
    "stream_windowed_counts",
    "bm25_relevance_documents",
    "winnow_fingerprint_documents",
    "leakage_safe_split_documents",
    # round-7 wave 3: table profiling + event analytics
    "profile_documents_table",
    "cohort_retention_events",
    "funnel_events",
    # round-7 wave 4: CDC / warehouse maintenance + copy reconciliation
    "apply_cdc_orders",
    "scd2_customer_status",
    "incremental_agg_lineitem",
    "reconcile_orders_copy",
    # round-7 wave 5: index compression + hopping-window streaming parity
    "quantize_embeddings_int8",
    "stream_sliding_counts",
    "pagerank_purchase_graph",
    "incremental_distinct_hll",
    "value_percentiles_daily",
    "weighted_sample_documents",
    "hits_purchase_graph",
    "trend_slope_daily",
    "reconcile_drilldown_orders",
    # round-8: skew action, global curriculum, bucketed-state/incremental
    # CDC merges, real image-header decode
    "salted_agg_lineitem",
    "salted_join_lineitem",
    "curriculum_global_documents",
    "incremental_agg_join_lineitem",
    "scd2_incremental_customer",
    "image_dimensions_documents",
    "skew_profile_orders",
    "anomaly_mad_daily",
    "readability_documents",
    # round-8 waves 2-7: drift stats, attribution, OOV audit, prefix
    # filtering, triangles, streaming sessions, TWAP, JSON extraction
    "ks_drift_events",
    "attribution_events",
    "oov_rate_documents",
    "prefix_filter_jaccard_pairs",
    "triangle_count_suppliers",
    "stream_session_counts",
    "twap_events",
    "json_props_events",
    # round-8 wave 8: bloom-pruned join, sketch contracts, basket mining,
    # privacy audit, token entropy
    "bloom_prune_join_lineitem",
    "approx_quantile_contract_lineitem",
    "assoc_pairs_orders",
    "k_anonymity_customers",
    "token_entropy_documents",
    # round-8 wave 9: information/cluster/linkage/privacy analytics
    "mutual_info_events",
    "covariance_embeddings",
    "kmeans_step_embeddings",
    "edit_distance_pairs_documents",
    "dp_counts_customers",
    # round-8 wave 10: sketch contracts, rolling actives, ANN recall
    # gate, bootstrap error bars, BPE merge counting
    "cms_frequency_events",
    "trailing_active_users_events",
    "lsh_recall_audit",
    "bootstrap_ci_events",
    "bpe_merge_candidates_documents",
    # round-8 wave 11: feature engineering + experiment analytics
    "target_encode_orders",
    "vocab_truncate_documents",
    "churn_labels_events",
    "event_trigrams_events",
    "ab_ttest_events",
    # round-8 wave 12: eval metrics + time-axis ML hygiene
    "auc_documents",
    "gini_orders",
    "temporal_split_events",
    "overdispersion_events",
    "weekday_seasonality_events",
    # round-8 wave 13: calibration, graded ANN quality, proportion CIs,
    # embedding health, Zipf corpus fit
    "calibration_bins_documents",
    "ndcg_lsh_audit",
    "wilson_ctr_events",
    "embedding_health_embeddings",
    "zipf_slope_documents",
    # round-8 wave 14: stream-static join + streaming dedup parities,
    # feature hashing, info-gain ranking, weighted percentiles
    "stream_static_enrich_events",
    "stream_dedup_events",
    "feature_hash_collisions_documents",
    "info_gain_ranking_events",
    "weighted_percentile_lineitem",
    # round-8 wave 15: customer segmentation + revenue/SLA dashboards,
    # Benford fraud screen, truncated-EWMA smoothing
    "rfm_segments_orders",
    "ship_latency_lineitem",
    "wow_revenue_orders",
    "benford_audit_orders",
    "ewma_revenue_daily",
    # round-8 wave 16: sort-based skyline, day-partitioned concurrency
    # sweep, decimal-exact ACF, Herfindahl concentration, Kaplan-Meier
    "pareto_frontier_parts",
    "max_concurrency_events",
    "acf_revenue_daily",
    "hhi_nation_suppliers",
    "kaplan_meier_events",
    # round-8 wave 17: robust trend, WOE/IV screening, inverted index,
    # gaps-and-islands streaks, histogram-exact Spearman
    "theil_sen_daily",
    "woe_iv_events",
    "posting_lists_documents",
    "activity_streaks_events",
    "spearman_quantity_price",
    # round-8 wave 18: cohort LTV, growth accounting, randomness and
    # outlier screens, forecast-baseline backtest
    "cohort_ltv_orders",
    "new_vs_returning_events",
    "runs_test_daily",
    "grubbs_test_daily",
    "forecast_backtest_daily",
    # round-8 wave 19: elasticity OLS, purchase cadence, token
    # burstiness, key-space completeness, audience overlap
    "price_elasticity_lineitem",
    "repeat_purchase_interval_events",
    "token_burstiness_documents",
    "key_gap_audit_orders",
    "audience_overlap_events",
    # round-8 wave 20: finance bridges, Pareto classes, basket shapes,
    # segment migration, win-backs
    "pvm_bridge_orders",
    "abc_classification_parts",
    "basket_size_orders",
    "customer_migration_orders",
    "reactivation_events",
    # round-8 wave 21: diversity, exact decay scoring, double-entry
    # screen, collocations, growth accounting
    "event_diversity_users",
    "decayed_value_customers",
    "duplicate_line_screen_lineitem",
    "token_npmi_documents",
    "growth_accounting_events",
    # round-8 wave 22: labeler agreement, tokenizer cost, PII triage,
    # bounce rate, adoption curve
    "cohens_kappa_langid",
    "token_fertility_documents",
    "pii_rate_by_source_documents",
    "bounce_rate_events",
    "adoption_curve_events",
    # round-8 wave 23: ANOVA, SPC limits, seasonal decomposition,
    # per-segment trends, returns report
    "anova_latency_priority",
    "control_chart_daily",
    "seasonal_factors_daily",
    "trend_by_priority_orders",
    "return_rate_by_brand",
    # round-8 wave 24: case-control stats, paired-model comparison,
    # inequality shape, peer outliers, entropy concentration
    "odds_ratio_events",
    "mcnemar_langid",
    "lorenz_curve_customers",
    "peer_zscore_customers",
    "revenue_entropy_brands",
    # round-8 wave 25: queueing identity, policy breakpoints, gains
    # pricing, rate tests, habit ratios
    "littles_law_events",
    "its_breakpoint_daily",
    "gains_curve_documents",
    "two_proportion_ztest_events",
    "stickiness_ratios_events",
    # round-8 wave 26: streaming leaderboards + watermark tuning, byte
    # accounting, classifier confidence, NZV feature screen
    "stream_topk_types_hourly",
    "byte_stats_by_source",
    "lateness_profile_events",
    "langid_margin_documents",
    "nzv_screen_lineitem",
    # round-8 wave 27: attribution sensitivity, dup triage, trend
    # mining, price volatility, the D7 KPI
    "attribution_window_sweep_events",
    "dup_rate_by_source_documents",
    "emerging_terms_documents",
    "price_dispersion_brands",
    "d7_retention_by_cohort_events",
    # round-8 wave 28: training-pair generation, weighting diagnostics,
    # cross audits, privacy, corpus mixture profile
    "negative_samples_orders",
    "cross_cardinality_lineitem",
    "l_diversity_customers",
    "ess_weights_documents",
    "lang_mix_by_source",
    # round-8 wave 29: SLA trends, mix drift, change decomposition,
    # tokenizer budgets, dedup shape
    "latency_trend_monthly",
    "basket_mix_drift_orders",
    "yoy_contribution_brands",
    "vocab_coverage_documents",
    "dup_cluster_sizes_documents",
    # round-8 wave 30: activity heatmap, distributional effects,
    # catalog coverage, price integrity, segmented inequality
    "dow_hour_heatmap_events",
    "qte_weekend_value_events",
    "catalog_coverage_parts",
    "price_points_parts",
    "gini_by_mktsegment",
    # round-8 wave 31: uplift, vocabulary diversity, seasonality
    # strength, resharding physics, dedup governance
    "uplift_deciles_events",
    "token_diversity_by_source",
    "weekday_anova_daily",
    "shard_rebalance_audit_documents",
    "dedup_bias_audit_documents",
    # round-8 wave 32: experiment trust + error bars, retention
    # curves, SLA attainment, word shapes
    "bootstrap_uplift_ci_events",
    "retention_curve_events",
    "srm_check_documents",
    "sla_attainment_priority",
    "token_length_hist_documents",
    # round-8 wave 33: experiment design (MDE/CUPED), feed freshness,
    # audit-budget allocation, source idiosyncrasy
    "mde_power_events",
    "freshness_by_type_events",
    "neyman_allocation_orders",
    "cuped_variance_reduction_events",
    "source_divergence_documents",
    # round-8 wave 34: loyalty/concentration KPIs, drawdown, ARPDAU,
    # engagement shape
    "repeat_customers_orders",
    "drawdown_daily",
    "top_customer_dependency",
    "arpdau_daily_events",
    "sessions_per_user_events",
    # round-8 wave 35: promo depth, velocity classes, board-cadence
    # growth, AOV trend, calendar-mix control
    "discount_depth_bands",
    "velocity_segments_parts",
    "qoq_revenue_orders",
    "aov_monthly_orders",
    "weekend_revenue_share_monthly",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # 5 interleaved reps by default: this box has ±10-15% run-to-run noise,
    # and 3 reps cannot resolve sub-25% regressions (round-6 lesson)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = build_session(app_name="pramen_spark_bench")

    # Warm up the JVM + parquet footers so per-query numbers measure the
    # queries, not session startup.
    force(QUERIES["record_count"].build(spark, sf_dir))

    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # rep-major order: all queries once, then again — so a transient
    # machine-load spike hits one rep of many queries (median absorbs it)
    # instead of all reps of one query
    for _ in range(reps):
        for name in HEADLINE:
            spec = QUERIES[name]
            t0 = time.perf_counter()
            force(spec.build(spark, sf_dir))
            raw[name].append(round(time.perf_counter() - t0, 4))
        # Cache hygiene is PER REP, not per query: a rep measures one pass
        # over the whole suite, the way a production pipeline runs it — so
        # the shingle-hash stage minhash_dedup caches is legitimately
        # served to ngram_jaccard_pairs / dedup_clusters inside the same
        # rep (CacheManager matches their canonicalized plans), exactly
        # like a persisted shingle table shared across pipeline steps at
        # 100 TB. Clearing between reps still guarantees every rep starts
        # cold and measures real computation, never a previous rep's cache.
        spark.catalog.clearCache()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings = {name: round(median(ts), 4) for name, ts in raw.items()}
    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": raw,
        "sf": sf,
    }

    # The driver records only a 2 KB stdout tail in BENCH_r{N}.json, which
    # truncates the medians/reps dicts — so round-over-round comparisons
    # need the FULL result as a committed repo artifact. Infer the round
    # from the driver's own BENCH_r files (this run feeds r = max + 1) and
    # write bench_full/bench_r{N}_full.json alongside the stdout line.
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        rounds = [
            int(m.group(1))
            for f in os.listdir(repo)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        n = (max(rounds) if rounds else 0) + 1
        full_dir = os.path.join(repo, "bench_full")
        os.makedirs(full_dir, exist_ok=True)
        full = dict(
            payload,
            env={
                "sf_dir": sf_dir,
                "reps": reps,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
                "spark_version": spark.version,
            },
        )
        with open(os.path.join(full_dir, f"bench_r{n}_full.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # never let artifact persistence break the bench line

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
