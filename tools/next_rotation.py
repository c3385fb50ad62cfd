"""Round-18 driver-window rotation — APPLY AT ROUND-18 START.

The driver's end-of-round correctness check runs on HEAD, so the next
round's rotation cannot be committed during round 17 (it would swap the
window out from under the round-17 verification). This script holds the
prepared round-18 _DRIVER_ORDER and swaps it into plans/catalog.py.

Round-18 window (45 + 5 pin): the 21 remaining r13-green entries (the
whole r13 backlog) + the 24 oldest r14-green + 5 planned round-18
registrations. After r18 the oldest evidence anywhere is r14.

Usage:  python tools/next_rotation.py --apply   (idempotent; run once,
commit, then register exactly the 5 planned entries or re-pin
_WINDOW_PIN to 50 - planned, per the driver-window-budget rule. If
CORRECTNESS_r17 shows red rows, amend the head first — never park a
red row in the green tail.)

Any other invocation (no args, --help, anything) prints this text and
exits 2 WITHOUT touching catalog.py. Never run this mid-round; to
inspect, read the file.

Round-18 registration plan (all five PRE-BUILT in round 16 with
brute-force tests; cross-engine-validated oracle SQL staged in
tools/r18_staged_oracles.py — lift and register):
- ref_sortino_ratio (risk.sortino_ratio): downside-semideviation
  Sharpe companion.
- ref_omega_ratio (risk.omega_ratio): pure-integer gain/loss mass
  ratio.
- ana_mood_median_drift (skew.mood_median_drift): K-group median test
  on the shared counts grid.
- ana_personalized_pagerank (graph.personalized_pagerank): seeded
  teleport PageRank.
- llm_heaps_law (text.heaps_law): vocabulary-saturation curve.
(The r19 slate is staged in tools/r19_staged_oracles.py, the r20 slate
in tools/r20_staged_oracles.py — register those at THEIR rounds, not
now; the window-budget discipline is what keeps zero latest-red.)
"""

from __future__ import annotations

from pathlib import Path

_CATALOG = (Path(__file__).resolve().parents[1]
            / "utn_dataengineering_stockmarketpipeline_spark"
            / "plans" / "catalog.py")

_SECTION = '#\n# Round-18 rotation (freshness after r17, assuming the r17 window\n# greens: r13x21 / r14x50 / r15x50 / r16x50 / r17x50):\n#   1. the 21 remaining r13-green entries (burns the r13 backlog\n#      completely) + the 24 oldest r14-green,\n#   2. (pin = 45 = 50 - 5 planned round-18 registrations — the five\n#      staged operators in tools/r18_staged_oracles.py; re-pin to\n#      50 - planned if the plan changes),\n#   3. the remaining r14-green head the tail (first into the r19\n#      window), then r15-green, r16-green, and the 50 round-17\n#      window entries (freshest evidence, safely outside).\n# NOTE: if CORRECTNESS_r17 has red rows, move them to the head\n# before applying (the r11 lesson: never park a red row in the\n# green tail).\n_DRIVER_ORDER: tuple[str, ...] = (\n    # -- 21 r13-green (the whole r13 backlog) + 24 oldest r14-green --\n    "ref_rolling_30day_mean",\n    "ref_rsi14",\n    "ref_scalar_functions",\n    "ref_scd0_new_markets",\n    "ref_scd0_new_stock_keys",\n    "ref_spearman_tickers",\n    "ref_ticker_beta",\n    "ref_ticker_correlation",\n    "ref_top_movers",\n    "ref_underwater_duration",\n    "ref_vwap_monthly",\n    "ref_watermarks",\n    "ref_zscore_anomalies",\n    "stream_dedup_within_watermark",\n    "stream_events_hourly",\n    "stream_hourly_topk",\n    "stream_ks_drift",\n    "stream_purchase_error_join",\n    "stream_quota_admission",\n    "stream_sliding_counts",\n    "stream_user_sessions",\n    "ana_approx_sketches",\n    "ana_chi_square_lang_source",\n    "ana_cube_returns",\n    "ana_cusum_drift",\n    "ana_gini_concentration",\n    "ana_grouping_sets",\n    "ana_mann_whitney_drift",\n    "ana_market_share",\n    "ana_nation_flow",\n    "ana_priority_late_orders",\n    "ana_quantity_percentiles",\n    "ana_referential_orphans",\n    "join_asof_tolerance_price",\n    "llm_ann_recall_eval",\n    "llm_bigram_logprob",\n    "llm_boilerplate_ngrams",\n    "llm_containment_pairs",\n    "llm_contamination",\n    "llm_dedup_exact",\n    "llm_length_deciles",\n    "llm_minhash_lsh_pairs",\n    "llm_minhash_signatures",\n    "llm_multimodal_features",\n    "llm_ngram_jaccard_pairs",\n    # -- (pin = 45: new round-18 registrations slot in HERE) --\n    # -- tail: remaining r14-green (first into the r19 window), then\n    #    r15, r16, and the 50 round-17 window entries (freshest) --\n    "llm_simhash",\n    "llm_simhash_near_pairs",\n    "llm_split_assignment",\n    "llm_text_quality",\n    "llm_token_entropy",\n    "llm_token_stats",\n    "llm_unigram_logprob",\n    "llm_vocabulary",\n    "llm_zipf_slope",\n    "ref_bollinger_bands",\n    "ref_ema20",\n    "ref_ema20_chunked",\n    "ref_macd",\n    "ref_mann_kendall",\n    "ref_ohlc_incremental",\n    "ref_rolling_beta",\n    "ref_scd1_markets",\n    "ref_scd2_markets",\n    "ref_stochastic_14",\n    "ref_stock_prices_table",\n    "ref_theil_sen_eval",\n    "ref_theil_sen_slope",\n    "ref_variance_ratio",\n    "stream_cusum_drift",\n    "stream_emd_drift",\n    "stream_psi_drift",\n    "ana_event_transitions",\n    "ana_join_key_skew",\n    "ana_jonckheere_trend",\n    "ana_pivot_status",\n    "ana_skyline_suppliers",\n    "join_asof_next_price",\n    "join_asof_price_at_ship",\n    "join_ffill_calendar",\n    "join_interval_promo_overlap",\n    "join_range_price_bands",\n    "llm_ann_ivf_topk",\n    "llm_bm25_scores",\n    "llm_bpe_train",\n    "llm_cluster_balanced_sample",\n    "llm_cosine_topk",\n    "llm_doc_chunks",\n    "llm_doc_profile",\n    "llm_embedding_kmeans",\n    "llm_embedding_near_dup",\n    "llm_frame_sample_plan",\n    "llm_heavy_hitters_cms",\n    "llm_lang_id",\n    "llm_lsh_recall_eval",\n    "llm_ngram_novelty",\n    "llm_phash_clusters",\n    "llm_pii_scrub",\n    "llm_prototype_pruning",\n    "llm_quality_classifier",\n    "llm_random_projection",\n    "llm_repetition_ratio",\n    "llm_resize_plan",\n    "llm_sample_k_per_stratum",\n    "llm_shard_assignment",\n    "llm_source_mix",\n    "llm_stratified_sample",\n    "llm_temperature_resample",\n    "llm_tfidf_top_terms",\n    "llm_token_fertility",\n    "llm_winnowing_fingerprints",\n    "ref_ols_trend",\n    "ref_scd2_as_of",\n    "ref_seasonal_mann_kendall",\n    "ref_table_diff",\n    "ref_unpivot_ohlc",\n    "stream_dedup_events",\n    "stream_heavy_hitters",\n    "stream_mann_whitney_drift",\n    "stream_scd2_apply",\n    "stream_stateful_totals",\n    "stream_static_enrich",\n    "ana_bfs_reach",\n    "ana_big_orders",\n    "ana_bloom_pruned_join",\n    "ana_data_profile",\n    "ana_distinct_users_salted",\n    "ana_events_hourly",\n    "ana_expectations_report",\n    "ana_first_touch",\n    "ana_funnel_conversion",\n    "ana_hits_graph",\n    "ana_important_parts",\n    "ana_lapsed_customers",\n    "ana_lead_lag",\n    "ana_min_cost_supplier",\n    "ana_order_priority",\n    "ana_pagerank_suppliers",\n    "ana_pareto_parts",\n    "ana_pricing_summary",\n    "ana_region_revenue",\n    "ana_retention_cohorts",\n    "ana_rollup_volume",\n    "ana_sketches_exact",\n    "ana_sole_late_supplier",\n    "llm_ann_lsh_topk",\n    "llm_ccnet_buckets",\n    "llm_curation_embedding",\n    "llm_curation_pipeline",\n    "llm_dedup_keep_one",\n    "llm_doc_chunks_udtf",\n    "llm_doc_fingerprint",\n    "llm_dsir_weights",\n    "llm_dup_clusters",\n    "llm_embedding_near_dup_lsh",\n    "llm_embedding_norms",\n    "llm_embedding_quantize",\n    "llm_embedding_recall_eval",\n    "llm_langid_confusion",\n    "llm_semantic_clusters",\n    "llm_semantic_dedup",\n    "ref_calendar_gaps",\n    "ref_runs_test",\n    "ref_sharpe_ratio",\n    "ref_snapshot_diff",\n    "ref_snapshot_versions",\n    "ref_turning_points",\n    "ref_up_streaks",\n    "ref_var_historical",\n    "stream_incremental_dedup",\n    "stream_jonckheere_trend",\n    "stream_quarantine_gate",\n    "ana_shortest_path",\n    "ana_top_customers",\n    "ana_user_sessions",\n    "ana_window_rank",\n    "join_asof_nearest_price",\n    "join_interp_calendar",\n    "llm_dup_triangles",\n    "llm_fuzzy_name_pairs",\n    "llm_gopher_gate",\n    "llm_incremental_dedup",\n    "llm_minhash_calibration",\n    "llm_mix_temperature",\n    "llm_sequence_packing",\n    "ref_daily_returns",\n    "ref_snapshot_vacuum",\n    "ref_var_backtest",\n    "ana_basket_pairs",\n    "ana_benford_profile",\n    "ana_communities_lp",\n    "ana_emd_drift",\n    "ana_kcore_suppliers",\n    "ana_ks_drift",\n    "ana_mutual_info_lang_source",\n    "ana_price_histogram",\n    "ana_psi_drift",\n    "ana_set_ops",\n    "ana_winsorized_stats",\n    "llm_ann_ivfpq_topk",\n    "llm_bpe_tokens",\n    "llm_dedup_keep_best",\n    "llm_embedding_outliers",\n    "llm_image_phash_pairs",\n    "llm_substring_dedup",\n    "llm_substring_scrub",\n    "llm_token_budget_selection",\n    "ref_autocorr_lag1",\n    "ref_cusum_alarms",\n    "ref_drawdown",\n    "ref_get_last_price",\n    "ref_global_max_date",\n    "ref_latest_per_ticker",\n    "ref_markets_table",\n    "ref_normalize_market_payload",\n    "ref_normalize_stock_payload",\n    "ref_ohlc_monthly",\n    "ref_acf",\n    "ref_ljung_box",\n    "ana_kruskal_wallis",\n    "llm_kl_source_divergence",\n    "stream_kruskal_wallis",)\n\n\n# New (unlisted) queries slot in after the must-verify head.\n# 45 + 5 planned round-18 registrations = the full 50-query window.\n_WINDOW_PIN = 45'


def main() -> None:
    import sys

    if sys.argv[1:] != ["--apply"]:
        print(__doc__)
        print("This script MUTATES plans/catalog.py. "
              "Run with --apply (exactly) to do so.")
        raise SystemExit(2)
    src = _CATALOG.read_text()
    if "Round-18 rotation" in src:
        print("already applied")
        return
    start = src.index("#\n# Round-17 rotation")
    end = src.index("_WINDOW_PIN = 45") + len("_WINDOW_PIN = 45")
    _CATALOG.write_text(src[:start] + _SECTION + src[end:])
    print("round-18 rotation applied; run tests/test_catalog_order.py")


if __name__ == "__main__":
    main()
