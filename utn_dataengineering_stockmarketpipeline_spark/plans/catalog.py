"""Query catalog — the driver contract's single source of truth.

Every implemented operator from SURVEY.md §2 (plus the large-scale
extension operators) registers here as a :class:`Query`:

- ``build(spark, sf_dir) -> DataFrame``: the Spark plan (the engine path),
- ``oracle``: equivalent DuckDB SQL over the same parquet views, or
  ``None`` for genuinely non-SQL-expressible ops (driver then records a
  rows-only check).

Column names are aliased identically on both sides — the driver's
comparator sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = Query(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn
    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from . import queries_reference  # noqa: F401
    from . import queries_analytics  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_joins  # noqa: F401


# Driver-window rotation policy
# -----------------------------
# The driver's per-round correctness check covers the FIRST 50 queries in
# catalog iteration order.  With 137+ registered queries, ordering is part
# of the verification contract; every query keeps full local oracle
# coverage via tests/test_catalog_oracle.py regardless of position.
#
# Round-16 rotation (freshness after r15, assuming the r15 window
# greens: r11x12 / r12x49 / r13x50 / r14x50 / r15x50):
#   1. the 12 remaining r11-green entries (burns the r11 backlog
#      completely) + the 33 oldest r12-green,
#   2. (pin = 45 = 50 - 5 planned round-16 registrations — the five
#      staged operators in tools/r16_staged_oracles.py; re-pin to
#      50 - planned if the plan changes),
#   3. the remaining 16 r12-green head the tail (first into the
#      r17 window), then r13-green, r14-green, and the 50 round-15
#      window entries (freshest evidence, safely outside).
# NOTE: if CORRECTNESS_r15 has red rows, move them to the head
# before applying (the r11 lesson: never park a red row in the
# green tail).
_DRIVER_ORDER: tuple[str, ...] = (
    # -- 12 r11-green + 33 oldest r12-green --
    "llm_embedding_near_dup_lsh",
    "llm_ann_lsh_topk",
    "llm_dup_clusters",
    "llm_dedup_keep_one",
    "llm_curation_pipeline",
    "ana_sketches_exact",
    "ana_bloom_pruned_join",
    "ref_snapshot_versions",
    "ref_var_historical",
    "ana_expectations_report",
    "llm_ccnet_buckets",
    "stream_quarantine_gate",
    "ref_sharpe_ratio",
    "ref_up_streaks",
    "ana_bfs_reach",
    "ref_snapshot_diff",
    "llm_langid_confusion",
    "ana_big_orders",
    "ana_funnel_conversion",
    "ana_important_parts",
    "ana_min_cost_supplier",
    "ana_retention_cohorts",
    "ana_sole_late_supplier",
    "ana_pagerank_suppliers",
    "ana_data_profile",
    "ana_distinct_users_salted",
    "ana_events_hourly",
    "ana_first_touch",
    "llm_doc_fingerprint",
    "llm_embedding_quantize",
    "ref_calendar_gaps",
    "llm_embedding_norms",
    "llm_doc_chunks_udtf",
    "llm_semantic_dedup",
    "llm_semantic_clusters",
    "llm_dsir_weights",
    "llm_curation_embedding",
    "stream_incremental_dedup",
    "ana_lapsed_customers",
    "ana_lead_lag",
    "ana_order_priority",
    "ana_pareto_parts",
    "ana_pricing_summary",
    "ana_region_revenue",
    "ana_rollup_volume",
    # -- (pin = 45: new round-16 registrations slot in HERE) --
    # -- tail: remaining r12-green, then r13, r14, and the 50
    #    round-15 window entries (freshest) --
    "ana_top_customers",
    "ana_user_sessions",
    "ana_window_rank",
    "join_asof_nearest_price",
    "join_interp_calendar",
    "llm_fuzzy_name_pairs",
    "llm_incremental_dedup",
    "llm_minhash_calibration",
    "llm_mix_temperature",
    "llm_sequence_packing",
    "ref_daily_returns",
    "ref_var_backtest",
    "ref_snapshot_vacuum",
    "ana_shortest_path",
    "llm_gopher_gate",
    "llm_dup_triangles",
    "ref_drawdown",
    "ref_ohlc_monthly",
    "ref_rolling_30day_mean",
    "ref_rsi14",
    "ref_scd0_new_markets",
    "ref_scd0_new_stock_keys",
    "ref_ticker_beta",
    "ref_ticker_correlation",
    "ref_top_movers",
    "ref_vwap_monthly",
    "ref_watermarks",
    "ref_zscore_anomalies",
    "stream_events_hourly",
    "stream_hourly_topk",
    "stream_purchase_error_join",
    "stream_sliding_counts",
    "stream_user_sessions",
    "llm_substring_dedup",
    "llm_substring_scrub",
    "llm_bpe_tokens",
    "llm_ann_ivfpq_topk",
    "llm_image_phash_pairs",
    "llm_dedup_keep_best",
    "llm_token_budget_selection",
    "llm_embedding_outliers",
    "stream_quota_admission",
    "stream_dedup_within_watermark",
    "ref_get_last_price",
    "ref_global_max_date",
    "ref_latest_per_ticker",
    "ref_normalize_market_payload",
    "ref_normalize_stock_payload",
    "ana_price_histogram",
    "ana_set_ops",
    "ref_markets_table",
    "ref_scalar_functions",
    "ana_ks_drift",
    "stream_ks_drift",
    "ana_psi_drift",
    "ref_cusum_alarms",
    "ref_spearman_tickers",
    "ref_autocorr_lag1",
    "ref_underwater_duration",
    "ana_emd_drift",
    "ana_benford_profile",
    "ana_basket_pairs",
    "ana_communities_lp",
    "ana_kcore_suppliers",
    "ana_winsorized_stats",
    "ana_mutual_info_lang_source",
    "stream_emd_drift",
    "ref_variance_ratio",
    "ana_gini_concentration",
    "llm_zipf_slope",
    "llm_ann_recall_eval",
    "stream_psi_drift",
    "ref_theil_sen_slope",
    "ref_stock_prices_table",
    "ana_approx_sketches",
    "ana_chi_square_lang_source",
    "ana_cube_returns",
    "ana_grouping_sets",
    "ana_market_share",
    "ana_nation_flow",
    "ana_priority_late_orders",
    "ana_quantity_percentiles",
    "ana_referential_orphans",
    "join_asof_tolerance_price",
    "llm_bigram_logprob",
    "llm_boilerplate_ngrams",
    "llm_containment_pairs",
    "llm_contamination",
    "llm_dedup_exact",
    "llm_length_deciles",
    "llm_minhash_lsh_pairs",
    "llm_minhash_signatures",
    "llm_multimodal_features",
    "llm_ngram_jaccard_pairs",
    "llm_simhash",
    "llm_simhash_near_pairs",
    "llm_split_assignment",
    "llm_text_quality",
    "llm_token_entropy",
    "llm_token_stats",
    "llm_unigram_logprob",
    "llm_vocabulary",
    "ref_bollinger_bands",
    "ref_ema20",
    "ref_ema20_chunked",
    "ref_macd",
    "ref_ohlc_incremental",
    "ref_rolling_beta",
    "ref_scd1_markets",
    "ref_scd2_markets",
    "ref_stochastic_14",
    "ref_mann_kendall",
    "ref_theil_sen_eval",
    "ana_cusum_drift",
    "ana_mann_whitney_drift",
    "stream_cusum_drift",
    "ref_unpivot_ohlc",
    "stream_static_enrich",
    "ref_scd2_as_of",
    "ana_event_transitions",
    "llm_bpe_train",
    "llm_random_projection",
    "llm_embedding_kmeans",
    "llm_phash_clusters",
    "llm_resize_plan",
    "llm_frame_sample_plan",
    "ana_pivot_status",
    "llm_quality_classifier",
    "llm_cluster_balanced_sample",
    "llm_prototype_pruning",
    "llm_heavy_hitters_cms",
    "llm_temperature_resample",
    "ana_join_key_skew",
    "stream_scd2_apply",
    "stream_heavy_hitters",
    "llm_shard_assignment",
    "llm_ngram_novelty",
    "ana_skyline_suppliers",
    "llm_token_fertility",
    "join_asof_next_price",
    "join_asof_price_at_ship",
    "join_ffill_calendar",
    "join_interval_promo_overlap",
    "join_range_price_bands",
    "llm_ann_ivf_topk",
    "llm_cosine_topk",
    "llm_doc_chunks",
    "llm_doc_profile",
    "llm_embedding_near_dup",
    "llm_lang_id",
    "llm_pii_scrub",
    "llm_repetition_ratio",
    "llm_sample_k_per_stratum",
    "llm_source_mix",
    "llm_stratified_sample",
    "llm_tfidf_top_terms",
    "llm_winnowing_fingerprints",
    "stream_dedup_events",
    "stream_stateful_totals",
    "ref_table_diff",
    "llm_bm25_scores",
    "ref_ols_trend",
    "ref_seasonal_mann_kendall",
    "ana_jonckheere_trend",
    "llm_lsh_recall_eval",
    "stream_mann_whitney_drift",
)


# New (unlisted) queries slot in after the must-verify head.
# 45 + 5 planned round-16 registrations = the full 50-query window.
_WINDOW_PIN = 45


def _apply_driver_order() -> None:
    """Rebuild CATALOG in _DRIVER_ORDER; unlisted queries (added after
    the ordering above was pinned) slot in at _WINDOW_PIN — right after
    the must-verify head, inside the driver's 50-query window."""
    unlisted = [n for n in CATALOG if n not in _DRIVER_ORDER]
    head = _DRIVER_ORDER[:_WINDOW_PIN]
    rest = _DRIVER_ORDER[_WINDOW_PIN:]
    ordered = [*head, *unlisted, *rest]
    missing = [n for n in ordered if n not in CATALOG]
    if missing:
        raise RuntimeError(f"_DRIVER_ORDER references unknown queries: {missing}")
    reordered = {n: CATALOG[n] for n in ordered}
    CATALOG.clear()
    CATALOG.update(reordered)


_load_all()
_apply_driver_order()
