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
# catalog iteration order.  With 96 registered queries, ordering is part
# of the verification contract; every query keeps full local oracle
# coverage via tests/test_catalog_oracle.py regardless of position.
#
# Round-7 rotation:
#   1. the 14 queries whose ONLY driver row is r2 (four rounds stale —
#      all green in every local oracle run since, but the driver row is
#      the hard signal),
#   2. the queries whose BEHAVIOR changed this round and need fresh
#      rows proving the change: ref_ema20_chunked (new registration,
#      segmented-scan EMA), llm_length_deciles (single-partition NTILE
#      replaced by broadcast-offset exact_ntile), the three
#      connected-components dependents (adaptive pointer jumping), the
#      two LSH rows and the three multimodal plans converted from
#      rows-only to oracle-backed,
#   3. (pin) new round-7 registrations slot in here,
#   4. the r5-green set — fresher first out, so the window tail
#      re-proves as many r5 rows as fit after blocks 1-3,
#   5. tail: the r6-green set (freshest evidence, safely outside).
_DRIVER_ORDER: tuple[str, ...] = (
    # -- block 1: r2-stale --
    "ana_approx_sketches",
    "ana_cube_returns",
    "ana_market_share",
    "ana_nation_flow",
    "ana_pivot_status",
    "ana_priority_late_orders",
    "ana_quantity_percentiles",
    "llm_dedup_exact",
    "llm_minhash_signatures",
    "llm_ngram_jaccard_pairs",
    "llm_simhash",
    "llm_simhash_near_pairs",
    "llm_text_quality",
    "llm_token_stats",
    # -- block 2: round-7 behavior changes --
    "ref_ema20_chunked",
    "llm_length_deciles",
    "llm_dup_clusters",
    "llm_dedup_keep_one",
    "llm_curation_pipeline",
    "llm_embedding_near_dup_lsh",
    "llm_ann_lsh_topk",
    "llm_resize_plan",
    "llm_frame_sample_plan",
    "llm_multimodal_features",
    # -- block 4: r5-green (window tail refreshes what fits) --
    "ref_ema20",
    "ref_scd2_markets",
    "ref_scd1_markets",
    "ref_bollinger_bands",
    "ref_unpivot_ohlc",
    "llm_minhash_lsh_pairs",
    "llm_contamination",
    "llm_containment_pairs",
    "llm_boilerplate_ngrams",
    "llm_doc_chunks",
    "llm_stratified_sample",
    "llm_sample_k_per_stratum",
    "llm_source_mix",
    "llm_embedding_quantize",
    "llm_cosine_topk",
    "llm_embedding_norms",
    "llm_embedding_near_dup",
    "llm_ann_ivf_topk",
    "llm_pii_scrub",
    "llm_tfidf_top_terms",
    "llm_repetition_ratio",
    "llm_doc_profile",
    "llm_lang_id",
    "llm_doc_fingerprint",
    "llm_winnowing_fingerprints",
    "join_asof_price_at_ship",
    "join_range_price_bands",
    "join_asof_next_price",
    "join_interval_promo_overlap",
    "join_ffill_calendar",
    "stream_stateful_totals",
    "stream_dedup_events",
    "ana_funnel_conversion",
    "ana_retention_cohorts",
    "ana_min_cost_supplier",
    "ana_sole_late_supplier",
    "ana_important_parts",
    "ana_big_orders",
    # -- block 5: r6-green tail --
    "stream_events_hourly",
    "stream_purchase_error_join",
    "stream_user_sessions",
    "stream_sliding_counts",
    "ana_lapsed_customers",
    "ref_zscore_anomalies",
    "ana_price_histogram",
    "ana_data_profile",
    "ana_pareto_parts",
    "ana_first_touch",
    "llm_fuzzy_name_pairs",
    "llm_incremental_dedup",
    "llm_sequence_packing",
    "llm_mix_temperature",
    "llm_minhash_calibration",
    "stream_hourly_topk",
    "join_interp_calendar",
    "join_asof_nearest_price",
    "ref_get_last_price",
    "ref_latest_per_ticker",
    "ref_rolling_30day_mean",
    "ref_scd0_new_markets",
    "ref_scd0_new_stock_keys",
    "ref_watermarks",
    "ref_global_max_date",
    "ref_normalize_stock_payload",
    "ref_normalize_market_payload",
    "ref_scalar_functions",
    "ref_stock_prices_table",
    "ref_markets_table",
    "ref_daily_returns",
    "ref_top_movers",
    "ref_ohlc_monthly",
    "ref_vwap_monthly",
    "ref_ticker_correlation",
    "ref_rsi14",
    "ref_drawdown",
    "ref_ticker_beta",
    "ana_pricing_summary",
    "ana_top_customers",
    "ana_region_revenue",
    "ana_order_priority",
    "ana_window_rank",
    "ana_lead_lag",
    "ana_rollup_volume",
    "ana_set_ops",
    "ana_events_hourly",
    "ana_distinct_users_salted",
    "ana_user_sessions",
)


# New (unlisted) queries slot in after the must-verify head: the
# r2-stale block + this round's behavior changes.
_WINDOW_PIN = 24


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
