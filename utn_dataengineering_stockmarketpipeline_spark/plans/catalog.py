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
# Round-6 rotation:
#   1. the four streaming drains that FAILED the r5 driver check (the
#      driver regenerated events.parquet with TIMESTAMP(MICROS); the
#      readers assumed NANOS — fixed in queries_streaming._events_stream,
#      and these four must produce fresh green rows proving it),
#   2. ana_lapsed_customers — registered late in r3, landed at position
#      50 of a 50-query window, never driver-checked,
#   3. the 45 long-stable queries whose last driver row is r2 (three
#      rounds stale),
#   4. tail: the r4+r5 double-green set (46 queries, freshest evidence).
# Queries registered after this pin (new in round 6) slot in at the
# window boundary right after block 2 — inside the window, displacing
# tail entries of block 3 (which keep their r2 rows + local coverage).
_DRIVER_ORDER: tuple[str, ...] = (
    "stream_events_hourly",
    "stream_purchase_error_join",
    "stream_user_sessions",
    "stream_sliding_counts",
    "ana_lapsed_customers",
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
    "ana_cube_returns",
    "ana_pivot_status",
    "ana_quantity_percentiles",
    "ana_nation_flow",
    "ana_market_share",
    "ana_priority_late_orders",
    "ana_approx_sketches",
    "llm_dedup_exact",
    "llm_minhash_signatures",
    "llm_ngram_jaccard_pairs",
    "llm_simhash",
    "llm_simhash_near_pairs",
    "llm_token_stats",
    "llm_text_quality",
    "join_asof_price_at_ship",
    "join_range_price_bands",
    "stream_stateful_totals",
    "stream_dedup_events",
    "llm_pii_scrub",
    "llm_tfidf_top_terms",
    "llm_repetition_ratio",
    "llm_doc_profile",
    "llm_resize_plan",
    "llm_frame_sample_plan",
    "llm_multimodal_features",
    "llm_lang_id",
    "llm_doc_fingerprint",
    "llm_winnowing_fingerprints",
    "llm_cosine_topk",
    "llm_embedding_norms",
    "llm_embedding_near_dup",
    "llm_embedding_near_dup_lsh",
    "llm_ann_lsh_topk",
    "llm_ann_ivf_topk",
    "ref_unpivot_ohlc",
    "ana_funnel_conversion",
    "ana_retention_cohorts",
    "ana_min_cost_supplier",
    "ana_sole_late_supplier",
    "ana_important_parts",
    "llm_dedup_keep_one",
    "llm_doc_chunks",
    "llm_boilerplate_ngrams",
    "llm_contamination",
    "llm_sample_k_per_stratum",
    "llm_containment_pairs",
    "llm_curation_pipeline",
    "llm_stratified_sample",
    "llm_source_mix",
    "llm_embedding_quantize",
    "join_asof_next_price",
    "join_interval_promo_overlap",
    "join_ffill_calendar",
    "ref_bollinger_bands",
    "ref_scd2_markets",
    "ref_ema20",
    "llm_minhash_lsh_pairs",
    "llm_dup_clusters",
    "ref_scd1_markets",
    "ana_big_orders",
)


# New (unlisted) queries slot in after the must-verify head: the four
# repaired streaming drains + the one never-checked query.
_WINDOW_PIN = 5


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
