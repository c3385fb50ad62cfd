"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
from utn_dataengineering_stockmarketpipeline_spark.session import get_spark

# Headline set: flagship + the heaviest representatives of each family.
BENCH_QUERIES = (
    "ref_get_last_price",
    "ref_rolling_30day_mean",
    "ref_scd0_new_stock_keys",
    "ana_pricing_summary",
    "ana_top_customers",
    "ana_region_revenue",
    "ana_order_priority",
    "ana_events_hourly",
    "join_asof_price_at_ship",
    "join_range_price_bands",
    "ana_user_sessions",
    "llm_dedup_exact",
    "llm_minhash_lsh_pairs",
    "llm_simhash_near_pairs",
    "llm_winnowing_fingerprints",
    "llm_text_quality",
    "llm_cosine_topk",
    "llm_embedding_near_dup",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("utn-stockmarket-bench")
    timings: dict[str, float] = {}

    # Warm the JVM/codegen once so timings measure the plans, not startup.
    CATALOG["ref_global_max_date"].build(spark, sf_dir).collect()

    total = 0.0
    for name in BENCH_QUERIES:
        # min of 2 runs: run 1 pays one-off plan/codegen/broadcast warmup,
        # run 2 is the steady state a real deployment sees. count() forces
        # full materialization without driver-collect cost dominating.
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            CATALOG[name].build(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "timing": "min-of-2 (steady state)",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
