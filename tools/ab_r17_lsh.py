"""Committed A/B evidence for the one >1.3x r16 common-set drift
(VERDICT r16 Next-round #3): llm_lsh_recall_eval, 2.14 s (r15) ->
2.92 s (r16 capture) with a git-identical plan (dedup.py:280 untouched
between the captures).

Protocol = AB_r16_regressions.json verbatim: bench.py's untimed warmup
phase first (the LSH family's deep Python-worker/JIT warmup), then
3 alternations x min-of-5, GC-isolated, loadavg recorded per row. The
sibling queries llm_minhash_calibration and llm_lsh_pairs ride along
as same-family controls — if the whole family moves together, the
cause is capture conditions, not this query's plan.

Usage: python tools/ab_r17_lsh.py   (writes AB_r17_lsh.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

HISTORY = {
    # committed driver captures (BENCH_r{N}.json), sf0.1
    "llm_lsh_recall_eval": {"r15": 2.135, "r16": 2.921},
    "llm_minhash_calibration": {"r15": 5.947, "r16": 1.728},
    "llm_embedding_near_dup_lsh": {"r15": 1.238, "r16": 1.454},
}


def main() -> None:
    import bench
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )
    from utn_dataengineering_stockmarketpipeline_spark.session import get_spark

    spark = get_spark("ab-r17-lsh")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jvm_gc = spark.sparkContext._jvm.System.gc

    for wname in bench.WARMUP_QUERIES:
        CATALOG[wname].build(spark, sf).count()
    for wname in ("llm_embedding_near_dup_lsh", "llm_minhash_calibration"):
        CATALOG[wname].build(spark, sf).count()

    rows = []
    best: dict[str, float] = {}
    for alt in range(3):
        for name in HISTORY:
            jvm_gc()
            b = None
            for _ in range(5):
                t0 = time.perf_counter()
                CATALOG[name].build(spark, sf).count()
                dt = time.perf_counter() - t0
                b = dt if b is None else min(b, dt)
            rows.append(
                {"query": name, "alternation": alt,
                 "min_of_5_sec": round(b, 3),
                 "loadavg": [round(x, 2) for x in os.getloadavg()]}
            )
            best[name] = min(best.get(name, b), b)
            print(rows[-1], flush=True)
    out = {
        "what": "same-session re-capture of the r16 drift-flagged "
                "llm_lsh_recall_eval with two same-family controls, after "
                "bench.py's warmup phase; 3 alternations x min-of-5, "
                "GC-isolated, loadavg per row",
        "sf_dir": sf,
        "history_driver_captures": HISTORY,
        "rows": rows,
        "best": {k: round(v, 3) for k, v in best.items()},
        "vs_r15": {
            k: round(best[k] / HISTORY[k]["r15"], 2) for k in best
        },
    }
    _REPO.joinpath("AB_r17_lsh.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({"best": out["best"], "vs_r15": out["vs_r15"]}))


if __name__ == "__main__":
    main()
