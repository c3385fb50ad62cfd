"""Committed A/B evidence for the three capture-drift queries
(VERDICT r15 asks #3/#5): llm_minhash_calibration,
llm_containment_pairs, ref_snapshot_versions.

All three are GIT-IDENTICAL to their r13-era plans (the verdicts
confirmed empty diffs each round), yet their driver captures drifted
1.3-2.9x across rounds. Root cause isolated in r16: the HOST shows
load-average spikes of 10-20+ with no processes visible inside the
container (ambient noisy neighbors), so absolute captures taken in
different rounds are not comparable — see the memory note and
AB_r16_theil.json for the same signature on the Theil-Sen work.

This script produces the reproducible-form capture: bench.py's
untimed warmup phase first (the deep Python-worker/JIT warmup the
LSH/calibration family needs), then 3 alternations x min-of-5,
GC-isolated, loadavg recorded per row. The committed artifact
(AB_r16_regressions.json) carries the r13/r14/r15 driver numbers
alongside for the ratio the verdict asks about.

Usage: python tools/ab_r16_regressions.py   (writes AB_r16_regressions.json)
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
    "llm_minhash_calibration": {"r13": 2.602, "r14": 2.026, "r15": 5.947},
    "llm_containment_pairs": {"r13": 1.783, "r14": 2.455, "r15": 2.500},
    "ref_snapshot_versions": {"r13": 1.515, "r14": 2.055, "r15": 2.080},
}


def main() -> None:
    import bench
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )
    from utn_dataengineering_stockmarketpipeline_spark.session import get_spark

    spark = get_spark("ab-r16-regressions")
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
        "what": "same-session capture of the three drift-flagged queries "
                "after bench.py's warmup phase; 3 alternations x min-of-5, "
                "GC-isolated, loadavg per row",
        "sf_dir": sf,
        "history_driver_captures": HISTORY,
        "best": {k: round(v, 3) for k, v in best.items()},
        "vs_r13": {
            k: round(best[k] / HISTORY[k]["r13"], 2) for k in best
        },
    }
    _REPO.joinpath("AB_r16_regressions.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps({"best": out["best"], "vs_r13": out["vs_r13"]}))


if __name__ == "__main__":
    main()
