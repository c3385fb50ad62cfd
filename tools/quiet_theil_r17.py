"""Quiet-window capture for ref_theil_sen_eval (VERDICT r16 Next-round
#4): the ≤6 s target has been missed three rounds running (8.12 →
7.07 s driver captures) while the same-session interleaved A/B
(AB_r16_theil.json) showed 6.50 s best at host loadavg 10-20 — the
open question is whether the residual gap to 6 s is plan cost or
ambient host load. This tool answers it with numbers: it samples
loadavg, runs the full warmup phase, then captures min-of-5 × 3
alternations of ref_theil_sen_eval alongside a fixed-cost control
query (ref_ols_trend — same scan, same entity aggregate shape, no
pair space), recording loadavg before/after every measurement. If the
eval lands ≤6 s at low load, the target is met and the number is the
evidence; if it stays >6 s at loadavg <6, the residual is plan cost
and the target needs plan work, not re-basing.

Usage: python tools/quiet_theil_r17.py   (writes AB_r17_theil_quiet.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

HISTORY_DRIVER = {"r14": 8.20, "r15": 8.12, "r16": 7.07}


def main() -> None:
    import bench
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )
    from utn_dataengineering_stockmarketpipeline_spark.session import get_spark

    spark = get_spark("quiet-theil-r17")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jvm_gc = spark.sparkContext._jvm.System.gc

    load_at_start = [round(x, 2) for x in os.getloadavg()]
    for wname in bench.WARMUP_QUERIES:
        CATALOG[wname].build(spark, sf).count()

    rows = []
    best: dict[str, float] = {}
    for alt in range(3):
        for name in ("ref_theil_sen_eval", "ref_ols_trend"):
            jvm_gc()
            la0 = [round(x, 2) for x in os.getloadavg()]
            b = None
            for _ in range(5):
                t0 = time.perf_counter()
                CATALOG[name].build(spark, sf).count()
                dt = time.perf_counter() - t0
                b = dt if b is None else min(b, dt)
            rows.append(
                {"query": name, "alternation": alt,
                 "min_of_5_sec": round(b, 3),
                 "loadavg_before": la0,
                 "loadavg_after": [round(x, 2) for x in os.getloadavg()]}
            )
            best[name] = min(best.get(name, b), b)
            print(rows[-1], flush=True)
    out = {
        "what": "quiet-window capture of ref_theil_sen_eval with a "
                "no-pair-space control (ref_ols_trend), after bench.py's "
                "warmup phase; 3 alternations x min-of-5, GC-isolated, "
                "loadavg before/after each row",
        "sf_dir": sf,
        "loadavg_at_start": load_at_start,
        "history_driver_captures_eval": HISTORY_DRIVER,
        "rows": rows,
        "best": {k: round(v, 3) for k, v in best.items()},
    }
    _REPO.joinpath("AB_r17_theil_quiet.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out["best"]))


if __name__ == "__main__":
    main()
