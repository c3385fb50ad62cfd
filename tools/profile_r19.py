"""r19 optimization-round profiler: per-query isolated timings + plans.

Usage:
    python tools/profile_r19.py [--plans-dir plans/r19] [--reps 3]
        [--tag before|after] [--round-plan] query [query ...]

For each named catalog query, in ONE warm session (same warmup set as
bench.py so the numbers are comparable to the roster's):
  - captures ``.explain("formatted")`` to
    ``<plans-dir>/<query>_<tag>.txt`` (build side effects run once),
  - with ``--round-plan``, additionally captures the FIRST-round
    pre-checkpoint physical plan of any iterative graph operator the
    query drives (operators/graph.ROUND_PLAN_SINK) to
    ``<plans-dir>/<query>_roundbody.txt`` — the final plan of an
    iterative query is checkpoint-truncated to ``Scan ExistingRDD``,
    so the per-round join/exchange shape is only auditable here,
  - times ``build(spark, sf).count()`` min-of-``reps`` with the
    bench's full-GC isolation,
and prints one JSON line with all timings at the end.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from utn_dataengineering_stockmarketpipeline_spark.operators import graph
from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
from utn_dataengineering_stockmarketpipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans-dir", default="plans/r19")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None,
                    help="suffix for plan files; no plans captured if unset")
    ap.add_argument("--round-plan", action="store_true",
                    help="capture iterative operators' first-round "
                         "pre-checkpoint plans to <query>_roundbody.txt")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error(f"--reps must be >= 1 (got {args.reps})")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r19-profile")
    jvm_gc = spark.sparkContext._jvm.System.gc

    if not args.no_warmup:
        from bench import WARMUP_QUERIES

        for wname in WARMUP_QUERIES:
            CATALOG[wname].build(spark, sf_dir).count()

    plans_dir = Path(args.plans_dir)
    if args.tag or args.round_plan:
        plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, float] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if args.tag or args.round_plan:
            if args.round_plan:
                graph.ROUND_PLAN_SINK = []
            try:
                df = CATALOG[name].build(spark, sf_dir)
                if args.tag:
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    (plans_dir / f"{name}_{args.tag}.txt").write_text(
                        buf.getvalue()
                    )
                if args.round_plan and graph.ROUND_PLAN_SINK:
                    body = "\n".join(
                        f"== {op}: first-round pre-checkpoint plan ==\n{txt}"
                        for op, txt in graph.ROUND_PLAN_SINK
                    )
                    (plans_dir / f"{name}_roundbody.txt").write_text(body)
            finally:
                graph.ROUND_PLAN_SINK = None
        jvm_gc()
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            CATALOG[name].build(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"## {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": args.reps,
                      "loadavg": [round(x, 2) for x in os.getloadavg()],
                      "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
