"""Driver-row freshness report — which catalog entries' latest
CORRECTNESS_r*.json row is how old, and what the current 50-query
driver window covers. Drives the per-round `_DRIVER_ORDER` rotation
(plans/catalog.py): after each round, entries older than two rounds
should head the next window.

Usage: python tools/freshness.py
"""

from __future__ import annotations

import glob
import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )

    latest: dict[str, int] = {}
    root = Path(__file__).resolve().parent.parent
    for f in sorted(glob.glob(str(root / "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r0?(\d+)", Path(f).name).group(1))
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), r)

    names = list(CATALOG)
    window = set(names[:50])
    print(f"catalog: {len(names)} entries; driver window = first 50")
    print("freshness:", dict(sorted(Counter(latest.values()).items())))
    never = [n for n in names if n not in latest]
    if never:
        print(f"never driver-checked ({len(never)}):",
              ", ".join(never))
        in_w = [n for n in never if n in window]
        print(f"  ...of which in window: {len(in_w)}")
    rounds = sorted(set(latest.values()))
    if rounds:
        oldest = rounds[0]
        stale = sorted(n for n, v in latest.items() if v == oldest)
        outside = [n for n in stale if n not in window]
        print(f"oldest round r{oldest}: {len(stale)} entries, "
              f"{len(outside)} OUTSIDE the window")
        if outside:
            print("  rotate these in next round:", ", ".join(outside))


if __name__ == "__main__":
    main()
