"""Interleaved A/B: r15 Theil-Sen machinery vs the r16 rewrite.

The host this repo is benchmarked on shows load-average spikes to
10-14 with NO processes visible inside the container — ambient noisy
neighbors. Absolute captures taken minutes apart swing 2-3x (the
r13-r15 "capture drift"), so code comparisons are only valid
INTERLEAVED inside one session. This script reconstructs the r15
implementation inline (naive entity-key pair join, single-level
whole-cent buckets, no counts checkpoint, lazy pair checkpoint +
separate OLS legs for eval) and alternates it with the shipped r16
operators (block-decomposed pair generation, two-level bucket probe,
eagerly-checkpointed counts, cached contamination + fused OLS),
min-of-3 per measurement, GC-isolated, loadavg recorded per row.

Usage: python tools/ab_theil_r16.py   (writes AB_r16_theil.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _r15_pairs(base):
    a, b = base.alias("a"), base.alias("b")
    return a.join(
        b, (F.col("a.e") == F.col("b.e")) & (F.col("a.d") < F.col("b.d"))
    ).select(
        F.col("a.e").alias("e"),
        F.col("a.d").alias("di"),
        F.col("b.d").alias("dj"),
        (F.col("b.vc") - F.col("a.vc")).alias("dvc"),
        F.datediff(F.col("b.d"), F.col("a.d")).cast("bigint").alias("dd"),
    ).withColumn("slope", F.expr("try_divide(cast(dvc as double), dd)"))


def _r15_from_base(base, checkpoint_pairs=False):
    pb = _r15_pairs(base).withColumn("bk", F.floor("slope").cast("bigint"))
    if checkpoint_pairs:
        pb = pb.localCheckpoint(eager=False)
    bc = pb.groupBy("e", "bk").agg(F.count(F.lit(1)).alias("c"))
    w_off = Window.partitionBy("e").orderBy("bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = bc.select(
        "e", "bk", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    m_per = bc.groupBy("e").agg(F.sum("c").alias("m"))
    tgt = (
        bc.join(off, ["e", "bk"])
        .join(m_per, "e")
        .withColumn("tgt", F.expr("(m + 1) div 2"))
        .filter(
            (F.col("off") < F.col("tgt"))
            & (F.col("tgt") <= F.col("off") + F.col("c"))
        )
        .select("e", "bk", "off", "m", "tgt")
    )
    w_in = Window.partitionBy("e", "bk").orderBy("slope", "di", "dj")
    ranked = pb.join(F.broadcast(tgt), ["e", "bk"]).withColumn(
        "rn", F.col("off") + F.row_number().over(w_in)
    )
    return ranked.filter(F.col("rn") == F.col("tgt")).select(
        "e",
        F.col("m").alias("n_pairs"),
        F.expr("(dvc * 10000) div dd").alias("slope_micro"),
    )


def _r15_ols(base, out_col):
    x = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast(
        "bigint"
    )
    dec = "decimal(19,0)"
    withx = base.select("e", x.alias("x"), F.col("vc").alias("y"))
    m = withx.groupBy("e").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
    )
    return m.filter(F.expr("n >= 2 AND n * sxx - sx * sx > 0")).select(
        "e",
        F.expr("((n * sxy - sx * sy) * 10000) div (n * sxx - sx * sx)")
        .alias(out_col),
    )


def _r15_slope(spark, sf):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk
    from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
        stock_prices,
    )

    base = risk._trend_base(
        stock_prices(spark, sf), "stock_ticker", "stock_date", "stock_close"
    )
    return _r15_from_base(base).select(
        F.col("e").alias("stock_ticker"), "n_pairs", "slope_micro"
    )


def _r15_eval(spark, sf):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk
    from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
        stock_prices,
    )

    base = risk._trend_base(
        stock_prices(spark, sf), "stock_ticker", "stock_date", "stock_close"
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("e"), F.col("d").cast("string"))),
            1, 8,
        ), 16, 10,
    ).cast("bigint")
    spiked = (u * 1000) < F.lit(100 * (1 << 32))
    cont = base.select(
        "e", "d",
        F.when(spiked, F.col("vc") * 10).otherwise(F.col("vc")).alias("vc"),
        spiked.cast("int").alias("__spiked"),
    )
    counts = cont.groupBy("e").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__spiked").cast("bigint").alias("n_spiked"),
    ).localCheckpoint()
    ts = _r15_from_base(
        cont.select("e", "d", "vc"), checkpoint_pairs=True
    ).select("e", F.col("slope_micro").alias("slope_ts_micro"))
    ols_cont = _r15_ols(cont.select("e", "d", "vc"), "slope_ols_micro")
    ols_clean = _r15_ols(base, "slope_clean_micro")
    return (
        counts.join(ts, "e").join(ols_cont, "e").join(ols_clean, "e")
        .select(
            F.col("e").alias("stock_ticker"), "n_obs", "n_spiked",
            "slope_ts_micro", "slope_ols_micro", "slope_clean_micro",
            (F.abs(F.col("slope_ts_micro") - F.col("slope_clean_micro"))
             < F.abs(F.col("slope_ols_micro") - F.col("slope_clean_micro"))
             ).alias("robust_wins"),
        )
    )


def main() -> None:
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )
    from utn_dataengineering_stockmarketpipeline_spark.session import get_spark

    spark = get_spark("ab-theil-r16")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jvm_gc = spark.sparkContext._jvm.System.gc

    variants = {
        "slope_r15": lambda: _r15_slope(spark, sf),
        "slope_r16": lambda: CATALOG["ref_theil_sen_slope"].build(spark, sf),
        "eval_r15": lambda: _r15_eval(spark, sf),
        "eval_r16": lambda: CATALOG["ref_theil_sen_eval"].build(spark, sf),
    }
    # warmup: one untimed pass of each variant
    for build in variants.values():
        build().count()
    rows = []
    best = {k: None for k in variants}
    for alt in range(3):
        for name, build in variants.items():
            jvm_gc()
            b = None
            for _ in range(3):
                t0 = time.perf_counter()
                build().count()
                dt = time.perf_counter() - t0
                b = dt if b is None else min(b, dt)
            rows.append(
                {"variant": name, "alternation": alt,
                 "min_of_3_sec": round(b, 3),
                 "loadavg": [round(x, 2) for x in os.getloadavg()]}
            )
            best[name] = b if best[name] is None else min(best[name], b)
            print(rows[-1])
    out = {
        "what": "interleaved A/B of the r15 vs r16 Theil-Sen machinery, "
                "one session, min-of-3 x 3 alternations, GC-isolated",
        "sf_dir": sf,
        "best": {k: round(v, 3) for k, v in best.items()},
        "speedup_slope_r16_over_r15": round(
            best["slope_r15"] / best["slope_r16"], 3
        ),
        "speedup_eval_r16_over_r15": round(
            best["eval_r15"] / best["eval_r16"], 3
        ),
        "rows": rows,
    }
    Path(__file__).resolve().parent.parent.joinpath(
        "AB_r16_theil.json"
    ).write_text(json.dumps(out, indent=2))
    print(json.dumps(out["best"]))


if __name__ == "__main__":
    main()
