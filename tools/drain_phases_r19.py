"""r19: phase instrumentation for the three stateful streaming drains
(VERDICT r18 ask #5) — splits each drain into machinery / stream-drain
/ post-drain-merge the way the counts monitors were instrumented in
r18, so the optimization targets are measured instead of guessed.

Usage: python tools/drain_phases_r19.py [--reps 2]
Prints one JSON line per drain variant.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.plans import (
    queries_streaming as qs,
)
from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
from utn_dataengineering_stockmarketpipeline_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, out, reps):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[label] = round(best, 3)
    print(f"## {label}: {out[label]}s", file=sys.stderr)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")
    spark = get_spark("r19-drains")
    out: dict[str, float] = {}

    # ---- machinery floor: drain the bare events stream, no-op handle
    def noop_drain():
        with qs._streaming_events_conf(spark):
            raw = qs._events_stream(spark, SF)
            q = (raw.writeStream.foreachBatch(lambda df, i: None)
                 .trigger(availableNow=True).start())
            q.awaitTermination()

    timed("events_noop_drain", noop_drain, out, args.reps)

    # ---- stream_purchase_error_join: drain vs batch-equivalent join
    def ssj_drain():
        CATALOG["stream_purchase_error_join"].build(spark, SF).count()

    timed("purchase_error_join_full", ssj_drain, out, args.reps)

    def ssj_batch():
        from utn_dataengineering_stockmarketpipeline_spark.sources.parquet \
            import load_table
        from utn_dataengineering_stockmarketpipeline_spark.streaming.ingest \
            import stream_stream_join  # noqa: F401  (batch shape below)
        e = load_table(spark, SF, "events").select(
            "event_id", F.col("ts").alias("ts"), "user_id", "event_type")
        p = e.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"))
        er = e.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("u2"), F.col("ts").alias("e_ts"),
            F.col("event_id").alias("e_id"))
        j = p.join(
            er,
            (F.col("user_id") == F.col("u2"))
            & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("e_ts") <= F.col("p_ts")),
        )
        j.count()

    timed("purchase_error_join_batch_shape", ssj_batch, out, args.reps)

    # ---- stream_quota_admission: drain vs bare stateful op vs batch agg
    def quota_drain():
        CATALOG["stream_quota_admission"].build(spark, SF).count()

    timed("quota_admission_full", quota_drain, out, args.reps)

    def quota_post_only():
        # memory-sink table already drained? No — time ONLY the final
        # groupBy over a static frame the size of the update stream
        from utn_dataengineering_stockmarketpipeline_spark.sources.parquet \
            import load_table
        e = load_table(spark, SF, "events").select("user_id")
        (e.groupBy("user_id")
         .agg(F.least(F.lit(5), F.count(F.lit(1))).alias("n_admitted"))
         .count())

    timed("quota_batch_shape", quota_post_only, out, args.reps)

    # ---- stream_incremental_dedup: full vs corpus-banding-only
    def incdedup_drain():
        CATALOG["stream_incremental_dedup"].build(spark, SF).count()

    timed("incremental_dedup_full", incdedup_drain, out, args.reps)

    def incdedup_corpus_banding():
        from utn_dataengineering_stockmarketpipeline_spark.operators import (
            dedup as dd,
        )
        from utn_dataengineering_stockmarketpipeline_spark.plans.queries_llm \
            import _BANDS, _NUM_PERMS
        from utn_dataengineering_stockmarketpipeline_spark.sources.parquet \
            import load_table
        corpus = (load_table(spark, SF, "documents")
                  .filter(F.col("doc_id") % 5 != 0).select("doc_id", "text"))
        sigs = dd.minhash_signatures(corpus, num_perms=_NUM_PERMS)
        sigs.count()

    timed("incremental_dedup_corpus_sigs_only", incdedup_corpus_banding,
          out, args.reps)

    print(json.dumps({"sf_dir": SF, "reps": args.reps,
                      "loadavg": [round(x, 2) for x in os.getloadavg()],
                      "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
