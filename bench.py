"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing contract: each headline number wraps ``build(spark, sf).count()``
— so for the side-effecting fixture queries (ref_snapshot_versions /
ref_snapshot_diff / stream_quarantine_gate) the build-time publish /
stream-drain work IS part of the reported seconds (each run publishes
into a fresh plans.scratch dir, cleaned at interpreter exit). Their
numbers measure the release/ingest protocol end-to-end, not a bare
read.
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
    # approximate scale paths + streaming drains: tracked numbers, not
    # just the exact baselines
    "llm_embedding_near_dup_lsh",
    "llm_ann_lsh_topk",
    "llm_ann_ivf_topk",
    "stream_events_hourly",
    "stream_purchase_error_join",
    # round-2 additions: iterative graph, multi-join warehouse shapes,
    # text compliance pass, indicator windows
    "llm_dup_clusters",
    "llm_pii_scrub",
    "llm_tfidf_top_terms",
    "ana_nation_flow",
    "ana_market_share",
    "ref_rsi14",
    # round-3 additions
    "llm_dedup_keep_one",
    "ref_scd2_markets",
    "join_interval_promo_overlap",
    "join_ffill_calendar",
    "ana_funnel_conversion",
    "llm_doc_chunks",
    "llm_containment_pairs",
    "llm_curation_pipeline",
    # round-6 additions: profiling, skyline, anomaly, attribution,
    # fuzzy linkage, streaming top-k, training-pipeline ops, as-of
    # compositions, estimator calibration
    "ana_data_profile",
    "ana_pareto_parts",
    "ref_zscore_anomalies",
    "ana_first_touch",
    "llm_fuzzy_name_pairs",
    "stream_hourly_topk",
    "llm_incremental_dedup",
    "llm_sequence_packing",
    "llm_mix_temperature",
    "llm_minhash_calibration",
    "llm_length_deciles",
    "join_interp_calendar",
    "join_asof_nearest_price",
    # round-7 additions: segmented-scan EMA, composed recurrences,
    # min/max-frame indicator, incremental state merge, staleness-bound
    # as-of, split assignment, distributed vocabulary ranking, unigram
    # LM scoring
    "ref_ema20_chunked",
    "ref_macd",
    "ref_stochastic_14",
    "ref_ohlc_incremental",
    "join_asof_tolerance_price",
    "llm_split_assignment",
    "llm_vocabulary",
    "llm_unigram_logprob",
    "llm_bigram_logprob",
    "llm_bm25_scores",
    "llm_token_entropy",
    "ana_chi_square_lang_source",
    "ana_grouping_sets",
    "ref_table_diff",
    "stream_static_enrich",
    "ana_referential_orphans",
    "ref_rolling_beta",
    # round-8 additions: SemDeDup semantic dedup (k-means + in-cluster
    # greedy drop), Python UDTF chunker (the honest Python-worker cost
    # next to the codegen'd llm_doc_chunks), sketch self-audit pair
    "llm_semantic_dedup",
    "llm_doc_chunks_udtf",
    "ana_sketches_exact",
    "llm_dsir_weights",
    "ref_calendar_gaps",
    "llm_curation_embedding",
    "stream_incremental_dedup",
    "llm_semantic_clusters",
    "ana_bloom_pruned_join",
    # round-9 additions: exact substring dedup (diagonal-run spans over
    # dual-fold k-gram hashes), deterministic BPE counts, WHT pHash
    # image near-dup, IVF-PQ asymmetric-distance ANN, key-only
    # within-watermark streaming dedup
    "llm_substring_dedup",
    "llm_bpe_tokens",
    "llm_image_phash_pairs",
    "llm_ann_ivfpq_topk",
    "stream_dedup_within_watermark",
    # round-9 curation-policy additions: quality-ranked dedup survivor,
    # token-budget greedy selection, per-label embedding outliers,
    # substring-span corpus rewrite
    "llm_dedup_keep_best",
    "llm_token_budget_selection",
    "llm_embedding_outliers",
    "llm_substring_scrub",
    "stream_quota_admission",
    # round-10 additions: SCD2 point-in-time read, event transition
    # matrix, BPE training, JL random projection, k-means cluster
    # profile, pHash duplicate clusters
    "ref_scd2_as_of",
    "ana_event_transitions",
    "llm_bpe_train",
    "llm_random_projection",
    "llm_embedding_kmeans",
    "llm_phash_clusters",
    "llm_quality_classifier",
    "llm_cluster_balanced_sample",
    "llm_prototype_pruning",
    "llm_heavy_hitters_cms",
    "llm_temperature_resample",
    "ana_join_key_skew",
    "stream_scd2_apply",
    "stream_heavy_hitters",
    "llm_shard_assignment",
    "llm_ngram_novelty",
    "ana_skyline_suppliers",
    "ana_ks_drift",
    "llm_token_fertility",
    # round-11 additions: expectations gate (batch report + streaming
    # quarantine), snapshot-release manifest, historical VaR/CVaR,
    # CCNet perplexity terciles
    "ana_expectations_report",
    "stream_quarantine_gate",
    "ref_snapshot_versions",
    "ref_var_historical",
    "llm_ccnet_buckets",
    "ref_sharpe_ratio",
    "ref_up_streaks",
    "ref_snapshot_diff",
    "llm_langid_confusion",
    # round-12 additions: Kupiec VaR backtest, weighted shortest path,
    # dup-graph triangle census, snapshot vacuum protocol, Gopher gate
    "ref_var_backtest",
    "ana_shortest_path",
    "llm_dup_triangles",
    "ref_snapshot_vacuum",
    "llm_gopher_gate",
    # late round-12 (tail-listed for the r13/r14 windows, benched now):
    # k-core, autocorrelation, underwater spells, winsorized stats,
    # mutual information, streaming/PSI/CUSUM monitors
    "ana_kcore_suppliers",
    "ref_autocorr_lag1",
    "ref_underwater_duration",
    "ana_winsorized_stats",
    "ana_mutual_info_lang_source",
    "stream_ks_drift",
    "ana_psi_drift",
    "ref_cusum_alarms",
    # round-13 additions: earth-mover drift, Spearman rank correlation,
    # market-basket pair mining, Benford conformance, label-propagation
    # communities
    "ana_emd_drift",
    "ref_spearman_tickers",
    "ana_basket_pairs",
    "ana_benford_profile",
    "ana_communities_lp",
    # late round-13 (tail-listed for the r14 window, benched now):
    # streaming EMD drain, variance-ratio test, Gini concentration,
    # Zipf exponent, ANN recall eval
    "stream_emd_drift",
    "ref_variance_ratio",
    "ana_gini_concentration",
    "llm_zipf_slope",
    "llm_ann_recall_eval",
    "stream_psi_drift",
    "ref_theil_sen_slope",
    # round-14 additions: CUSUM drift (batch + streaming drain),
    # Mann-Whitney rank-sum drift, Mann-Kendall trend test,
    # robust-trend contamination eval
    "ana_cusum_drift",
    "stream_cusum_drift",
    "ana_mann_whitney_drift",
    "ref_mann_kendall",
    "ref_theil_sen_eval",
    # round-15 additions: OLS baseline trend, seasonal Mann-Kendall,
    # Jonckheere-Terpstra ordered-trend, the Mann-Whitney streaming
    # twin, and the LSH recall eval loop
    "ref_ols_trend",
    "ref_seasonal_mann_kendall",
    "ana_jonckheere_trend",
    "stream_mann_whitney_drift",
    "llm_lsh_recall_eval",
    # round-16 additions: runs/turning-point randomness screens,
    # integer-ppm HITS, the embedding-LSH recall eval loop, and the
    # Jonckheere streaming twin
    "ref_runs_test",
    "ref_turning_points",
    "ana_hits_graph",
    "llm_embedding_recall_eval",
    "stream_jonckheere_trend",
    # round-17 additions: the ACF horizon family with its Ljung-Box
    # white-noise gate, the Kruskal-Wallis K-group omnibus (batch +
    # seventh streaming twin), and the token-space KL source monitor
    "ref_acf",
    "ref_ljung_box",
    "ana_kruskal_wallis",
    "stream_kruskal_wallis",
    "llm_kl_source_divergence",
)

# Untimed warmup phase: run BEFORE the timed loop so one-off
# process-level costs (JIT compilation depth, codegen cache, Python
# worker pool spin-up, Arrow serializer init, shuffle machinery) are
# paid outside every timed number. min-of-3 only absorbs PER-QUERY
# first-run cost; the process-level warmup is global and lands on
# whichever queries run early — r12-r15 showed the LSH/calibration
# family (deep Python-worker + BLAS paths) drifting 1.3-2.9x between
# captures purely from warmup depth (plans git-identical, interleaved
# A/B always reconverging). The set below touches every runtime
# family once: JVM codegen/scan (scalar agg), window+join (rolling
# mean), Arrow mapInPandas + BLAS (embedding LSH), the banded MinHash
# shuffle + calibration path itself, and a groupBy-heavy text plan.
WARMUP_QUERIES = (
    "ref_global_max_date",
    "ref_rolling_30day_mean",
    "llm_embedding_near_dup_lsh",
    "llm_minhash_calibration",
    "llm_token_stats",
)


def _full_gc(spark) -> None:
    """Full JVM GC before a timed measurement — the same isolation the
    main query roster gets per-query; without it the late-bench scale
    evidence varies with accumulated session garbage (pagerank_1x
    measured anywhere from 4 to 9 s across otherwise-identical runs)."""
    spark.sparkContext._jvm.System.gc()


def _replicate_docs(spark, sf_dir: str, factor: int):
    """documents scaled ×factor: replicas get distinct ids and a small
    distinct text suffix, so corpus GROWS without becoming a wall of
    exact duplicates (which would measure pair explosion, not scaling)."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.concat(
                F.col("text"),
                F.lit(" variant token "),
                F.col("rep").cast("string"),
            )
        ).alias("text"),
    )


def _scrambled_docs(spark, sf_dir: str, factor: int):
    """documents ×factor with a PER-REPLICA affine character permutation
    (translate a-z via (a*i + b) mod 26, a coprime to 26): every token
    — hence every k-gram hash and every pHash pixel — is distinct
    across replicas, so substring-dedup / pHash timings at ×factor
    measure clean corpus GROWTH. (The suffix-variant replicas of
    ``_replicate_docs`` share their full text across replicas, which
    for span/pixel operators would measure quadratic pair explosion —
    a data property — instead of operator scaling.)"""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    coprimes = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    parts = []
    for rep in range(factor):
        a, b = coprimes[rep % len(coprimes)], 3 * rep
        perm = "".join(alphabet[(a * i + b) % 26] for i in range(26))
        t = F.col("text") if rep == 0 else F.translate(
            F.col("text"), alphabet, perm
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(rep * n)).alias("doc_id"),
                t.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _replicate_embeddings(spark, sf_dir: str, factor: int):
    """embeddings ×factor: replicas are exact vector copies with new ids
    — the worst realistic LSH case (every replica group collides in
    every table)."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n = emb.agg(F.max("vec_id")).first()[0] + 1
    rep = spark.range(factor).select(F.col("id").alias("rep"))
    return emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
        "embedding",
        "label",
    )


def _replicated_events_dir(sf_dir: str, factor: int, out_root: str) -> str:
    """Write events ×factor to a temp dir (single events.parquet file, as
    the streaming file source's glob expects). Replicas offset BOTH
    event_id and user_id, so the user universe grows with volume and
    per-user event density stays constant — the realistic 10× shape; same
    user_ids ×10 would grow the interval-join output ~quadratically and
    measure pair explosion instead of scaling."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    n_ev = pc.max(t["event_id"]).as_py() + 1
    n_us = pc.max(t["user_id"]).as_py() + 1
    parts = [t]
    for rep in range(1, factor):
        t2 = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], rep * n_ev),
        )
        t2 = t2.set_column(
            t2.schema.get_field_index("user_id"), "user_id",
            pc.add(t2["user_id"], rep * n_us),
        )
        parts.append(t2)
    big = pa.concat_tables(parts)
    path = Path(out_root) / f"events_x{factor}"
    path.mkdir(parents=True, exist_ok=True)
    # version 2.6 preserves the source's timestamp unit (nanos or
    # micros) — the streaming reader probes the replica's unit, so the
    # replica must match the original encoding
    pq.write_table(big, path / "events.parquet", version="2.6",
                   coerce_timestamps=None)
    return str(path)


def _streaming_scale(spark, sf_dir: str, factor: int, out: dict) -> None:
    """stream_purchase_error_join drained at 1× and ×factor volume: the
    sf-scale drain cost is dominated by per-partition state-store commit
    overhead (fixed per micro-batch), so wall time should grow far
    slower than rows."""
    import tempfile

    with tempfile.TemporaryDirectory(prefix="bench_events_") as tmp:
        big_dir = _replicated_events_dir(sf_dir, factor, tmp)
        for label, d in (("stream_ssj_1x", sf_dir),
                         (f"stream_ssj_{factor}x", big_dir)):
            _full_gc(spark)
            t0 = time.perf_counter()
            df = CATALOG["stream_purchase_error_join"].build(spark, d)
            n = df.count()
            out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}


def _scd2_scale(spark, factor: int, out: dict, base_rows: int = 100_000) -> None:
    """scd2_apply at a 1× and ×factor synthetic dimension (half the keys
    change attributes, 10% new keys): evidence the (key, md5-hash)
    compare joins hold their shape as the dimension grows."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators.scd import scd2_apply

    def dim(n):
        return spark.range(n).select(
            F.concat(F.lit("K"), F.col("id")).alias("k"),
            F.concat(F.lit("name-"), (F.col("id") % 1000)).alias("name"),
            F.lit("2020-01-01").cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    def snap(n):
        return spark.range(n + n // 10).select(
            F.concat(F.lit("K"), F.col("id")).alias("k"),
            F.when(
                F.col("id") % 2 == 0,
                F.concat(F.lit("renamed-"), F.col("id") % 1000),
            ).otherwise(F.concat(F.lit("name-"), F.col("id") % 1000)).alias(
                "name"
            ),
        )

    for label, n in (("scd2_1x", base_rows),
                     (f"scd2_{factor}x", base_rows * factor)):
        cur, sn = dim(n).persist(), snap(n).persist()
        cur.count(), sn.count()  # isolate the merge from input build
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = scd2_apply(sn, cur, "k", ["name"], "2024-06-01").count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        cur.unpersist(), sn.unpersist()


def _bucket_quantiles(sizes_df) -> dict:
    """Summarize a (…, size) bucket-size DataFrame into the numbers a
    skew dashboard would track."""
    row = sizes_df.selectExpr(
        "count(*) AS n_buckets",
        "percentile_approx(size, array(0.5, 0.9, 0.99)) AS q",
        "max(size) AS max_size",
    ).first()
    return {
        "n_buckets": row["n_buckets"],
        "p50": row["q"][0],
        "p90": row["q"][1],
        "p99": row["q"][2],
        "max": row["max_size"],
    }


def scale_evidence(spark, sf_dir: str, factor: int = 10) -> dict:
    """Evidence that the bucketed (LSH) dedup paths scale near-linearly
    where brute force scales quadratically: wall time at 1× and
    ×factor corpus, plus the bucket-size distribution that the default
    ``max_bucket_size`` guard acts on."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup

    out: dict = {"factor": factor}

    docs_1x = _replicate_docs(spark, sf_dir, 1)
    docs_nx = _replicate_docs(spark, sf_dir, factor)
    emb_1x = _replicate_embeddings(spark, sf_dir, 1)
    emb_nx = _replicate_embeddings(spark, sf_dir, factor)
    for df in (docs_1x, docs_nx, emb_1x, emb_nx):
        df.persist().count()  # isolate operator time from input build

    def timed(label: str, build) -> None:
        # min-of-2 with GC isolation: the 1x entries here are sub-second,
        # so a single sample's jitter can swing the reported 10x/1x
        # ratio several-fold (r9 observed minhash_lsh 3.3-7.2 across
        # otherwise-identical runs); the min mirrors the roster's
        # min-of-3 steady-state convention. ``build`` is a THUNK —
        # each sample constructs a FRESH DataFrame, because operators
        # with internal localCheckpoints (phash_near_pairs' hash
        # relation) would otherwise serve sample 2 from the checkpoint
        # and min() would time only the post-checkpoint stages.
        best = n = None
        for _ in range(2):
            _full_gc(spark)
            t0 = time.perf_counter()
            n = build().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[label] = {"sec": round(best, 3), "rows": n}

    timed("minhash_lsh_1x", lambda: dedup.minhash_candidates(docs_1x))
    timed("minhash_lsh_10x", lambda: dedup.minhash_candidates(docs_nx))
    out["minhash_buckets_10x"] = _bucket_quantiles(
        dedup.minhash_bucket_sizes(docs_nx)
    )
    timed("sign_lsh_near_dup_1x",
          lambda: dedup.embedding_near_dup_pairs_lsh(emb_1x, dim=64))
    timed("sign_lsh_near_dup_10x",
          lambda: dedup.embedding_near_dup_pairs_lsh(emb_nx, dim=64))
    out["embedding_buckets_10x"] = _bucket_quantiles(
        dedup.embedding_bucket_sizes(emb_nx, dim=64)
    )
    # brute-force quadratic reference at 1x only (the point of the LSH
    # path is not running an n² matmul at 10x)
    timed("brute_near_dup_1x", lambda: dedup.embedding_near_dup_pairs(emb_1x))

    # ANN index path at 10x: the IVF index trains on a bounded sample
    # (size-independent) and probes n_probe cells, so query cost should
    # track cell size (~linear in corpus), never corpus x queries
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        similarity,
    )
    from pyspark.sql import functions as F

    q10 = emb_1x.filter(F.col("vec_id") < 10)
    timed("ann_ivf_1x",
          lambda: similarity.ivf_topk(corpus=emb_1x, queries=q10, dim=64, k=5))
    timed(f"ann_ivf_{factor}x",
          lambda: similarity.ivf_topk(corpus=emb_nx, queries=q10, dim=64, k=5))

    # incremental dedup at 10x: a nightly batch (1/10th of the corpus)
    # screened against the rest — cross-side pairing only, so wall time
    # should sit well under the full 10x pairing above
    from pyspark.sql import functions as F

    timed(
        "incremental_dedup_10x",
        lambda: dedup.incremental_candidates(
            docs_nx.filter(F.col("doc_id") % 10 != 0),
            docs_nx.filter(F.col("doc_id") % 10 == 0),
        ),
    )

    # round-9 curation-policy operators: evidence that each documented
    # decomposition holds its shape at ×factor — bounded-sample index
    # train + per-cell probing (IVF-PQ), per-score token totals instead
    # of a global cumsum window (token budget), integer per-dim group
    # sums + broadcast centroids (outliers), pure codegen map (BPE).
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        text as text_ops,
    )

    timed("ivfpq_1x",
          lambda: similarity.ivfpq_topk(corpus=emb_1x, queries=q10,
                                        dim=64, k=5))
    timed(f"ivfpq_{factor}x",
          lambda: similarity.ivfpq_topk(corpus=emb_nx, queries=q10,
                                        dim=64, k=5))
    # SemDeDup's documented scale policy (semantic_dedup docstring) is
    # n_centroids ~ n / target-cluster-size, so the ×factor run raises
    # k with the corpus and per-cluster pair cost stays flat. Holding k
    # fixed instead would grow Σ|cluster|² quadratically — a layout
    # choice the operator tells you not to make, not operator scaling.
    timed("semantic_dedup_1x",
          lambda: similarity.semantic_dedup(emb_1x, dim=64,
                                            n_centroids=16))
    timed(f"semantic_dedup_{factor}x",
          lambda: similarity.semantic_dedup(emb_nx, dim=64,
                                            n_centroids=16 * factor))
    timed("embedding_outliers_1x",
          lambda: similarity.embedding_outliers(emb_1x))
    timed(f"embedding_outliers_{factor}x",
          lambda: similarity.embedding_outliers(emb_nx))
    timed("token_budget_1x",
          lambda: text_ops.token_budget_selection(docs_1x))
    timed(f"token_budget_{factor}x",
          lambda: text_ops.token_budget_selection(docs_nx))
    timed("bpe_encode_1x", lambda: text_ops.bpe_token_stats(docs_1x))
    timed(f"bpe_encode_{factor}x",
          lambda: text_ops.bpe_token_stats(docs_nx))

    # round-10 embedding operators: the JL projection is a pure
    # codegen map (ratio should track data volume with zero shuffle
    # growth); the k-means profile trains on a bounded sample
    # (size-independent) and profiles via one Arrow pass + one agg
    timed("random_projection_1x",
          lambda: similarity.random_projection(emb_1x))
    timed(f"random_projection_{factor}x",
          lambda: similarity.random_projection(emb_nx))

    def _kmeans_profile(emb):
        cent = similarity.train_centroids(emb, n_centroids=16)
        asg = similarity.assign_centroids(emb, cent, sim_col="sim")
        return asg.groupBy("centroid").agg(F.count(F.lit(1)))

    timed("kmeans_profile_1x", lambda: _kmeans_profile(emb_1x))
    timed(f"kmeans_profile_{factor}x", lambda: _kmeans_profile(emb_nx))

    # round-10 continuation operators: CMS is one map-side-combined
    # count shuffle + vocabulary-sized tail (near-linear in tokens);
    # prototype pruning follows the SemDeDup k∝n centroid policy (one
    # Arrow assignment pass + a narrow rank window, no pair term at
    # all); the temperature resample's cost is the per-source rank
    # window over narrow (id, source) rows
    timed("cms_heavy_hitters_1x",
          lambda: text_ops.cms_heavy_hitters(docs_1x))
    timed(f"cms_heavy_hitters_{factor}x",
          lambda: text_ops.cms_heavy_hitters(docs_nx))
    timed("prototype_pruning_1x",
          lambda: similarity.prototype_pruning(emb_1x, n_centroids=16))
    timed(f"prototype_pruning_{factor}x",
          lambda: similarity.prototype_pruning(emb_nx,
                                               n_centroids=16 * factor))
    def _with_source(df):
        # replicas carry only (doc_id, text); derive a 10-source mix
        return df.withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 10))
        )

    timed("temperature_resample_1x",
          lambda: text_ops.temperature_resample(_with_source(docs_1x)))
    timed(f"temperature_resample_{factor}x",
          lambda: text_ops.temperature_resample(_with_source(docs_nx)))

    # round-10 tail: shard assignment is a pure map + shard-partitioned
    # rank (expect ~linear); novelty is three narrow int shuffles
    # (expect ~linear); the skyline's two-stage prune should stay
    # near-FLAT in the final stage — candidates are O(partitions x
    # per-partition front), not O(n) — so wall tracks the scan
    timed("shard_assignment_1x", lambda: text_ops.shard_assignment(docs_1x))
    timed(f"shard_assignment_{factor}x",
          lambda: text_ops.shard_assignment(docs_nx))
    timed("ngram_novelty_1x", lambda: dedup.ngram_novelty(docs_1x))
    timed(f"ngram_novelty_{factor}x", lambda: dedup.ngram_novelty(docs_nx))

    from utn_dataengineering_stockmarketpipeline_spark.functions.hashing import (
        md5_prefix64,
    )
    from utn_dataengineering_stockmarketpipeline_spark.operators.skyline import (
        skyline_2d,
    )

    def _points(docs):
        # independent-ish dims -> expected front O(log n): the shape
        # the local prune is designed for
        return docs.select(
            "doc_id",
            F.length("text").cast("double").alias("x"),
            (md5_prefix64(F.col("doc_id").cast("string")) % 1000000)
            .cast("double").alias("y"),
        )

    timed("skyline_1x", lambda: skyline_2d(_points(docs_1x), "x", "y"))
    timed(f"skyline_{factor}x", lambda: skyline_2d(_points(docs_nx), "x", "y"))

    # KS drift: one counts shuffle, then grid work bounded by the VALUE
    # DOMAIN (|sources| x |distinct lengths| is the same at 1x and 10x)
    # -> wall should track the scan, near-flat past it
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    def _sourced(docs):
        return docs.select(
            F.length("text").alias("n_chars"),
            F.concat(F.lit("src"), (F.col("doc_id") % 10)).alias("source"),
        )

    timed("ks_drift_1x",
          lambda: skew.ks_drift(_sourced(docs_1x), "n_chars", "source"))
    timed(f"ks_drift_{factor}x",
          lambda: skew.ks_drift(_sourced(docs_nx), "n_chars", "source"))

    # EMD drift rides the same counts grid as KS — same near-flat
    # expectation past the scan
    timed("emd_drift_1x",
          lambda: skew.emd_drift(_sourced(docs_1x), "n_chars", "source"))
    timed(f"emd_drift_{factor}x",
          lambda: skew.emd_drift(_sourced(docs_nx), "n_chars", "source"))

    # Zipf slope: token-count shuffle scales with the corpus, the
    # vocabulary relation (replicated text -> constant distinct terms)
    # and the OLS reduction do not
    timed("zipf_slope_1x", lambda: text_ops.zipf_slope(docs_1x))
    timed(f"zipf_slope_{factor}x", lambda: text_ops.zipf_slope(docs_nx))

    for df in (docs_1x, docs_nx, emb_1x, emb_nx):
        df.unpersist()

    # Gini: bucket offsets ride the value-domain relation (constant),
    # the rank window partitions by bucket — wall should track the
    # scan. Deterministic hash values over a 1e6 domain, 100 buckets.
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        gini_concentration,
    )

    def _gvals(n):
        return spark.range(n).select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("v"),
        )

    timed("gini_1x",
          lambda: gini_concentration(_gvals(200_000), "v", "k",
                                     bucket_width=10_000))
    timed(f"gini_{factor}x",
          lambda: gini_concentration(_gvals(200_000 * factor), "v", "k",
                                     bucket_width=10_000))

    # basket pairs: fixed item universe (10k), 4-item baskets — the
    # pair self-join fan-out is C(4,2) per basket, linear in baskets
    from utn_dataengineering_stockmarketpipeline_spark.operators.baskets import (
        copurchase_pairs,
    )

    def _baskets(n):
        return spark.range(4 * n).select(
            (F.col("id") % n).alias("bk"),
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("it"),
        )

    timed("basket_pairs_1x",
          lambda: copurchase_pairs(_baskets(100_000), "bk", "it"))
    timed(f"basket_pairs_{factor}x",
          lambda: copurchase_pairs(_baskets(100_000 * factor), "bk", "it"))

    # label propagation: 3 rounds over a degree-6 random graph — per
    # round one edges⋈labels join, so wall should scale with edges
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        label_propagation,
    )

    def _lpa_edges(n):
        return spark.range(3 * n).select(
            F.pmod(F.xxhash64("id"), F.lit(n)).cast("string").alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n)).cast("string")
            .alias("dst"),
        )

    timed("lpa_1x", lambda: label_propagation(_lpa_edges(20_000), rounds=3))
    timed(f"lpa_{factor}x",
          lambda: label_propagation(_lpa_edges(20_000 * factor), rounds=3))

    # round-9 span/pixel operators on affine-scrambled replicas (clean
    # corpus growth — suffix-variant replicas would share every k-gram
    # and pixel across the replica group and measure pair explosion)
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        multimodal,
    )

    sc_1x = _scrambled_docs(spark, sf_dir, 1)
    sc_nx = _scrambled_docs(spark, sf_dir, factor)
    for df in (sc_1x, sc_nx):
        df.persist().count()
    timed("substring_dedup_1x", lambda: dedup.substring_duplicate_pairs(sc_1x))
    timed(f"substring_dedup_{factor}x",
          lambda: dedup.substring_duplicate_pairs(sc_nx))

    def _assets(docs):
        return multimodal.synthetic_assets(
            docs.withColumn("n_chars", F.length("text"))
        ).filter(F.col("modality") == "image")

    timed("phash_pairs_1x", lambda: multimodal.phash_near_pairs(_assets(sc_1x)))
    timed(f"phash_pairs_{factor}x",
          lambda: multimodal.phash_near_pairs(_assets(sc_nx)))
    for df in (sc_1x, sc_nx):
        df.unpersist()

    _scd2_scale(spark, factor, out)
    _streaming_scale(spark, sf_dir, factor, out)
    _interval_scale(spark, sf_dir, factor, out)
    _skew_join_scale(spark, factor, out)
    _graph_scale(spark, sf_dir, factor, out)
    _asof_skew_scale(spark, factor, out)
    return out


def _graph_scale(spark, sf_dir: str, factor: int, out: dict) -> None:
    """Iterative-graph scale evidence: (a) connected components over the
    minhash LSH pair graph of the 1× and ×factor corpus — wall time AND
    round count recorded (LSH graphs are shallow; rounds should hold
    constant); (b) CC over a deep CHAIN whose diameter grows ×factor —
    the adversarial case; rounds should grow ~log2(factor)≈3, not
    ×factor, proving the pointer-jump bound; (c) PageRank (fixed 10
    rounds) over the customer→supplier order graph replicated into
    ×factor disjoint key namespaces — same per-node degree, ×factor
    nodes, so the ratio isolates per-round scaling."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        pagerank,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    for label, fac in (("cc_minhash_1x", 1), (f"cc_minhash_{factor}x", factor)):
        docs = _replicate_docs(spark, sf_dir, fac).persist()
        docs.count()
        pairs = dedup.minhash_candidates(docs).persist()
        pairs.count()  # isolate CC time from pair generation
        st: dict = {}
        _full_gc(spark)
        t0 = time.perf_counter()
        # small_graph_cap=None: the evidence measures the DISTRIBUTED
        # propagation path's scaling — the adaptive driver fast path
        # (which the catalog queries keep) would swallow the 1x graph
        # and make the ratio compare driver closure vs distributed loop
        n = dedup.duplicate_clusters(
            pairs, docs, small_graph_cap=None, stats=st
        ).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3),
                      "rows": n, **st}
        pairs.unpersist()
        docs.unpersist()

    chain_base = 5_000
    for label, n in (("cc_chain_1x", chain_base),
                     (f"cc_chain_{factor}x", chain_base * factor)):
        ids = spark.range(n).select(F.col("id").alias("doc_id")).persist()
        chain = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        ).persist()
        ids.count(), chain.count()
        st = {}
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = dedup.duplicate_clusters(
            chain, ids, small_graph_cap=None, stats=st
        ).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3),
                      "rows": rows, **st}
        ids.unpersist(), chain.unpersist()

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_custkey", "l_suppkey"
    )
    for label, fac in (("pagerank_1x", 1), (f"pagerank_{factor}x", factor)):
        rep = spark.range(fac).select(F.col("id").alias("rep"))
        edges = base.crossJoin(rep).select(
            F.concat(F.lit("C"), F.col("rep"), F.lit("_"),
                     F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("rep"), F.lit("_"),
                     F.col("l_suppkey")).alias("dst"),
        ).distinct().persist()
        edges.count()
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = pagerank(edges, iters=10).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        edges.unpersist()

    # bounded BFS reach (r11): same replicated graph, seeds = every
    # replica's nation-0 customers, 4 relaxation rounds. Replica
    # namespaces are disconnected, so reached rows scale exactly with
    # the factor while per-round join width scales with edges — the
    # ratio isolates the round cost like the pagerank entry.
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        bfs_hops,
    )

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") == 0
    ).select("c_custkey")
    for label, fac in (("bfs_reach_1x", 1), (f"bfs_reach_{factor}x", factor)):
        rep = spark.range(fac).select(F.col("id").alias("rep"))
        edges = base.crossJoin(rep).select(
            F.concat(F.lit("C"), F.col("rep"), F.lit("_"),
                     F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("rep"), F.lit("_"),
                     F.col("l_suppkey")).alias("dst"),
        ).distinct().persist()
        seeds = cust.crossJoin(rep).select(
            F.concat(F.lit("C"), F.col("rep"), F.lit("_"),
                     F.col("c_custkey")).alias("node")
        )
        edges.count()
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = bfs_hops(edges, seeds, max_hops=4).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        edges.unpersist()

    # weighted shortest path + k-core (r12): same namespace replica,
    # weights = cheapest order quantity per relationship. Both share
    # the bounded-loop skeleton; the ratio isolates per-round join +
    # eager-checkpoint cost exactly like the bfs entry.
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        kcore_peel,
        shortest_path_weighted,
    )

    liq = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    wbase = (
        liq.join(o, liq["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.min(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    for label, fac in (("shortest_path_1x", 1),
                       (f"shortest_path_{factor}x", factor)):
        rep = spark.range(fac).select(F.col("id").alias("rep"))
        edges = wbase.crossJoin(rep).select(
            F.concat(F.lit("C"), F.col("rep"), F.lit("_"),
                     F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("rep"), F.lit("_"),
                     F.col("l_suppkey")).alias("dst"),
            "w",
        ).persist()
        seeds = cust.crossJoin(rep).select(
            F.concat(F.lit("C"), F.col("rep"), F.lit("_"),
                     F.col("c_custkey")).alias("node")
        )
        edges.count()
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = shortest_path_weighted(edges, seeds, max_rounds=4).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        edges.unpersist()

    for label, fac in (("kcore_1x", 1), (f"kcore_{factor}x", factor)):
        rep = spark.range(fac).select(F.col("id").alias("rep"))
        edges = base.crossJoin(rep).select(
            F.concat(F.lit("C"), F.col("rep"), F.lit("_"),
                     F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("rep"), F.lit("_"),
                     F.col("l_suppkey")).alias("dst"),
        ).distinct().persist()
        edges.count()
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = kcore_peel(edges, k=4, rounds=3).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        edges.unpersist()

    # triangle census on the SCRAMBLED-replica LSH pair graph (the
    # zero-collision corpus — same reasoning as minhash_pipeline in
    # tools/scale100.py: exact-copy replicas would explode the pair
    # output quadratically as a data property, masking the operator's
    # own join cost)
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        triangle_stats,
    )

    sc1 = _scrambled_docs(spark, sf_dir, 1)
    scn = _scrambled_docs(spark, sf_dir, factor)
    for df in (sc1, scn):
        df.persist().count()
    for label, docs in (("triangles_1x", sc1),
                        (f"triangles_{factor}x", scn)):
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = triangle_stats(dedup.minhash_candidates(docs)).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
    for df in (sc1, scn):
        df.unpersist()


def _asof_skew_scale(spark, factor: int, out: dict,
                     base_rows: int = 100_000) -> None:
    """As-of join under HOT-KEY skew: ×factor trades where 30% of all
    rows hit ONE ticker, vs a uniform left of identical size, against
    the same quote table. The union-window plan shuffles once on the
    key and window-sorts per key partition — the hot key concentrates
    its sort in one task, so 'flat under skew' (skew/uniform ≈ 1) is
    the claim being evidenced. At 100 TB a single key holding 30% of
    ALL rows additionally wants the interval-bucketed variant
    (interval_overlap_join) or a time-bucketed composite key; this
    entry pins where that cliff is NOT yet hit."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators.asof import (
        asof_join,
    )

    n = base_rows * factor
    n_tickers = 100
    quotes = spark.range(n_tickers * 1_000).select(
        (F.col("id") % n_tickers).alias("ticker"),
        (F.expr(f"id div {n_tickers}") * F.lit(90)).alias("q_ts"),
        (F.col("id").cast("double") / 100).alias("quote_px"),
    ).persist()

    def trades(skewed: bool):
        key = (
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_tickers)))
            if skewed
            else F.pmod(F.col("id"), F.lit(n_tickers))
        )
        return spark.range(n).select(
            key.alias("ticker"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(90_000)).alias("t_ts"),
            F.col("id").alias("trade_id"),
        ).persist()

    uni, skw = trades(False), trades(True)
    quotes.count(), uni.count(), skw.count()
    for label, left in ((f"asof_uniform_{factor}x", uni),
                        (f"asof_skew_{factor}x", skw)):
        _full_gc(spark)
        t0 = time.perf_counter()
        rows = asof_join(
            left, quotes, on="ticker", left_time="t_ts",
            right_time="q_ts", value_cols=["quote_px"],
        ).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
    out[f"asof_skew_over_uniform_{factor}x"] = round(
        out[f"asof_skew_{factor}x"]["sec"]
        / max(out[f"asof_uniform_{factor}x"]["sec"], 1e-9), 2
    )
    quotes.unpersist(), uni.unpersist(), skw.unpersist()


def _skew_join_scale(spark, factor: int, out: dict,
                     base_rows: int = 1_000_000) -> None:
    """Hot-key join at ×factor volume, plain vs salted: the big side
    puts 30% of all rows on ONE key (the hot-ticker / boilerplate-
    bucket shape). Broadcast is disabled for the measurement — at
    100 TB the dimension can exceed the broadcast threshold, and a
    broadcast join would sidestep the skew being demonstrated. The
    salted plan splits the hot key across n_salts tasks
    (operators/skew.salted_join); AQE's own skew splitting is active
    in both runs, so the delta shows what explicit salting adds on
    top of AQE. Measured honestly: AQE's sort-merge skew split covers
    this join shape on its own (salting costs ~25% extra) — the
    salted operators earn their keep on the shapes AQE cannot split:
    skewed AGGREGATIONS (salted_distinct_count, exercised by
    ana_distinct_users_salted) and non-SMJ join paths."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import salted_join

    n = base_rows * factor
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
        .alias("k"),
        F.col("id").alias("v"),
    ).persist()
    small = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    ).persist()
    big.count(), small.count()
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for label, joined in (
            (f"skew_join_plain_{factor}x", big.join(small, "k")),
            (f"skew_join_salted_{factor}x", salted_join(big, small, "k")),
        ):
            _full_gc(spark)
            t0 = time.perf_counter()
            rows = joined.agg(F.count(F.lit(1))).first()[0]
            out[label] = {"sec": round(time.perf_counter() - t0, 3),
                          "rows": rows}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        big.unpersist(), small.unpersist()


def _interval_scale(spark, sf_dir: str, factor: int, out: dict) -> None:
    """Interval-overlap join at 1× and ×factor left intervals against a
    fixed promo side: the bucketed equi-join plan should scale with
    |L| + output pairs, never |L|×|R|. Replicas shift by a few days per
    copy so the interval distribution spreads instead of stacking."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators.asof import (
        interval_overlap_join,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    epoch = F.lit("1970-01-01").cast("date")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("ship_lo")
    )
    promo = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.trunc(F.col("l_shipdate").cast("date"), "month").alias("m"))
        .distinct()
        .select(F.datediff(F.col("m"), epoch).alias("promo_lo"))
        .withColumn("promo_hi", F.col("promo_lo") + 6)
    )
    rep = spark.range(factor).select(F.col("id").alias("rep"))

    def left(fac_df):
        return (
            li.crossJoin(fac_df)
            .select((F.col("ship_lo") + F.col("rep") * 3).alias("lo"))
            .withColumn("hi", F.col("lo") + 6)
        )

    l1 = left(rep.limit(1)).persist()
    ln = left(rep).persist()
    l1.count(), ln.count()
    for label, l in ((f"interval_overlap_1x", l1), (f"interval_overlap_{factor}x", ln)):
        _full_gc(spark)
        t0 = time.perf_counter()
        n = interval_overlap_join(
            l, promo, "lo", "hi", "promo_lo", "promo_hi", bucket_width=7
        ).count()
        out[label] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
    l1.unpersist(), ln.unpersist()


def _write_artifact(artifact: dict, target: Path) -> None:
    """Write the full bench artifact, preserving curated per-round
    annotations (``*_note`` keys added between captures, e.g. the r17
    capture-context note) from the prior file unless this run
    re-emitted the key itself — the tools/scale100.py preserve-notes
    protocol (r18, VERDICT r17 #5: the driver's own bench run silently
    dropped r17_capture_note on overwrite)."""
    if target.exists():
        try:
            prior = json.loads(target.read_text())
            # non-dict JSON (a list/scalar prior) has no notes to carry
            # and .items() on it would raise OUTSIDE the except types
            if isinstance(prior, dict):
                for k, v in prior.items():
                    if k.endswith("_note") and k not in artifact:
                        artifact[k] = v
        except (ValueError, OSError):
            pass
    target.write_text(json.dumps(artifact, indent=2))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("utn-stockmarket-bench")
    timings: dict[str, float] = {}

    # Untimed warmup phase (see WARMUP_QUERIES): amortize process-level
    # JIT/codegen/Python-worker/Arrow/shuffle warmup for the whole
    # roster, so min-of-3 measures steady-state plans, not warmup
    # depth. The calibration/LSH members run TWICE — the r12/r14 A/B
    # captures showed that family converging over several runs, and
    # one min-of-3 pass on a cold path still reports an inflated min.
    for wname in WARMUP_QUERIES:
        CATALOG[wname].build(spark, sf_dir).count()
    for wname in ("llm_embedding_near_dup_lsh", "llm_minhash_calibration"):
        CATALOG[wname].build(spark, sf_dir).count()

    total = 0.0
    jvm_gc = spark.sparkContext._jvm.System.gc
    for name in BENCH_QUERIES:
        # Isolation: a full JVM GC before each query's timed runs, so a
        # query's number doesn't drift with how much catalog/cache work
        # the session did before it (r2 showed a uniform ~1.16× drift
        # attributable to accumulated session state, not plan changes).
        # min of 3 runs: run 1 pays one-off plan/codegen/broadcast
        # warmup, later runs are the steady state a real deployment
        # sees. count() forces full materialization without
        # driver-collect cost dominating.
        jvm_gc()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            CATALOG[name].build(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    evidence = scale_evidence(spark, sf_dir)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # ×factor / ×1 wall-time ratios — the scale-linearity signal, tiny
    # enough to ride inline; the full evidence goes to bench_out.json.
    factor = evidence.get("factor", 10)
    ratios = {}
    for k, v in evidence.items():
        if isinstance(v, dict) and k.endswith("_1x"):
            big = evidence.get(f"{k[:-3]}_{factor}x")
            if isinstance(big, dict):
                ratios[k[:-3].rstrip("_")] = round(
                    big["sec"] / max(v["sec"], 1e-9), 2
                )
    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        # Measured run-to-run variance of the common-set total at
        # sf0.1 under this scheme: ±7% (per-query deltas under
        # ~30% at sub-second scale are noise, not regressions).
        "timing": "untimed warmup phase (WARMUP_QUERIES, LSH/calibration "
                  "members twice), then min-of-3 with full-GC isolation "
                  "per query",
        # r10->r11 reconciliation: the r10 capture's broad ~1.25x
        # per-query slowdown was HOST LOAD, not code — the r11 re-run
        # on an idle host matches r9 at median ratio 0.990 over the 48
        # common queries, and r10's worst "regressors" (ref_macd
        # 1.77x, join_asof_nearest_price 1.61x — untouched code)
        # recovered to 0.51x/0.52x of their r10 numbers with no change.
        "variance_note": "r10 capture was host-load-skewed ~1.25x; "
                         "r11 idle re-run matches r9 (median 0.99)",
        # r12 LSH-family attribution: near_dup_lsh/curation_pipeline
        # drifted 1.3-1.4x vs r9 across two rounds, but the whole call
        # path is git-identical to r9 (empty diffs: operator, bucketing
        # BLAS, cosine, both catalog builders). An interleaved fresh-JVM
        # A/B (3 alternations x min-of-3, GC-isolated) converges to r9
        # levels by the third alternation — near_dup_lsh 3.59/2.96/1.72
        # vs r9 1.54 (1.12x), curation 6.02/4.31/3.71 vs r9 3.42
        # (1.08x) — i.e. the family needs deeper Python-worker/JIT
        # warm-up than min-of-3 in a busy session provides; no plan
        # regression exists.
        "lsh_family_note": "r9->r11 1.3-1.4x drift is warmup depth + "
                           "load, not code: path git-identical to r9; "
                           "interleaved A/B reconverges to 1.08-1.12x",
        # r14 minhash_calibration re-measure (VERDICT r13 ask): path
        # git-identical to r12 (c52f8f3..HEAD diff has zero
        # calibration lines); an idle min-of-5 GC-isolated A/B
        # converges monotonically 5.56 -> 2.76 -> 2.52 -> 2.36 -> 2.19 s
        # within one session (vs r12 1.87 = 1.17x, vs r13 2.60 =
        # 0.84x) — the same warmup-depth family as the LSH note above;
        # no plan regression exists.
        "calibration_note": "minhash_calibration r12->r14 drift is "
                            "warmup depth, not code: path git-identical "
                            "to r12; idle min-of-5 converges to 2.19s "
                            "(1.17x r12, 0.84x r13)",
        # r16 root cause of ALL the capture drift above: the host shows
        # load-average spikes of 10-20+ with no processes visible
        # inside the container (ambient noisy neighbors), so absolute
        # captures taken in different rounds swing 2-3x. The warmup
        # phase removes the warmup-depth component; the load component
        # is recorded here so a capture can be judged in context.
        # Same-session interleaved A/Bs (AB_r16_theil.json,
        # AB_r16_regressions.json) are the comparison instrument.
        "loadavg_at_capture": [round(x, 2) for x in os.getloadavg()],
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        f"scale_ratios_{factor}x_over_1x": ratios,
        "scale_evidence_file": "bench_out.json",
    }
    # Full artifact (per-query timings + complete scale evidence) to a
    # file; the FIRST stdout line carries the complete per-query record
    # for humans/logs. The driver records only the LAST 2000 bytes of
    # stdout — with 67 queries even a compact full line exceeds that
    # (r5-r7 all arrived mid-line-truncated, "parsed": null) — so the
    # FINAL line is a summary trimmed to a hard byte budget: headline
    # total, scale ratios, and as many of the slowest per-query timings
    # as fit; the rest live in bench_out.json (referenced) and line 1.
    _write_artifact(
        {**result, "scale_evidence": evidence},
        Path(__file__).resolve().parent / "bench_out.json",
    )
    print(json.dumps(result, separators=(",", ":")))
    spark.stop()  # stop BEFORE the final line: nothing may follow it

    compact = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": result["sf"],
        "n": len(timings),
        "queries_omitted": len(timings),  # placeholder, same digit width
        f"scale_ratios_{factor}x_over_1x": ratios,
        "artifact": "bench_out.json",
        "queries": {},
    }
    budget = 1850  # < 2000-byte tail capture, with slack for a newline
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        compact["queries"][name] = sec
        if len(json.dumps(compact, separators=(",", ":"))) > budget:
            del compact["queries"][name]
            break
    compact["queries_omitted"] = len(timings) - len(compact["queries"])
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= budget, len(line)
    print(line)


if __name__ == "__main__":
    main()
