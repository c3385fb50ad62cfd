"""Skew-mitigation operator tests: salted plans must return exactly the
plain-plan answer while actually spreading the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import dedup, skew
from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import load_table

from conftest import SF_SMOKE


def _hot_key_df(spark, n_hot=5000, n_cold=200):
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(n_cold).select(
        F.concat(F.lit("c"), (F.col("id") % 20)).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_join_matches_plain_join(spark):
    big = _hot_key_df(spark)
    small = spark.createDataFrame(
        [("HOT", 1.0), ("c3", 2.0), ("c7", 3.0), ("absent", 9.0)],
        "k string, w double",
    )
    plain = big.join(small, "k").select("k", "v", "w")
    salted = skew.salted_join(big, small, on="k").select("k", "v", "w")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0

    # the hot key's rows really do land in many salt groups
    b = big.withColumn("__salt", skew._salt(["v"], 8))
    n_groups = (
        b.filter(F.col("k") == "HOT").select("__salt").distinct().count()
    )
    assert n_groups == 8


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest

    big = _hot_key_df(spark)
    small = spark.createDataFrame([("HOT", 1.0)], "k string, w double")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="not supported"):
            skew.salted_join(big, small, on="k", how=how)
    # left-side types still work
    assert skew.salted_join(big, small, on="k", how="left_anti").count() == 200


def test_salted_distinct_count_exact(spark):
    df = _hot_key_df(spark).withColumn("v", F.col("v") % 777)  # repeats
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in skew.salted_distinct_count(df, "k", "v").collect()
    }
    assert salted == plain


def test_lsh_bucket_cap_drops_only_oversized(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    uncapped = dedup.minhash_candidates(docs, max_bucket_size=None)
    capped = dedup.minhash_candidates(docs, max_bucket_size=10**6)
    # astronomically large cap: identical result
    assert uncapped.exceptAll(capped).count() == 0
    # cap of 1 kills every bucket → no pairs
    none = dedup.minhash_candidates(docs, max_bucket_size=1)
    assert none.count() == 0


def test_lsh_bucket_cap_on_by_default_kills_boilerplate_bucket(spark):
    """One adversarial boilerplate bucket (200 near-identical docs) must
    be DROPPED by the default cap, not expanded into ~20k pairs."""
    boiler = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("terms of service apply to all users of this site").alias(
            "text"
        ),
    )
    organic = spark.range(1000, 1040).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("organic document number "),
            F.col("id").cast("string"),
            F.lit(" with distinct content words"),
        ).alias("text"),
    )
    docs = boiler.unionAll(organic)

    capped = dedup.minhash_candidates(docs, max_bucket_size=100)
    boiler_pairs = capped.filter(F.col("id_a") < 200).count()
    assert boiler_pairs == 0, "oversized boilerplate bucket must be dropped"

    # and the default IS capped (same behavior as an explicit small cap
    # once the bucket exceeds it)
    default_pairs = dedup.minhash_candidates(docs)
    assert default_pairs.filter(F.col("id_a") < 200).count() > 0  # 200<1000
    uncapped = dedup.minhash_candidates(docs, max_bucket_size=None)
    # identical docs all collide: m(m-1)/2 pairs without any cap
    assert uncapped.filter(F.col("id_a") < 200).count() >= 199 * 200 // 2


def test_oracle_mirrors_default_bucket_cap():
    """The DuckDB oracles for the LSH queries must apply the SAME bucket
    cap as the Spark default, or Spark==oracle breaks by construction the
    moment any bucket exceeds the cap (ADVICE r2)."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG

    for name in ("llm_minhash_lsh_pairs", "llm_dup_clusters"):
        sql = CATALOG[name].oracle
        assert f"<= {dedup.DEFAULT_MAX_BUCKET_SIZE}" in sql, name
        assert "QUALIFY COUNT(*) OVER (PARTITION BY band, bucket)" in sql, name


def test_ks_drift_planted_shift(spark):
    """Group 'b' is a pure location shift of 'a'; group 'c' equals the
    pooled rest — KS must rank b's drift high and c's low, and the
    statistic must equal the brute-force two-sample definition."""
    rows = (
        [("a", v) for v in (1, 1, 2, 2, 3)]
        + [("b", v) for v in (8, 8, 9, 9, 10)]
        + [("c", v) for v in (1, 2, 3, 8, 9, 10)]
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import ks_drift

    got = {r.source: r for r in ks_drift(df, "n_chars", "source").collect()}

    def brute(g):
        gv = sorted(v for s, v in rows if s == g)
        rv = sorted(v for s, v in rows if s != g)
        vals = sorted({v for _, v in rows})
        num = max(
            abs(
                sum(1 for x in gv if x <= t) * len(rv)
                - sum(1 for x in rv if x <= t) * len(gv)
            )
            for t in vals
        )
        return num, len(gv) * len(rv)

    for g in ("a", "b", "c"):
        num, denom = brute(g)
        assert int(got[g].ks_num) == num
        assert int(got[g].ks_ppm) == num * 1_000_000 // denom
    # a and b are mirror images around the pool -> equal drift; c is
    # drawn from the pooled rest -> low drift
    assert got["b"].ks_ppm == got["a"].ks_ppm > got["c"].ks_ppm
    assert int(got["c"].ks_ppm) < 200_000


def test_ks_drift_excludes_whole_corpus_group(spark):
    """A group that IS the whole corpus has no rest to drift from:
    excluded (n_rest = 0 would divide by zero), other groups intact."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import ks_drift

    lone = spark.createDataFrame(
        [("a", 1), ("a", 2)], "source string, n_chars long"
    )
    assert ks_drift(lone, "n_chars", "source").count() == 0
    two = spark.createDataFrame(
        [("a", 1), ("b", 9)], "source string, n_chars long"
    )
    assert ks_drift(two, "n_chars", "source").count() == 2


def test_winsorized_stats_hand_values(spark):
    """Winsorized mean: clip bounds are the exact discrete order
    statistics, the outlier moves the raw mean but not the winsorized
    one, and ties/small groups follow the max(1, ceil(p*n)) rule."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        winsorized_stats,
    )

    # group g: 1..19 plus one 10000.0 outlier (n=20).
    # k_lo = ceil(20*.05) = 1 -> lo = 1.0; k_hi = ceil(20*.95) = 19
    # -> hi = 19.0; clipped outlier contributes 19.
    vals = [float(i) for i in range(1, 20)] + [10000.0]
    rows = [("g", v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["grp", "v", "tb"])
    r = winsorized_stats(df, "v", "grp", tiebreak="tb").collect()[0]
    assert r["n_rows"] == 20
    assert r["p_lo_val"] == 1.0
    assert r["p_hi_val"] == 19.0
    assert r["win_mean"] == (sum(range(1, 20)) + 19) / 20
    assert r["raw_mean"] == (sum(range(1, 20)) + 10000.0) / 20


def test_psi_drift_matches_bruteforce(spark):
    """psi_drift == plain-Python PSI with discrete decile boundaries and
    add-1 smoothing, on a corpus where one source is a pure location
    shift (high PSI) and another mirrors the pool (low PSI)."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        psi_drift,
    )

    rows = (
        [("a", v) for v in range(0, 40)]          # uniform low
        + [("b", v) for v in range(60, 100)]      # shifted high
        + [("c", v) for v in range(0, 100, 2)]    # spans the pool
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["source"]: r for r in
           psi_drift(df, "n_chars", "source").collect()}

    vals = sorted(v for _, v in rows)
    n = len(vals)
    # percentile-disc boundaries: smallest value whose cumulative count
    # reaches j/10 of the corpus
    from collections import Counter
    cnt = Counter(vals)
    bounds = []
    for j in range(1, 10):
        cum = 0
        for v in sorted(cnt):
            cum += cnt[v]
            if cum * 10 >= j * n:
                bounds.append(v)
                break

    def bin_of(v):
        return sum(1 for b in bounds if b < v)

    for g in ("a", "b", "c"):
        gv = [v for s, v in rows if s == g]
        rv = [v for s, v in rows if s != g]
        cg = Counter(bin_of(v) for v in gv)
        cr = Counter(bin_of(v) for v in rv)
        psi_micro = 0
        for i in range(10):
            p = (cg.get(i, 0) + 1.0) / (len(gv) + 10.0)
            q = (cr.get(i, 0) + 1.0) / (len(rv) + 10.0)
            psi_micro += math.floor((p - q) * math.log(p / q) * 1e6 + 0.5)
        r = got[g]
        assert r["n_docs"] == len(gv)
        assert r["psi_micro"] == psi_micro, g
    # the shifted source drifts far more than the pool-like one
    assert got["b"].psi_micro > got["c"].psi_micro
    assert got["a"].psi_micro > got["c"].psi_micro
