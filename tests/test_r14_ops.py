"""Round-14 operator tests: pair-join cap guards, the trimmed Theil-Sen
median-bucket rank stage, and the r14 registrations (streaming CUSUM
drain, Theil-Sen vs OLS contamination eval, and friends)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_SMOKE  # noqa: F401  (fixtures)


def test_ticker_pair_guard_refuses_wide_universe(spark):
    """The ticker-pair self-joins refuse entity universes whose pair
    space exceeds MAX_PAIR_TICKERS — the MAX_THEIL_SEN_OBS discipline
    applied to ref_ticker_correlation / ref_spearman_tickers."""
    from utn_dataengineering_stockmarketpipeline_spark.plans import (
        queries_reference as qr,
    )

    rows = [
        (f"T{i:04d}", dt.date(2021, 1, 1 + d), 10.0 + d)
        for i in range(12)
        for d in range(3)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    ).select("stock_ticker", "stock_date", "stock_close")
    old = qr.MAX_PAIR_TICKERS
    qr.MAX_PAIR_TICKERS = 10
    try:
        with pytest.raises(ValueError, match="O\\(T²/2\\)"):
            qr._guard_ticker_pairs(df)
    finally:
        qr.MAX_PAIR_TICKERS = old
    # under the cap: no raise
    qr._guard_ticker_pairs(df)


def _grid_rows():
    """Synthetic (group, value) observations with ties, NULLs, and a
    contiguous over-represented band in group B (the case CUSUM is
    built to catch)."""
    rows = []
    rows += [("A", v) for v in (1, 2, 2, 3, 5, 8, 9, 10, 12, 15)]
    # B piles mass into the 6..8 band (offset by light tails)
    rows += [("B", v) for v in (1, 6, 6, 7, 7, 7, 8, 8, 15, 20)]
    rows += [("C", v) for v in (2, 3, 4, 5, 6, 9, 11, 13)]
    rows += [(None, 7), ("A", None)]  # dropped by the null filter
    return rows


def _brute_cusum(rows, h_ppm=100_000):
    from collections import Counter

    clean = [(g, v) for g, v in rows if g is not None and v is not None]
    n = len(clean)
    values = sorted({v for _, v in clean})
    out = {}
    for g in sorted({g for g, _ in clean}):
        cg = Counter(v for gg, v in clean if gg == g)
        cr = Counter(v for gg, v in clean if gg != g)
        n_g, n_r = sum(cg.values()), sum(cr.values())
        if n_r == 0:
            continue
        cum_g = cum_r = 0
        run_min = 0
        best = 0
        alarm = None
        for v in values:
            cum_g += cg.get(v, 0)
            cum_r += cr.get(v, 0)
            d = cum_g * n_r - cum_r * n_g
            run_min = min(run_min, d)
            s = d - min(0, run_min)
            best = max(best, s)
            if alarm is None and s * 1_000_000 > h_ppm * n_g * n_r:
                alarm = v
        out[g] = (n_g, best, (best * 1_000_000) // (n_g * n_r), alarm)
    return out


def test_cusum_drift_matches_bruteforce(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        cusum_drift,
    )

    df = spark.createDataFrame(_grid_rows(), "source string, n_chars long")
    got = {
        r.source: (r.n_docs, r.cusum_num, r.cusum_ppm, r.alarm_value)
        for r in cusum_drift(df, "n_chars", "source").collect()
    }
    want = _brute_cusum(_grid_rows())
    assert got == want
    # the banded group must alarm, and at a value inside its band
    assert want["B"][3] is not None and 6 <= want["B"][3] <= 8


def _brute_mann_whitney(rows):
    clean = [(g, v) for g, v in rows if g is not None and v is not None]
    out = {}
    for g in sorted({g for g, _ in clean}):
        xs = [v for gg, v in clean if gg == g]
        ys = [v for gg, v in clean if gg != g]
        if not ys:
            continue
        u2 = sum(
            2 if x > y else (1 if x == y else 0) for x in xs for y in ys
        )
        ngnr = len(xs) * len(ys)
        num = (u2 - ngnr) * 1_000_000
        # integral division truncates toward zero in both engines
        rb = num // ngnr if num >= 0 else -((-num) // ngnr)
        out[g] = (len(xs), u2, rb)
    return out


def test_mann_whitney_matches_bruteforce(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        mann_whitney_drift,
    )

    df = spark.createDataFrame(_grid_rows(), "source string, n_chars long")
    got = {
        r.source: (r.n_docs, r.u2, r.rank_biserial_ppm)
        for r in mann_whitney_drift(df, "n_chars", "source").collect()
    }
    assert got == _brute_mann_whitney(_grid_rows())


def test_mann_kendall_matches_bruteforce(spark):
    """S and tau-a against the plain-Python pair scan, including a
    tied-value series (ties contribute 0 to S) and a downtrend
    (negative integral division)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        mann_kendall,
    )

    series = {
        "UP": [10.0, 11.0, 12.0, 11.5, 13.0, 14.0],
        "DOWN": [90.0, 88.5, 89.0, 85.0, 84.2, 80.9],
        "TIED": [50.0, 50.0, 51.0, 50.0, 50.0],
    }
    # 2i + (i%2) is strictly increasing (2i + (i%3) is NOT: i=2,3
    # collide, and tied-date pairs are excluded by the a.d < b.d join)
    rows = [
        (t, dt.date(2021, 3, 1) + dt.timedelta(days=2 * i + (i % 2)), v)
        for t, xs in series.items()
        for i, v in enumerate(xs)
    ]
    rows.append(("UP", dt.date(2021, 2, 1), None))  # null discipline
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {
        r.stock_ticker: (r.n_obs, r.s_stat, r.tau_a_ppm)
        for r in mann_kendall(df).collect()
    }
    for t, xs in series.items():
        vc = [round(v * 100) for v in xs]
        s = sum(
            (1 if vc[j] > vc[i] else (-1 if vc[j] < vc[i] else 0))
            for i in range(len(vc))
            for j in range(i + 1, len(vc))
        )
        npairs = len(vc) * (len(vc) - 1) // 2
        num = s * 1_000_000
        tau = num // npairs if num >= 0 else -((-num) // npairs)
        assert got[t] == (len(vc), s, tau), t
    assert got["UP"][1] > 0 and got["DOWN"][1] < 0


def test_theil_sen_eval_robust_wins_on_contaminated_trend(spark):
    """On a clean linear trend with md5-deterministic ×10 spikes, the
    Theil-Sen slope must stay nearer the clean-OLS truth than the
    contaminated OLS — the measured robustness verdict."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        theil_sen_eval,
    )

    rows = [
        ("TREND", dt.date(2020, 1, 1) + dt.timedelta(days=i), 100.0 + i)
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    out = theil_sen_eval(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_obs == 80
    # md5 band is ~10%: deterministic, but sanity-bound it
    assert 1 <= r.n_spiked <= 25
    # clean truth = +1.00 $/day exactly (integer day grid)
    assert r.slope_clean_micro == 1_000_000
    assert r.robust_wins is True
    assert abs(r.slope_ts_micro - 1_000_000) < abs(
        r.slope_ols_micro - 1_000_000
    )


def test_gini_and_winsorized_ignore_null_rows(spark):
    """NULL values/groups must not shift bucket offsets or rank counts
    (the theil_sen r13-ADVICE defect class): results with NULL rows
    present equal results with them absent, and gini must not raise
    its negative-value error on a NULL."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        gini_concentration,
        winsorized_stats,
    )

    clean = [(i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
    dirty = clean + [(100, None), (101, None)]
    g_clean = gini_concentration(
        spark.createDataFrame(clean, "k long, v double"), "v", "k",
        bucket_width=3,
    ).collect()
    g_dirty = gini_concentration(
        spark.createDataFrame(dirty, "k long, v double"), "v", "k",
        bucket_width=3,
    ).collect()
    assert g_clean == g_dirty

    wclean = [("g1", float(v)) for v in [1, 2, 3, 4, 100]] + [
        ("g2", float(v)) for v in [5, 6, 7]
    ]
    wdirty = wclean + [("g1", None), (None, 3.0)]
    w_a = winsorized_stats(
        spark.createDataFrame(wclean, "g string, v double"), "v", "g"
    ).collect()
    w_b = winsorized_stats(
        spark.createDataFrame(wdirty, "g string, v double"), "v", "g"
    ).collect()
    assert sorted(map(tuple, w_a)) == sorted(map(tuple, w_b))


def test_ols_trend_matches_bruteforce(spark):
    """The standalone exact-moment OLS baseline: slope recovered
    exactly on an integer-grid trend, negative-safe, NULL-immune, and
    degenerate entities (single obs / single date) excluded."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        ols_trend,
    )

    rows = (
        [("UP", dt.date(2022, 1, 1) + dt.timedelta(days=i), 50.0 + 2 * i)
         for i in range(30)]
        + [("DOWN", dt.date(2022, 1, 1) + dt.timedelta(days=3 * i),
            90.0 - 0.5 * i) for i in range(20)]
        + [("ONE", dt.date(2022, 1, 1), 10.0)]
        + [("UP", dt.date(2021, 12, 1), None)]
    )
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {r.stock_ticker: r for r in ols_trend(df).collect()}
    assert set(got) == {"UP", "DOWN"}  # ONE excluded, NULL ignored
    assert got["UP"].n_obs == 30
    assert got["UP"].slope_micro == 2_000_000  # exactly +2.00 $/day
    # DOWN: -0.50 $ per 3 days = -1/6 $/day; toward-zero truncation
    num, den = -50 * 10_000 * 100, 3 * 100  # brute from integer moments
    import statistics
    xs = [3 * i for i in range(20)]
    ys = [round((90.0 - 0.5 * i) * 100) for i in range(20)]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = (n * sxy - sx * sy) * 10_000, n * sxx - sx * sx
    want = num // den if num >= 0 else -((-num) // den)
    assert got["DOWN"].slope_micro == want and want < 0


def test_seasonal_mann_kendall_matches_bruteforce(spark):
    """Hirsch-Slack: within-month pairs only. A pure seasonal sawtooth
    (high Jan, low Jul, no year-over-year change) must score S = 0,
    while a cross-year uptrend scores positive; brute force checks the
    exact S/tau on a mixed series."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        seasonal_mann_kendall,
    )

    rows = []
    # SAW: monthly cycle, identical every year -> every within-month
    # pair ties -> S = 0
    for year in (2020, 2021, 2022):
        for month in range(1, 13):
            rows.append(
                ("SAW", dt.date(year, month, 15), 100.0 + (month % 6))
            )
    # GROW: +1 every year in every month -> all within-month pairs
    # concordant
    for year in (2020, 2021, 2022):
        for month in range(1, 13):
            rows.append(
                ("GROW", dt.date(year, month, 15), 50.0 + year - 2020)
            )
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {
        r.stock_ticker: (r.n_obs, r.s_stat, r.tau_a_ppm)
        for r in seasonal_mann_kendall(df).collect()
    }
    # brute force: group by (ticker, month), pair within month by date
    from collections import defaultdict

    by_tm = defaultdict(list)
    for t, d, v in rows:
        by_tm[(t, d.month)].append((d, round(v * 100)))
    want = {}
    for t in ("SAW", "GROW"):
        s = npairs = nobs = 0
        for (tt, _m), obs in by_tm.items():
            if tt != t:
                continue
            obs.sort()
            nobs += len(obs)
            for i in range(len(obs)):
                for j in range(i + 1, len(obs)):
                    npairs += 1
                    s += (obs[j][1] > obs[i][1]) - (obs[j][1] < obs[i][1])
        num = s * 1_000_000
        tau = num // npairs if num >= 0 else -((-num) // npairs)
        want[t] = (nobs, s, tau)
    assert got == want
    assert got["SAW"][1] == 0 and got["SAW"][2] == 0
    assert got["GROW"][1] == 36 * 2 - 36  # 3 obs/month: C(3,2)=3 pairs,
    # all concordant -> 12 months * 3 = 36; s == n_pairs
    assert got["GROW"][2] == 1_000_000


def test_jonckheere_matches_bruteforce(spark):
    """J-T against the all-pairs brute force (ordered group pairs,
    ties at half weight), on ascending / flat / descending layouts."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        jonckheere_trend,
    )

    def brute(rows):
        clean = [(g, v) for g, v in rows if g is not None and v is not None]
        gs = sorted({g for g, _ in clean})
        j2 = ej2 = 0
        for i, a in enumerate(gs):
            for b in gs[i + 1:]:
                xs = [v for g, v in clean if g == a]
                ys = [v for g, v in clean if g == b]
                ej2 += len(xs) * len(ys)
                j2 += sum(
                    2 if y > x else (1 if y == x else 0)
                    for x in xs
                    for y in ys
                )
        num = (j2 - ej2) * 1_000_000
        ppm = num // ej2 if num >= 0 else -((-num) // ej2)
        return (len(gs), len(clean), j2, ej2, ppm)

    ascending = (
        [("r1", v) for v in (1, 2, 3, 2)]
        + [("r2", v) for v in (3, 4, 5, 4)]
        + [("r3", v) for v in (5, 6, 7, 8)]
        + [("r1", None), (None, 9)]
    )
    descending = [("r1", 9), ("r1", 8), ("r2", 5), ("r2", 4), ("r3", 1)]
    flat = [(g, v) for g in ("r1", "r2", "r3") for v in (4, 4, 4)]
    for rows in (ascending, descending, flat):
        df = spark.createDataFrame(rows, "source string, n_chars long")
        got = [
            (r.n_groups, r.n_obs, r.j2, r.ej2, r.trend_ppm)
            for r in jonckheere_trend(df, "n_chars", "source").collect()
        ]
        assert got == [brute(rows)], rows[:3]
    # direction sanity
    df = spark.createDataFrame(ascending, "source string, n_chars long")
    assert jonckheere_trend(df, "n_chars", "source").first().trend_ppm > 0
    df = spark.createDataFrame(descending, "source string, n_chars long")
    assert jonckheere_trend(df, "n_chars", "source").first().trend_ppm < 0
    df = spark.createDataFrame(flat, "source string, n_chars long")
    assert jonckheere_trend(df, "n_chars", "source").first().trend_ppm == 0


def test_counts_grid_mergeability_under_any_batching(spark):
    """The streaming drains' core claim: per-batch partial counts are
    ADDITIVE, so the statistic from the merged grid equals the batch
    statistic regardless of how the corpus was split into batches.
    Pinned here for every grid consumer (KS, PSI, EMD, CUSUM,
    Mann-Whitney, Jonckheere, Kruskal-Wallis) at 2-way and 5-way
    splits."""
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        cusum_drift_from_counts,
        emd_drift_from_counts,
        jonckheere_from_counts,
        kruskal_wallis_from_counts,
        ks_drift_from_counts,
        mann_whitney_from_counts,
        psi_drift_from_counts,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "n_chars"
    ).filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
    full_counts = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c")
    )
    stat_fns = (
        ks_drift_from_counts,
        psi_drift_from_counts,
        emd_drift_from_counts,
        cusum_drift_from_counts,
        mann_whitney_from_counts,
        jonckheere_from_counts,
        kruskal_wallis_from_counts,
    )
    want = [
        sorted(map(tuple, fn(full_counts, "n_chars", "source").collect()))
        for fn in stat_fns
    ]
    for k in (2, 5):
        partials = [
            docs.filter(F.col("doc_id") % k == i)
            .groupBy("source", "n_chars")
            .agg(F.count(F.lit(1)).alias("c"))
            for i in range(k)
        ]
        merged = partials[0]
        for p in partials[1:]:
            merged = merged.unionByName(p)
        merged = merged.groupBy("source", "n_chars").agg(
            F.sum("c").alias("c")
        )
        for fn, w in zip(stat_fns, want):
            got = sorted(
                map(tuple, fn(merged, "n_chars", "source").collect())
            )
            assert got == w, (fn.__name__, k)
