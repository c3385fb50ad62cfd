"""Round-16 operator tests: the scale-adaptive Theil-Sen machinery.

The r16 rewrite split _theil_sen_from_base into two physical
strategies selected by the per-entity max observation count the cap
probe already collects (naive single-level for short series, block-
decomposed two-level for long ones — AB_r16_theil.json has the
measured split). These tests pin the load-bearing claim: BOTH
strategies emit bit-identical results, and they match a brute-force
lower-median over every pair slope.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F


def _series(spark, n_per_entity=(97, 150, 23, 1, 2), seed=7):
    """Deterministic synthetic (e, d, vc) series: jagged lengths
    including degenerate 1- and 2-obs entities, duplicate values (bucket
    ties), spikes (cross-bucket spread), and a flat entity."""
    rng = random.Random(seed)
    rows = []
    for k, n in enumerate(n_per_entity):
        e = f"T{k}"
        v = 10_000
        for i in range(n):
            d = dt.date(2020, 1, 1) + dt.timedelta(days=i * (k + 1))
            if k == 3:
                vc = 5_000  # single obs
            elif k == 2:
                vc = 7_777  # flat series: all pair slopes exactly 0
            else:
                v += rng.randint(-300, 310)
                vc = v if rng.random() > 0.05 else v * 10  # spikes
            rows.append((e, d, vc))
    return spark.createDataFrame(rows, "e string, d date, vc long")


def _brute_median(rows):
    """Brute-force per-entity lower-median pair slope in micro-$/day
    (ties broken by (slope, di, dj) — the operator's rank order)."""
    by_e = {}
    for e, d, vc in rows:
        by_e.setdefault(e, []).append((d, vc))
    out = {}
    for e, obs in by_e.items():
        obs.sort()
        pairs = []
        for i in range(len(obs)):
            for j in range(i + 1, len(obs)):
                di, vi = obs[i]
                dj, vj = obs[j]
                if di < dj:
                    dd = (dj - di).days
                    pairs.append(((vj - vi) / dd, di, dj, vj - vi, dd))
        if not pairs:
            continue
        pairs.sort(key=lambda p: (p[0], p[1], p[2]))
        sel = pairs[(len(pairs) + 1) // 2 - 1]
        dvc, dd = sel[3], sel[4]
        q, r = divmod(dvc * 10000, dd)
        micro = q if r == 0 or dvc >= 0 else q + 1  # div truncates to zero
        out[e] = (len(pairs), micro)
    return out


def test_theil_sen_strategies_identical_and_brute_forced(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    base = _series(spark)
    rows = [(r["e"], r["d"], r["vc"]) for r in base.collect()]
    naive = {
        r["e"]: (r["n_pairs"], r["slope_micro"])
        for r in risk._theil_sen_from_base(base, max_obs=10).collect()
    }
    blocked = {
        r["e"]: (r["n_pairs"], r["slope_micro"])
        for r in risk._theil_sen_from_base(
            base, max_obs=risk.TS_BLOCK_THRESHOLD + 1
        ).collect()
    }
    assert naive == blocked
    assert naive == _brute_median(rows)


def test_theil_sen_blocked_many_blocks(spark):
    """Force several blocks per entity (n >> blk_sz is impractical in a
    unit test, so shrink via a long single entity relative to the
    512-row block: 1100 obs -> 3 blocks) and pin against brute force."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rng = random.Random(11)
    rows, v = [], 50_000
    for i in range(1100):
        v += rng.randint(-40, 42)
        rows.append(("LONG", dt.date(2000, 1, 1) + dt.timedelta(days=i), v))
    base = spark.createDataFrame(rows, "e string, d date, vc long")
    got = {
        r["e"]: (r["n_pairs"], r["slope_micro"])
        for r in risk._theil_sen_from_base(
            base, max_obs=risk.TS_BLOCK_THRESHOLD + 1
        ).collect()
    }
    assert got == _brute_median(rows)


def test_theil_sen_slope_empty_and_single(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    empty = spark.createDataFrame(
        [], "stock_ticker string, stock_date date, stock_close double"
    )
    assert risk.theil_sen_slope(empty).collect() == []
    one = spark.createDataFrame(
        [("A", dt.date(2020, 1, 1), 10.0)],
        "stock_ticker string, stock_date date, stock_close double",
    )
    assert risk.theil_sen_slope(one).collect() == []


def test_theil_sen_eval_clean_recovery(spark):
    """The eval derives the clean series from the cached contaminated
    one by integer division — slope_clean_micro must equal a direct
    OLS fit on the raw base."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rng = random.Random(3)
    rows, v = [], 20_000
    for i in range(400):
        v += rng.randint(-25, 27)
        rows.append(
            ("A", dt.date(2021, 1, 1) + dt.timedelta(days=i), v / 100.0)
        )
    prices = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    out = risk.theil_sen_eval(prices).collect()
    assert len(out) == 1
    base = risk._trend_base(
        prices, "stock_ticker", "stock_date", "stock_close"
    )
    direct = risk._ols_slope_micro(base, "s").collect()[0]["s"]
    assert out[0]["slope_clean_micro"] == direct
    assert out[0]["n_spiked"] > 0  # the contamination actually fired


# ---- round-18 staged operators (built r16) --------------------------------


def _rets(spark, rows):
    return spark.createDataFrame(
        rows, "stock_ticker string, ret_ppm long"
    )


def test_omega_ratio_exact_integers(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rows = [("A", 100), ("A", -40), ("A", 7), ("A", -3), ("A", 0),
            ("B", 5), ("B", 5),          # no loss -> dropped
            ("C", -9)]                   # no gain -> omega 0
    out = {r["stock_ticker"]: r for r in
           risk.omega_ratio(_rets(spark, rows)).collect()}
    assert set(out) == {"A", "C"}
    assert out["A"]["gain_ppm_sum"] == 107
    assert out["A"]["loss_ppm_sum"] == 43
    assert out["A"]["omega_ppm"] == (107 * 1_000_000) // 43
    assert out["C"]["omega_ppm"] == 0


def test_sortino_ratio_brute_force(spark):
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rows = [("A", v) for v in (120, -80, 35, -15, 60, -5, 0)]
    rows += [("UP", 10), ("UP", 20)]  # no downside -> dropped
    out = {r["stock_ticker"]: r for r in
           risk.sortino_ratio(_rets(spark, rows)).collect()}
    assert set(out) == {"A"}
    vals = [v for e, v in rows if e == "A"]
    s = float(sum(vals))
    qd = float(sum(v * v for v in vals if v < 0))
    n = len(vals)
    mean_raw = s / n
    dd_raw = math.sqrt(qd / n)
    got = out["A"]
    assert abs(got["mean_ppm"] - mean_raw) < 1e-6
    assert abs(got["downside_ppm"] - dd_raw) < 1e-6
    assert abs(got["sortino_ann"]
               - (mean_raw / dd_raw) * math.sqrt(252.0)) < 1e-6


def test_mood_median_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    rows = []
    data = {"s1": [1, 2, 3, 9, 9], "s2": [5, 6, 7, 8, 2],
            "s3": [1, 1, 10, 10, 10, 10]}
    for src, vs in data.items():
        rows += [(i, src, v) for i, v in enumerate(vs)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    out = skew.mood_median_drift(
        df, value_col="n_chars", group_col="source"
    ).collect()
    assert len(out) == 1
    got = out[0]
    pooled = sorted(v for vs in data.values() for v in vs)
    n = len(pooled)
    med = pooled[(n + 1) // 2 - 1]
    assert got["grand_median"] == med
    a = {s: sum(1 for v in vs if v > med) for s, vs in data.items()}
    big_a = sum(a.values())
    assert got["n_above"] == big_a
    # exact integer replay of the emission algebra
    ssum = 0
    for s, vs in data.items():
        n_g = len(vs)
        d = a[s] * n - n_g * big_a
        ssum += (d * d * 1_000_000) // n_g
    assert got["chi2_micro"] == ssum // (big_a * (n - big_a))
    # and it approximates the textbook 2xK chi-square
    big_b = n - big_a
    chi2 = 0.0
    for s, vs in data.items():
        n_g = len(vs)
        ea, eb = n_g * big_a / n, n_g * big_b / n
        chi2 += (a[s] - ea) ** 2 / ea + ((n_g - a[s]) - eb) ** 2 / eb
    assert abs(got["chi2_micro"] / 1e6 - chi2) < len(data) * 1e-6 + 1e-9


def test_personalized_pagerank_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "a")]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a",), ("zzz_not_in_graph",)], "node string"
    )
    out = {r["node"]: r["rank"]
           for r in personalized_pagerank(e, seeds, iters=8).collect()}
    # python replay: teleport only to 'a' (the off-graph seed ignored)
    nodes = sorted({u for p in edges for u in p})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    tele = {u: (1.0 - 0.85) / 1 if u == "a" else 0.0 for u in nodes}
    rank = {u: 1.0 if u == "a" else 0.0 for u in nodes}
    for _ in range(8):
        inflow = {u: 0.0 for u in nodes}
        for s, d in edges:
            inflow[d] += rank[s] / outdeg[s]
        rank = {u: tele[u] + 0.85 * inflow[u] for u in nodes}
    assert set(out) == set(nodes)
    for u in nodes:
        assert abs(out[u] - rank[u]) < 1e-9, (u, out[u], rank[u])
    # teleport never reaches x (no inbound): rank exactly 0
    assert out["x"] == 0.0


def test_personalized_pagerank_empty_seeds(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("nope",)], "node string")
    assert personalized_pagerank(e, seeds, iters=3).collect() == []


def test_heaps_law_exact(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import text

    docs = [
        (0, "a b c"),        # bucket 0 (ids 0..7 with span 1? see below)
        (1, "a b"),
        (8, "c d"),
        (15, "d e f"),
    ]
    # ids 0..15 -> span = (15 - 0 + 16) div 16 = 1 -> bucket = id
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["bucket"]: r for r in text.heaps_law(df).collect()}
    assert set(out) == {0, 1, 8, 15}
    assert out[0]["n_docs_cum"] == 1
    assert out[0]["n_tokens_cum"] == 3
    assert out[0]["n_terms_cum"] == 3          # a b c
    assert out[1]["n_terms_cum"] == 3          # a b seen
    assert out[8]["n_tokens_cum"] == 7
    assert out[8]["n_terms_cum"] == 4          # + d
    assert out[15]["n_docs_cum"] == 4
    assert out[15]["n_tokens_cum"] == 10
    assert out[15]["n_terms_cum"] == 6         # + e f


def test_heaps_law_single_doc(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import text

    df = spark.createDataFrame([(7, "x  y x")], "doc_id long, text string")
    out = text.heaps_law(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bucket"], r["n_docs_cum"], r["n_tokens_cum"],
            r["n_terms_cum"]) == (0, 1, 3, 2)
