"""Round-13 operators: EMD drift, Spearman, basket pairs, Benford,
label propagation — each checked against an independent plain-Python
brute force (the test_skew.py discipline), never against its own SQL
oracle (that cross-check lives in test_catalog_oracle.py).
"""

from __future__ import annotations

from collections import Counter

from conftest import SF_SMOKE


def test_emd_drift_matches_bruteforce(spark):
    """emd_drift == Σ|F_g − F_rest|·gap computed in plain Python, on a
    corpus with a planted location shift; the shift must out-drift the
    pool-like source, and a PARTIAL shift must score between them
    (the property KS cannot express: KS saturates at the worst point,
    EMD integrates)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import emd_drift

    rows = (
        [("a", v) for v in (1, 1, 2, 2, 3)]
        + [("b", v) for v in (8, 8, 9, 9, 10)]      # far shift
        + [("c", v) for v in (1, 2, 3, 8, 9, 10)]   # spans the pool
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: r for r in emd_drift(df, "n_chars", "source").collect()}

    vals = sorted({v for _, v in rows})
    for g in ("a", "b", "c"):
        gv = [v for s, v in rows if s == g]
        rv = [v for s, v in rows if s != g]
        area = sum(
            abs(
                sum(1 for x in gv if x <= v) * len(rv)
                - sum(1 for x in rv if x <= v) * len(gv)
            )
            * (nxt - v)
            for v, nxt in zip(vals, vals[1:])
        )
        assert r_micro(got[g]) == area * 1_000_000 // (len(gv) * len(rv)), g
        assert got[g].n_docs == len(gv)
    assert got["b"].emd_micro > got["c"].emd_micro
    assert got["a"].emd_micro > got["c"].emd_micro


def r_micro(row):
    return int(row.emd_micro)


def test_emd_drift_excludes_whole_corpus_group(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import emd_drift

    lone = spark.createDataFrame(
        [("a", 1), ("a", 2)], "source string, n_chars long"
    )
    assert emd_drift(lone, "n_chars", "source").count() == 0


def test_emd_vs_ks_small_shift_everywhere(spark):
    """The motivating separation: a 1-unit shift of EVERY value keeps
    KS small (CDFs stay close pointwise) while a mass teleport to one
    far value spikes KS; EMD ranks by total transported mass×distance,
    so the far teleport must dominate on EMD too — but the near-shift
    source must show MORE EMD per unit of KS than the teleport."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        emd_drift,
        ks_drift,
    )

    base = list(range(0, 20, 2))
    rows = (
        [("shift", v + 1) for v in base]            # +1 everywhere
        + [("spike", v) for v in base[:-1]] + [("spike", 1000)]
        + [("pool", v) for v in base] * 3
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    emd = {r.source: int(r.emd_micro) for r in
           emd_drift(df, "n_chars", "source").collect()}
    ks = {r.source: int(r.ks_ppm) for r in
          ks_drift(df, "n_chars", "source").collect()}
    assert emd["spike"] > emd["shift"]                      # 980-unit haul
    assert ks["shift"] * emd["spike"] < ks["spike"] * emd["shift"] * 100
    # cross-ratio: shift moves little mass-distance but touches every
    # point; spike's EMD/KS ratio must exceed shift's
    assert emd["spike"] / ks["spike"] > emd["shift"] / ks["shift"]


def test_spearman_tickers_matches_bruteforce(spark):
    """Catalog Spearman == plain-Python ranks over the same returns,
    including the date tie-break, at sf0.001."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
    from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
        stock_prices,
    )

    got = {
        (r.ticker_a, r.ticker_b): r
        for r in CATALOG["ref_spearman_tickers"].build(spark, SF_SMOKE).collect()
    }
    px = sorted(
        ((r.stock_ticker, r.stock_date, r.stock_close)
         for r in stock_prices(spark, SF_SMOKE).collect()),
        key=lambda t: (t[0], t[1]),
    )
    rets: dict[str, dict] = {}
    for i, (t, d, c) in enumerate(px):
        if i and px[i - 1][0] == t:
            rets.setdefault(t, {})[d] = c / px[i - 1][2] - 1
    tickers = sorted(rets)
    assert got, "no pairs returned"
    for i, ta in enumerate(tickers):
        for tb in tickers[i + 1:]:
            days = sorted(set(rets[ta]) & set(rets[tb]))
            if len(days) < 2:
                assert (ta, tb) not in got
                continue
            xs = [(rets[ta][d], d) for d in days]
            ys = [(rets[tb][d], d) for d in days]
            rank_x = {d: i + 1 for i, (_, d) in enumerate(sorted(xs))}
            rank_y = {d: i + 1 for i, (_, d) in enumerate(sorted(ys))}
            sd2 = sum((rank_x[d] - rank_y[d]) ** 2 for d in days)
            n = len(days)
            rho = 1_000_000 - (6_000_000 * sd2) // (n * (n * n - 1))
            assert int(got[(ta, tb)].rho_micro) == rho, (ta, tb)
            assert got[(ta, tb)].n_days == n


def test_copurchase_pairs_bruteforce_and_caps(spark):
    """copurchase_pairs == brute-force pair counting over baskets,
    quantity rows dedup per basket, the mega-basket is EXCLUDED (not
    truncated) from pairs, supports, and n_baskets, and lift is exact
    integral micro-units."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.baskets import (
        copurchase_pairs,
    )

    baskets = {
        1: ["x", "y", "z"],
        2: ["x", "y"],
        3: ["x", "y", "y"],        # duplicate item row: counts once
        4: ["z"],
        5: list(map(str, range(100))),  # mega-basket: excluded (>8)
        6: ["x", "z"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r.item_a, r.item_b): r
        for r in copurchase_pairs(
            df, "bk", "it", min_support=2, max_basket=8
        ).collect()
    }

    kept = {b: sorted(set(i)) for b, i in baskets.items() if
            len(set(i)) <= 8}
    sup = Counter(i for items in kept.values() for i in items)
    pair_sup = Counter(
        (a, b)
        for items in kept.values()
        for ai, a in enumerate(items)
        for b in items[ai + 1:]
    )
    expect = {p: c for p, c in pair_sup.items() if c >= 2}
    assert set(got) == set(expect)
    n_b = len(kept)
    for (a, b), c in expect.items():
        assert got[(a, b)].support == c
        assert int(got[(a, b)].lift_micro) == (
            c * n_b * 1_000_000 // (sup[a] * sup[b])
        )


def test_benford_profile_matches_bruteforce(spark, duck):
    """Catalog Benford digits == Python first-char-of-cents counting at
    sf0.001; ppm constants sum to exactly 1e6 and all 9 digits are
    always present (zero-count digits included)."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG

    rows = CATALOG["ana_benford_profile"].build(spark, SF_SMOKE).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert sum(r.benford_ppm for r in rows) == 1_000_000

    prices = [
        p for (p,) in duck.execute(
            "SELECT l_extendedprice FROM lineitem WHERE l_extendedprice > 0"
        ).fetchall()
    ]
    cnt = Counter(int(str(round(p * 100))[0]) for p in prices)
    n = sum(cnt.values())
    for r in rows:
        assert r.cnt == cnt.get(r.digit, 0)
        assert int(r.obs_ppm) == cnt.get(r.digit, 0) * 1_000_000 // n
        assert int(r.dev_ppm) == int(r.obs_ppm) - int(r.benford_ppm)


def _brute_lpa(edges, rounds):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nbrs: dict[str, list] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    label = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            c = Counter(label[u] for u in nbrs[v])
            # most frequent, ties to smallest label
            new[v] = min(c, key=lambda l: (-c[l], l))
        label = new
    return label


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by a single bridge edge: after 3 rounds
    every node's label matches the synchronous brute force, and the
    bridge does NOT merge the cliques into one community (the
    separation connected components cannot make)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        label_propagation,
    )

    def clique(names):
        return [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    edges = clique(["a1", "a2", "a3", "a4"]) + clique(
        ["b1", "b2", "b3", "b4"]
    ) + [("a4", "b1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert got == _brute_lpa(edges, 3)
    a_lab = {got[n] for n in ("a1", "a2", "a3")}
    b_lab = {got[n] for n in ("b2", "b3", "b4")}
    assert a_lab == {"a1"} and b_lab == {"b1"} and a_lab != b_lab


def test_label_propagation_matches_bruteforce_random(spark):
    """Synchronous-update parity on an irregular graph (hub + chain +
    triangle), several round depths."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        label_propagation,
    )

    edges = [
        ("h", "x1"), ("h", "x2"), ("h", "x3"), ("h", "x4"),
        ("x4", "c1"), ("c1", "c2"), ("c2", "c3"),
        ("t1", "t2"), ("t2", "t3"), ("t3", "t1"), ("t1", "c3"),
        ("h", "h"),  # self loop: dropped
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    for rounds in (0, 1, 2, 4):
        got = {
            r.node: r.label
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == _brute_lpa(edges, rounds), rounds


def _brute_vr(xs, q):
    n = len(xs)
    ys = [sum(xs[i - q + 1:i + 1]) for i in range(q - 1, n)]
    nq = len(ys)
    sx, sxx = sum(xs), sum(v * v for v in xs)
    sy, syy = sum(ys), sum(v * v for v in ys)
    if nq < 2 or n * sxx - sx * sx <= 0:
        return None
    return ((float(nq) * syy - float(sy) * sy) * float(n) * n) / (
        (float(n) * sxx - float(sx) * sx) * float(nq) * nq * q
    )


def test_variance_ratio_matches_bruteforce(spark):
    """variance_ratio == the plain-Python moment formula, and it
    separates momentum (trending: VR > 1) from mean reversion
    (alternating: VR < 1) — the diagnostic the operator exists for."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        variance_ratio,
    )

    series = {
        "TREND": [1000] * 6 + [2000] * 6 + [1500] * 8,   # sticky levels
        "FLIP": [1000, -1000] * 10,                       # alternating
        "MIX": [300, -200, 900, -50, 120, 700, -640, 80, 10, -400,
                250, 330, -75, 60, -900, 410, 220, -130, 505, -20],
    }
    rows = [
        (t, dt.date(2020, 1, 1) + dt.timedelta(days=i), v)
        for t, xs in series.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, ret_ppm long"
    )
    got = {r.stock_ticker: r for r in variance_ratio(df, q=5).collect()}
    for t, xs in series.items():
        want = _brute_vr(xs, 5)
        assert got[t].n_obs == len(xs)
        assert got[t].n_q == len(xs) - 4
        assert got[t].vr == want, t   # bit-exact: same pinned association
    assert got["TREND"].vr > 1.0 > got["FLIP"].vr


def test_variance_ratio_rejects_degenerate(spark):
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        variance_ratio,
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        variance_ratio(None, q=1)
    # zero 1-period variance: entity dropped, not NULL/inf
    rows = [
        ("Z", dt.date(2020, 1, 1) + dt.timedelta(days=i), 500)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, ret_ppm long"
    )
    assert variance_ratio(df, q=5).count() == 0


def test_gini_concentration_known_values(spark):
    """Gini == the rank-sum formula: 0 for perfect equality, the exact
    closed form for one-holder concentration, brute-force parity on an
    arbitrary multiset (with ties), and a narrow bucket width — which
    forces many buckets — must not change the result."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        gini_concentration,
    )

    def brute(vals):
        xs = sorted(vals)
        n, sx = len(xs), sum(xs)
        srx = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * srx - (n + 1) * sx) * 1_000_000 // (n * sx)

    equal = [(i, 500) for i in range(10)]
    onehot = [(i, 0) for i in range(9)] + [(9, 900)]
    mixed = [(i, v) for i, v in enumerate(
        [5, 5, 5, 20, 100, 0, 0, 33, 33, 7, 250, 1]
    )]
    for rows, width in ((equal, 100), (onehot, 100), (mixed, 100),
                        (mixed, 3)):
        df = spark.createDataFrame(rows, "k long, v long")
        r = gini_concentration(df, "v", "k", bucket_width=width).collect()[0]
        vals = [v for _, v in rows]
        assert r.n_units == len(vals)
        assert r.total_value == sum(vals)
        assert int(r.gini_ppm) == brute(vals), (rows, width)
    assert gini_concentration(
        spark.createDataFrame(equal, "k long, v long"), "v", "k"
    ).collect()[0].gini_ppm == 0


def test_gini_rejects_negative(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        gini_concentration,
    )

    import pytest as _pytest

    df = spark.createDataFrame([(1, 5), (2, -3)], "k long, v long")
    with _pytest.raises(Exception, match="negative value"):
        gini_concentration(df, "v", "k").collect()


def test_zipf_slope_matches_bruteforce(spark):
    """zipf_slope == the plain-Python quantized OLS over the same
    (rank, count) vocabulary, and a steeper synthetic corpus yields a
    larger alpha than a flatter one."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        zipf_slope,
    )

    def corpus(freqs):
        # term i appears freqs[i] times; single-doc corpus
        words = []
        for i, f in enumerate(freqs):
            words += [f"w{i:03d}"] * f
        return [(0, " ".join(words))]

    def brute(freqs):
        ranked = sorted(
            ((f, f"w{i:03d}") for i, f in enumerate(freqs)),
            key=lambda t: (-t[0], t[1]),
        )
        pts = [
            (
                math.floor(math.log(r + 1) * 1e6 + 0.5),
                math.floor(math.log(f) * 1e6 + 0.5),
            )
            for r, (f, _) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        return (sx * sy - n * sxy) * 1_000_000 // (n * sxx - sx * sx)

    steep = [729, 243, 81, 27, 9, 3, 1, 1]          # ~r^-3 head
    flat = [64, 54, 47, 42, 38, 35, 32, 30]          # ~r^-0.4
    alphas = {}
    for name, freqs in (("steep", steep), ("flat", flat)):
        df = spark.createDataFrame(corpus(freqs), "doc_id long, text string")
        r = zipf_slope(df).collect()[0]
        assert r.n_terms == len(freqs)
        assert int(r.zipf_alpha_micro) == brute(freqs), name
        alphas[name] = int(r.zipf_alpha_micro)
    assert alphas["steep"] > alphas["flat"] > 0


def test_ann_recall_eval_bounds_and_identity(spark):
    """Catalog recall eval: every query scores in [0, 1e6] with
    n_exact = 5 at SF_SMOKE, recall_ppm is exactly the integral ratio,
    and an index evaluated against ITSELF scores perfect recall."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG

    rows = CATALOG["llm_ann_recall_eval"].build(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_exact == 5
        assert 0 <= r.n_hit <= r.n_exact
        assert int(r.recall_ppm) == r.n_hit * 1_000_000 // r.n_exact

    from utn_dataengineering_stockmarketpipeline_spark.operators import similarity
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(corpus=emb, queries=q, k=5).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(exact, ["query_id", "neighbor_id"], "left_semi")
    assert hits.count() == exact.count()


def test_theil_sen_matches_bruteforce(spark):
    """theil_sen_slope == the plain-Python median pairwise slope with
    the same lower-median discrete rule, and one huge outlier tick
    must NOT drag the slope (the property OLS fails)."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        theil_sen_slope,
    )

    series = {
        # clean +1.00/day trend with one absurd tick
        "ROBUST": [10.0, 11.0, 12.0, 13.0, 999.0, 15.0, 16.0, 17.0],
        "FLAT": [50.0, 50.0, 50.0, 50.0, 50.0],
        "DOWN": [90.0, 88.5, 87.1, 85.0, 84.2, 82.9],
    }
    # strictly increasing, irregularly spaced trading days
    rows = [
        (t, dt.date(2021, 3, 1) + dt.timedelta(days=2 * i + (i % 2)), v)
        for t, xs in series.items()
        for i, v in enumerate(xs)
    ]
    # NULL-price ticks must be dropped before pairing, not counted
    # into the bucket offsets (the r13 ADVICE defect class)
    null_rows = [
        ("ROBUST", dt.date(2021, 2, 1), None),
        ("FLAT", dt.date(2021, 2, 2), None),
    ]
    df = spark.createDataFrame(
        rows + null_rows,
        "stock_ticker string, stock_date date, stock_close double",
    )
    got = {r.stock_ticker: r for r in theil_sen_slope(df).collect()}

    from collections import defaultdict

    by_t = defaultdict(list)
    for t, d, v in rows:
        by_t[t].append((d, round(v * 100)))
    for t, obs in by_t.items():
        obs.sort()
        pairs = [
            (
                (vj - vi) / (dj - di).days,
                di,
                dj,
                vj - vi,
                (dj - di).days,
            )
            for i, (di, vi) in enumerate(obs)
            for dj, vj in obs[i + 1:]
        ]
        pairs.sort(key=lambda p: (p[0], p[1], p[2]))
        m = len(pairs)
        _, _, _, dvc, dd = pairs[(m + 1) // 2 - 1]
        want = (dvc * 10000) // dd if dvc >= 0 else -((-dvc * 10000) // dd)
        assert got[t].n_pairs == m
        assert int(got[t].slope_micro) == want, t
    # robustness: the outlier tick leaves the trend ≈ 1.00 $/day
    assert abs(int(got["ROBUST"].slope_micro) - 1_000_000) < 600_000
    assert int(got["FLAT"].slope_micro) == 0
    assert int(got["DOWN"].slope_micro) < 0


def test_theil_sen_refuses_quadratic_blowup(spark):
    import datetime as dt

    import pytest as _pytest

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    old = risk.MAX_THEIL_SEN_OBS
    risk.MAX_THEIL_SEN_OBS = 10
    try:
        rows = [
            ("X", dt.date(2021, 1, 1) + dt.timedelta(days=i), 1.0 + i)
            for i in range(11)
        ]
        df = spark.createDataFrame(
            rows, "stock_ticker string, stock_date date, stock_close double"
        )
        with _pytest.raises(ValueError, match="O\\(n²/2\\)"):
            risk.theil_sen_slope(df)
    finally:
        risk.MAX_THEIL_SEN_OBS = old


def test_stream_monitors_share_one_grid(spark):
    """The three streaming monitors are the SAME drain with a different
    statistic: their oracles are the batch SQL verbatim, and their
    builders all route through _drained_counts_monitor."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
    from utn_dataengineering_stockmarketpipeline_spark.plans import (
        queries_analytics as qa,
    )

    assert CATALOG["stream_ks_drift"].oracle == qa._KS_DRIFT_ORACLE_SQL
    assert CATALOG["stream_emd_drift"].oracle == qa._EMD_DRIFT_ORACLE_SQL
    assert CATALOG["stream_psi_drift"].oracle == qa._PSI_DRIFT_ORACLE_SQL
    assert CATALOG["ana_ks_drift"].oracle == qa._KS_DRIFT_ORACLE_SQL
    assert CATALOG["ana_emd_drift"].oracle == qa._EMD_DRIFT_ORACLE_SQL
    assert CATALOG["ana_psi_drift"].oracle == qa._PSI_DRIFT_ORACLE_SQL
