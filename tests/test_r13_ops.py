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
