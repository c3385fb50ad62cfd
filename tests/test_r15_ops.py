"""Round-15 operator tests: the LSH recall eval loop (brute-force
truth on a constructed corpus + invariants on the synthetic corpus)
and the shingle_pair_counts refactor contract."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE  # noqa: F401  (fixtures)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_recall_eval_identical_docs_bin9(spark):
    """Identical texts have Jaccard 1.0 (bin 9) and identical MinHash
    signatures, so LSH MUST recall them: recall_ppm == 1_000_000 in
    bin 9. An unrelated doc contributes no truth pair."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely unrelated text about spark query planning"),
    ]
    out = dedup.lsh_recall_eval(_docs(spark, rows)).collect()
    by_bin = {r["jaccard_bin"]: r for r in out}
    assert set(by_bin) == {9}
    assert by_bin[9]["n_truth"] == 1
    assert by_bin[9]["n_hit"] == 1
    assert by_bin[9]["recall_ppm"] == 1_000_000


def test_lsh_recall_eval_truth_matches_jaccard_pairs(spark):
    """Σ_bins n_truth == |ngram_jaccard_pairs(threshold=0.2)| — the
    integer threshold (5·n_shared ≥ union) is exactly the 0.2 float
    threshold, and every truth pair lands in exactly one bin."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = dedup.lsh_recall_eval(docs).collect()
    n_truth_total = sum(r["n_truth"] for r in out)
    n_pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2).count()
    assert n_truth_total == n_pairs
    for r in out:
        assert 0 <= r["jaccard_bin"] <= 9
        assert 0 <= r["n_hit"] <= r["n_truth"]
        assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // r["n_truth"]


def test_lsh_recall_eval_brute_force(spark):
    """Recall per bin against a pure-Python brute force over the same
    shingle-hash sets and the operator's own candidate pairs — pins the
    binning, thresholding, and the semi-join hit logic independently
    of the SQL oracle."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup
    from utn_dataengineering_stockmarketpipeline_spark.functions.hashing import (
        shingle_hash_rows,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "alpha beta gamma delta epsilon zeta mu nu"),
        (4, "one two three four five six seven eight"),
        (5, "one two three four five six seven eight"),
        (6, "totally different words nothing shared here at all"),
    ]
    docs = _docs(spark, rows)
    sets: dict[int, set] = {}
    for r in shingle_hash_rows(docs, "text", "doc_id", 3).select(
        "doc_id", "h"
    ).collect():
        sets.setdefault(r["doc_id"], set()).add(r["h"])
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidates(docs).select("id_a", "id_b").collect()
    }
    truth: dict[int, list] = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n_shared = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if n_shared == 0 or n_shared * 5 < union:
                continue
            bin_ = min(n_shared * 10 // union, 9)
            truth.setdefault(bin_, []).append((a, b))
    expected = {
        bin_: (
            len(pairs),
            sum(1 for p in pairs if p in cand),
        )
        for bin_, pairs in truth.items()
    }
    got = {
        r["jaccard_bin"]: (r["n_truth"], r["n_hit"])
        for r in dedup.lsh_recall_eval(docs).collect()
    }
    assert got == expected


def test_shingle_pair_counts_contract(spark):
    """(n_shared, n_a, n_b) are exact distinct-shingle set counts and
    ngram_jaccard_pairs is their ratio — the refactor changed no
    semantics."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup

    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),
        (3, "x y z w q"),
    ]
    docs = _docs(spark, rows)
    counts = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["n_a"], r["n_b"])
        for r in dedup.shingle_pair_counts(docs).collect()
    }
    # docs 1 and 2 share the "a b c" and "b c d" shingles; each has 3.
    assert counts[(1, 2)] == (2, 3, 3)
    assert (1, 3) not in counts and (2, 3) not in counts
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jac[(1, 2)] == pytest.approx(2 / 4)


# --- staged r16 operators (pre-built this round, registered next) ---


def test_runs_test_brute_force(spark):
    """Wald-Wolfowitz counts vs a hand-checked sequence: ties dropped,
    runs = 1 + sign changes, exact integer excess."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    # closes: 10, 11, 12, 11, 11, 10, 12, 13 → diffs +,+,-,0,-,+,+
    # tie-free signs: +,+,-,-,+,+ → n_up=4, n_down=2, runs=3
    closes = [10.0, 11.0, 12.0, 11.0, 11.0, 10.0, 12.0, 13.0]
    rows = [
        ("T", dt.date(2021, 1, 1 + i), c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    out = risk.runs_test(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_up"], r["n_down"], r["n_runs"]) == (4, 2, 3)
    # excess_ppm = (R*n - n - 2*u*d)*1e6 div (n + 2*u*d); Spark `div`
    # truncates toward zero while python // floors — divide on abs
    n, u, d, R = 6, 4, 2, 3
    num = (R * n - n - 2 * u * d) * 1_000_000
    den = n + 2 * u * d
    expect = abs(num) // den * (1 if num >= 0 else -1)
    assert r["runs_excess_ppm"] == expect


def test_runs_test_one_sided_excluded(spark):
    """A strictly increasing series has n_down=0 → degenerate null
    variance → excluded."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rows = [
        ("U", dt.date(2021, 1, 1 + i), 10.0 + i) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    assert risk.runs_test(df).count() == 0


def test_turning_points_brute_force(spark):
    """Strict local extrema counted, ties don't count, boundaries
    don't count."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    # closes: 1, 3, 2, 2, 4, 1, 5 → interior checks:
    #   3 (1<3>2: TP), 2 (3>2, 2=2: no), 2 (2=2: no), 4 (2<4>1: TP),
    #   1 (4>1<5: TP) → n_turning = 3, n_obs = 7
    closes = [1.0, 3.0, 2.0, 2.0, 4.0, 1.0, 5.0]
    rows = [
        ("T", dt.date(2021, 1, 1 + i), c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    out = risk.turning_points(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_obs"], r["n_turning"]) == (7, 3)
    assert r["turning_excess_ppm"] == (3 * 3 - 2 * 5) * 1_000_000 // (2 * 5)


def test_hits_brute_force(spark):
    """Integer-ppm HITS vs a pure-Python replay of the exact same
    recurrence on a small directed graph."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import graph

    edge_list = [
        ("a", "x"), ("a", "y"), ("b", "x"), ("c", "y"), ("x", "a"),
    ]
    df = spark.createDataFrame(edge_list, "src string, dst string")
    got = {
        r["node"]: (r["hub_ppm"], r["auth_ppm"])
        for r in graph.hits(df, iters=3).collect()
    }
    nodes = sorted({n for e in edge_list for n in e})
    h = {n: 1_000_000 for n in nodes}
    a = {}
    for _ in range(3):
        raw_a = {n: sum(h[s] for s, d in edge_list if d == n) for n in nodes}
        mx = max(raw_a.values())
        a = {n: (v * 1_000_000 // mx if mx > 0 else 0)
             for n, v in raw_a.items()}
        raw_h = {n: sum(a[d] for s, d in edge_list if s == n) for n in nodes}
        mx = max(raw_h.values())
        h = {n: (v * 1_000_000 // mx if mx > 0 else 0)
             for n, v in raw_h.items()}
    assert got == {n: (h[n], a[n]) for n in nodes}


def test_hits_empty_graph(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import graph

    df = spark.createDataFrame([], "src string, dst string")
    assert graph.hits(df, iters=2).count() == 0


def test_ols_slope_epoch_shift_invariance(spark):
    """The epoch-anchored x gives bit-identical slopes to a MIN(d)-
    anchored fit: shift invariance is exact in integer arithmetic, and
    this pins it empirically against a brute-force anchored fit."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rows = [
        ("T", dt.date(2021, 3, 1 + i), 50.0 + 3 * i + (i % 3)) for i in range(9)
    ] + [
        ("U", dt.date(1969, 12, 25 + i), 20.0 - i) for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {
        r["stock_ticker"]: r["slope_micro"]
        for r in risk.ols_trend(df).collect()
    }
    # brute force with per-entity min anchor (the oracle's form)
    from collections import defaultdict

    series = defaultdict(list)
    for e, d, v in rows:
        series[e].append((d, round(v * 100)))
    for e, pts in series.items():
        d0 = min(d for d, _ in pts)
        xs = [(d - d0).days for d, _ in pts]
        ys = [y for _, y in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        # python // floors; both engines truncate toward zero
        q = abs(num * 10000) // den
        expect = q if num >= 0 else -q
        assert got[e] == expect, (e, got[e], expect)


def _kw_brute(rows):
    """Pure-Python replay of the exact quantized Kruskal-Wallis
    recurrence (doubled ranks, per-group div, final integral div)."""
    from collections import Counter, defaultdict

    clean = [(g, v) for g, v in rows if g is not None and v is not None]
    cv = Counter(v for _, v in clean)
    values = sorted(cv)
    r2, cum = {}, 0
    for v in values:
        r2[v] = 2 * cum + cv[v] + 1
        cum += cv[v]
    per = defaultdict(lambda: [0, 0])  # g -> [n_g, R2_g]
    for g, v in clean:
        per[g][0] += 1
        per[g][1] += r2[v]
    n = len(clean)
    s = sum((R2 * R2) // ng for ng, R2 in per.values())
    h_micro = (3 * s * 1_000_000) // (n * (n + 1)) - 3_000_000 * (n + 1)
    n3 = n ** 3 - n
    tsum = sum(c ** 3 - c for c in cv.values())
    if n3 <= tsum:
        return None
    num = h_micro * n3
    den = n3 - tsum
    h_tie = abs(num) // den * (1 if num >= 0 else -1)
    return (len(per), n, h_micro, h_tie)


def test_kruskal_wallis_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    rows = (
        [("A", v) for v in (1, 2, 2, 3, 5, 8, 9)]
        + [("B", v) for v in (1, 6, 6, 7, 7, 8, 20)]
        + [("C", v) for v in (2, 3, 4, 5, 6, 9)]
        + [(None, 7), ("A", None)]
    )
    df = spark.createDataFrame(
        [(g, v) for g, v in rows], "source string, n_chars long"
    )
    out = skew.kruskal_wallis_drift(df, "n_chars", "source").collect()
    assert len(out) == 1
    r = out[0]
    got = (r["n_groups"], r["n_obs"], r["h_micro"], r["h_tie_micro"])
    assert got == _kw_brute(rows)


def test_kruskal_wallis_tracks_true_h(spark):
    """The quantized h_tie_micro/1e6 matches the textbook tie-corrected
    H (computed with exact fractions) within the documented per-group
    truncation slack, and separates identical groups (H ~ 0) from a
    shifted group (H large)."""
    from fractions import Fraction

    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    def true_h(rows):
        from collections import Counter, defaultdict

        cv = Counter(v for _, v in rows)
        values = sorted(cv)
        rank, cum = {}, 0
        for v in values:
            rank[v] = Fraction(2 * cum + cv[v] + 1, 2)
            cum += cv[v]
        per = defaultdict(lambda: [0, Fraction(0)])
        for g, v in rows:
            per[g][0] += 1
            per[g][1] += rank[v]
        n = len(rows)
        h = Fraction(12, n * (n + 1)) * sum(
            R * R / ng for ng, R in per.values()
        ) - 3 * (n + 1)
        c = 1 - Fraction(sum(t**3 - t for t in cv.values()), n**3 - n)
        return float(h / c)

    same = [("A", v) for v in range(1, 21)] + [("B", v) for v in range(1, 21)]
    shifted = [("A", v) for v in range(1, 21)] + [
        ("B", v + 15) for v in range(1, 21)
    ]
    for rows, expect_large in ((same, False), (shifted, True)):
        df = spark.createDataFrame(rows, "source string, n_chars long")
        r = skew.kruskal_wallis_drift(df, "n_chars", "source").collect()[0]
        h = r["h_tie_micro"] / 1e6
        assert abs(h - true_h(rows)) < 1e-3
        assert (h > 10) == expect_large


def test_kl_source_divergence_brute_force(spark):
    """Exact replay of the quantized per-cell pipeline in pure Python
    (identical IEEE double ops on identical integers), plus the
    semantic sanity: a source sharing the corpus distribution scores
    ~0, a disjoint-vocabulary source scores large."""
    import math
    from collections import Counter, defaultdict

    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "srcA", "the cat sat on the mat"),
        (2, "srcA", "the dog sat on the rug"),
        (3, "srcB", "the cat sat on the mat"),
        (4, "srcC", "zork quux blorp zork frotz"),
        (5, None, "ignored row"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["n_tokens"], r["n_terms"], r["kl_micro"])
        for r in text_ops.kl_source_divergence(df).collect()
    }

    cells: dict = defaultdict(Counter)
    for _, src, text in rows:
        if src is None:
            continue
        for t in text.split(" "):
            if t:
                cells[src][t] += 1
    ct = Counter()
    for src in cells:
        ct.update(cells[src])
    n = sum(ct.values())
    expected = {}
    for src, c in cells.items():
        ns = sum(c.values())
        kl = sum(
            math.floor(
                (o / ns) * math.log((o * n) / (ns * ct[t])) * 1000000.0
                + 0.5
            )
            for t, o in c.items()
        )
        expected[src] = (ns, len(c), kl)
    assert got == expected
    # semantics: srcC's vocabulary is disjoint from the rest → large
    # positive KL; srcA/srcB share the common register → small
    assert got["srcC"][2] > got["srcA"][2]
    assert got["srcC"][2] > 500_000  # > 0.5 nats in micro units


def test_acf_and_ljung_box_brute_force(spark):
    """acf_ppm vs a pure-Python replay (lag-k pair Pearson over ppm
    returns, identical IEEE ops, mode-stable ppm quantization) and
    ljung_box vs the exact integer recurrence over those ppms."""
    import datetime as dt
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    closes = [100.0, 101.0, 99.5, 102.0, 103.0, 101.5, 104.0, 102.5,
              105.0, 106.0, 104.5, 107.0]
    rows = [
        ("T", dt.date(2021, 1, 1 + i), c) for i, c in enumerate(closes)
    ] + [
        ("U", dt.date(2021, 1, 1 + i), 50.0 + (i % 2))  # alternating
        for i in range(8)
    ]
    prices = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    rets = risk.returns_ppm(prices)
    max_lag = 4
    got_acf = {
        (r["stock_ticker"], r["lag"]): (r["n_pairs"], r["rho_ppm"])
        for r in risk.acf_ppm(rets, max_lag).collect()
    }
    # python replay over the SAME ppm returns
    all_rets = sorted(
        rets.collect(), key=lambda r: (r["stock_ticker"], r["stock_date"])
    )
    ppm = {
        e: [r["ret_ppm"] for r in all_rets if r["stock_ticker"] == e]
        for e in ("T", "U")
    }
    expected_acf = {}
    for e, series in ppm.items():
        for k in range(1, max_lag + 1):
            xs, ys = series[:-k], series[k:]
            n = len(xs)
            if n < 2:
                continue
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            syy = sum(b * b for b in ys)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx <= 0 or vy <= 0:
                continue
            rho = (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
            expected_acf[(e, k)] = (
                n, math.floor(rho * 1000000.0 + 0.5)
            )
    assert got_acf == expected_acf

    got_lb = {
        r["stock_ticker"]: (r["n_obs"], r["n_lags"], r["q_micro"])
        for r in risk.ljung_box(rets, max_lag).collect()
    }
    expected_lb = {}
    for e, series in ppm.items():
        n = len(series)
        qsum = 0
        n_lags = 0
        for k in range(1, max_lag + 1):
            key = (e, k)
            if key not in expected_acf:
                continue
            rho_ppm = expected_acf[key][1]
            qsum += (rho_ppm * rho_ppm) // (n - k)
            n_lags += 1
        if n_lags:
            expected_lb[e] = (n, n_lags, (n * (n + 2) * qsum) // 1_000_000)
    assert got_lb == expected_lb
    # semantics: the alternating series U has strong negative lag-1 /
    # positive lag-2 autocorrelation → Q decisively non-white
    assert got_acf[("U", 1)][1] < -500_000
    assert got_lb["U"][2] > got_lb["T"][2]
