"""Round-17 operator tests: the r19-staged operators built this round
(Calmar ratio, two-sample Cramér-von Mises drift, degree
assortativity, source vocabulary overlap) and the r20-staged ones
(Ulcer index, Theil inequality, local clustering coefficient, term
burstiness) — each against a pure-Python brute-force replay of the
pinned integer recurrence."""

from __future__ import annotations

import datetime
import math

from tests.conftest import SF_SMOKE  # noqa: F401  (fixtures)


def _prices(spark, rows):
    return spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )


def _d(i):
    return datetime.date(2024, 1, 1) + datetime.timedelta(days=i)


def test_calmar_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    series = {
        "A": [100.0, 120.0, 90.0, 140.0, 130.0],   # dd + gain
        "B": [50.0, 40.0, 45.0, 30.0],             # net loss
        "C": [10.0, 11.0, 12.0, 13.0],             # monotone: drops
    }
    rows = [
        (t, _d(i), v) for t, vs in series.items() for i, v in enumerate(vs)
    ]
    out = {
        r["stock_ticker"]: r
        for r in risk.calmar_ratio(_prices(spark, rows)).collect()
    }
    assert "C" not in out  # max_dd_ppm == 0 drops

    def brute(vs):
        vc = [round(v * 100) for v in vs]
        peak, mdd = vc[0], 0
        for x in vc:
            peak = max(peak, x)
            mdd = max(mdd, ((peak - x) * 1_000_000) // peak)
        # integral division toward zero (matches Spark div / DuckDB //)
        tr = (
            ((vc[-1] - vc[0]) * 1_000_000) // vc[0]
            if vc[-1] >= vc[0]
            else -((vc[0] - vc[-1]) * 1_000_000 // vc[0])
        )
        cal = (
            (tr * 1_000_000) // mdd
            if tr >= 0
            else -((-tr * 1_000_000) // mdd)
        )
        return len(vc), tr, mdd, cal

    for t in ("A", "B"):
        n, tr, mdd, cal = brute(series[t])
        r = out[t]
        assert (r["n_obs"], r["total_ret_ppm"], r["max_dd_ppm"],
                r["calmar_ppm"]) == (n, tr, mdd, cal), t


def test_cvm_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    data = {
        "a": [1, 1, 2, 3, 5, 5, 8],
        "b": [2, 2, 3, 4, 4],
        "c": [9, 9, 10],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {
        r["source"]: r
        for r in skew.cvm_drift(df, "n_chars", "source").collect()
    }
    allv = sorted({v for vs in data.values() for v in vs})
    n = sum(len(vs) for vs in data.values())
    for g, vs in data.items():
        n_g = len(vs)
        n_r = n - n_g
        s = 0
        for v in allv:
            v_cnt = sum(x == v for xs in data.values() for x in xs)
            cum_g = sum(x <= v for x in vs)
            cum_all = sum(x <= v for xs in data.values() for x in xs)
            d = cum_g * n_r - (cum_all - cum_g) * n_g
            s += v_cnt * d * d
        t_micro = (s * 1_000_000) // (n * n * n_g * n_r)
        msq = (s * 1_000_000) // (n * n_g * n_g * n_r * n_r)
        r = out[g]
        assert (r["n_docs"], r["t_micro"], r["msq_gap_ppm"]) == (
            n_g, t_micro, msq), g


def test_cvm_identical_groups_zero(spark):
    """Two groups with identical value multisets: every CDF gap is 0."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    for r in skew.cvm_drift(df, "n_chars", "source").collect():
        assert r["t_micro"] == 0 and r["msq_gap_ppm"] == 0


def test_degree_assortativity_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import graph

    edges = [("u1", "v1"), ("u1", "v2"), ("u2", "v1"), ("u3", "v1"),
             ("u3", "v3"), ("u4", "v4")]
    df = spark.createDataFrame(edges, "src string, dst string")
    outd = {}
    ind = {}
    for s, t in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[t] = ind.get(t, 0) + 1
    xs = [outd[s] for s, _ in edges]
    ys = [ind[t] for _, t in edges]
    n = float(len(edges))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sxx = float(sum(x * x for x in xs))
    syy = float(sum(y * y for y in ys))
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    expect = math.floor(r * 1_000_000 + 0.5)
    got = graph.degree_assortativity(df).collect()
    assert len(got) == 1
    assert got[0]["n_edges"] == len(edges)
    assert got[0]["r_ppm"] == expect


def test_degree_assortativity_degenerate_drops(spark):
    """A perfect star: every edge has the same (outdeg, indeg) pair on
    one side — zero variance, the row drops."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import graph

    df = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(4)], "src string, dst string"
    )
    assert graph.degree_assortativity(df).collect() == []


def test_source_vocab_overlap_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import text

    rows = [
        (1, "alpha beta gamma", "s1"),
        (2, "beta beta delta", "s1"),
        (3, "alpha beta", "s2"),
        (4, "epsilon zeta", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in text.source_vocab_overlap(df).collect()
    }
    # s1 vocab {alpha,beta,gamma,delta}, s2 {alpha,beta}, s3 {epsilon,zeta}
    assert set(out) == {("s1", "s2")}  # zero-overlap pairs absent
    r = out[("s1", "s2")]
    assert (r["n_terms_a"], r["n_terms_b"], r["n_shared"]) == (4, 2, 2)
    assert r["jaccard_ppm"] == (2 * 1_000_000) // 4


# --- r20-staged operators (also built this round) ---


def test_ulcer_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    series = {
        "A": [100.0, 120.0, 90.0, 140.0, 130.0],
        "C": [10.0, 11.0, 12.0, 13.0],  # monotone: ulcer 0, stays
    }
    rows = [
        (t, _d(i), v) for t, vs in series.items() for i, v in enumerate(vs)
    ]
    out = {
        r["stock_ticker"]: r
        for r in risk.ulcer_index(_prices(spark, rows)).collect()
    }
    for t, vs in series.items():
        vc = [round(v * 100) for v in vs]
        peak, sq = vc[0], 0
        for x in vc:
            peak = max(peak, x)
            dd = ((peak - x) * 1_000_000) // peak
            sq += dd * dd
        msdd = sq // len(vc)
        ulcer = math.floor(math.sqrt(msdd) + 0.5)
        r = out[t]
        assert (r["n_obs"], r["msdd_ppm2"], r["ulcer_ppm"]) == (
            len(vc), msdd, ulcer), t
    assert out["C"]["ulcer_ppm"] == 0


def test_theil_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    vals = [100, 100, 100, 700, 1, 0, -5]  # non-positive excluded
    df = spark.createDataFrame([(v,) for v in vals], "rev_mu long")
    pos = [v for v in vals if v > 0]
    n, s = len(pos), sum(pos)
    expect = sum(
        math.floor((x / s) * math.log(x * n / s) * 1_000_000 + 0.5)
        for x in pos
    )
    got = skew.theil_inequality(df, "rev_mu").collect()
    assert len(got) == 1
    assert (got[0]["n_units"], got[0]["total_value"],
            got[0]["theil_micro"]) == (n, s, expect)


def test_theil_equality_is_zero(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    df = spark.createDataFrame([(50,)] * 6, "rev_mu long")
    got = skew.theil_inequality(df, "rev_mu").collect()
    assert got[0]["theil_micro"] == 0


def test_local_clustering_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import graph

    # triangle 1-2-3 plus a pendant 4 off node 1 and an isolated edge 5-6
    pairs = [(1, 2), (2, 3), (1, 3), (1, 4), (5, 6)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = {r["node"]: r for r in graph.local_clustering(df).collect()}
    # deg: 1->3, 2->2, 3->2, 4->1, 5->1, 6->1; only deg>=2 kept
    assert set(out) == {1, 2, 3}
    assert (out[1]["deg"], out[1]["n_tri"]) == (3, 1)
    assert out[1]["local_cc_ppm"] == (2 * 1_000_000) // (3 * 2)
    for n in (2, 3):
        assert (out[n]["deg"], out[n]["n_tri"]) == (2, 1)
        assert out[n]["local_cc_ppm"] == 1_000_000


def test_term_burstiness_brute_force(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import text

    rows = [
        (1, "x x x x x"),        # bursty term x: 5 in one doc
        (2, "y z"),
        (3, "y z"),
        (4, "y z"),
        (5, "y z"),
        (6, "y z junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["term"]: r for r in text.term_burstiness(df).collect()
    }
    d = len(rows)
    assert set(out) == {"x", "y", "z"}  # junk: total 1 < min_count 5
    for term, counts in (("x", [5]), ("y", [1] * 5), ("z", [1] * 5)):
        s, q, m = sum(counts), sum(c * c for c in counts), len(counts)
        vmr = ((d * q - s * s) * 1_000_000) // (d * s)
        r = out[term]
        assert (r["n_docs_with"], r["total_count"], r["vmr_micro"]) == (
            m, s, vmr), term
    assert out["x"]["vmr_micro"] > out["y"]["vmr_micro"]
