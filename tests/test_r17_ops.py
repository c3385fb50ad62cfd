"""Round-17 operator tests: the four r19-staged operators built this
round — Calmar ratio, two-sample Cramér-von Mises drift (batch grid),
degree assortativity, and source vocabulary overlap — each against a
pure-Python brute-force replay of the pinned integer recurrence."""

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
