"""operators/windows.py unit semantics — the ordered-recurrence (ema)
memory-bound contract (same enforced-bound discipline as
similarity.MAX_BROADCAST_ROWS)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import windows


def _series(spark, n):
    return spark.createDataFrame(
        [("T", i, float(i)) for i in range(n)],
        "ticker string, t int, x double",
    )


def test_ema_group_bound_enforced(spark):
    """A group past max_group_rows must raise in the task (naming the
    remedy), never silently pull an unbounded Arrow batch."""
    df = _series(spark, 10)
    out = windows.ema(df, "ticker", "t", "x", span=5, max_group_rows=5)
    with pytest.raises(Exception, match="max_group_rows"):
        out.collect()


def test_ema_values_within_bound(spark):
    df = _series(spark, 6)
    out = windows.ema(df, "ticker", "t", "x", span=3, max_group_rows=100)
    got = {r["t"]: r["ema"] for r in out.collect()}
    a = 2.0 / 4.0
    prev, want = None, {}
    for i in range(6):
        prev = float(i) if prev is None else a * i + (1 - a) * prev
        want[i] = prev
    assert got == pytest.approx(want)


def test_ema_default_bound_is_module_constant(spark):
    assert windows.MAX_GROUP_ROWS == 10_000_000
    df = _series(spark, 8)
    assert windows.ema(df, "ticker", "t", "x").count() == 8


def test_funnel_ordering_discriminates(spark):
    """The catalog data has every user completing every stage; this
    hand-built set exercises the ordering constraint the funnel is
    about: clicks BEFORE the first view don't count, purchases before
    the qualifying click don't count."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.plans import (
        queries_analytics as qa,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, etype, minutes):
        return (uid, etype, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # u1: full ordered funnel
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 9),
        # u2: click precedes the only view → stalls at view
        ev(2, "click", 0), ev(2, "view", 5),
        # u3: purchase precedes the qualifying click → stalls at purchase
        ev(3, "view", 0), ev(3, "purchase", 1), ev(3, "click", 4),
        # u4: no view at all → only counted in total
        ev(4, "click", 0), ev(4, "purchase", 1),
        # u5: same-instant chain (>= is inclusive) → full funnel
        ev(5, "view", 0), ev(5, "click", 0), ev(5, "purchase", 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )

    import unittest.mock as mock

    with mock.patch.object(qa, "load_table", return_value=df):
        out = qa.q_funnel_conversion(spark, "unused").collect()[0]
    assert (
        out["users_total"], out["users_view"],
        out["users_click"], out["users_purchase"],
    ) == (5, 4, 3, 2)


def test_exact_ntile_matches_global_ntile(spark):
    """exact_ntile must reproduce NTILE(n) OVER (ORDER BY v, id) bit
    for bit — including heavy ties straddling bucket boundaries, N not
    divisible by n, and N < n."""
    from pyspark.sql import Window as W

    from utn_dataengineering_stockmarketpipeline_spark.operators.windows import (
        exact_ntile,
    )

    cases = [
        # (n_rows, n_buckets, value_fn) — ties via mod
        (97, 10, lambda i: i % 7),
        (100, 10, lambda i: i % 3),
        (5, 10, lambda i: 42),   # N < n: rank IS bucket
        (1, 4, lambda i: 0),
    ]
    for n_rows, n_buckets, vf in cases:
        df = spark.createDataFrame(
            [(i, vf(i)) for i in range(n_rows)], "id int, v int"
        )
        want = {
            r["id"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(n_buckets).over(W.orderBy("v", "id"))
            ).collect()
        }
        got = {
            r["id"]: r["bucket"]
            for r in exact_ntile(df, "v", "id", n_buckets).collect()
        }
        assert got == want, f"n_rows={n_rows} n_buckets={n_buckets}"


def test_exact_ntile_distinct_bound_enforced(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.windows import (
        exact_ntile,
    )

    df = spark.createDataFrame([(i, i) for i in range(20)], "id int, v int")
    with pytest.raises(ValueError, match="distinct values"):
        exact_ntile(df, "v", "id", 4, max_distinct_values=10)


def test_ema_chunked_matches_sequential(spark):
    """The segmented-scan EMA must agree with the sequential loop to
    float tolerance, across chunk boundaries and key counts — including
    chunks smaller than, equal to, and larger than the series."""
    import math

    from pyspark.sql import Row

    from utn_dataengineering_stockmarketpipeline_spark.operators.windows import (
        ema,
        ema_chunked,
    )

    rows = [
        Row(k=f"t{g}", t=i, v=100.0 + 10.0 * math.sin(i / 3.0 + g))
        for g in range(3)
        for i in range(57)
    ]
    df = spark.createDataFrame(rows)
    want = {
        (r.k, r.t): r.ema
        for r in ema(df, "k", "t", "v", span=10).collect()
    }
    for chunk_rows in (7, 57, 1000):
        got = {
            (r.k, r.t): r.ema
            for r in ema_chunked(
                df, "k", "t", "v", span=10, chunk_rows=chunk_rows
            ).collect()
        }
        assert set(got) == set(want)
        worst = max(abs(got[k] - want[k]) / max(abs(want[k]), 1e-12)
                    for k in want)
        assert worst < 1e-12, f"chunk_rows={chunk_rows}: rel err {worst}"


def test_ema_chunked_nonstring_and_null_keys(spark):
    """Regression: the seed join must carry the NATIVE key type — a
    string round-trip renders 1e-07 as '1e-07' in Python but '1.0E-7'
    in the JVM, silently dropping whole groups; null keys vanish under
    a plain equality join. Row counts must survive an outer check."""
    from pyspark.sql import Row

    from utn_dataengineering_stockmarketpipeline_spark.operators.windows import (
        ema,
        ema_chunked,
    )

    rows = []
    for key in (1e-07, 2.5, None):
        for i in range(11):
            rows.append(Row(k=key, t=i, v=10.0 + i))
    df = spark.createDataFrame(rows, "k double, t int, v double")

    got = ema_chunked(df, "k", "t", "v", span=4, chunk_rows=4).collect()
    assert len(got) == len(rows), "groups dropped by the seed join"

    want = {(r.k, r.t): r.ema for r in ema(df, "k", "t", "v", span=4).collect()}
    for r in got:
        assert r.ema == pytest.approx(want[(r.k, r.t)], rel=1e-12)


def test_ohlc_merge_equals_direct_state(spark):
    """merge(state(A), state(B)) must equal state(A ∪ B) for disjoint
    bar sets — including a month present on only one side and open/
    close resolution across the split boundary."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators.transforms import (
        ohlc_merge,
        ohlc_state,
    )

    rows = []
    for day, (o, h, l, c, v) in {
        1: (10.0, 12.0, 9.0, 11.0, 100),
        2: (11.0, 15.0, 10.0, 14.0, 200),
        15: (14.0, 14.5, 13.0, 13.5, 50),
        28: (13.5, 16.0, 13.0, 15.5, 300),
    }.items():
        rows.append(("T", 2024, 1, dt.date(2024, 1, day), o, h, l, c, v))
    # February bars land entirely in one split half
    rows.append(("T", 2024, 2, dt.date(2024, 2, 2), 15.0, 15.2, 14.8, 15.1, 70))
    df = spark.createDataFrame(
        rows,
        "stock_ticker string, stock_year int, stock_month int, "
        "stock_date date, stock_open double, stock_high double, "
        "stock_low double, stock_close double, stock_volume long",
    )
    import pyspark.sql.functions as SF

    a = df.filter(SF.dayofmonth("stock_date") <= 14)
    b = df.filter(SF.dayofmonth("stock_date") > 14)
    merged = {
        tuple(r[k] for k in ("stock_ticker", "stock_year", "stock_month")): r
        for r in ohlc_merge(ohlc_state(a), ohlc_state(b)).collect()
    }
    direct = {
        tuple(r[k] for k in ("stock_ticker", "stock_year", "stock_month")): r
        for r in ohlc_state(df).collect()
    }
    assert set(merged) == set(direct)
    for k in direct:
        assert merged[k].asDict() == direct[k].asDict(), k


def test_train_val_test_split_stable_and_complete(spark):
    """Split assignment is a pure function of the id: the same id gets
    the same split in any corpus subset, every row gets exactly one
    split, and all three splits are nonempty at n=2000."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        train_val_test_split,
    )

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    full = {r["doc_id"]: r["split"]
            for r in train_val_test_split(df, "doc_id").collect()}
    half = {r["doc_id"]: r["split"]
            for r in train_val_test_split(
                df.filter(F.col("doc_id") % 2 == 0), "doc_id").collect()}
    assert all(full[k] == v for k, v in half.items())
    from collections import Counter

    c = Counter(full.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] > 0 and c["test"] > 0
    # ~80/10/10 within loose tolerance
    assert 0.7 < c["train"] / 2000 < 0.9


def test_ohlc_merge_associative(spark):
    """Monoid sanity: merging in any grouping yields the direct state —
    merge(merge(A,B),C) == state(A ∪ B ∪ C)."""
    import datetime as dt

    from utn_dataengineering_stockmarketpipeline_spark.operators.transforms import (
        ohlc_merge,
        ohlc_state,
    )

    rows = [
        ("T", 2024, 1, dt.date(2024, 1, d), 10.0 + d, 20.0 + d, 5.0 + d,
         15.0 + d, 10 * d)
        for d in range(1, 10)
    ]
    df = spark.createDataFrame(
        rows,
        "stock_ticker string, stock_year int, stock_month int, "
        "stock_date date, stock_open double, stock_high double, "
        "stock_low double, stock_close double, stock_volume long",
    )
    import pyspark.sql.functions as SF

    a = df.filter(SF.dayofmonth("stock_date") % 3 == 0)
    b = df.filter(SF.dayofmonth("stock_date") % 3 == 1)
    c = df.filter(SF.dayofmonth("stock_date") % 3 == 2)
    chained = ohlc_merge(ohlc_merge(ohlc_state(a), ohlc_state(b)), ohlc_state(c))
    direct = ohlc_state(df)
    assert [r.asDict() for r in chained.collect()] == [
        r.asDict() for r in direct.collect()
    ]


def test_bm25_ignores_absent_terms(spark):
    """A query term absent from the corpus contributes nothing — scores
    equal the query without it, and docs matching no term drop out."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        bm25_scores,
    )

    df = spark.createDataFrame(
        [(1, "spark window merge"), (2, "window window join"), (3, "other")],
        "doc_id long, text string",
    )
    with_ghost = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, ["window", "zzz_absent"]).collect()
    }
    without = {
        r["doc_id"]: r["score"] for r in bm25_scores(df, ["window"]).collect()
    }
    assert with_ghost == without
    assert set(without) == {1, 2}
    assert without[2] > without[1]  # higher tf, same dl-ish -> higher score


def test_bm25_query_term_multiplicity_weights_partials(spark):
    """Bag-of-words query semantics: a term listed twice contributes its
    partial score twice (Lucene sums per query occurrence) — doubled
    query term == doubled single-term score (ADVICE r7)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        bm25_scores,
    )

    df = spark.createDataFrame(
        [(1, "spark window merge"), (2, "window window join"), (3, "other")],
        "doc_id long, text string",
    )
    single = {
        r["doc_id"]: r["score"] for r in bm25_scores(df, ["window"]).collect()
    }
    doubled = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, ["window", "window"]).collect()
    }
    assert set(doubled) == set(single)
    # scores are rounded to 6 dp after summation, so compare at the
    # rounding granularity (round(2x) vs 2*round(x))
    for d, s in single.items():
        assert doubled[d] == pytest.approx(2.0 * s, abs=2e-6)


def test_exact_rank_rejects_nan_and_reserved_columns(spark):
    """_offset_ranked guards: NaN in the value column raises (Python
    ordering diverges from Spark's NaN-greatest), and input columns
    colliding with internal names raise instead of corrupting
    (ADVICE r7)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.windows import (
        exact_row_number,
    )

    nan_df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 2.0)], "id long, v double"
    )
    with pytest.raises(ValueError, match="NaN"):
        exact_row_number(nan_df, "v", "id")

    clash_df = spark.createDataFrame([(1, 5, 9)], "id long, v long, __rank long")
    with pytest.raises(ValueError, match="__rank"):
        exact_row_number(clash_df, "v", "id")


def test_dsir_weights_favor_target_like_docs(spark):
    """r8 DSIR contract: a doc written in the target domain's vocabulary
    scores a higher log-weight than one written in the other domain's;
    token counts are exact; empty docs emit nothing."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        dsir_weights,
    )

    rows = [
        # target domain (src0) speaks 'alpha beta', the rest 'gamma delta'
        (0, "alpha beta alpha beta", "src0"),
        (1, "alpha alpha beta beta", "src0"),
        (2, "gamma delta gamma delta", "src1"),
        (3, "gamma gamma delta delta", "src1"),
        (4, "alpha beta alpha beta", "src1"),   # target-LIKE, other source
        (5, "", "src1"),                        # empty: no evidence
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in
           dsir_weights(df, target_source="src0").collect()}
    assert 5 not in out and set(out) == {0, 1, 2, 3, 4}
    assert all(out[i]["n_tokens"] == 4 for i in out)
    # target-vocabulary docs outrank other-domain docs regardless of source
    assert out[4]["log_weight"] > out[2]["log_weight"]
    assert out[0]["log_weight"] > out[2]["log_weight"]
    # same bag of words -> identical weight (order-insensitive)
    assert out[0]["log_weight"] == out[1]["log_weight"] == out[4]["log_weight"]
    assert out[2]["log_weight"] == out[3]["log_weight"]
