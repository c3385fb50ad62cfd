"""As-of / range join edge semantics on hand-built data (the catalog
oracle test covers the full-table DuckDB ASOF comparison)."""

from __future__ import annotations

import datetime as dt

from utn_dataengineering_stockmarketpipeline_spark.operators.asof import (
    asof_join,
    range_join_bucketed,
)


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("A", _d("2024-01-01"), 1),  # before any bar → null
            ("A", _d("2024-01-05"), 2),  # equal to a bar date (tie)
            ("A", _d("2024-01-07"), 3),  # between bars → carry 01-05
            ("B", _d("2024-01-04"), 4),  # other key
            ("C", _d("2024-01-04"), 5),  # key with no bars at all
        ],
        "k string, t date, row_id int",
    )
    right = spark.createDataFrame(
        [
            ("A", _d("2024-01-02"), 10.0),
            ("A", _d("2024-01-05"), 20.0),
            ("A", _d("2024-01-09"), 30.0),
            ("B", _d("2024-01-01"), 40.0),
        ],
        "k string, t date, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", value_cols=["v"],
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    assert got == {1: None, 2: 20.0, 3: 20.0, 4: 40.0, 5: None}
    assert out.count() == left.count()  # never explodes or drops rows


def test_asof_strict_excludes_same_instant(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", value_cols=["v"],
        strict=True,
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    # row 2 (equal date) now sees the earlier bar, not the same-day one
    assert got == {1: None, 2: 10.0, 3: 20.0, 4: 40.0, 5: None}


def test_asof_forward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", value_cols=["v"],
        direction="forward",
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    # row 1 sees the first bar after it; row 2 the same-day bar; row 3 the
    # 01-09 bar; row 4 is after B's only bar → null; row 5 has no bars
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: None, 5: None}
    assert out.count() == left.count()


def test_asof_forward_strict_excludes_same_instant(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", value_cols=["v"],
        direction="forward", strict=True,
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    # row 2 (equal date) now sees the NEXT bar, not the same-day one
    assert got == {1: 10.0, 2: 30.0, 3: 30.0, 4: None, 5: None}


def test_asof_bad_direction_raises(spark):
    left, right = _frames(spark)
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right.withColumnRenamed("t", "rt"),
            on="k", left_time="t", right_time="rt", value_cols=["v"],
            direction="sideways",
        )


def test_asof_null_in_matched_row_stays_null(spark):
    """A NULL value inside the matched (latest prior) right row must come
    back as NULL — not backfilled from an older right row (DuckDB ASOF
    returns the matched row verbatim)."""
    left = spark.createDataFrame(
        [("A", _d("2024-01-06"), 1)], "k string, t date, row_id int"
    )
    right = spark.createDataFrame(
        [
            ("A", _d("2024-01-02"), 10.0, 100.0),
            ("A", _d("2024-01-05"), None, 200.0),  # matched row: v is NULL
        ],
        "k string, rt date, v double, w double",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        value_cols=["v", "w"],
    ).collect()
    assert len(out) == 1
    assert out[0]["w"] == 200.0
    assert out[0]["v"] is None  # NOT 10.0 from the older row


def test_range_join_bucketed_exact_bounds(spark):
    left = spark.createDataFrame(
        [(0.0,), (499.9,), (500.0,), (1999.9,), (2000.0,), (7999.0,)],
        "x double",
    )
    right = spark.createDataFrame(
        [(0, 0.0, 500.0), (1, 500.0, 2000.0), (2, 2000.0, 8000.0)],
        "band int, lo double, hi double",
    )
    out = range_join_bucketed(left, right, "x", "lo", "hi", bucket_width=300)
    got = sorted((r["x"], r["band"]) for r in out.collect())
    # [lo, hi): lower bound inclusive, upper exclusive, across buckets
    assert got == [
        (0.0, 0),
        (499.9, 0),
        (500.0, 1),
        (1999.9, 1),
        (2000.0, 2),
        (7999.0, 2),
    ]


def test_interval_overlap_join_dedup_and_bounds(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.asof import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            (1, 0, 25),     # spans many buckets; overlaps R10 and R20
            (2, 9, 10),     # touches R10 at exactly one point
            (3, -12, -4),   # negative coords; overlaps R-neg
            (4, 50, 60),    # overlaps nothing
        ],
        "lid int, llo int, lhi int",
    )
    right = spark.createDataFrame(
        [
            (10, 5, 30),    # shares buckets 0,1,2,3 with L1 → must emit ONCE
            (20, 25, 40),   # touches L1 endpoint
            (30, -6, -1),   # negative overlap with L3
            (40, 100, 110),
        ],
        "rid int, rlo int, rhi int",
    )
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", bucket_width=8
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 10), (1, 20), (2, 10), (3, 30)]

    import pytest

    with pytest.raises(ValueError, match="overlapping column"):
        interval_overlap_join(
            left, left, "llo", "lhi", "llo", "lhi", bucket_width=8
        )


def test_asof_tolerance_nulls_stale_matches(spark):
    """tolerance_seconds bounds match staleness: exactly-at-bound
    matches survive, beyond-bound matches null out (BOTH value columns
    together — partial survival would mix right rows), and rows are
    never dropped."""
    left, right = _frames(spark)
    out = asof_join(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", value_cols=["v"],
        tolerance_seconds=2 * 86400,
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    # row 2: same-day bar (lag 0) ok; row 3: 01-05 bar is 2 days old —
    # exactly at the bound, kept; row 4: B's bar is 3 days old → null
    assert got == {1: None, 2: 20.0, 3: 20.0, 4: None, 5: None}
    assert out.count() == left.count()


def test_asof_tolerance_forward(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right.withColumnRenamed("t", "rt"),
        on="k", left_time="t", right_time="rt", value_cols=["v"],
        direction="forward", tolerance_seconds=1 * 86400,
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    # forward: row 1 (01-01) → next bar 01-02, 1 day ahead, kept;
    # row 3 (01-07) → next bar 01-09 is 2 days ahead → null
    assert got == {1: 10.0, 2: 20.0, 3: None, 4: None, 5: None}


def test_asof_reserved_rt_name_raises(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="__rt"):
        asof_join(
            left, right.withColumnRenamed("v", "__rt"),
            on="k", left_time="t", right_time="t", value_cols=["__rt"],
        )
