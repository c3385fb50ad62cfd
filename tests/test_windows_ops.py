"""operators/windows.py unit semantics — the ordered-recurrence (ema)
memory-bound contract (same enforced-bound discipline as
similarity.MAX_BROADCAST_ROWS)."""

from __future__ import annotations

import pytest

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
