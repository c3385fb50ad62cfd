"""Local clone of the driver's t2 correctness gate, at sf0.001.

For every catalog query with an oracle: run the Spark plan AND the
DuckDB SQL, then compare row count, column names, and order-insensitive
values. Catches cross-engine drift (float reduction order, dialect
differences, type coercions) before the driver does.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG

from conftest import SF_SMOKE


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    return str(v)


def _canon(rows, cols) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    q = CATALOG[name]
    sdf = q.build(spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert a == b, f"{name}: value mismatch, first diffs: {mism}"

    # Driver-parity: the driver compares via pandas (sort_values over all
    # columns, then value-hash), which is dtype-sensitive (int64 1234 vs
    # float64 1234.0 hash differently — DuckDB HUGEINT sums arrive as
    # float64) and cannot hash list cells at all.  Mirror both hazards.
    spdf = sdf.toPandas()
    dkdf = duck.execute(q.oracle).df()

    def _kind(frame, col):
        # A Spark DECIMAL lands in pandas as object(Decimal) — NUMERIC
        # to the driver's hash, invisible to dtype.kind.  Classify it
        # as its own numeric kind so object(Decimal)-vs-float64 fails
        # here instead of at the driver (the r11/r12 ana_ks_drift red
        # slipped through the old both-numeric-only check exactly this
        # way).
        k = frame[col].dtype.kind
        if k == "O":
            nonnull = frame[col].dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], Decimal):
                return "decimal"
        return k

    numericish = {"i", "u", "f", "decimal"}
    for col in sorted(spark_cols):
        sk, dk = _kind(spdf, col), _kind(dkdf, col)
        assert sk == dk or (sk not in numericish and dk not in numericish), (
            f"{name}.{col}: pandas dtype kind {sk!r} vs oracle {dk!r} — "
            "the driver's value hash is dtype-sensitive; cast the oracle "
            "(e.g. CAST(SUM(..) AS BIGINT)) or the Spark column to agree"
        )
        for frame, side in ((spdf, "spark"), (dkdf, "oracle")):
            if len(frame) and frame[col].dtype.kind == "O":
                cell = frame[col].iloc[0]
                try:
                    hash(cell)
                except TypeError:
                    pytest.fail(
                        f"{name}.{col} ({side}): unhashable cell "
                        f"{type(cell).__name__} — the driver's pandas "
                        "compare will error; serialize arrays to strings"
                    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark):
    q = CATALOG[name]
    df = q.build(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
