"""Local clone of the driver's t2 correctness gate, at sf0.001.

For every catalog query with an oracle: run the Spark plan AND the
DuckDB SQL, then compare row count, column names, and order-insensitive
values. Catches cross-engine drift (float reduction order, dialect
differences, type coercions) before the driver does.
"""

from __future__ import annotations

import math

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


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark):
    q = CATALOG[name]
    df = q.build(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0
