"""Declarative expectations runner (operators/expectations.py):
one-pass reporting, NULL-as-violation discipline, quarantine split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import (
    expectations as ex,
)


def _rules():
    return {
        "price_positive": F.col("price") > 0,
        "qty_in_range": F.col("qty").between(1, 100),
        "name_nonempty": F.length("name") > 0,
    }


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, 5, "ok"),
            (2, -1.0, 5, "neg price"),
            (3, 10.0, 500, "qty high"),
            (4, None, 5, "null price"),   # NULL rule result = violation
            (5, 10.0, 5, ""),
            (6, -2.0, 0, ""),             # violates all three
        ],
        "id long, price double, qty long, name string",
    )


def test_quality_report_counts_and_single_pass(spark):
    rep = {r.rule: r for r in ex.quality_report(_df(spark), _rules()).collect()}
    assert rep["price_positive"].n_violations == 3  # ids 2, 4(null), 6
    assert rep["qty_in_range"].n_violations == 2    # ids 3, 6
    assert rep["name_nonempty"].n_violations == 2   # ids 5, 6
    assert all(r.n_rows == 6 for r in rep.values())
    assert rep["price_positive"].pass_permille == 500.0

    # one aggregation pass: a single scan + single (partial) aggregate,
    # no per-rule re-scan and no join
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ex.quality_report(_df(spark), _rules()).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert plan.count(") Scan") <= 1  # detail-section operator ids


def test_tag_violations_and_split(spark):
    clean, bad = ex.quarantine_split(_df(spark), _rules())
    assert sorted(r.id for r in clean.collect()) == [1]
    tags = {r.id: sorted(r.violations) for r in bad.collect()}
    assert tags[2] == ["price_positive"]
    assert tags[3] == ["qty_in_range"]
    assert tags[4] == ["price_positive"]  # NULL price is a violation
    assert tags[5] == ["name_nonempty"]
    assert tags[6] == ["name_nonempty", "price_positive", "qty_in_range"]
    assert "violations" not in clean.columns
    assert clean.count() + bad.count() == 6


def test_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="no rules"):
        ex.quality_report(df, {})
    with pytest.raises(ValueError, match="already exists"):
        ex.tag_violations(df.withColumn("violations", F.lit("x")), _rules())


def test_rule_names_with_quotes_are_safe(spark):
    rules = {"price isn't null": F.col("price").isNotNull()}
    rep = ex.quality_report(_df(spark), rules).collect()
    assert rep[0].rule == "price isn't null"
    assert rep[0].n_violations == 1  # id 4
    _, bad = ex.quarantine_split(_df(spark), rules)
    assert {r.id for r in bad.collect()} == {4}
