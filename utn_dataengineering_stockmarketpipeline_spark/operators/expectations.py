"""Declarative data-quality expectations: one-pass report + quarantine.

The load gate every warehouse/corpus pipeline runs before publishing
(dbt tests / Great Expectations, engine-side): rules are named boolean
Columns over a ROW (``True`` = the row passes), and the runner gives

- ``quality_report``: per-rule violation counts in ONE aggregation
  pass over the data — never a pass per rule (at 100 TB, k rules must
  not mean k scans; every ``sum(when(~rule, 1))`` rides the same
  map-side-combined aggregate);
- ``tag_violations``: the row-level audit form — every row with the
  array of rule names it violates (empty = clean);
- ``quarantine_split``: (clean, quarantined) — the action. The
  quarantined side keeps the violation tags so triage never re-runs
  the rules.

Rules are row-scoped on purpose: NULL/range/format/key-shape checks
fuse into the scan as a zero-shuffle codegen map. Cross-row rules
(uniqueness, referential integrity) are aggregations with their own
plan shapes — the catalog's ``ana_referential_orphans`` and the
SCD key contracts cover those; bolting them into a row-rule API would
hide a shuffle behind a predicate.

NULL discipline: a rule evaluating to NULL (e.g. ``col > 0`` on a
NULL) counts as a VIOLATION — the gate is allow-list, matching SQL
CHECK-constraint reality where unknown is not a pass. That is
``coalesce(rule, false)`` applied once here, not in every rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _passes(rule: Column) -> Column:
    return F.coalesce(rule, F.lit(False))


def tag_violations(
    df: DataFrame, rules: dict[str, Column], tag_col: str = "violations"
) -> DataFrame:
    """All columns plus ``tag_col``: array of violated rule names
    (empty array = clean row). Zero shuffle — a pure projection."""
    if not rules:
        raise ValueError("no rules given")
    if tag_col in df.columns:
        raise ValueError(f"column {tag_col!r} already exists")
    tags = F.array_compact(
        F.array(
            *[
                F.when(~_passes(rule), F.lit(name))
                for name, rule in rules.items()
            ]
        )
    )
    return df.withColumn(tag_col, tags)


def quality_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """``(rule, n_violations, n_rows, pass_permille)`` per rule — ONE
    aggregation over the data for any number of rules, then the tiny
    k-row result unpivots driver-free via stack."""
    if not rules:
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(~_passes(rule), 1).otherwise(0)).alias(f"__v_{i}")
        for i, rule in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    # unpivot via explode of literal structs — rule names ride F.lit,
    # never an interpolated SQL string (names with quotes stay names,
    # not parse errors or injected expressions)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return wide.select(
        F.explode(pairs).alias("p"), F.col("__n").alias("n_rows")
    ).select(
        F.col("p.rule").alias("rule"),
        F.col("p.n_violations").alias("n_violations"),
        "n_rows",
    ).select(
        "rule",
        "n_violations",
        "n_rows",
        ((F.col("n_rows") - F.col("n_violations")) * 1000 / F.col("n_rows"))
        .alias("pass_permille"),
    )


def quarantine_split(
    df: DataFrame, rules: dict[str, Column], tag_col: str = "violations"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows with original schema,
    quarantined rows carrying their violation tags for triage."""
    tagged = tag_violations(df, rules, tag_col)
    clean = tagged.filter(F.size(tag_col) == 0).drop(tag_col)
    bad = tagged.filter(F.size(tag_col) > 0)
    return clean, bad
