"""Skew mitigation (SURVEY.md §4.2; the 100 TB posture).

AQE's skew-join splitting handles most runtime skew, but two cases need
explicit plans:

- ``salted_join``: a JOIN where one key dominates (a hot ticker, a
  boilerplate LSH bucket). The big side gets a deterministic salt in
  [0, n); the small side replicates each row across ALL n salts; the
  join key becomes (key, salt), splitting the hot key's row group into
  n parallel tasks. Classic trade: n× duplication of the small side
  buys n× parallelism on the hot key.
- ``salted_distinct_count``: exact COUNT(DISTINCT x) per key without
  funneling a hot key's whole value set through one reduce task —
  phase 1 dedups (key, salt, value) partitions, phase 2 sums partial
  distinct counts (values are disjoint across salts by construction:
  the salt IS a hash of the value).

Salts derive from xxhash64 of real columns — deterministic, no RNG, no
``rand()`` nondeterminism across stage retries (a correctness hazard:
a retried task re-rolling different salts double-counts rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``.

    ``big`` rows salt by a hash of ALL their columns (stable under
    retries); ``small`` rows replicate across every salt. Output
    matches ``big.join(small, on, how)`` for the LEFT-side join types
    only — each big row carries exactly one salt, so it joins/misses
    exactly once. Right/full outer would emit each unmatched small row
    once PER SALT (n_salts duplicates), so those are rejected; put the
    skewed side on the left or de-dup downstream instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — small-side rows "
            f"are replicated per salt, so right/full outer joins would "
            f"duplicate unmatched small rows. Allowed: {sorted(allowed)}"
        )
    non_key = [c for c in big.columns if c != on] or [on]
    b = big.withColumn("__salt", _salt(non_key, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value), hot-key-proof.

    Salting by hash(value) partitions each key's value SET into
    disjoint slices, so per-slice distinct counts sum exactly — unlike
    salting by row, which would double-count values recurring across
    salts.
    """
    phase1 = (
        df.select(key, value)
        .withColumn("__salt", _salt([value], n_salts))
        .groupBy(key, "__salt")
        .agg(F.countDistinct(value).alias("__part"))
    )
    return phase1.groupBy(key).agg(F.sum("__part").alias("n_distinct"))
