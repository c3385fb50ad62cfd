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


def key_skew_profile(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Join-key skew diagnostic — the pre-flight a 100 TB join runs
    BEFORE choosing between a plain shuffle join, :func:`salted_join`,
    or AQE skew splitting: per-key frequencies, the p50/p99 key
    frequency, and the ``top_k`` hottest keys with their ratio to the
    median. A hot key whose ratio is 100× means one reduce task gets
    100× the median partition's rows — this report is the evidence.

    Returns the ``top_k`` hottest keys as ``(key, cnt,
    share_permille, p50_cnt, p99_cnt, ratio_to_p50)`` — the summary
    percentiles ride every row (audit style), all integer arithmetic
    except the final 6dp ratio.

    Plan: ONE map-side-combined count shuffle builds the per-key
    relation; the percentiles come from the counts-OF-counts relation
    (|distinct frequency values| rows — Zipf-tiny however large the
    corpus, the same observation :func:`~..operators.windows.
    exact_row_number` rests on), cumulated with a window over that
    tiny relation and broadcast back; the hottest keys are a
    distributed top-k (TakeOrdered), never a global sort. Exact
    percentile-disc semantics: p50 = smallest frequency whose
    cumulative key count reaches ceil(0.5 · n_keys) — integer on both
    engines."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    cc = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_at"))
    wcum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the window's ordered partition is the counts-of-counts relation:
    # tiny by Zipf, so the single-partition global window is bounded
    cum = cc.withColumn("cum", F.sum("n_at").over(wcum))
    pct = (
        cum.crossJoin(F.broadcast(total))
        .select(
            F.min(F.when(F.col("cum") * 2 >= F.col("n_keys"), F.col("cnt"))
                  ).alias("p50_cnt"),
            F.min(F.when(F.col("cum") * 100 >= F.col("n_keys") * 99,
                         F.col("cnt"))).alias("p99_cnt"),
        )
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col(key)).limit(top_k)
    return (
        top.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(pct))
        .select(
            key, "cnt",
            F.expr("(cnt * 1000) div n_rows").alias("share_permille"),
            "p50_cnt", "p99_cnt",
            F.round(F.col("cnt") / F.col("p50_cnt"), 6).alias("ratio_to_p50"),
        )
    )
