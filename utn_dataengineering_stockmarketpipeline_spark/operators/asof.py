"""As-of and range joins — time-series extensions (SURVEY.md §2.5 notes
them as the natural stock-domain extensions beyond the reference's
equi-joins; §7 stretch list).

Spark has no ASOF JOIN operator, and the naive formulation (theta join
on ``l.t >= r.t`` + keep-latest) degenerates to a nested-loop cross
product. Both operators here reduce to shuffle-friendly plans:

- ``asof_join``: the union-window trick — interleave both sides on
  (key, time), carry right-side values forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window,
  keep left rows. ONE shuffle on the key, zero row explosion,
  per-partition streaming frame scan: the same shape a dedicated
  time-series engine uses (sort-merge by key/time).
- ``range_join_bucketed``: interval join via bucketing — each right
  interval explodes to the fixed-width buckets it covers, the left
  point hashes to its bucket, equi-join on bucket, exact predicate
  verifies. Shuffle cost scales with interval/width ratio, not |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    strict: bool = False,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): for every left
    row, the latest right row with ``right_time <= left_time`` (``<``
    when ``strict``). ``direction="forward"``: the earliest right row
    with ``right_time >= left_time`` (``>`` when ``strict``) — the
    next-quote / next-fill lookup. Right columns come back null when no
    matching row exists (LEFT ASOF semantics, matching DuckDB's
    ``ASOF LEFT JOIN`` with the corresponding inequality). Same
    one-shuffle union-window plan either way — forward sorts the union
    DESCENDING so the carry stays a RUNNING ``last`` over
    [unbounded preceding, current] (never a [current, unbounded
    following] frame + ``first``, whose UnboundedFollowing frame
    re-iterates the frame per row: O(partition²) when it spills —
    see the inline comment at the window construction).

    Right rows must be unique per (key, time) — the stock-bar contract;
    with duplicates the carried value is the max-sorting one.

    All value columns travel as ONE struct carried by a single
    ``last(ignorenulls=True)``, so every output value comes from the
    same matched right row — a NULL inside the matched row stays NULL
    (per-column carries would backfill it from an older row, mixing
    columns of different right rows and diverging from DuckDB ASOF).

    ``tolerance_seconds`` bounds the staleness of the match (pandas
    ``merge_asof(tolerance=...)``): a carried row farther than the
    bound from the left time nulls out. Zero extra cost — the matched
    right time already rides in the carried struct, so the bound is a
    map-side expression after the same one-shuffle plan (the as-of
    match is by definition the CLOSEST eligible row, so nulling it is
    exactly "no match within tolerance").
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if "__rt" in value_cols:
        raise ValueError("value_cols may not contain the reserved name '__rt'")
    fwd = direction == "forward"
    # side marker orders equal timestamps so a left row sees a right row
    # at the *same* instant (inclusive) or not (strict); the forward
    # frame looks the other way, so the markers mirror
    if fwd:
        l_mark, r_mark = (1, 0) if strict else (0, 1)
    else:
        l_mark, r_mark = (0, 1) if strict else (1, 0)
    r_struct_type = right.select(*value_cols).schema
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(l_mark).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{f.name}:{f.dataType.simpleString()}" for f in r_struct_type
            ) + ",__rt:timestamp>"
        ).alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(r_mark).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_time).cast("timestamp").alias("__rt"),
        ).alias("__rrow"),
    )
    # Both directions run a RUNNING frame ([unboundedPreceding, current])
    # — the only window frame Spark evaluates incrementally (one pass,
    # O(partition)). The forward lookup sorts DESCENDING and carries
    # with last(): "nearest row at-or-after current in ascending order"
    # IS "last non-null seen at-or-before current in the exactly
    # reversed order", tie markers included. The direct formulation —
    # first() over [current, unboundedFollowing] — looks symmetric but
    # is NOT: Spark's UnboundedFollowingWindowFunctionFrame re-scans
    # from each row to partition end, O(partition²) aggregate updates
    # (and once the partition spills, each step re-walks the spill
    # file: a sf0.1 per-ticker partition measured 30+ min under a 1 GB
    # heap vs sub-second for the reversed running frame).
    if fwd:
        base = Window.partitionBy("__k").orderBy(
            F.col("__t").desc(), F.col("__side").desc()
        )
    else:
        base = Window.partitionBy("__k").orderBy("__t", "__side")
    w = base.rowsBetween(Window.unboundedPreceding, 0)
    carry = F.last("__rrow", ignorenulls=True).over(w)
    carried = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__t",
        "__lrow",
        carry.alias("__rrow"),
    )
    rrow = F.col("__rrow")
    if tolerance_seconds is not None:
        lag = (
            F.col("__rrow.__rt").cast("double") - F.col("__t").cast("double")
            if fwd
            else F.col("__t").cast("double") - F.col("__rrow.__rt").cast("double")
        )
        rrow = F.when(lag <= F.lit(float(tolerance_seconds)), rrow)
    return carried.filter(F.col("__side") == l_mark).select(
        "__lrow.*",
        *[rrow[c].alias(c) for c in value_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    point: str | Column,
    lo: str | Column,
    hi: str | Column,
    bucket_width: float,
) -> DataFrame:
    """Interval join: left rows whose ``point`` falls in [lo, hi) of a
    right interval. Buckets of ``bucket_width`` turn the inequality pair
    into ONE equi-join: right intervals explode to every bucket they
    overlap, left points hash to their bucket, the exact predicate
    verifies after the join.

    Pick ``bucket_width`` near the typical interval length: row growth
    on the right is ~len/width + 1 per interval, and each left point
    probes exactly one bucket.
    """
    p = F.col(point) if isinstance(point, str) else point
    lo_c = F.col(lo) if isinstance(lo, str) else lo
    hi_c = F.col(hi) if isinstance(hi, str) else hi

    l_b = left.withColumn("__bucket", F.floor(p / bucket_width))
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(lo_c / bucket_width), F.floor(hi_c / bucket_width))
        ),
    )
    joined = l_b.join(r_b, "__bucket").filter((p >= lo_c) & (p < hi_c))
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair whose
    CLOSED intervals intersect (``l_lo <= r_hi AND r_lo <= l_hi``).
    The inequality pair becomes ONE equi-join: both sides explode to
    the fixed-width buckets their interval spans and join on bucket.

    A pair sharing several buckets is emitted exactly once WITHOUT a
    distinct pass: a match only counts in the first bucket both
    intervals cover — ``max(floor(l_lo/W), floor(r_lo/W))`` — which is
    pure arithmetic on the joined row, so dedup costs zero extra
    shuffles. Shuffle volume scales with Σ(span/W + 1) per side, not
    |L|×|R|; pick ``bucket_width`` near the typical interval length.

    Column names must be disjoint across the two sides (raises
    otherwise) — the output carries all columns of both.
    """
    dup = sorted(set(left.columns) & set(right.columns))
    if dup:
        raise ValueError(f"overlapping column names across sides: {dup}")
    l_lo, l_hi = F.col(left_lo), F.col(left_hi)
    r_lo, r_hi = F.col(right_lo), F.col(right_hi)
    w = bucket_width
    lb = left.withColumn(
        "__bucket", F.explode(F.sequence(F.floor(l_lo / w), F.floor(l_hi / w)))
    )
    rb = right.withColumn(
        "__bucket", F.explode(F.sequence(F.floor(r_lo / w), F.floor(r_hi / w)))
    )
    joined = lb.join(rb, "__bucket").filter(
        (l_lo <= r_hi)
        & (r_lo <= l_hi)
        & (F.col("__bucket") == F.greatest(F.floor(l_lo / w), F.floor(r_lo / w)))
    )
    return joined.drop("__bucket")
