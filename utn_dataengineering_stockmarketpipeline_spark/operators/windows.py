"""Window / latest-row operators (SURVEY.md §2.7 W1-W4, §2.6 A1).

Two forms of "latest row per entity":

1. ``latest_global_date`` — the reference's exact semantics
   (``DB_manager.py:192-196``): filter to the *global* max date, then by
   ticker. Quirk preserved on purpose: a ticker that did not trade on
   the globally-latest date yields 0 rows (SURVEY.md §2.7 W1).
2. ``latest_per_entity`` — the robust variant:
   ``row_number() over (partition by entity order by date desc) = 1``.

Scale: the global max is a two-stage tree aggregate (bytes of shuffle);
the per-entity variant shuffles once on the entity key. Both avoid any
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_global_date(fact: DataFrame, date_col: str = "stock_date") -> DataFrame:
    """Rows on the globally-latest date (scalar-subquery MAX, A1/W1).

    Expressed as an inner equi-join against the 1-row aggregate rather
    than ``.first()`` — no driver round-trip, and AQE broadcasts the
    1-row side.
    """
    latest = fact.agg(F.max(date_col).alias("__max_date"))
    return fact.join(
        latest, on=fact[date_col] == latest["__max_date"], how="inner"
    ).drop("__max_date")


def latest_per_entity(
    fact: DataFrame,
    entity_col: str = "stock_ticker",
    date_col: str = "stock_date",
) -> DataFrame:
    """Most recent row per entity (robust W1 variant)."""
    w = Window.partitionBy(entity_col).orderBy(F.col(date_col).desc())
    return (
        fact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


#: Per-key row bound for the ordered-recurrence operators (ema): each
#: group materializes as ONE Arrow batch in ONE task, so a group must fit
#: a task's memory. 10^7 rows ≈ hundreds of MB as Arrow — the practical
#: ceiling. Same enforced-bound discipline as similarity.MAX_BROADCAST_ROWS.
MAX_GROUP_ROWS = 10_000_000


def ema(df, key_col: str, time_col: str, value_col: str, span: int = 20,
        out_col: str = "ema", max_group_rows: int = MAX_GROUP_ROWS):
    """Exponential moving average per key — the per-group ORDERED
    RECURRENCE class (EMA / Wilder smoothing / Kalman-style filters)
    that window frames cannot express: e_t = a·x_t + (1-a)·e_{t-1}.

    ``applyInPandas`` per key: each group arrives as one Arrow batch,
    sorts by time locally, runs the recurrence sequentially. One shuffle
    on the key; groups process in parallel — the 100 TB contract is
    "group fits one task", which holds for per-entity time series (a
    ticker's daily history is tiny; millions of tickers give the
    parallelism). That contract is ENFORCED, not assumed: a group past
    ``max_group_rows`` raises in the task rather than silently OOMing —
    tick-level series must be pre-bucketed (e.g. key = (ticker, year)
    with carried-in seed values) or chunked before this operator. The
    recurrence is a Python loop over the group — exact same float op
    order (mul, mul, add) every engine; swap in scipy.signal.lfilter
    for very long series.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    a = 2.0 / (span + 1.0)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(key_col, time_col, value_col).schema
    ) + f", {out_col} double"

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"ema: group {pdf[key_col].iloc[0]!r} has {len(pdf)} rows "
                f"> max_group_rows={max_group_rows}; a group must fit one "
                f"task. Pre-bucket the key (e.g. (entity, year) with a "
                f"carried seed) or chunk the series."
            )
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        prev = None
        vals = []
        for x in pdf[value_col]:
            prev = x if prev is None else a * x + (1.0 - a) * prev
            vals.append(prev)
        pdf[out_col] = vals
        return pdf

    return (
        df.select(key_col, time_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fn, out_schema)
    )
