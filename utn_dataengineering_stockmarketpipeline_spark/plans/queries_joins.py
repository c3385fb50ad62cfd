"""As-of / range join queries (SURVEY.md §2.5 extensions).

The as-of query is the canonical stock-domain ask the reference cannot
express: "the prevailing price when each line item shipped". The DuckDB
oracle uses its native ``ASOF LEFT JOIN`` — an independent
implementation of the semantics our union-window plan must reproduce
exactly (inclusive at equal timestamps, nulls when no prior bar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, interval_overlap_join, range_join_bucketed
from ..sources.parquet import load_table
from .catalog import register
from .reference_tables import (
    STOCK_PRICES_CTE,
    _ticker_expr,
    stock_prices,
    ticker_sql,
)


@register(
    "join_asof_tolerance_price",
    f"""
WITH {STOCK_PRICES_CTE.strip()},
li AS (
  SELECT l_orderkey, l_linenumber,
         {ticker_sql('l_suppkey')} AS stock_ticker,
         CAST(l_shipdate AS DATE) AS ship_date
  FROM lineitem),
matched AS (
  SELECT li.l_orderkey, li.l_linenumber, li.stock_ticker, li.ship_date,
         sp.stock_date, sp.stock_close
  FROM li ASOF LEFT JOIN stock_prices sp
    ON li.stock_ticker = sp.stock_ticker AND li.ship_date >= sp.stock_date)
SELECT l_orderkey, l_linenumber, stock_ticker, ship_date,
       CASE WHEN datediff('day', stock_date, ship_date) <= 3
            THEN stock_date END AS px_date,
       CASE WHEN datediff('day', stock_date, ship_date) <= 3
            THEN stock_close END AS px_close
FROM matched
""",
    doc="as-of join with a STALENESS BOUND (pandas merge_asof "
        "tolerance): prevailing bar per ship date, but only if at most "
        "3 days old — stale quotes null out instead of silently "
        "backfilling across a halt/delisting gap. The matched right "
        "time rides in the carried struct, so the bound is a map-side "
        "expression on the same one-shuffle union-window plan; DuckDB "
        "mirrors with ASOF LEFT JOIN + a datediff gate (the as-of "
        "match is the closest eligible row, so nulling it IS 'no "
        "match within tolerance')",
    tags=("joins", "asof", "window", "tolerance"),
)
def q_asof_tolerance_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _ticker_expr("l_suppkey").alias("stock_ticker"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )
    sp = stock_prices(spark, sf_dir)
    joined = asof_join(
        li,
        sp,
        on="stock_ticker",
        left_time="ship_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
        tolerance_seconds=3 * 86400,
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "stock_ticker",
        "ship_date",
        F.col("stock_date").alias("px_date"),
        F.col("stock_close").alias("px_close"),
    )


@register(
    "join_asof_price_at_ship",
    f"""
WITH {STOCK_PRICES_CTE.strip()},
li AS (
  SELECT l_orderkey, l_linenumber,
         {ticker_sql('l_suppkey')} AS stock_ticker,
         CAST(l_shipdate AS DATE) AS ship_date
  FROM lineitem)
SELECT li.l_orderkey, li.l_linenumber, li.stock_ticker, li.ship_date,
       sp.stock_date AS px_date, sp.stock_close AS px_close
FROM li ASOF LEFT JOIN stock_prices sp
  ON li.stock_ticker = sp.stock_ticker AND li.ship_date >= sp.stock_date
""",
    doc="as-of join: prevailing stock bar (latest at-or-before) for each "
        "lineitem ship date — union-window plan (one shuffle, no row "
        "explosion) vs DuckDB's native ASOF LEFT JOIN",
    tags=("joins", "asof", "window"),
)
def q_asof_price_at_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _ticker_expr("l_suppkey").alias("stock_ticker"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )
    sp = stock_prices(spark, sf_dir)
    joined = asof_join(
        li,
        sp,
        on="stock_ticker",
        left_time="ship_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "stock_ticker",
        "ship_date",
        F.col("stock_date").alias("px_date"),
        F.col("stock_close").alias("px_close"),
    )


_N_BANDS = 15
_BANDS_SQL = f"""
bands AS (
  SELECT CAST(b AS INT) AS band,
         CAST(b * b * 500 AS DOUBLE) AS lo,
         CAST((b + 1) * (b + 1) * 500 AS DOUBLE) AS hi
  FROM range({_N_BANDS}) t(b))
"""


@register(
    "join_range_price_bands",
    f"""
WITH {_BANDS_SQL.strip()}
SELECT band, lo, hi,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN bands
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band, lo, hi
""",
    doc="range (interval) join: lineitem prices into quadratic price "
        "bands — bucketed equi-join plan (explode intervals to "
        "fixed-width buckets) instead of a nested-loop theta join",
    tags=("joins", "range"),
)
def q_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )
    b = F.col("id")
    bands = spark.range(_N_BANDS).select(
        b.cast("int").alias("band"),
        (b * b * 500).cast("double").alias("lo"),
        ((b + 1) * (b + 1) * 500).cast("double").alias("hi"),
    )
    joined = range_join_bucketed(
        li, bands, point="l_extendedprice", lo="lo", hi="hi", bucket_width=5000
    )
    return joined.groupBy("band", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
            "sum_qty"
        ),
    )


@register(
    "join_asof_next_price",
    f"""
WITH {STOCK_PRICES_CTE.strip()},
li AS (
  SELECT l_orderkey, l_linenumber,
         {ticker_sql('l_suppkey')} AS stock_ticker,
         CAST(l_shipdate AS DATE) + 7 AS receipt_date
  FROM lineitem)
SELECT li.l_orderkey, li.l_linenumber, li.stock_ticker, li.receipt_date,
       sp.stock_date AS px_date, sp.stock_close AS px_close
FROM li ASOF LEFT JOIN stock_prices sp
  ON li.stock_ticker = sp.stock_ticker AND li.receipt_date <= sp.stock_date
""",
    doc="FORWARD as-of join: the next stock bar at-or-after each "
        "lineitem receipt date (ship+7d; the testdata carries no "
        "receipt column) — the next-quote/next-fill lookup, same "
        "one-shuffle union-window plan with the frame flipped to "
        "[current, unbounded following], vs DuckDB's native forward "
        "ASOF LEFT JOIN (li.t <= sp.t)",
    tags=("joins", "asof", "window"),
)
def q_asof_next_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _ticker_expr("l_suppkey").alias("stock_ticker"),
        F.date_add(F.col("l_shipdate").cast("date"), 7).alias("receipt_date"),
    )
    sp = stock_prices(spark, sf_dir)
    joined = asof_join(
        li,
        sp,
        on="stock_ticker",
        left_time="receipt_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
        direction="forward",
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "stock_ticker",
        "receipt_date",
        F.col("stock_date").alias("px_date"),
        F.col("stock_close").alias("px_close"),
    )


@register(
    "join_interval_promo_overlap",
    """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS ship_lo
  FROM lineitem),
p AS (
  SELECT promo_month,
         datediff('day', DATE '1970-01-01', promo_month) AS promo_lo
  FROM (SELECT DISTINCT date_trunc('month', CAST(l_shipdate AS DATE))
               AS promo_month
        FROM lineitem))
SELECT li.l_orderkey, li.l_linenumber, p.promo_month,
       CAST(LEAST(li.ship_lo + 6, p.promo_lo + 6)
            - GREATEST(li.ship_lo, p.promo_lo) + 1 AS BIGINT) AS overlap_days
FROM li JOIN p
  ON li.ship_lo <= p.promo_lo + 6 AND p.promo_lo <= li.ship_lo + 6
""",
    doc="interval × interval overlap join: each lineitem's 7-day ship "
        "window [shipdate, shipdate+6] against the first-7-days promo "
        "window of every ship month, plus the overlap length in days. "
        "Bucketed equi-join plan (operators/asof.py:"
        "interval_overlap_join) — both sides explode to 7-day buckets, "
        "multi-bucket pairs dedup by first-shared-bucket arithmetic, "
        "zero distinct pass — vs DuckDB's native inequality join.",
    tags=("joins", "interval", "overlap"),
)
def q_interval_promo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("ship_lo"),
    ).withColumn("ship_hi", F.col("ship_lo") + 6)
    promo = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.trunc(F.col("l_shipdate").cast("date"), "month").alias(
                "promo_month"
            )
        )
        .distinct()
        .select(
            "promo_month",
            F.datediff(F.col("promo_month"), epoch).alias("promo_lo"),
        )
        .withColumn("promo_hi", F.col("promo_lo") + 6)
    )
    joined = interval_overlap_join(
        li, promo, "ship_lo", "ship_hi", "promo_lo", "promo_hi",
        bucket_width=7,
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "promo_month",
        (
            F.least(F.col("ship_hi"), F.col("promo_hi"))
            - F.greatest(F.col("ship_lo"), F.col("promo_lo"))
            + F.lit(1)
        ).cast("bigint").alias("overlap_days"),
    )


@register(
    "join_ffill_calendar",
    f"""
WITH {STOCK_PRICES_CTE.strip()},
sp AS (SELECT stock_ticker, stock_date, stock_close FROM stock_prices),
cal AS (
  SELECT stock_ticker,
         CAST(unnest(generate_series(mind, maxd, INTERVAL 1 DAY)) AS DATE)
           AS cal_date
  FROM (SELECT stock_ticker, MIN(stock_date) AS mind,
               MAX(stock_date) AS maxd
        FROM sp GROUP BY stock_ticker))
SELECT cal.stock_ticker, cal.cal_date,
       sp.stock_close AS close_ffill,
       CAST(datediff('day', sp.stock_date, cal.cal_date) AS INT)
         AS days_stale
FROM cal ASOF LEFT JOIN sp
  ON cal.stock_ticker = sp.stock_ticker AND cal.cal_date >= sp.stock_date
""",
    doc="calendar resampling + forward fill: a gapless per-ticker daily "
        "calendar (min..max bar date), each day carrying the most "
        "recent close and its staleness in days — the gap-fill / "
        "as-of-alignment step before any calendar-window indicator. "
        "Pure composition: per-ticker min/max agg → date sequence "
        "explode → the one-shuffle union-window asof_join. No join "
        "against the calendar (that plan re-shuffles twice); vs "
        "DuckDB's native ASOF LEFT JOIN over a generate_series "
        "calendar.",
    tags=("joins", "asof", "resample", "window"),
)
def q_ffill_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = stock_prices(spark, sf_dir).select(
        "stock_ticker", "stock_date", "stock_close"
    )
    cal = (
        sp.groupBy("stock_ticker")
        .agg(F.min("stock_date").alias("d0"), F.max("stock_date").alias("d1"))
        .select(
            "stock_ticker",
            F.explode(F.sequence("d0", "d1")).alias("cal_date"),
        )
    )
    joined = asof_join(
        cal,
        sp,
        on="stock_ticker",
        left_time="cal_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
    )
    return joined.select(
        "stock_ticker",
        "cal_date",
        F.col("stock_close").alias("close_ffill"),
        F.datediff("cal_date", "stock_date").alias("days_stale"),
    )


@register(
    "join_interp_calendar",
    f"""
WITH {STOCK_PRICES_CTE.strip()},
sp AS (SELECT stock_ticker, stock_date, stock_close FROM stock_prices),
cal AS (
  SELECT stock_ticker,
         CAST(unnest(generate_series(mind, maxd, INTERVAL 1 DAY)) AS DATE)
           AS cal_date
  FROM (SELECT stock_ticker, MIN(stock_date) AS mind,
               MAX(stock_date) AS maxd
        FROM sp GROUP BY stock_ticker)),
prev AS (
  SELECT cal.stock_ticker, cal.cal_date,
         sp.stock_date AS prev_date, sp.stock_close AS prev_close
  FROM cal ASOF LEFT JOIN sp
    ON cal.stock_ticker = sp.stock_ticker AND cal.cal_date >= sp.stock_date),
nxt AS (
  SELECT cal.stock_ticker, cal.cal_date,
         sp.stock_date AS next_date, sp.stock_close AS next_close
  FROM cal ASOF LEFT JOIN sp
    ON cal.stock_ticker = sp.stock_ticker AND cal.cal_date <= sp.stock_date)
SELECT p.stock_ticker, p.cal_date, p.prev_date, n.next_date,
       CASE WHEN p.prev_date = p.cal_date THEN p.prev_close
            WHEN p.prev_close IS NULL OR n.next_close IS NULL THEN NULL
            ELSE p.prev_close
                 + (n.next_close - p.prev_close)
                   * (CAST(datediff('day', p.prev_date, p.cal_date) AS DOUBLE)
                      / CAST(datediff('day', p.prev_date, n.next_date)
                             AS DOUBLE))
       END AS close_interp
FROM prev p JOIN nxt n
  ON p.stock_ticker = n.stock_ticker AND p.cal_date = n.cal_date
""",
    doc="calendar resampling with LINEAR interpolation: gapless "
        "per-ticker daily spine where non-trading days get the "
        "straight-line value between the surrounding bars — the "
        "gap-fill used before calendar-window math that forward-fill "
        "would bias. Composition of the two as-of directions "
        "(backward prev bar, forward next bar) on the SAME spine — "
        "each a one-shuffle union-window plan — plus one equi-join to "
        "pair them. The interpolation weight is an integer-day ratio, "
        "so both engines run the identical IEEE sequence and the "
        "result hash-matches without rounding",
    tags=("joins", "asof", "resample", "interpolation"),
)
def q_interp_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = stock_prices(spark, sf_dir).select(
        "stock_ticker", "stock_date", "stock_close"
    )
    cal = (
        sp.groupBy("stock_ticker")
        .agg(F.min("stock_date").alias("d0"), F.max("stock_date").alias("d1"))
        .select(
            "stock_ticker",
            F.explode(F.sequence("d0", "d1")).alias("cal_date"),
        )
    )
    prev = asof_join(
        cal,
        sp,
        on="stock_ticker",
        left_time="cal_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
    ).select(
        "stock_ticker",
        "cal_date",
        F.col("stock_date").alias("prev_date"),
        F.col("stock_close").alias("prev_close"),
    )
    nxt = asof_join(
        cal,
        sp,
        on="stock_ticker",
        left_time="cal_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
        direction="forward",
    ).select(
        "stock_ticker",
        "cal_date",
        F.col("stock_date").alias("next_date"),
        F.col("stock_close").alias("next_close"),
    )
    both = prev.join(nxt, on=["stock_ticker", "cal_date"])
    frac = (
        F.datediff("cal_date", "prev_date").cast("double")
        / F.datediff("next_date", "prev_date").cast("double")
    )
    interp = (
        F.when(F.col("prev_date") == F.col("cal_date"), F.col("prev_close"))
        .when(
            F.col("prev_close").isNull() | F.col("next_close").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.col("prev_close")
            + (F.col("next_close") - F.col("prev_close")) * frac
        )
    )
    return both.select(
        "stock_ticker",
        "cal_date",
        "prev_date",
        "next_date",
        interp.alias("close_interp"),
    )


@register(
    "join_asof_nearest_price",
    f"""
WITH {STOCK_PRICES_CTE.strip()},
probes AS (
  SELECT DISTINCT {ticker_sql('l_suppkey')} AS stock_ticker,
         CAST(l_shipdate AS DATE) + 3 AS probe_date
  FROM lineitem),
prev AS (
  SELECT pr.stock_ticker, pr.probe_date,
         sp.stock_date AS prev_date, sp.stock_close AS prev_close
  FROM probes pr ASOF LEFT JOIN stock_prices sp
    ON pr.stock_ticker = sp.stock_ticker AND pr.probe_date >= sp.stock_date),
nxt AS (
  SELECT pr.stock_ticker, pr.probe_date,
         sp.stock_date AS next_date, sp.stock_close AS next_close
  FROM probes pr ASOF LEFT JOIN stock_prices sp
    ON pr.stock_ticker = sp.stock_ticker AND pr.probe_date <= sp.stock_date)
SELECT p.stock_ticker, p.probe_date,
       CASE
         WHEN p.prev_date IS NULL THEN n.next_date
         WHEN n.next_date IS NULL THEN p.prev_date
         WHEN datediff('day', p.prev_date, p.probe_date)
              <= datediff('day', p.probe_date, n.next_date)
           THEN p.prev_date ELSE n.next_date
       END AS px_date,
       CASE
         WHEN p.prev_date IS NULL THEN n.next_close
         WHEN n.next_date IS NULL THEN p.prev_close
         WHEN datediff('day', p.prev_date, p.probe_date)
              <= datediff('day', p.probe_date, n.next_date)
           THEN p.prev_close ELSE n.next_close
       END AS px_close
FROM prev p JOIN nxt n
  ON p.stock_ticker = n.stock_ticker AND p.probe_date = n.probe_date
""",
    doc="NEAREST-neighbor as-of join: the bar closest in time to each "
        "probe, prev on distance ties — pandas merge_asof "
        "direction='nearest', which neither engine has natively. "
        "Probes are DISTINCT-projected to (ticker, date) first — the "
        "lookup depends on nothing else, so the as-of passes run on "
        "the key domain (|tickers| x |dates|), not the fact table; "
        "facts broadcast-join the result back when they need it. "
        "Composition of the two as-of directions plus an integer-day "
        "distance compare, exact in both engines",
    tags=("joins", "asof", "nearest"),
)
def q_asof_nearest_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    probes = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            _ticker_expr("l_suppkey").alias("stock_ticker"),
            F.date_add(F.col("l_shipdate").cast("date"), 3).alias(
                "probe_date"
            ),
        )
        .distinct()
    )
    sp = stock_prices(spark, sf_dir)
    prev = asof_join(
        probes, sp, on="stock_ticker", left_time="probe_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
    ).select(
        "stock_ticker", "probe_date",
        F.col("stock_date").alias("prev_date"),
        F.col("stock_close").alias("prev_close"),
    )
    nxt = asof_join(
        probes, sp, on="stock_ticker", left_time="probe_date",
        right_time="stock_date",
        value_cols=["stock_date", "stock_close"],
        direction="forward",
    ).select(
        F.col("stock_ticker").alias("n_tk"),
        F.col("probe_date").alias("n_pd"),
        F.col("stock_date").alias("next_date"),
        F.col("stock_close").alias("next_close"),
    )
    both = prev.join(
        nxt,
        (F.col("stock_ticker") == F.col("n_tk"))
        & (F.col("probe_date") == F.col("n_pd")),
    )
    d_prev = F.datediff("probe_date", "prev_date")
    d_next = F.datediff("next_date", "probe_date")
    prev_wins = F.col("next_date").isNull() | (
        F.col("prev_date").isNotNull() & (d_prev <= d_next)
    )
    return both.select(
        "stock_ticker",
        "probe_date",
        F.when(prev_wins, F.col("prev_date"))
        .otherwise(F.col("next_date"))
        .alias("px_date"),
        F.when(prev_wins, F.col("prev_close"))
        .otherwise(F.col("next_close"))
        .alias("px_close"),
    )
