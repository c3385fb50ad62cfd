"""Risk / streak analytics over per-entity time series — the
stock-domain metric family (historical VaR, expected shortfall, Sharpe,
momentum streaks) the reference's data model exists to serve (its own
analytics stop at latest-price and a rolling mean; these are the
standard next queries on the same OHLCV fact).

Float discipline (the engine-wide rule): returns quantize to integer
parts-per-million at the source, every cross-row reduction is an exact
integer sum, and the handful of final double operations (divisions,
IEEE-correctly-rounded sqrt) happen in ONE pinned association on both
engines — so no parallel-float-accumulation ambiguity exists anywhere,
and the DuckDB oracles match to the bit, not "to a tolerance".

Quantile discipline: VaR is a DISCRETE order statistic (the k-th
smallest, k = max(1, ceil(p·n))), picked by a deterministic
(value, date) row_number — never an interpolated percentile, whose
``lower + (upper-lower)·f`` vs ``lower·(1-f) + upper·f`` association
differs across engines by final ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def returns_ppm(
    prices: DataFrame,
    entity_col: str = "stock_ticker",
    date_col: str = "stock_date",
    value_col: str = "stock_close",
) -> DataFrame:
    """Per-entity daily simple returns quantized to integer ppm:
    ``round((v / lag(v) - 1) * 1e6)`` as BIGINT — one lag window, the
    first bar per entity drops. Quantization is what makes every
    downstream reduction exact; ±1 ppm ≈ 1e-4 % is far inside any use
    of a daily return."""
    w = Window.partitionBy(entity_col).orderBy(date_col)
    return prices.select(
        entity_col,
        date_col,
        F.round(
            (F.col(value_col) / F.lag(value_col).over(w) - 1) * F.lit(1e6)
        )
        .cast("bigint")
        .alias("ret_ppm"),
    ).filter(F.col("ret_ppm").isNotNull())


def var_cvar(
    rets: DataFrame,
    p: float = 0.05,
    entity_col: str = "stock_ticker",
    date_col: str = "stock_date",
) -> DataFrame:
    """Historical VaR + expected shortfall per entity at tail level
    ``p`` → ``(entity, n_days, var95_ppm, cvar95_ppm)``.

    VaR = the k-th smallest return (k = max(1, ceil(p·n)), discrete —
    see module docstring); CVaR = exact BIGINT sum of the k tail
    returns / k, one final double division. Plan: one count aggregate
    broadcast back, one rank window over the same entity partitioning,
    map-side-combined tail aggregation — partitions by entity
    throughout, no global sort."""
    stats = (
        rets.groupBy(entity_col)
        .agg(F.count(F.lit(1)).alias("n_days"))
        .withColumn(
            "k",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.col("n_days") * F.lit(p)),
            ),
        )
    )
    wr = Window.partitionBy(entity_col).orderBy("ret_ppm", date_col)
    return (
        rets.withColumn("rn", F.row_number().over(wr))
        .join(F.broadcast(stats), entity_col)
        .filter(F.col("rn") <= F.col("k"))
        .groupBy(entity_col, "n_days")
        .agg(
            F.max(
                F.when(F.col("rn") == F.col("k"), F.col("ret_ppm"))
            ).alias("var95_ppm"),
            (F.sum("ret_ppm").cast("double") / F.count(F.lit(1))).alias(
                "cvar95_ppm"
            ),
        )
        .select(entity_col, "n_days", "var95_ppm", "cvar95_ppm")
    )


def sharpe(
    rets: DataFrame,
    periods_per_year: float = 252.0,
    entity_col: str = "stock_ticker",
) -> DataFrame:
    """Annualized Sharpe per entity →
    ``(entity, n_days, mean_ppm, vol_ppm, sharpe_ann)`` (6dp).

    S = Σ ret and Q = Σ ret² are exact integers (< 2^53 at any
    plausible ppm scale, so their doubles are exact); mean, sample
    variance, and Sharpe derive from (S, Q, n) in one pinned
    association. Entities with fewer than 2 returns or zero variance
    drop (their Sharpe is undefined)."""
    agg = rets.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("ret_ppm").cast("double").alias("s"),
        F.sum(F.col("ret_ppm") * F.col("ret_ppm")).cast("double").alias("q"),
    )
    base = (
        agg.filter(F.col("n_days") >= 2)
        .select(
            entity_col,
            "n_days",
            (F.col("s") / F.col("n_days")).alias("mean_raw"),
            (
                (F.col("q") - (F.col("s") * F.col("s")) / F.col("n_days"))
                / (F.col("n_days") - 1)
            ).alias("var_raw"),
        )
        .filter(F.col("var_raw") > 0)
    )
    return base.select(
        entity_col,
        "n_days",
        F.round("mean_raw", 6).alias("mean_ppm"),
        F.round(F.sqrt("var_raw"), 6).alias("vol_ppm"),
        F.round(
            (F.col("mean_raw") / F.sqrt("var_raw"))
            * F.sqrt(F.lit(periods_per_year)),
            6,
        ).alias("sharpe_ann"),
    )


def longest_positive_streak(
    rets: DataFrame,
    entity_col: str = "stock_ticker",
    date_col: str = "stock_date",
) -> DataFrame:
    """Longest run of consecutive positive returns per entity →
    ``(entity, streak_len, start_date, end_date)`` — the
    gaps-and-islands idiom: island key = rn_all − rn_pos, two windows
    over the SAME partitioning (one shuffle), integer end-to-end;
    winner picked deterministically by (len DESC, start ASC).
    Entities with no positive return have no longest streak and drop."""
    w = Window.partitionBy(entity_col).orderBy(date_col)
    rn = rets.withColumn("rn_all", F.row_number().over(w))
    pos = rn.filter(F.col("ret_ppm") > 0).withColumn(
        "rn_pos", F.row_number().over(w)
    )
    runs = pos.groupBy(
        entity_col, (F.col("rn_all") - F.col("rn_pos")).alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min(date_col).alias("start_date"),
        F.max(date_col).alias("end_date"),
    )
    wp = Window.partitionBy(entity_col).orderBy(
        F.col("streak_len").desc(), "start_date"
    )
    return (
        runs.withColumn("pick", F.row_number().over(wp))
        .filter(F.col("pick") == 1)
        .select(entity_col, "streak_len", "start_date", "end_date")
    )


def var_backtest(
    prices: DataFrame,
    split_date: str,
    p: float = 0.05,
    entity_col: str = "stock_ticker",
    date_col: str = "stock_date",
    value_col: str = "stock_close",
) -> DataFrame:
    """Out-of-sample VaR backtest — the Kupiec unconditional-coverage
    loop that closes the risk family the way the confusion-matrix eval
    closed language-ID: fit the p-tail VaR on returns dated
    ``<= split_date``, count violations (return BELOW the fitted VaR)
    strictly after, and emit the exceedance numbers the Kupiec POF
    test consumes → ``(entity, n_est, var_ppm, n_test, n_viol,
    viol_ppm, expected_ppm)``. A model whose ``viol_ppm`` sits far
    from ``expected_ppm = p·1e6`` failed coverage; the LR statistic
    itself is a driver-side scalar over these two integers and stays
    out of the relation (ln of count ratios would re-open the
    cross-engine float door the ppm discipline closed).

    Returns are computed over the FULL series first and split by date
    after, so the first test-window return uses the last estimation
    close as its lag base (no artificial gap at the boundary).
    Integer end-to-end: ppm returns, integer violation counts, and
    ``viol_ppm`` by integral division. Plan: the var_cvar fit on the
    estimation slice (count agg + rank window, entity-partitioned),
    fitted VaR broadcast back, one map-side-combined violation count
    over the test slice. Entities with no estimation returns or no
    test returns drop (a backtest needs both sides).
    """
    rets = returns_ppm(prices, entity_col, date_col, value_col)
    split = F.lit(split_date).cast("date")
    fitted = var_cvar(
        rets.filter(F.col(date_col) <= split), p, entity_col, date_col
    ).select(
        entity_col,
        F.col("n_days").alias("n_est"),
        F.col("var95_ppm").alias("var_ppm"),
    )
    return (
        rets.filter(F.col(date_col) > split)
        .join(F.broadcast(fitted), entity_col)
        .groupBy(entity_col, "n_est", "var_ppm")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("ret_ppm") < F.col("var_ppm"), 1).otherwise(0)
            ).cast("bigint").alias("n_viol"),
        )
        .select(
            entity_col,
            "n_est",
            "var_ppm",
            "n_test",
            "n_viol",
            F.expr("(n_viol * 1000000) div n_test").alias("viol_ppm"),
            F.lit(int(round(p * 1e6))).cast("bigint").alias("expected_ppm"),
        )
    )
