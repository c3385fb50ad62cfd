"""Reference-shaped tables derived from the driver's star schema.

The reference warehouse holds ``stock_prices`` (fact) and ``markets``
(dim) — DDL at ``DB_manager.py:43-86``. The driver's testdata is a
TPC-H-ish star schema, so we derive the reference schema from ``orders``
deterministically (FIXTURES.md §B): ticker from ``o_custkey % 5``, daily
OHLCV from order-independent aggregates (MIN/MAX/COUNT only — never
SUM/AVG of doubles, whose result depends on reduction order and would
break cross-engine value-hash parity).

Each table exists twice, by design:
- a DataFrame builder (the engine path — what runs at 100 TB), and
- a DuckDB SQL CTE (the oracle path).
``tests/test_catalog_oracle.py`` + the driver's t2 gate verify the two
stay value-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import date_parts, surrogate_key
from ..sources.parquet import load_table

TICKERS = ("AAPL", "MSFT", "GOOG", "AMZN", "TSLA")
NASDAQ = ("AAPL", "MSFT", "GOOG")

# The reference's warehouse tables are MATERIALIZED (Postgres); deriving
# them per-query would re-run the orders scan+agg for every entry point.
# One persisted copy per (application, sf_dir) mirrors the warehouse
# semantics — and is exactly what a deployment does (stored fact table).
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _materialized(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist()
        _CACHE[key] = df
    return df


def evict_materialized(spark: SparkSession, sf_dir: str | None = None) -> int:
    """Unpersist and drop this session's materialized reference tables —
    all of them, or only one ``sf_dir``'s. Returns the number evicted.

    A long-lived session sweeping many scale factors (bench loops,
    notebooks) would otherwise accumulate persisted tables for every
    sf_dir it ever touched; call this when done with a scale factor.
    """
    app = spark.sparkContext.applicationId
    victims = [
        k for k in _CACHE
        if k[0] == app and (sf_dir is None or k[1] == sf_dir)
    ]
    for k in victims:
        _CACHE.pop(k).unpersist()
    return len(victims)


def _ticker_expr(custkey: str = "o_custkey"):
    """o_custkey % 5 → fixed 5-ticker alphabet (pure arithmetic, so the
    DuckDB oracle derives the identical mapping)."""
    m = (F.col(custkey) % 5).cast("int")
    expr = F.lit(TICKERS[-1])
    for i in range(len(TICKERS) - 2, -1, -1):
        expr = F.when(m == i, TICKERS[i]).otherwise(expr)
    return expr


def stock_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived ``datawarehouse.stock_prices`` (DB_manager.py:66-78),
    materialized once per session+scale (see _materialized)."""
    return _materialized(
        spark, sf_dir, "stock_prices", lambda: _build_stock_prices(spark, sf_dir)
    )


def _build_stock_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderdate").cast("date").alias("stock_date"),
        _ticker_expr().alias("stock_ticker"),
        F.col("o_totalprice").alias("px"),
    )
    agg = base.groupBy("stock_date", "stock_ticker").agg(
        F.min("px").alias("stock_open"),
        F.max("px").alias("stock_high"),
        (F.min("px") * F.lit(0.95)).alias("stock_low"),
        ((F.min("px") + F.max("px")) / F.lit(2)).alias("stock_close"),
        F.count(F.lit(1)).alias("stock_volume"),
    )
    y, m, d = date_parts("stock_date")
    return agg.select(
        "stock_date",
        "stock_open",
        "stock_high",
        "stock_low",
        "stock_close",
        "stock_volume",
        "stock_ticker",
        y,
        m,
        d,
        surrogate_key("stock_date", "stock_ticker").alias("stock_key"),
    )


def markets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived ``datawarehouse.markets`` (DB_manager.py:79-86),
    materialized once per session+scale."""
    return _materialized(
        spark, sf_dir, "markets", lambda: _build_markets(spark, sf_dir)
    )


def _build_markets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    t = F.col("market_stockid")
    return (
        orders.select(_ticker_expr().alias("market_stockid"))
        .distinct()
        .select(
            t,
            F.concat(F.lit("Company "), t).alias("market_companyname"),
            F.lit("USA").alias("market_country"),
            F.when(t.isin(*NASDAQ), "NASDAQ")
            .otherwise("NYSE")
            .alias("market_exchange"),
            F.lit("USD").alias("market_currency"),
            F.concat(F.lit("US000"), t).alias("market_stockisin"),
        )
    )


# --- DuckDB oracle CTEs (dialect: DuckDB; semantics mirrored above) --------

def ticker_sql(key: str = "o_custkey") -> str:
    """DuckDB mirror of :func:`_ticker_expr` for any integer key col."""
    return (
        f"CASE CAST({key} % 5 AS INT) "
        "WHEN 0 THEN 'AAPL' WHEN 1 THEN 'MSFT' WHEN 2 THEN 'GOOG' "
        "WHEN 3 THEN 'AMZN' ELSE 'TSLA' END"
    )


TICKER_SQL = ticker_sql("o_custkey")

STOCK_PRICES_CTE = f"""
stock_prices AS (
  SELECT
    stock_date,
    MIN(px) AS stock_open,
    MAX(px) AS stock_high,
    MIN(px) * 0.95 AS stock_low,
    (MIN(px) + MAX(px)) / 2 AS stock_close,
    COUNT(*) AS stock_volume,
    stock_ticker,
    CAST(EXTRACT(YEAR FROM stock_date) AS INT) AS stock_year,
    CAST(EXTRACT(MONTH FROM stock_date) AS INT) AS stock_month,
    CAST(EXTRACT(DAY FROM stock_date) AS INT) AS stock_day,
    CAST(stock_date AS VARCHAR) || '/' || stock_ticker AS stock_key
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS stock_date,
           {TICKER_SQL} AS stock_ticker,
           o_totalprice AS px
    FROM orders
  )
  GROUP BY stock_date, stock_ticker
)"""

MARKETS_CTE = f"""
markets AS (
  SELECT ticker AS market_stockid,
         'Company ' || ticker AS market_companyname,
         'USA' AS market_country,
         CASE WHEN ticker IN ('AAPL','MSFT','GOOG') THEN 'NASDAQ'
              ELSE 'NYSE' END AS market_exchange,
         'USD' AS market_currency,
         'US000' || ticker AS market_stockisin
  FROM (SELECT DISTINCT {TICKER_SQL} AS ticker FROM orders)
)"""


def with_reference_ctes(body_sql: str) -> str:
    """Wrap an oracle query body with both reference-table CTEs."""
    return f"WITH {STOCK_PRICES_CTE.strip()}, {MARKETS_CTE.strip()}\n{body_sql}"
