"""End-to-end pipeline orchestration — the reference's ``main.py`` flow
(``main.py:57-100``) as one composable function.

Reference run: for each exchange, full symbol-list snapshot → warehouse
dimension; for each ticker, incremental EOD pull from the saved state →
bronze parquet → stage → SCD-0 warehouse commit; then the
``get_last_price`` query. Spark-native differences:

- the incremental bound derives from the warehouse itself
  (sources/state.py) — no ``state.json``;
- the bronze lake partitions by year/month (not day/ticker, §4.1);
- stage → warehouse is one left-anti append, not a truncate-and-INSERT
  loop over a WAN.

Everything is injected (fetcher, paths, databases) so the same function
runs in tests against local JSON fixtures and in production against the
real API — the reference hard-codes all of it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators import warehouse as wh
from .operators.transforms import normalize_market_payload, normalize_stock_payload
from .sources import lake
from .sources.rest import Fetcher, fetch_market, fetch_stock
from .sources.state import SENTINEL_DATE, next_from_date


@dataclass
class PipelineReport:
    """Row counts per phase (the reference prints these; we return them)."""

    fetched: dict[str, int] = field(default_factory=dict)
    staged: dict[str, int] = field(default_factory=dict)
    committed: dict[str, int] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    fetcher: Fetcher,
    tickers: list[str],
    exchanges: list[str],
    lake_dir: str,
    stage: str = wh.STAGE,
    warehouse: str = wh.WAREHOUSE,
) -> PipelineReport:
    """One full load cycle: dims (full refresh) + facts (incremental).

    Idempotent end to end: re-running with the same upstream data
    commits zero new rows (SCD-0 absorbs every replay).
    """
    report = PipelineReport()
    wh.create_tables(spark, stage, warehouse)

    # --- dimension: full snapshot per exchange (T4, main.py:22-23) ---
    markets_batches = [
        normalize_market_payload(fetch_market(spark, fetcher, ex))
        for ex in exchanges
    ]
    dim = markets_batches[0]
    for extra in markets_batches[1:]:
        dim = dim.unionByName(extra)
    report.fetched["markets"] = dim.count()
    report.staged["markets"] = wh.save_to_stage(spark, "markets", dim, stage)
    report.committed["markets"] = wh.commit_to_warehouse(
        spark, "markets", stage, warehouse
    )

    # --- fact: incremental per ticker (T1, main.py:14-16) ---
    fact_table = spark.table(f"`{warehouse}`.`stock_prices`")
    batches: list[DataFrame] = []
    for ticker in tickers:
        frm = next_from_date(fact_table, ticker)
        raw = fetch_stock(spark, fetcher, ticker, frm)
        batches.append(normalize_stock_payload(raw, ticker))
    incoming = batches[0]
    for extra in batches[1:]:
        incoming = incoming.unionByName(extra)
    incoming = incoming.persist()
    try:
        report.fetched["stock_prices"] = incoming.count()
        if report.fetched["stock_prices"]:
            lake.write_stocks(incoming, lake_dir)  # bronze first (K1)
        report.staged["stock_prices"] = wh.save_to_stage(
            spark, "stock_prices", incoming, stage
        )
        report.committed["stock_prices"] = wh.commit_to_warehouse(
            spark, "stock_prices", stage, warehouse
        )
    finally:
        incoming.unpersist()
    return report


def get_last_price(
    spark: SparkSession, ticker: str, warehouse: str = wh.WAREHOUSE
) -> DataFrame:
    """The reference's analytical query over the live warehouse
    (``DB_manager.py:181-199``), global-max-date quirk included."""
    from pyspark.sql import functions as F

    from .functions.scalar import fmt_ddmmyyyy

    fact = spark.table(f"`{warehouse}`.`stock_prices`")
    dim = spark.table(f"`{warehouse}`.`markets`")
    latest = fact.select(F.max("stock_date").alias("__d"))
    return (
        fact.join(F.broadcast(latest), fact.stock_date == F.col("__d"))
        .filter(F.col("stock_ticker") == ticker)
        .join(
            F.broadcast(dim),
            fact.stock_ticker == dim.market_stockid,
            "left",
        )
        .select(
            fmt_ddmmyyyy("stock_date").alias("stock_date_fmt"),
            "stock_ticker",
            "market_companyname",
            "stock_close",
            "market_exchange",
            "market_stockisin",
        )
    )
