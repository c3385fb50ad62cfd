"""Full-pipeline E2E (the reference's main.py flow): two load cycles
with growing upstream data, idempotency, and the live get_last_price."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from utn_dataengineering_stockmarketpipeline_spark import pipeline
from utn_dataengineering_stockmarketpipeline_spark.operators import warehouse as wh


def make_fetcher(up_to: str):
    """Fixture API serving a calendar that 'grows' as up_to advances."""
    d0 = dt.date(2024, 1, 1)

    def fetch(kind, entity, from_date):
        if kind == "market":
            return [
                {"Code": t, "Name": f"Co {t}", "Country": "US",
                 "Exchange": entity, "Currency": "USD",
                 "Type": "Common Stock", "Isin": f"ISIN{t}"}
                for t in ("AAA", "BBB")
            ]
        out = []
        for i in range(60):
            d = (d0 + dt.timedelta(days=i)).isoformat()
            if from_date <= d <= up_to:
                out.append(
                    {"date": d, "open": 1.0 + i, "high": 2.0 + i,
                     "low": 0.5 + i, "close": 1.5 + i,
                     "adjusted_close": 1.4 + i, "volume": 100 + i}
                )
        return out

    return fetch


@pytest.fixture
def dbs(spark):
    tag = uuid.uuid4().hex[:8]
    stage, dw = f"p_stage_{tag}", f"p_dw_{tag}"
    yield stage, dw
    wh.delete_schemas(spark, stage, dw)


def test_two_cycle_incremental_pipeline(spark, dbs, tmp_path):
    stage, dw = dbs
    lake_dir = str(tmp_path / "bronze")
    tickers, exchanges = ["AAA", "BBB"], ["NYSE"]

    # cycle 1: first 10 days exist upstream
    r1 = pipeline.run_pipeline(
        spark, make_fetcher("2024-01-10"), tickers, exchanges, lake_dir,
        stage, dw,
    )
    assert r1.fetched["stock_prices"] == 20  # 10 days x 2 tickers
    assert r1.committed["stock_prices"] == 20
    assert r1.committed["markets"] == 2

    # cycle 2: upstream grew by 5 days — only the delta is fetched
    r2 = pipeline.run_pipeline(
        spark, make_fetcher("2024-01-15"), tickers, exchanges, lake_dir,
        stage, dw,
    )
    assert r2.fetched["stock_prices"] == 10  # 5 new days x 2
    assert r2.committed["stock_prices"] == 10
    assert r2.committed["markets"] == 0  # dim snapshot unchanged

    # cycle 3: nothing new upstream — fully idempotent
    r3 = pipeline.run_pipeline(
        spark, make_fetcher("2024-01-15"), tickers, exchanges, lake_dir,
        stage, dw,
    )
    assert r3.fetched["stock_prices"] == 0
    assert r3.committed["stock_prices"] == 0

    fact = spark.table(f"{dw}.stock_prices")
    assert fact.count() == 30
    assert fact.select("stock_key").distinct().count() == 30

    # the flagship query over the live warehouse
    rows = pipeline.get_last_price(spark, "AAA", dw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["stock_date_fmt"] == "15-01-2024"
    assert r["market_companyname"] == "Co AAA"
    assert r["market_exchange"] == "NYSE"
