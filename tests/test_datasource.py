"""Spark 4 Python DataSource tests (S1/S2 scale path) — hermetic via
JSON fixtures, exercising the real DataSource machinery end to end
(registration, per-ticker partitions, typed rows, incremental bound)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators.transforms import (
    normalize_stock_payload,
)
from utn_dataengineering_stockmarketpipeline_spark.sources.datasource import (
    StockApiDataSource,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("api_fixtures")
    d0 = dt.date(2024, 1, 1)
    for ticker, n in (("AAPL", 8), ("MSFT", 5)):
        rows = [
            {
                "date": (d0 + dt.timedelta(days=i)).isoformat(),
                "open": 10.0 + i,
                "high": 11.0 + i,
                "low": 9.0 + i,
                "close": 10.5 + i,
                "adjusted_close": 10.4 + i,
                "volume": 1000 + i,
            }
            for i in range(n)
        ]
        (base / f"{ticker}.json").write_text(json.dumps(rows))
    return str(base)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(StockApiDataSource)
    return spark


def test_datasource_reads_all_tickers(registered, fixture_dir):
    df = (
        registered.read.format("stock_api")
        .option("tickers", "AAPL,MSFT")
        .option("fixture_dir", fixture_dir)
        .load()
    )
    counts = {
        r["ticker"]: r["n"]
        for r in df.groupBy("ticker").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"AAPL": 8, "MSFT": 5}
    # one partition per ticker — the parallel-fetch contract
    assert df.rdd.getNumPartitions() == 2


def test_datasource_incremental_from_date(registered, fixture_dir):
    df = (
        registered.read.format("stock_api")
        .option("tickers", "AAPL")
        .option("fixture_dir", fixture_dir)
        .option("from_date", "2024-01-06")
        .load()
    )
    dates = sorted(r["date"] for r in df.collect())
    assert dates == ["2024-01-06", "2024-01-07", "2024-01-08"]


def test_datasource_feeds_transform_layer(registered, fixture_dir):
    raw = (
        registered.read.format("stock_api")
        .option("tickers", "MSFT")
        .option("fixture_dir", fixture_dir)
        .load()
    )
    norm = normalize_stock_payload(raw.drop("ticker"), "MSFT")
    rows = norm.orderBy("stock_date").collect()
    assert len(rows) == 5
    assert rows[0]["stock_key"] == "2024-01-01/MSFT"
    assert rows[0]["stock_close"] == 10.5
