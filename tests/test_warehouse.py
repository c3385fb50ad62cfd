"""Catalog-warehouse surface tests (SURVEY.md §2.3): full DB_manager
lifecycle — create, stage load, SCD-0 commit, truncate, drop — plus the
reboot flow, on Spark managed tables."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import warehouse as wh
from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
    markets,
    stock_prices,
)

from conftest import SF_SMOKE


@pytest.fixture
def dbs(spark):
    tag = uuid.uuid4().hex[:8]
    stage, dw = f"stage_{tag}", f"dw_{tag}"
    yield stage, dw
    wh.delete_schemas(spark, stage, dw)


def test_full_warehouse_lifecycle(spark, dbs):
    stage, dw = dbs
    wh.create_tables(spark, stage, dw)
    assert spark.catalog.tableExists(f"{stage}.stock_prices")
    assert spark.catalog.tableExists(f"{dw}.markets")
    # idempotent DDL (IF NOT EXISTS)
    wh.create_tables(spark, stage, dw)

    sp = stock_prices(spark, SF_SMOKE)
    mk = markets(spark, SF_SMOKE)
    n_sp = sp.count()

    assert wh.save_to_stage(spark, "stock_prices", sp, stage) == n_sp
    assert wh.save_to_stage(spark, "markets", mk, stage) == 5

    assert wh.commit_to_warehouse(spark, "stock_prices", stage, dw) == n_sp
    assert wh.commit_to_warehouse(spark, "markets", stage, dw) == 5

    # SCD-0: recommitting the same stage adds nothing
    assert wh.commit_to_warehouse(spark, "stock_prices", stage, dw) == 0
    fact = spark.table(f"{dw}.stock_prices")
    assert fact.count() == n_sp
    assert fact.select("stock_key").distinct().count() == n_sp

    # stage truncate-and-reload is an overwrite, not an append
    assert wh.save_to_stage(spark, "stock_prices", sp, stage) == n_sp

    # D4: the generic SQL surface answers over the warehouse
    row = wh.make_query(
        spark,
        f"SELECT COUNT(*) AS n FROM {dw}.stock_prices "
        f"WHERE stock_ticker = 'AAPL'",
    ).first()
    assert row["n"] == sp.filter(F.col("stock_ticker") == "AAPL").count()

    wh.truncate_table(spark, stage, "stock_prices")
    assert spark.table(f"{stage}.stock_prices").count() == 0


def test_reboot_drops_everything(spark, dbs):
    stage, dw = dbs
    wh.create_tables(spark, stage, dw)
    wh.save_to_stage(spark, "markets", markets(spark, SF_SMOKE), stage)
    wh.delete_schemas(spark, stage, dw)
    assert not spark.catalog.databaseExists(stage)
    assert not spark.catalog.databaseExists(dw)
    # delete is idempotent (IF EXISTS), like reboot.py re-runs
    wh.delete_schemas(spark, stage, dw)
