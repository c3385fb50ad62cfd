"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(``utn_dataengineering_stockmarketpipeline_spark.plans.catalog``): every
implemented operator from SURVEY.md §2 (plus the LLM-pipeline extension
operators) registers there once with its Spark builder and its DuckDB
oracle; this module just re-exposes them in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's ``get_last_price`` (DB_manager.py:181-199)
    over sf0.001 — parquet scan → global-max-date scalar subquery →
    ticker filter → broadcast left join to the dimension → projection.

    AMZN is the ticker trading on the globally-latest date at sf0.001
    (the reference's global-max quirk returns 0 rows otherwise —
    SURVEY.md §2.7 W1).
    """
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_reference import (
        get_last_price,
    )

    return get_last_price(spark, SMOKE_SF_DIR, "AMZN")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return {name: q.build for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops omitted
    (driver records rows-only checks for those)."""
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
