"""REST ingestion source (SURVEY.md §2 S1-S3, E1).

The reference fetches EODHD endpoints with blocking ``requests`` calls in
a single process (``API_manager.py:51-65,119-140``). Here the fetch is a
pluggable callable so tests inject local JSON fixtures (no network), and
production can fan out across executors.

Scale design: one HTTP endpoint is inherently driver-side, but a ticker
*universe* is not — ``fetch_many`` distributes tickers to executors with
``mapInPandas`` so a 10k-ticker backfill runs at cluster width rather
than sequentially like the reference (``main.py:65-75``). Each executor
task fetches its partition's tickers and yields typed rows; the result is
a normal DataFrame feeding the transform layer.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import MARKET_RAW, STOCK_RAW

# fetcher(kind, entity, from_date) -> list of JSON row dicts.
Fetcher = Callable[[str, str, str], list[dict[str, Any]]]

# Error sentinels the API returns in-body (API_manager.py:61-65).
_API_ERRORS = ("Exchange Not Found.", "Ticker Not Found.")


class ApiError(RuntimeError):
    """Raised when the API answers with an in-body error sentinel (E1)."""


def _check_payload(payload: Any) -> list[dict[str, Any]]:
    if isinstance(payload, str) and payload in _API_ERRORS:
        raise ApiError(payload)
    if payload is None:
        return []
    return list(payload)


def http_fetcher(base_url: str, api_token: str) -> Fetcher:
    """Production fetcher hitting an EODHD-shaped REST API.

    Mirrors API_manager.py:51-59 (eod/{t}) and :131-140
    (exchange-symbol-list/{m}); the token is never logged (the reference
    redacts it too, API_manager.py:57).
    """

    def fetch(kind: str, entity: str, from_date: str) -> list[dict[str, Any]]:
        import urllib.parse
        import urllib.request

        if kind == "stock":
            path, params = f"eod/{entity}.US", {"from": from_date}
        elif kind == "market":
            path, params = f"exchange-symbol-list/{entity}", {"type": "common_stock"}
        else:
            raise ValueError(f"unknown kind: {kind}")
        params.update({"api_token": api_token, "fmt": "json"})
        url = f"{base_url}/{path}?{urllib.parse.urlencode(params)}"
        with urllib.request.urlopen(url, timeout=60) as resp:  # noqa: S310
            return json.loads(resp.read())

    return fetch


def json_rows_to_df(
    spark: SparkSession, rows: Iterable[dict[str, Any]], schema: T.StructType
) -> DataFrame:
    """S3: materialize a JSON payload as a typed DataFrame.

    Unlike the reference's ``pd.DataFrame.from_dict`` inference
    (API_manager.py:147), the schema is explicit; fields absent from the
    payload surface as nulls (the adjusted_close/warning drift case).
    """
    names = [f.name for f in schema.fields]
    prepared = [tuple(r.get(n) for n in names) for r in rows]
    return spark.createDataFrame(prepared, schema)


def fetch_stock(
    spark: SparkSession, fetcher: Fetcher, ticker: str, from_date: str
) -> DataFrame:
    """S1: incremental EOD prices for one ticker (raw payload shape).

    Payload validation (E1 sentinels, null→empty) happens HERE, not in
    the fetcher, so every fetcher implementation gets it.
    """
    rows = _check_payload(fetcher("stock", ticker, from_date))
    return json_rows_to_df(spark, rows, STOCK_RAW)


def fetch_market(spark: SparkSession, fetcher: Fetcher, exchange: str) -> DataFrame:
    """S2: full symbol-list snapshot for one exchange (raw payload shape)."""
    rows = _check_payload(fetcher("market", exchange, "1990-01-01"))
    return json_rows_to_df(spark, rows, MARKET_RAW)


def fetch_many(
    spark: SparkSession,
    fetcher: Fetcher,
    tickers_with_from: list[tuple[str, str]],
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed fan-out: fetch many tickers across executors.

    The reference loops tickers sequentially on one machine
    (main.py:65-75). Here the (ticker, from_date) work-list becomes a
    DataFrame repartitioned to cluster width; each task fetches its
    tickers and yields raw rows tagged with the ticker. The fetcher must
    be picklable (http_fetcher's closure is).
    """
    out_schema = T.StructType(
        [T.StructField("ticker", T.StringType()), *STOCK_RAW.fields]
    )
    work = spark.createDataFrame(tickers_with_from, "ticker string, from_date string")
    n = parallelism or min(len(tickers_with_from), 64)
    names = [f.name for f in STOCK_RAW.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for ticker, from_date in zip(pdf["ticker"], pdf["from_date"]):
                rows = _check_payload(fetcher("stock", ticker, from_date))
                frame = pd.DataFrame(
                    [[r.get(c) for c in names] for r in rows], columns=names
                )
                frame.insert(0, "ticker", ticker)
                frames.append(frame)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return work.repartition(n, "ticker").mapInPandas(run, schema=out_schema)
