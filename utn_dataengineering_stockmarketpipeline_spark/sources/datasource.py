"""Custom PySpark DataSource for the EODHD-shaped REST API (SURVEY.md
§2 S1/S2 scale path: "at scale a PySpark DataSource (Spark 4 Python
data source API)").

``spark.read.format("stock_api")`` with one InputPartition per ticker:
the scheduler spreads fetches across executors, so a 10k-ticker
backfill runs at cluster width — versus the reference's sequential
driver loop (``main.py:65-75``). Each partition fetches its ticker's
daily bars and yields typed rows; downstream is the normal transform
layer.

Fetch modes (options):
- ``fixture_dir``: read ``{dir}/{ticker}.json`` — hermetic tests, no
  network (the pluggable-fetcher design of sources/rest.py).
- ``base_url`` + ``api_token``: real HTTP GET
  ``eod/{ticker}.US?from=...&fmt=json`` (API_manager.py:51-59,125).

Options are plain strings (the DataSource contract), so everything the
executor needs travels in them — never a pickled closure.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_FIELDS = (
    ("ticker", "string"),
    ("date", "string"),
    ("open", "double"),
    ("high", "double"),
    ("low", "double"),
    ("close", "double"),
    ("adjusted_close", "double"),
    ("volume", "bigint"),
    ("warning", "string"),
)
_SCHEMA = ", ".join(f"{n} {t}" for n, t in _FIELDS)
_PAYLOAD_COLS = [n for n, _ in _FIELDS[1:]]


class _TickerPartition(InputPartition):
    def __init__(self, ticker: str, from_date: str):
        self.ticker = ticker
        self.from_date = from_date


class StockApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.tickers = [
            t.strip() for t in options.get("tickers", "").split(",") if t.strip()
        ]
        if not self.tickers:
            raise ValueError("stock_api requires option 'tickers' (csv)")
        self.from_date = options.get("from_date", "1990-01-01")

    def partitions(self) -> Sequence[InputPartition]:
        return [_TickerPartition(t, self.from_date) for t in self.tickers]

    def read(self, partition: _TickerPartition) -> Iterator[tuple]:
        rows = self._fetch(partition.ticker, partition.from_date)
        for r in rows:
            yield (partition.ticker, *[r.get(c) for c in _PAYLOAD_COLS])

    def _fetch(self, ticker: str, from_date: str) -> list[dict]:
        fixture_dir = self.options.get("fixture_dir")
        if fixture_dir:
            with open(f"{fixture_dir}/{ticker}.json") as fh:
                rows = json.load(fh)
            return [r for r in rows if r.get("date", "") >= from_date]
        base = self.options.get("base_url")
        token = self.options.get("api_token", "")
        if not base:
            raise ValueError("stock_api needs 'fixture_dir' or 'base_url'")
        import urllib.parse
        import urllib.request

        params = urllib.parse.urlencode(
            {"from": from_date, "api_token": token, "fmt": "json"}
        )
        url = f"{base}/eod/{ticker}.US?{params}"
        with urllib.request.urlopen(url, timeout=60) as resp:  # noqa: S310
            return json.loads(resp.read())


class StockApiDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(StockApiDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "stock_api"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> StockApiReader:
        return StockApiReader(self.options)
