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


def test_corpus_release_end_to_end(spark, tmp_path):
    """The LLM-corpus release flow, end to end on real files: curated
    catalog query -> seeded-shuffle shard export -> atomic snapshot
    publish -> (bad release) -> rollback serves the previous version.

    Each stage is an already-verified unit; this pins the COMPOSITION —
    schemas line up, the export consumes the curation output, the
    snapshot layer versions the export manifest + shards together."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
    from utn_dataengineering_stockmarketpipeline_spark.sources import (
        snapshots as sn,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        write_training_shards,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "corpus_releases")

    # release 1: curated survivors joined back to their text
    kept = CATALOG["llm_curation_pipeline"].build(spark, sf).select("doc_id")
    docs = load_table(spark, sf, "documents").join(kept, "doc_id")
    n_curated = docs.count()
    assert 0 < n_curated < load_table(spark, sf, "documents").count()

    shards1 = str(tmp_path / "shards_v1")
    manifest1 = write_training_shards(
        docs, shards1, n_shards=4, shuffle_seed="release-1"
    )
    v1 = sn.publish_snapshot(manifest1, root)
    assert sn.read_snapshot(spark, root).agg({"n_docs": "sum"}).first()[0] == n_curated

    # release 2: a (deliberately bad) empty-gate release
    shards2 = str(tmp_path / "shards_v2")
    manifest2 = write_training_shards(
        docs.limit(3), shards2, n_shards=4, shuffle_seed="release-2"
    )
    v2 = sn.publish_snapshot(manifest2, root)
    assert sn.current_version(spark, root) == v2
    assert sn.read_snapshot(spark, root).agg({"n_docs": "sum"}).first()[0] == 3

    # rollback: the previous release is immediately current again,
    # and its shard files still reproduce the curated corpus exactly
    sn.rollback(spark, root, to_version=v1)
    assert sn.read_snapshot(spark, root).agg({"n_docs": "sum"}).first()[0] == n_curated
    back = spark.read.parquet(shards1)
    assert back.count() == n_curated
    assert back.select("doc_id").distinct().count() == n_curated
