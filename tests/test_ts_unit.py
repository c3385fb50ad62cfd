"""events.ts physical-unit compatibility (plans/queries_streaming.py).

The driver has shipped events.parquet with TIMESTAMP(NANOS) (rounds
1-4) and TIMESTAMP(MICROS) (round 5+). The streaming file source must
read BOTH: the micros path is exercised by the live testdata, so this
module pins the nanos path by rewriting the smoke table to ns and
asserting the drained stream equals the batch aggregation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory):
    """sf0.001 events re-encoded as TIMESTAMP(NANOS) in a tmp dir."""
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    i = t.schema.get_field_index("ts")
    t = t.set_column(i, "ts", t["ts"].cast(pa.timestamp("ns")))
    d = tmp_path_factory.mktemp("events_ns")
    # parquet 2.6 keeps nanos; older versions silently coerce to micros
    pq.write_table(t, d / "events.parquet", version="2.6",
                   coerce_timestamps=None)
    return str(d)


def test_ts_unit_probe(nanos_dir):
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_streaming import (
        _events_ts_unit,
    )

    assert _events_ts_unit(SF_SMOKE) == "us"
    assert _events_ts_unit(nanos_dir) == "ns"


def test_stream_drain_matches_batch_for_both_units(spark, nanos_dir):
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG

    def drained(sf_dir):
        df = CATALOG["stream_events_hourly"].build(spark, sf_dir)
        return sorted(
            (str(r["window_start"]), r["event_type"], r["n_events"],
             round(r["total_value"], 2))
            for r in df.collect()
        )

    us_rows = drained(SF_SMOKE)
    ns_rows = drained(nanos_dir)
    assert us_rows == ns_rows, "ns-encoded drain diverged from us-encoded"

    batch = sorted(
        (str(r["h"]), r["event_type"], r["n"], round(r["v"], 2))
        for r in spark.sql(
            f"""
            SELECT date_trunc('hour', ts) AS h, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            FROM parquet.`{SF_SMOKE}/events.parquet`
            GROUP BY 1, 2
            """
        ).collect()
    )
    assert us_rows == batch


def test_ts_unit_cache_invalidates_on_regeneration(tmp_path):
    """The unit cache keys on (path, mtime, size): regenerating
    events.parquet in place with the OTHER timestamp unit must re-probe
    instead of serving the stale unit (r7 ADVICE) — a stale 'ns' answer
    against a micros file shifts every streamed timestamp 1000x."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_streaming import (
        _events_ts_unit,
    )

    path = tmp_path / "events.parquet"

    def write(unit):
        t = pa.table({"ts": pa.array([1_700_000_000_000], pa.timestamp(unit))})
        pq.write_table(t, path, coerce_timestamps=None,
                       version="2.6", store_schema=True)

    write("us")
    assert _events_ts_unit(str(tmp_path)) == "us"
    # ensure a distinct mtime even on coarse-resolution filesystems
    time.sleep(0.01)
    write("ns")
    os.utime(path)
    assert _events_ts_unit(str(tmp_path)) == "ns"
