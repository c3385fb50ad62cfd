"""Sketch-aggregate accuracy bounds vs exact answers (the correctness
contract for approximate operators with no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import load_table

from conftest import SF_SMOKE


def test_approx_sketches_within_error_bounds(spark):
    got = {
        r["event_type"]: r
        for r in CATALOG["ana_approx_sketches"].build(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        # HLL++ at rsd=0.02: generous 6% gate guards broken merges
        assert abs(g["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"])
        spread = abs(e["p95"] - e["p50"]) + 1e-9
        assert abs(g["p50"] - e["p50"]) <= 0.1 * spread
        assert abs(g["p95"] - e["p95"]) <= 0.1 * spread


def test_sketches_deterministic_across_runs(spark):
    a = sorted(map(str, CATALOG["ana_approx_sketches"].build(spark, SF_SMOKE).collect()))
    b = sorted(map(str, CATALOG["ana_approx_sketches"].build(spark, SF_SMOKE).collect()))
    assert a == b  # register-max merges are order-insensitive


def test_sketches_self_audit_columns_within_bounds(spark):
    """r8: the error contract lives IN the query output — every group
    must report users_within_bounds and quantiles_within_bounds true,
    and the exact companions must agree with ana_sketches_exact."""
    rows = CATALOG["ana_approx_sketches"].build(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["users_within_bounds"] is True, r
        assert r["quantiles_within_bounds"] is True, r
        # Assert the SAME bound the query emits (max(3, 6%) absolute) —
        # a bare rel-err gate is stricter than the contract for small
        # groups (exact_users < 50) and fragile to data/SF changes.
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            3, 0.06 * r["exact_users"]
        ), r
    exact = {
        r["event_type"]: r["exact_users"]
        for r in CATALOG["ana_sketches_exact"].build(spark, SF_SMOKE).collect()
    }
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
