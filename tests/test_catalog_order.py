"""Driver-window rotation invariants (plans/catalog.py).

The driver correctness-checks the first 50 catalog entries per round;
ordering is therefore part of the verification contract.
"""

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
    CATALOG,
    _DRIVER_ORDER,
)

# Queries with no green driver row before round 3 (VERDICT.md r2): these
# MUST sit inside the 50-query driver window this round.
R2_UNVERIFIED = _DRIVER_ORDER[:22]


def test_catalog_complete_and_ordered():
    assert set(CATALOG) >= set(_DRIVER_ORDER)
    assert len(set(_DRIVER_ORDER)) == len(_DRIVER_ORDER)


def test_unverified_queries_inside_driver_window():
    window = list(CATALOG)[:50]
    missing = [n for n in R2_UNVERIFIED if n not in window]
    assert not missing, f"driver-unverified queries outside window: {missing}"


def test_new_queries_inside_driver_window():
    # Anything registered but absent from _DRIVER_ORDER is new this round
    # and must land in the window to get its first driver row.
    window = list(CATALOG)[:50]
    new = [n for n in CATALOG if n not in _DRIVER_ORDER]
    missing = [n for n in new if n not in window]
    assert not missing, f"new queries outside driver window: {missing}"
