"""Driver-window rotation invariants (plans/catalog.py).

The driver correctness-checks the first 50 catalog entries per round;
ordering is therefore part of the verification contract.
"""

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
    CATALOG,
    _DRIVER_ORDER,
    _WINDOW_PIN,
)

# Queries with no green driver row before round 3 (VERDICT.md r2): these
# MUST sit inside the 50-query driver window this round.
R2_UNVERIFIED = _DRIVER_ORDER[:22]

# The curated window head: never-checked + new-in-r3 + changed-in-r3.
WINDOW_HEAD = _DRIVER_ORDER[:_WINDOW_PIN]


def test_catalog_complete_and_ordered():
    assert set(CATALOG) >= set(_DRIVER_ORDER)
    assert len(set(_DRIVER_ORDER)) == len(_DRIVER_ORDER)


def test_unverified_queries_inside_driver_window():
    window = list(CATALOG)[:50]
    missing = [n for n in R2_UNVERIFIED if n not in window]
    assert not missing, f"driver-unverified queries outside window: {missing}"


def test_window_head_is_stable():
    # The curated head (never-checked, new-in-r3, changed-in-r3) occupies
    # positions 0..47 verbatim — late additions must not evict any of it.
    assert tuple(CATALOG)[:_WINDOW_PIN] == WINDOW_HEAD


def test_late_additions_slot_at_boundary():
    # Queries registered after the ordering was pinned sit immediately
    # after the curated head: just past this round's window, first in
    # line for round 4's.
    names = list(CATALOG)
    late = [n for n in CATALOG if n not in _DRIVER_ORDER]
    n = len(late)
    assert names[_WINDOW_PIN:_WINDOW_PIN + n] == late
