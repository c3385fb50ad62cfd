"""Driver-window rotation invariants (plans/catalog.py).

The driver correctness-checks the first 50 catalog entries per round;
ordering is therefore part of the verification contract.
"""

from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
    CATALOG,
    _DRIVER_ORDER,
    _WINDOW_PIN,
)

# The must-verify head: queries whose last driver row is missing or red
# (this round: the four repaired streaming drains + the never-checked
# ana_lapsed_customers). These MUST land inside the 50-query window.
WINDOW_HEAD = _DRIVER_ORDER[:_WINDOW_PIN]


def test_catalog_complete_and_ordered():
    assert set(CATALOG) >= set(_DRIVER_ORDER)
    assert len(set(_DRIVER_ORDER)) == len(_DRIVER_ORDER)


def test_head_inside_driver_window():
    window = list(CATALOG)[:50]
    missing = [n for n in WINDOW_HEAD if n not in window]
    assert not missing, f"must-verify queries outside window: {missing}"


def test_new_queries_inside_driver_window():
    """Queries registered after the ordering was pinned (no driver row
    yet) slot in at _WINDOW_PIN — they must sit inside the window."""
    window = list(CATALOG)[:50]
    unlisted = [n for n in CATALOG if n not in _DRIVER_ORDER]
    missing = [n for n in unlisted if n not in window]
    assert not missing, f"new queries outside driver window: {missing}"
    # and the pin itself leaves room for them
    assert _WINDOW_PIN + len(unlisted) <= 50


def test_bench_queries_exist_in_catalog():
    """Every headline bench entry must resolve — a typo here only
    surfaces when the driver's per-round bench run crashes."""
    import bench
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )

    missing = [n for n in bench.BENCH_QUERIES if n not in CATALOG]
    assert not missing, f"bench queries not in catalog: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_stream_ks_drift_shares_the_batch_oracle_verbatim():
    """The streaming drift monitor's correctness claim IS convergence to
    the batch statistic — the two catalog entries must verify against
    the identical SQL (the stream_heavy_hitters contract)."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )

    assert CATALOG["stream_ks_drift"].oracle == CATALOG["ana_ks_drift"].oracle
    assert (CATALOG["stream_emd_drift"].oracle
            == CATALOG["ana_emd_drift"].oracle)
    assert (CATALOG["stream_psi_drift"].oracle
            == CATALOG["ana_psi_drift"].oracle)
    assert (CATALOG["stream_cusum_drift"].oracle
            == CATALOG["ana_cusum_drift"].oracle)
