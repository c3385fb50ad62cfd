from .transforms import (  # noqa: F401
    add_rolling_mean,
    normalize_market_payload,
    normalize_stock_payload,
)
from .scd import merge_append  # noqa: F401
from .windows import latest_per_entity, latest_global_date  # noqa: F401
