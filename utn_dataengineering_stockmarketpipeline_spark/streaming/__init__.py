from .ingest import (  # noqa: F401
    scd0_sink,
    stateful_running_totals,
    stream_parquet,
    tumbling_agg,
)
