from .parquet import TABLES, load_table, register_views  # noqa: F401
