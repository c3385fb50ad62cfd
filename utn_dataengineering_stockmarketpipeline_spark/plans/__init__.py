from .catalog import CATALOG, Query  # noqa: F401
