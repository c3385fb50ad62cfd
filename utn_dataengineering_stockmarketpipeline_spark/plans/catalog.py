"""Query catalog — the driver contract's single source of truth.

Every implemented operator from SURVEY.md §2 (plus the large-scale
extension operators) registers here as a :class:`Query`:

- ``build(spark, sf_dir) -> DataFrame``: the Spark plan (the engine path),
- ``oracle``: equivalent DuckDB SQL over the same parquet views, or
  ``None`` for genuinely non-SQL-expressible ops (driver then records a
  rows-only check).

Column names are aliased identically on both sides — the driver's
comparator sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = Query(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn
    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from . import queries_reference  # noqa: F401
    from . import queries_analytics  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_joins  # noqa: F401


_load_all()
