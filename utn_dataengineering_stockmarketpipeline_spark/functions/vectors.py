"""Vector column expressions for similarity search.

All pure higher-order-function compositions over array<float> columns —
JVM-side, no UDF, no data movement to Python. Elements are cast to
double *before* arithmetic and reduced strictly left-to-right so results
are bit-reproducible across engines and partitionings (the DuckDB oracle
computes the same left-fold).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i · b_i in double precision, left-to-right."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double precision."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NaN-free for zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
