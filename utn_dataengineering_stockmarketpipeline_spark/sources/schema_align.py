"""Schema-evolution alignment for lake appends.

A new crawl/vendor drop rarely matches the lake's schema exactly: a
column was added last quarter, an int widened to long, field order
drifted. Appending it raw either fails or — worse — silently writes a
divergent schema that poisons every later ``mergeSchema`` read. This
module makes the contract explicit:

- missing target columns (nullable) are added as typed NULLs — the
  standard additive-evolution case;
- matching columns are reordered and, where needed, WIDENED along the
  lossless ladder (byte→short→int→long, float→double, byte/short/int→
  double, date→timestamp) — and ONLY lossless: narrowings (long→int,
  double→float, string→anything) AND long→double (exact only below
  2^53 — silent rounding for big int64 IDs) raise instead of
  truncating data at 2 a.m.;
- extra source columns are dropped or rejected per ``on_extra``;
- a missing NON-nullable target column always raises — inventing
  required data is not evolution.

Pure projection: zero shuffle, fuses with the scan at any scale.
Top-level columns only by design — nested struct evolution belongs to
a table format's schema registry, and pretending otherwise here would
hide silent field reordering inside structs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructType,
    TimestampType,
)

# lossless widening ladders: source type -> types it may widen TO.
# long -> double is deliberately ABSENT: doubles hold only 53 mantissa
# bits, so int64 values past 2^53 (snowflake IDs, nanosecond epochs)
# would round silently — exactly the truncation this module promises
# to raise on. Every ladder below is exact for the source type's FULL
# range (int32 max < 2^53).
_WIDENS_TO: dict[type, tuple[type, ...]] = {
    ByteType: (ShortType, IntegerType, LongType, DoubleType),
    ShortType: (IntegerType, LongType, DoubleType),
    IntegerType: (LongType, DoubleType),
    FloatType: (DoubleType,),
    DateType: (TimestampType,),
}


def _can_widen(src: DataType, dst: DataType) -> bool:
    return type(dst) in _WIDENS_TO.get(type(src), ())


def align_to_schema(
    df: DataFrame,
    target: StructType,
    on_extra: str = "drop",
) -> DataFrame:
    """Project ``df`` onto ``target``: exact column order and types, or
    a ``ValueError`` explaining every incompatibility at once (a 2 a.m.
    operator fixes one error message, not an error per retry)."""
    if on_extra not in ("drop", "error"):
        raise ValueError("on_extra must be 'drop' or 'error'")
    src = {f.name: f for f in df.schema.fields}
    problems: list[str] = []
    cols = []
    for field in target.fields:
        have = src.get(field.name)
        if have is None:
            if not field.nullable:
                problems.append(
                    f"required column {field.name!r} missing from source"
                )
            else:
                cols.append(
                    F.lit(None).cast(field.dataType).alias(field.name)
                )
        elif have.dataType == field.dataType:
            cols.append(F.col(field.name))
        elif _can_widen(have.dataType, field.dataType):
            cols.append(
                F.col(field.name).cast(field.dataType).alias(field.name)
            )
        else:
            problems.append(
                f"column {field.name!r}: {have.dataType.simpleString()} "
                f"!> {field.dataType.simpleString()} (not a lossless widening)"
            )
    extras = [n for n in src if n not in {f.name for f in target.fields}]
    if extras and on_extra == "error":
        problems.append(f"unexpected source columns: {sorted(extras)}")
    if problems:
        raise ValueError("; ".join(problems))
    return df.select(*cols)
