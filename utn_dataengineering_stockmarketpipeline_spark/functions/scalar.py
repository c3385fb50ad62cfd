"""Scalar column expressions (SURVEY.md §2.8 F1-F8).

All pure ``pyspark.sql.functions`` compositions — JVM-side, codegen'd,
never Python UDFs. Each helper returns a Column so it fuses into
whatever select/filter uses it (single WholeStageCodegen span).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fmt_ddmmyyyy(col: Column | str) -> Column:
    """F1: Postgres ``TO_CHAR(d,'DD-MM-YYYY')`` (DB_manager.py:184)."""
    return F.date_format(col, "dd-MM-yyyy")


def surrogate_key(date_col: Column | str, ticker_col: Column | str) -> Column:
    """F2/F3/P4: the fact PK ``str(date) + "/" + ticker``
    (API_manager.py:162).

    pandas ``astype(str)`` on a date renders ``YYYY-MM-DD``; a plain
    string cast of DateType matches byte-for-byte (golden-tested), which
    keeps SCD-0 dedup keys identical to the reference's.
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    t = F.col(ticker_col) if isinstance(ticker_col, str) else ticker_col
    return F.concat_ws("/", d.cast("string"), t)


def date_parts(date_col: Column | str) -> tuple[Column, Column, Column]:
    """F5/P3: (year, month, day) derived columns (API_manager.py:158-160).

    Kept as physical columns in the warehouse for reference DDL parity
    (DB_manager.py:51-53) even though they duplicate partition values.
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (
        F.year(c).alias("stock_year"),
        F.month(c).alias("stock_month"),
        F.dayofmonth(c).alias("stock_day"),
    )
