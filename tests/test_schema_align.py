"""Schema-evolution alignment (sources/schema_align.py): additive
nulls, lossless widening only, explicit extra-column policy."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from utn_dataengineering_stockmarketpipeline_spark.sources.schema_align import (
    align_to_schema,
)

TARGET = StructType(
    [
        StructField("id", LongType(), False),
        StructField("price", DoubleType(), True),
        StructField("note", StringType(), True),
    ]
)


def test_align_widens_adds_null_reorders_drops(spark):
    src = spark.createDataFrame(
        [("x", 1.5, 3, "junk")], "note string, price double, id int, extra string"
    )
    out = align_to_schema(src, TARGET)
    assert [f.name for f in out.schema.fields] == ["id", "price", "note"]
    assert out.schema["id"].dataType == LongType()  # int widened to long
    row = out.first()
    assert (row.id, row.price, row.note) == (3, 1.5, "x")

    # missing nullable column arrives as a typed NULL
    src2 = spark.createDataFrame([(1, 2.0)], "id long, price double")
    out2 = align_to_schema(src2, TARGET)
    assert out2.schema["note"].dataType == StringType()
    assert out2.first().note is None
    # and the aligned frame appends cleanly onto a target-schema frame
    base = spark.createDataFrame([], TARGET)
    assert base.unionByName(out2).count() == 1


def test_align_rejects_lossy_and_missing_required(spark):
    # narrowing double -> int style: here long target, double source
    src = spark.createDataFrame([(1.0, 2.0, "a")], "id double, price double, note string")
    with pytest.raises(ValueError, match="not a lossless widening"):
        align_to_schema(src, TARGET)

    src2 = spark.createDataFrame([(2.0,)], "price double")  # no id
    with pytest.raises(ValueError, match="required column 'id' missing"):
        align_to_schema(src2, TARGET)

    # every problem reported at once, not one per retry
    src3 = spark.createDataFrame([("s",)], "price string")
    with pytest.raises(ValueError) as e:
        align_to_schema(src3, TARGET)
    msg = str(e.value)
    assert "required column 'id'" in msg and "price" in msg


def test_align_extra_column_policy(spark):
    src = spark.createDataFrame(
        [(1, 2.0, "n", "x")], "id long, price double, note string, extra string"
    )
    assert "extra" not in align_to_schema(src, TARGET).columns
    with pytest.raises(ValueError, match="unexpected source columns"):
        align_to_schema(src, TARGET, on_extra="error")
    with pytest.raises(ValueError, match="drop"):
        align_to_schema(src, TARGET, on_extra="quarantine")


def test_align_rejects_long_to_double(spark):
    """long -> double silently rounds past 2^53 (big IDs, ns epochs):
    NOT a lossless widening, must raise."""
    target = StructType([StructField("id", DoubleType(), True)])
    src = spark.createDataFrame([(1_700_000_000_123_456_789,)], "id long")
    with pytest.raises(ValueError, match="not a lossless widening"):
        align_to_schema(src, target)
