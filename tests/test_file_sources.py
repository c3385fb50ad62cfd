"""CSV / JSON-lines source round-trips: values survive both formats
byte-identically, malformed rows fail fast, and the bronze conversion
restores columnar scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from utn_dataengineering_stockmarketpipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    to_parquet_bronze,
)
from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import load_table

from conftest import SF_SMOKE

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_csv_round_trip(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "csv")
    src.write.option("header", "true").csv(path)
    back = read_csv(spark, path, DOC_SCHEMA)
    assert _same(src, back)


def test_jsonl_round_trip(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "jsonl")
    src.write.json(path)
    back = read_jsonl(spark, path, DOC_SCHEMA)
    assert _same(src, back)


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("doc_id,lang,n_chars\n1,en,10\nnope,xx\n")
    with pytest.raises(Exception):
        read_csv(spark, str(p), DOC_SCHEMA).collect()


def test_bronze_conversion_round_trip(spark, tmp_path):
    src = _docs(spark)
    csv_path = str(tmp_path / "drop")
    src.write.option("header", "true").csv(csv_path)
    bronze = str(tmp_path / "bronze")
    to_parquet_bronze(read_csv(spark, csv_path, DOC_SCHEMA), bronze)
    back = spark.read.parquet(bronze)
    assert _same(src, back)
    # columnar payoff: a one-column projection reads one column
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.select("lang").explain("formatted")
    plan = buf.getvalue()
    start = plan.index("ReadSchema")
    line = plan[start : plan.index("\n", start)]
    assert "lang" in line and "n_chars" not in line
