"""CSV / JSON-lines file sources (generic-connector surface).

The reference ingests only REST JSON and parquet (SURVEY.md §2.1); real
deployments also land CSV/JSONL drops. Discipline mirrors the REST
source (sources/rest.py): EXPLICIT StructType always — schema inference
is a full extra pass over the data at 100 TB and can silently change
types between drops. Both readers are thin, pushdown-friendly wrappers:
Catalyst still prunes columns and pushes filters into the scan
(CSV/JSON scans support filter pushdown post-parse in Spark; the big
win vs parquet — column skipping — is inherently absent, which is why
:func:`to_parquet_bronze` exists: convert once, scan columnar forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with a mandatory explicit schema.

    ``FAILFAST`` by default: a malformed row is a data-contract
    violation, not something to silently null out (use
    ``mode='PERMISSIVE'`` plus a ``_corrupt_record`` column when
    quarantining is the pipeline's policy).
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines scan with a mandatory explicit schema (one object per
    line — the only JSON layout that splits across executors; a single
    giant array/object cannot be read in parallel)."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def to_parquet_bronze(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """One-time conversion of a row-oriented drop (CSV/JSONL) into the
    columnar bronze layer, after which every query gets parquet column
    pruning + min/max skipping for free."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
