"""SparkSession factory with scale-oriented defaults.

The reference runs a single Python process (``main.py:65-75``) — no
parallelism at all. Here every knob is set for a real cluster and merely
*sized down* by env vars for local runs:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting),
- broadcast threshold sized so dimension tables never shuffle,
- Arrow enabled so the few pandas-UDF operators batch-transfer,
- nanos-as-long so the driver's TIMESTAMP(NANOS) parquet is readable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "utn-stockmarket-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` sizes local parallelism; on a real cluster the
    master/executor topology comes from spark-submit and these local
    settings are ignored.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", shuffle)
        # AQE: coalesce tiny shuffle partitions, split skewed ones, and
        # convert to broadcast joins at runtime when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables here are ≤ a few MB; broadcast aggressively.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Arrow for pandas_udf / mapInPandas extension operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet has shipped as TIMESTAMP(NANOS) or (MICROS)
        # across driver rounds; this flag makes the nanos variant read as
        # long (sources/parquet.py re-types it) and is a no-op for micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Target split size — at 100 TB this keeps ~128MB tasks; local SFs
        # produce a handful of splits, which AQE coalesces anyway.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
