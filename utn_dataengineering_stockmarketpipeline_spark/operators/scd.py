"""SCD Type 0 merge (SURVEY.md §2.5 J1/J2, §2.9 T2).

The reference inserts only rows whose key is absent from the target via
``LEFT JOIN … WHERE key IS NULL`` SQL executed by Postgres
(``DB_manager.py:142-177``), after a truncate-and-reload hop through a
stage schema (``:107-136``). The stage hop exists only because pandas
cannot anti-join against a remote table; Spark expresses the whole merge
as one ``left_anti`` join — the canonical idempotent / exactly-once-sink
building block (re-delivered rows vanish in the anti-join).

Scale notes: the incoming batch is usually tiny next to the target, but
the JOIN must still scan the target's keys. Partition-prune the target
first (``prune`` predicate — e.g. only recent year/month partitions can
contain colliding keys when keys embed the date), and let AQE pick
broadcast when the pruned side is small.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame


def new_rows(incoming: DataFrame, target: DataFrame, key: str,
             prune: Column | None = None) -> DataFrame:
    """Rows of ``incoming`` whose ``key`` does not exist in ``target``.

    Mirrors DB_manager.py:152-155 (markets / J1) and :172-176
    (stock_prices / J2). Duplicate keys *within* the batch are collapsed
    first so a single load is idempotent in itself.
    """
    pruned = target.filter(prune) if prune is not None else target
    return incoming.dropDuplicates([key]).join(
        pruned.select(key), on=key, how="left_anti"
    )


def merge_append(incoming: DataFrame, target_path: str, key: str,
                 partition_by: list[str] | None = None) -> int:
    """SCD-0 load: append only never-seen keys to a parquet target.

    Returns the number of rows appended (the reference prints this,
    DB_manager.py:179). Creates the target on first load.

    Only a genuinely-absent target counts as "first load". Any other
    read failure (permissions, corrupt footer, transient FS error) is
    re-raised — treating it as first-load would append the whole batch
    without the anti-join and silently break the SCD-0 exactly-once
    invariant that the streaming sink (streaming/ingest.py scd0_sink)
    relies on for replay absorption.
    """
    spark = incoming.sparkSession
    try:
        target = spark.read.parquet(target_path)
        fresh = new_rows(incoming, target, key)
    except AnalysisException as e:
        get_cond = getattr(e, "getCondition", None) or e.getErrorClass
        cond = get_cond() or ""
        if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise  # real failure — surface it, don't skip the anti-join
        fresh = incoming.dropDuplicates([key])  # first load
    fresh = fresh.persist()  # count + write without recomputing the anti-join
    try:
        n = fresh.count()
        if n:
            writer = fresh.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(target_path)
    finally:
        fresh.unpersist()
    return n
