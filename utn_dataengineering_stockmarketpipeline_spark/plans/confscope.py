"""Scoped SQL-conf helper shared by catalog queries and tests.

Catalog queries must not leak session-conf changes: confs are
session-global, so an unrestored set races concurrent queries and
changes how LATER queries plan (the exact defect class ADVICE r7/r8
flagged). Every conf set through here is restored — or unset, if it
had no prior value — on exit.

Scoping alone is not enough for a LAZY result: a DataFrame returned
out of the ``with`` block re-plans at consumption time under the
restored confs. Queries whose advertised plan depends on a scoped conf
must materialize while the scope is live (``localCheckpoint(eager=
True)``) and return the checkpointed frame.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import SparkSession


@contextlib.contextmanager
def scoped_sql_conf(spark: SparkSession, **settings: str):
    saved: dict[str, str | None] = {}
    for key, val in settings.items():
        saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, val)
    try:
        yield
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
