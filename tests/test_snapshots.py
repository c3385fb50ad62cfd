"""Versioned snapshot publish / rollback / vacuum (sources/snapshots.py):
commit-marker atomicity, reader isolation from in-flight writes,
tombstone rollback, retention vacuum."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.sources import snapshots as sn


def _df(spark, tag: str, n: int = 10):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(tag).alias("release")
    )


def test_publish_read_current_and_pinned(spark, tmp_path):
    root = str(tmp_path / "corpus")
    assert sn.current_version(spark, root) is None
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, root)

    v1 = sn.publish_snapshot(_df(spark, "r1"), root)
    v2 = sn.publish_snapshot(_df(spark, "r2", n=12), root)
    assert (v1, v2) == (1, 2)
    assert sn.current_version(spark, root) == 2
    cur = sn.read_snapshot(spark, root)
    assert cur.count() == 12 and cur.select("release").distinct().first()[0] == "r2"
    pinned = sn.read_snapshot(spark, root, version=1)
    assert pinned.count() == 10
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, root, version=9)


def test_uncommitted_write_is_invisible(spark, tmp_path):
    """A crashed publish = data dir without the marker: readers and
    current_version must not see it, and the next publish must not
    collide with its directory."""
    root = str(tmp_path / "corpus")
    sn.publish_snapshot(_df(spark, "r1"), root)
    # simulate a crash: v=2 data lands, marker never created
    _df(spark, "crashed").write.parquet(f"{root}/v=2")
    assert sn.current_version(spark, root) == 1
    assert sn.read_snapshot(spark, root).select("release").first()[0] == "r1"
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, root, version=2)
    # next publish allocates PAST the orphan — never errorifexists-collides
    assert sn.publish_snapshot(_df(spark, "r3"), root) == 3
    assert sn.current_version(spark, root) == 3


def test_rollback_tombstones_and_fresh_numbers(spark, tmp_path):
    root = str(tmp_path / "corpus")
    for tag in ("r1", "r2", "r3"):
        sn.publish_snapshot(_df(spark, tag), root)
    sn.rollback(spark, root, to_version=1)
    assert sn.current_version(spark, root) == 1
    assert sn.read_snapshot(spark, root).select("release").first()[0] == "r1"
    # tombstoned history stays pin-readable (reproducing an old run)
    assert sn.read_snapshot(spark, root, version=3).select("release").first()[0] == "r3"
    # re-publish allocates a FRESH number, not a reused one
    assert sn.publish_snapshot(_df(spark, "r4"), root) == 4
    assert sn.current_version(spark, root) == 4
    # can't roll back TO a tombstoned version
    with pytest.raises(ValueError):
        sn.rollback(spark, root, to_version=2)
    inv = sn.snapshot_versions(spark, root)
    assert [v["version"] for v in inv] == [1, 2, 3, 4]
    assert [v["is_current"] for v in inv] == [False, False, False, True]
    assert [v["rolled_back"] for v in inv] == [False, True, True, False]


def test_vacuum_retention_never_touches_current(spark, tmp_path):
    root = str(tmp_path / "corpus")
    for tag in ("r1", "r2", "r3", "r4"):
        sn.publish_snapshot(_df(spark, tag), root)
    _df(spark, "orphan").write.parquet(f"{root}/v=9")  # never committed
    sn.rollback(spark, root, to_version=3)  # tombstones v4
    removed = sn.vacuum(spark, root, keep_last=2)
    # gone: v1 (beyond retention), v4 (tombstoned), v9 (orphan)
    assert removed == [1, 4, 9]
    assert sorted(p.name for p in Path(root).iterdir()) == [
        "_claims", "_retired", "v=2", "v=3",
    ]
    retired = sorted(
        p.name
        for p in (Path(root) / "_retired").iterdir()
        if not p.name.startswith(".")  # local-FS .crc sidecars
    )
    assert retired == ["v=1", "v=4", "v=9"]
    assert sn.current_version(spark, root) == 3
    assert sn.read_snapshot(spark, root).count() == 10
    with pytest.raises(ValueError):
        sn.vacuum(spark, root, keep_last=0)
    # vacuumed numbers are BURNED: the next publish allocates past the
    # highest version ever seen (v9 orphan was reclaimed), never reusing
    # a number some consumer may have pinned
    assert sn.publish_snapshot(_df(spark, "r5"), root) == 10


def test_concurrent_publishers_get_distinct_versions(spark, tmp_path):
    """Two interleaved publishers serialize through the create-exclusive
    claim marker: writer A claims v=2 (then stalls mid-write), writer B
    publishes concurrently and must land on v=3 — not collide with A's
    claimed-but-uncommitted number. Both publishes succeed with
    DISTINCT versions; a claimed number whose writer crashes is burned
    forever (allocator floor), never handed to a later publisher."""
    root = str(tmp_path / "corpus")
    sn.publish_snapshot(_df(spark, "r1"), root)

    # writer A: claims the next number, stalls before writing data
    n_a = sn._claim_version(spark, root)
    assert n_a == 2

    # writer B: full publish while A is mid-flight -> fresh number
    assert sn.publish_snapshot(_df(spark, "rB"), root) == 3

    # the CAS itself: a second exclusive create of an existing claim
    # loses (raises) — that is the entire race arbitration
    jvm, fs, _ = sn._fs(spark, root)
    with pytest.raises(Exception):
        fs.create(
            jvm.org.apache.hadoop.fs.Path(f"{root}/_claims/v=3"), False
        ).close()

    # writer A resumes: writes its claimed dir and commits; history is
    # v1 < v2(A) < v3(B), current = highest committed = 3
    vdir = f"{root}/v={n_a}"
    _df(spark, "rA").write.parquet(vdir)
    fs.create(jvm.org.apache.hadoop.fs.Path(vdir, "_COMMITTED")).close()
    assert sn.current_version(spark, root) == 3
    assert (
        sn.read_snapshot(spark, root, version=2)
        .select("release").first()[0] == "rA"
    )

    # a claimer that crashes before writing burns its number
    assert sn._claim_version(spark, root) == 4  # never written
    assert sn.publish_snapshot(_df(spark, "r5"), root) == 5
