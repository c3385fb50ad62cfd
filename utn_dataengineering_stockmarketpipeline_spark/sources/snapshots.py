"""Versioned dataset snapshots on plain parquet — publish / read /
rollback / vacuum.

Training corpora ship as RELEASES: v7 trains a model, v8 adds a crawl,
and when v8 turns out contaminated the pipeline must serve v7 again
five minutes later. Table formats solve this with ACID logs; this
module provides the honest plain-parquet subset that needs no extra
dependency, built on ONE primitive every Hadoop-compatible filesystem
gives atomically: file CREATE.

Layout:  <root>/v=<n>/...parquet        (immutable once committed)
         <root>/v=<n>/_COMMITTED       (marker, created LAST)
         <root>/v=<n>/_ROLLED_BACK     (tombstone, beats the marker)

Commit protocol: data writes go to a brand-new ``v=<n>`` directory
(never touching published versions), then the empty ``_COMMITTED``
marker is created as the final act. Readers resolve "current" as the
highest version whose marker exists without a tombstone, so a crashed
or in-flight publish is simply invisible — no pointer file to swap, no
rename-overwrite races, no window where readers see partial data.
Rollback CREATES a tombstone (again a bare atomic create) rather than
deleting anything; the bad version stays on disk for forensics until
``vacuum`` reclaims it. Version numbers are NEVER reused, even after
``vacuum`` deletes the highest directories: vacuum first writes an
empty ``<root>/_retired/v=<n>`` marker per removed version (atomic
create, before the delete — crash-safe), and ``publish`` allocates
``max(existing ∪ retired) + 1``, so a pinned "v4" can never silently
resolve to different data than the v4 that was once published.

Concurrency contract: any number of readers, and CONCURRENT writers
serialize through the version allocator — ``publish`` claims its
number with a create-exclusive ``<root>/_claims/v=<n>`` marker (the
same atomic-create primitive as the commit marker), so two racing
publishers land on distinct versions instead of both writing ``v=n``.
Claims are permanent allocator floor alongside ``_retired``: a writer
that crashes after claiming burns the number, which the never-reuse
contract wants anyway. What this is NOT: snapshot-isolated multi-table
transactions or conflict detection between logically-conflicting
writes — that is Delta/Iceberg territory, out of scope by design.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d+)$")


def _fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    return jvm, path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _versions(spark: SparkSession, root: str) -> dict[int, dict]:
    """All version dirs under root: {n: {"committed": bool,
    "rolled_back": bool, "path": str}}."""
    jvm, fs, p_root = _fs(spark, root)
    out: dict[int, dict] = {}
    if not fs.exists(p_root):
        return out
    for status in fs.listStatus(p_root):
        name = status.getPath().getName()
        m = _VDIR.match(name)
        if not m or not status.isDirectory():
            continue
        vpath = status.getPath()
        out[int(m.group(1))] = {
            "path": str(vpath),
            "committed": fs.exists(
                jvm.org.apache.hadoop.fs.Path(vpath, "_COMMITTED")
            ),
            "rolled_back": fs.exists(
                jvm.org.apache.hadoop.fs.Path(vpath, "_ROLLED_BACK")
            ),
        }
    return out


def _retired(spark: SparkSession, root: str) -> list[int]:
    """Version numbers vacuum has reclaimed — the allocator floor."""
    jvm, fs, _ = _fs(spark, root)
    rdir = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/_retired")
    if not fs.exists(rdir):
        return []
    out = []
    for status in fs.listStatus(rdir):
        m = _VDIR.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return out


def _current(vs: dict[int, dict]) -> int | None:
    live = [n for n, v in vs.items() if v["committed"] and not v["rolled_back"]]
    return max(live) if live else None


def snapshot_versions(spark: SparkSession, root: str) -> list[dict]:
    """Version inventory, ascending: [{version, committed, rolled_back,
    is_current, path}]. Cheap — pure directory metadata, no data scan,
    ONE filesystem listing (object-store requests are the cost here)."""
    vs = _versions(spark, root)
    cur = _current(vs)
    return [
        {"version": n, "is_current": n == cur, **vs[n]} for n in sorted(vs)
    ]


def current_version(spark: SparkSession, root: str) -> int | None:
    """Highest committed, non-tombstoned version; None if nothing is
    published."""
    return _current(_versions(spark, root))


def _claims(spark: SparkSession, root: str) -> list[int]:
    """Version numbers any writer has CLAIMED (committed or not) — part
    of the allocator floor, so a claimed-but-crashed publish still
    burns its number."""
    jvm, fs, _ = _fs(spark, root)
    cdir = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/_claims")
    if not fs.exists(cdir):
        return []
    out = []
    for status in fs.listStatus(cdir):
        m = _VDIR.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return out


def _is_already_exists(exc: Exception) -> bool:
    """True iff a Py4J-wrapped filesystem error is the file-already-
    exists failure of an exclusive ``create(path, overwrite=False)`` —
    `org.apache.hadoop.fs.FileAlreadyExistsException` on HDFS-like
    stores, or the ChecksumFileSystem/RawLocalFileSystem IOException
    whose message says the path already exists. Walks the Java cause
    chain so a wrapped RemoteException still matches."""
    java_exc = getattr(exc, "java_exception", None)
    seen = 0
    while java_exc is not None and seen < 8:
        try:
            cls = java_exc.getClass().getName()
            msg = java_exc.getMessage() or ""
        except Exception:
            break
        if "FileAlreadyExists" in cls or "already exists" in msg.lower():
            return True
        java_exc = java_exc.getCause()
        seen += 1
    return "already exists" in str(exc).lower()


def _claim_version(spark: SparkSession, root: str, max_attempts: int = 64
                   ) -> int:
    """Allocate the next version number with a create-EXCLUSIVE claim
    marker (``<root>/_claims/v=<n>``) — the CAS that makes concurrent
    publishers safe: two writers computing the same candidate ``n``
    both attempt the exclusive create, exactly one succeeds, the loser
    re-probes and claims ``n+1``. Lock-free (no lease to expire, no
    stale lock to break): a writer that crashes after claiming merely
    burns a number, which the never-reuse contract wants anyway.
    ``create(path, overwrite=False)`` is the entire protocol — and the
    mutual-exclusion guarantee is therefore exactly as strong as that
    primitive on the underlying store: atomic on namenode-arbitrated
    filesystems (HDFS, ABFS) where create-no-overwrite is a single
    metadata CAS. On S3A before Hadoop's conditional-write support
    (If-None-Match, Hadoop 3.4.1+ with the feature enabled) and on the
    local ChecksumFileSystem, it degrades to check-then-create, so two
    racing publishers CAN both claim the same version — on those
    stores, front this with an external coordinator or enable the S3
    conditional-write flag."""
    jvm, fs, _ = _fs(spark, root)
    cdir = f"{root.rstrip('/')}/_claims"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(cdir))
    for _ in range(max_attempts):
        vs = _versions(spark, root)
        floor = max(
            max(_retired(spark, root), default=0),
            max(_claims(spark, root), default=0),
        )
        n = max(max(vs, default=0), floor) + 1
        try:
            fs.create(
                jvm.org.apache.hadoop.fs.Path(f"{cdir}/v={n}"), False
            ).close()
            return n
        except Exception as exc:
            # ONLY a lost race (the marker already exists) is retryable;
            # permissions / transient-IO / misconfigured-FS failures
            # must surface with their root cause, not be retried 64
            # times into a misleading "could not claim" error.
            if not _is_already_exists(exc):
                raise
            continue  # lost the race for n; re-probe and try n+1
    raise RuntimeError(
        f"could not claim a snapshot version under {root} after "
        f"{max_attempts} attempts"
    )


def publish_snapshot(
    df: DataFrame,
    root: str,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Write ``df`` as the next snapshot version and commit it; returns
    the version number. The new version is invisible to readers until
    the final marker create, so a mid-write crash leaves the table
    exactly as it was (vacuum reclaims the orphan directory later).

    Concurrent publishers are safe: the version number comes from
    :func:`_claim_version`'s create-exclusive claim marker, so two
    racing publishes land on DISTINCT versions (serialized by claim
    order) instead of both writing ``v=n``."""
    spark = df.sparkSession
    n = _claim_version(spark, root)
    vdir = f"{root.rstrip('/')}/v={n}"
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vdir)
    jvm, fs, _ = _fs(spark, root)
    fs.create(jvm.org.apache.hadoop.fs.Path(vdir, "_COMMITTED")).close()
    return n


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot (default) or a pinned ``version`` —
    pinning works for any committed version, including tombstoned ones
    still on disk (reproducing an old training run needs exactly that)."""
    vs = _versions(spark, root)
    if version is None:
        version = _current(vs)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {root}")
    elif version not in vs or not vs[version]["committed"]:
        raise FileNotFoundError(f"snapshot v={version} not committed under {root}")
    return spark.read.parquet(f"{root.rstrip('/')}/v={version}")


def rollback(spark: SparkSession, root: str, to_version: int) -> None:
    """Make ``to_version`` current by tombstoning every committed
    version above it. Pure atomic marker creates — nothing is deleted,
    and re-publishing after a rollback allocates a FRESH version number
    (the tombstoned history stays readable by pin until vacuumed)."""
    vs = _versions(spark, root)
    if to_version not in vs or not vs[to_version]["committed"] or vs[
        to_version
    ]["rolled_back"]:
        raise ValueError(f"cannot roll back to non-live version {to_version}")
    jvm, fs, _ = _fs(spark, root)
    for n, v in vs.items():
        if n > to_version and v["committed"] and not v["rolled_back"]:
            fs.create(
                jvm.org.apache.hadoop.fs.Path(v["path"], "_ROLLED_BACK")
            ).close()


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[int]:
    """Reclaim disk: delete tombstoned versions, orphaned (never
    committed) directories, and committed history beyond the newest
    ``keep_last`` live versions. NEVER deletes the current version;
    returns the versions removed."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1: the current version stays")
    vs = _versions(spark, root)
    live = sorted(
        n for n, v in vs.items() if v["committed"] and not v["rolled_back"]
    )
    keep = set(live[-keep_last:])
    jvm, fs, _ = _fs(spark, root)
    rdir = f"{root.rstrip('/')}/_retired"
    removed = []
    for n, v in sorted(vs.items()):
        if n not in keep:
            # retire-marker BEFORE delete: even a crash between the two
            # leaves the number burned, so publish can never reuse it
            fs.mkdirs(jvm.org.apache.hadoop.fs.Path(rdir))
            fs.create(jvm.org.apache.hadoop.fs.Path(f"{rdir}/v={n}")).close()
            fs.delete(jvm.org.apache.hadoop.fs.Path(v["path"]), True)
            removed.append(n)
    return removed
