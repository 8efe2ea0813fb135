"""Raw-warehouse retention: expire whole hour PARTITIONS older than a
horizon — the day-2 operator that bounds the raw logs warehouse itself.

The r12/r13 work bounded the maintained aggregates (rollup tail trim,
grain compaction); this bounds the raw data they were built from, the way
a 100 TB deployment actually retains: whole-directory deletes at the
layout's hour grain (service_name/year/month/day/hour — SURVEY §2.A A7),
driven by PARTITION VALUES from one directory listing. No file footer is
opened, no row is read or rewritten, and cost is O(hour directories in
the doomed range) regardless of data volume — the same reason the pruned
panel routes read the listing instead of the data (plans/facade.py's
``_hour_dir_entries``, reused here).

Semantics (whole-partition discipline, stated not silent):

- an hour directory is expired iff its (year, month, day, hour) tuple is
  STRICTLY before the cutoff's — the cutoff's own (partial) hour always
  survives, so no surviving directory ever needs a rewrite;
- tuple comparison uses the same session-timezone rendering the writer
  used to derive the partition values (the cutoff's tuple is computed by
  Spark's own year()/month()/dayofmonth()/hour() on a one-row plan —
  never a drifting Python reimplementation; the facade's r10 tz lessons);
- ``hour=__HIVE_DEFAULT_PARTITION__`` directories (NULL-timestamp rows)
  have no age and are NEVER expired — rows that could not be placed in
  time must not silently vanish on a time-based policy;
- ``dry_run=True`` (the DEFAULT — ``vacuum_orphans``' dry-run-first
  discipline) returns the doomed directory list without deleting;
- idempotent and crash-safe: each hour directory is one recursive
  delete; a crash mid-sweep leaves fewer old directories and a re-run
  converges (returns the remainder, then []).

Streaming-manifest rule (same contract as ``compaction.compact``): a
warehouse still carrying a file-sink ``_spark_metadata`` manifest routes
reads through the manifest, which pins the exact file set — deleting
files under it breaks every read. Expiry therefore REFUSES on such a
root unless ``finalize_streaming=True`` (the sink is done writing here);
live pipelines should retire history by compacting into a new root and
flipping the catalog pointer (sources/registry.py), or use the Iceberg
path's snapshot expiry (``LogTableRegistry.expire_snapshots`` +
``vacuum_orphans``) where deletes are metadata transactions.

Catalog composition: a fake-catalog registry over the same root keeps
reading green by following expiry with
``LogTableRegistry.retire_missing()`` (a metadata-only delete commit);
the recorded trim boundary of the rollup tier
(``rollup.read_trim_boundary``) is directly a valid ``older_than`` (the
epoch-int form), so 'expire raw that the coarse tail already owns' is a
two-call composition.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.fsutil import hadoop_delete
from demo_otel_parquet_antalya_spark.fsutil import local_root as _local_root
from demo_otel_parquet_antalya_spark.sources.compaction import (
    finalize_streaming_warehouse,
    has_streaming_manifest,
)


class RetentionDeleteError(RuntimeError):
    """A non-dry-run sweep could not delete every doomed partition
    (permissions, concurrent writers, transient IO). Raised AFTER every
    doomed path was attempted — the sweep is maximal, the report honest
    (ADVICE r13: the old ignore_errors=True form reported a failed
    delete as expired, so a permission failure silently read as a
    completed retention sweep and re-runs believed the data gone).
    ``expired`` holds the paths that WERE removed this run, ``failed``
    the survivors — a re-run converges on exactly the failed set, and
    callers composing with ``LogTableRegistry.retire_missing`` can
    retire the expired paths before re-raising or retrying."""

    def __init__(self, expired: list[str], failed: list[str]):
        self.expired = expired
        self.failed = failed
        super().__init__(
            f"retention sweep deleted {len(expired)} partition(s) but "
            f"FAILED on {len(failed)}: {failed[:5]}"
            + ("..." if len(failed) > 5 else "")
        )


def _cutoff_tuple(spark: SparkSession, older_than) -> tuple[int, int, int, int]:
    """(year, month, day, hour) of the cutoff, rendered by the SESSION's
    own calendar/timezone semantics — the same clock that derived the
    partition values at write time. Ints are epoch seconds; strings /
    datetimes are timestamp literals (naive = session timezone).
    Unparseable input is a ValueError (a wrongly configured retention
    must fail loudly, never expire an unintended range)."""
    if isinstance(older_than, bool) or older_than is None:
        raise ValueError(f"unusable retention cutoff {older_than!r}")
    if isinstance(older_than, int):
        ts = F.timestamp_seconds(F.lit(older_than))
    else:
        ts = F.lit(older_than).try_cast("timestamp")
    row = (
        spark.range(1)
        .select(
            F.year(ts).alias("y"), F.month(ts).alias("m"),
            F.dayofmonth(ts).alias("d"), F.hour(ts).alias("h"),
        )
        .first()
    )
    if row.y is None:
        raise ValueError(f"unparseable retention cutoff {older_than!r}")
    return (int(row.y), int(row.m), int(row.d), int(row.h))


def _has_any_parquet(spark: SparkSession, root: str) -> bool:
    """Does the root hold ANY .parquet file (at any depth)? Local roots
    walk the filesystem; remote roots ask the Hadoop FS for a bounded
    recursive glob (5 levels — the layout's own depth)."""
    local = _local_root(root)
    if local is not None:
        import os

        for _dir, _subdirs, files in os.walk(local):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False
    from demo_otel_parquet_antalya_spark.fsutil import hadoop_glob

    base = root.rstrip("/")
    return any(
        hadoop_glob(spark, base + "/*" * depth + "/*.parquet")
        for depth in range(0, 6)
    )


def expire_partitions(
    spark: SparkSession,
    root: str,
    older_than,
    dry_run: bool = True,
    finalize_streaming: bool = False,
) -> list[str]:
    """Expire (or, by default, just LIST — ``dry_run=True``) every hour
    partition directory of the warehouse under ``root`` whose
    (year, month, day, hour) is strictly before ``older_than``'s hour.
    Returns the affected directory paths, sorted oldest-first. A
    non-dry-run sweep verifies every delete and raises
    ``RetentionDeleteError`` (after attempting all doomed paths) when
    any failed — the return value only ever lists partitions that are
    PROVABLY gone (ADVICE r13). See the module docstring for the
    whole-partition semantics, the NULL-partition exemption and the
    streaming-manifest rule."""
    if has_streaming_manifest(spark, root):
        if not finalize_streaming:
            raise ValueError(
                "root was written by a streaming sink (_spark_metadata "
                "present): deleting files under the manifest breaks every "
                "manifest-routed read. Pass finalize_streaming=True if "
                "this streaming query is done writing here, or retire "
                "history via a new root + catalog flip "
                "(sources/registry.py) / Iceberg snapshot expiry."
            )
        if not dry_run:
            # drop the manifest BEFORE deleting (the compact() crash-point
            # argument, ADVICE r8): once the caller declares the sink
            # finished, manifest-routed reads are already invalid, and
            # deleting data first would leave a manifest pinning missing
            # files on every crash in between
            finalize_streaming_warehouse(spark, root)
    cutoff = _cutoff_tuple(spark, older_than)
    from demo_otel_parquet_antalya_spark.plans.facade import _hour_dir_entries

    entries = _hour_dir_entries(spark, root)
    if not entries and _has_any_parquet(spark, root):
        # a root holding data but NO hour-layout directories is a
        # mis-pointed retention (wrong directory, or a warehouse written
        # without the partition layout): returning [] here would read as
        # "nothing old enough" while the disk fills forever — the silent
        # no-op is the dangerous direction for a retention operator
        raise ValueError(
            f"{root!r} holds parquet data but no "
            "service/year/month/day/hour partition directories — not the "
            "hive hour layout this retention expires; wrong root?"
        )
    doomed = sorted(
        (t, p) for p, t in entries
        if t is not None and t < cutoff
    )
    paths = [p for _t, p in doomed]
    if dry_run:
        return paths
    # every delete's outcome is CHECKED (ADVICE r13): the sweep attempts
    # all doomed paths, then reports failures loudly instead of returning
    # them as expired — a permission/IO failure must never read as a
    # completed retention sweep
    local = _local_root(root)
    expired: list[str] = []
    failed: list[str] = []
    for p in paths:
        if local is not None:
            import shutil

            try:
                shutil.rmtree(p)
            except FileNotFoundError:
                expired.append(p)  # a racing/prior sweep got it — gone is gone
            except OSError:
                failed.append(p)
            else:
                expired.append(p)
        else:
            # the FS's success flag; delete() on a missing path returns
            # False on Hadoop filesystems, but a path we just listed and
            # then cannot delete is a failure either way — report it.
            # A THROWING delete (permission/transient IO surfacing as a
            # java exception, not a false flag) must not abort the sweep
            # mid-way either: the maximal-sweep contract says every
            # doomed path is attempted before the error (code-review r14)
            try:
                ok = hadoop_delete(spark, p, True)
            except Exception:
                ok = False
            (expired if ok else failed).append(p)
    if local is not None:
        # best-effort prune of now-empty parent directories (day/month/
        # year/service); harmless if skipped — listings ignore empties
        import os

        for p in expired:
            parent = os.path.dirname(p)
            while len(parent) > len(local):
                try:
                    os.rmdir(parent)
                except OSError:
                    break
                parent = os.path.dirname(parent)
    if failed:
        raise RetentionDeleteError(expired, failed)
    return expired
