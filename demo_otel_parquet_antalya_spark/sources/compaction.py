"""Small-file compaction for hive-partitioned parquet warehouses.

The reference accepts small-file buildup from its micro-batched ingest
(SURVEY §2.A6/A9 — many ~200k-row parquet files per partition directory and
no OPTIMIZE step; see reference README's ingest/batching notes). At 100 TB
that tax compounds: every scan pays per-file open/footer costs, and the
driver's file listing grows without bound. This module goes beyond the
reference with an explicit compaction pass:

- **Discovery is distributed, not driver-side listing**: one scan with
  ``input_file_name()`` aggregated per partition gives (n_files, n_rows)
  for every hive partition — the same pattern works unchanged on a
  1000-executor cluster where ``os.listdir`` over an object store would be
  the bottleneck.
- **Only offending partitions are rewritten**: a partition is compacted only
  when its file count exceeds what its row count justifies, so steady-state
  runs are cheap no-ops and hot (recently written) partitions can be skipped
  by predicate.
- **Swap is write-to-staging then rename.** On a local/HDFS filesystem the
  directory rename is atomic. On S3-style object stores there is no atomic
  rename — production there pairs this with the registry's
  register-don't-rewrite catalog flip (sources/registry.py) or a table
  format (Iceberg/Delta) commit instead; the rewrite planning above is
  identical in both cases.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PartitionStats:
    values: dict[str, str]  # partition column -> value
    n_files: int
    n_rows: int
    ideal_files: int

    @property
    def rel_dir(self) -> str:
        return "/".join(f"{k}={v}" for k, v in self.values.items())


def small_file_report(
    spark: SparkSession,
    root: str,
    partition_cols: list[str],
    target_rows_per_file: int,
) -> DataFrame:
    """Per-partition (n_files, n_rows, ideal_files) via one distributed scan.

    ``ideal_files = ceil(n_rows / target_rows_per_file)`` — a partition whose
    actual file count exceeds this is paying avoidable per-file overhead.
    """
    # project the nondeterministic input_file_name() BEFORE the agg — Spark 4
    # forbids it directly inside an aggregate function
    df = spark.read.parquet(root).withColumn("_file", F.input_file_name())
    return (
        df.groupBy(*partition_cols)
        .agg(
            F.countDistinct("_file").alias("n_files"),
            F.count("*").alias("n_rows"),
        )
        .withColumn(
            "ideal_files",
            F.greatest(
                F.lit(1), F.ceil(F.col("n_rows") / F.lit(target_rows_per_file))
            ).cast("int"),
        )
    )


def plan_compaction(
    spark: SparkSession,
    root: str,
    partition_cols: list[str],
    target_rows_per_file: int = 200_000,
    min_excess_files: int = 2,
) -> list[PartitionStats]:
    """Partitions whose file count exceeds ideal by >= min_excess_files.

    The collect here is bounded by the number of hive partitions (thousands),
    never by file or row counts — safe driver-side at any data scale.
    """
    rows = (
        small_file_report(spark, root, partition_cols, target_rows_per_file)
        .filter(F.col("n_files") >= F.col("ideal_files") + min_excess_files)
        .collect()
    )
    return [
        PartitionStats(
            values={c: str(r[c]) for c in partition_cols},
            n_files=r["n_files"],
            n_rows=r["n_rows"],
            ideal_files=r["ideal_files"],
        )
        for r in rows
    ]


def compact_partitions(
    spark: SparkSession,
    root: str,
    targets: list[PartitionStats],
) -> int:
    """Rewrite each target partition into its ideal file count; returns the
    number of partitions rewritten. Each rewrite is read-leaf-dir →
    repartition(ideal) → write-staging → swap, so concurrent readers of
    other partitions are never touched and a crash mid-partition leaves the
    original directory intact (staging dirs are suffixed and ignorable)."""
    done = 0
    for part in targets:
        pdir = os.path.join(root, part.rel_dir)
        staging = pdir + ".compacting"
        trash = pdir + ".old"
        (
            spark.read.parquet(pdir)
            .repartition(part.ideal_files)
            .write.mode("overwrite")
            .parquet(staging)
        )
        os.rename(pdir, trash)
        os.rename(staging, pdir)
        shutil.rmtree(trash)
        done += 1
    return done


def _manifest_path(spark: SparkSession, root: str):
    """(hadoop_fs, hadoop_path) of ``root/_spark_metadata`` — Hadoop FS so
    hdfs:///s3a:// roots work exactly like local ones (a local-only
    os.path check would silently no-op on remote warehouses)."""
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(root.rstrip("/") + "/_spark_metadata")
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, path


def has_streaming_manifest(spark: SparkSession, root: str) -> bool:
    fs, path = _manifest_path(spark, root)
    return bool(fs.exists(path))


def finalize_streaming_warehouse(spark: SparkSession, root: str) -> bool:
    """Remove a streaming file sink's ``_spark_metadata`` manifest under
    ``root`` (returns whether one existed), converting the root to a
    plain listed warehouse. REQUIRED after compacting a sink-written
    warehouse: ``spark.read`` of such a root goes through the manifest
    (MetadataLogFileIndex), which still references the pre-compaction
    files — reads fail with FileNotFoundException once they are
    rewritten.

    FINALIZE means finalize: the SAME streaming query must not write this
    root again. Its next micro-batch would recreate ``_spark_metadata``
    containing only that batch's files, and manifest-routed reads would
    then silently LOSE all prior (compacted) history — worse than the
    read failure this removes. For a continuously-ingesting pipeline,
    compact into a NEW root and flip the catalog pointer instead
    (sources/registry.py's register-don't-rewrite), or point the sink at
    a fresh root going forward."""
    fs, path = _manifest_path(spark, root)
    existed = bool(fs.exists(path))
    if existed:
        fs.delete(path, True)
    return existed


def compact(
    spark: SparkSession,
    root: str,
    partition_cols: list[str],
    target_rows_per_file: int = 200_000,
    min_excess_files: int = 2,
    finalize_streaming: bool = False,
) -> int:
    """plan + execute in one call; returns partitions rewritten.

    A warehouse written by the STREAMING sink carries a
    ``_spark_metadata`` manifest that pins the exact pre-compaction file
    set — rewriting files under it breaks manifest-routed reads, and
    merely dropping it breaks them WORSE later if the sink keeps writing
    (see ``finalize_streaming_warehouse``). So on a sink-written root
    this refuses by default; pass ``finalize_streaming=True`` to rewrite
    AND finalize (drop the manifest) when the root will no longer be
    written by that streaming query. Live pipelines should compact into
    a new root + catalog flip instead."""
    if has_streaming_manifest(spark, root) and not finalize_streaming:
        raise ValueError(
            "root was written by a streaming sink (_spark_metadata "
            "present): in-place compaction invalidates the manifest. "
            "Pass finalize_streaming=True if this streaming query is "
            "done writing here, or compact into a new root and flip "
            "the catalog pointer (sources/registry.py)."
        )
    if finalize_streaming:
        # Drop the manifest BEFORE rewriting (ADVICE r8): the caller has
        # declared the sink finished, so manifest-routed reads of any
        # post-compaction state are already invalid — and deleting it
        # last meant a crash mid-compaction (or between rewrite and
        # delete) left the manifest pinning already-deleted files,
        # failing every read until someone manually finalized. Dropping
        # first makes every crash point recoverable: reads list the
        # directory directly and a re-run just resumes compacting.
        finalize_streaming_warehouse(spark, root)
    targets = plan_compaction(
        spark, root, partition_cols, target_rows_per_file, min_excess_files
    )
    return compact_partitions(spark, root, targets)
