"""Incremental, idempotent table registration (the reference's log-sync loop).

The reference registers Parquet files into an Iceberg table *by reference*
on a 60 s cadence, keeping a state file of already-registered paths so reruns
never double-count (SURVEY.md §2.A9-A12; scripts/sync-logs.sh:36,44-76).

This engine keeps the same contract without requiring Iceberg jars:

- warehouse dir of partitioned parquet = the data;
- a ``_registered_files`` text state (one path per line, atomically swapped)
  = the catalog's file list;
- ``sync()`` lists the warehouse, diffs against the state, and registers the
  delta — file discovery and diffing are METADATA-ONLY, no data is read or
  rewritten (same "register, don't rewrite" semantics as ``ice insert -p``);
- ``table()`` exposes the registered snapshot as a DataFrame/temp view, so
  in-flight files that were written but not yet synced stay invisible —
  mirroring the reference's freshness contract (record visible ≈ flush age +
  sync interval, AGENTS.md:69).

At 100 TB the state file becomes a parquet table and sync() a scheduled job;
the listing diff stays O(new files). With Iceberg jars on the classpath the
same loop maps onto ``CALL system.add_files`` (see ``iceberg_register``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_parquet_files(root: str) -> set[str]:
    found = set()
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".parquet"):
                found.add(os.path.join(dirpath, fn))
    return found


class LogTableRegistry:
    """Incremental registration state for one logs table (A9-A12)."""

    def __init__(self, spark: SparkSession, warehouse_root: str, state_path: str | None = None):
        self.spark = spark
        self.root = warehouse_root
        self.state_path = state_path or os.path.join(warehouse_root, "_registered_files.txt")

    def registered(self) -> set[str]:
        if not os.path.exists(self.state_path):
            return set()
        with open(self.state_path) as f:
            return {line.strip() for line in f if line.strip()}

    def sync(self) -> list[str]:
        """One sync cycle: list -> diff -> register. Returns newly-registered
        paths. Idempotent: a second call with no new files is a no-op
        (mirrors scripts/sync-logs.sh:44-57 early-exit)."""
        current = _list_parquet_files(self.root)
        known = self.registered()
        new = sorted(current - known)
        if not new:
            return []
        # atomic state swap so a crashed sync never half-registers
        all_files = sorted(known | set(new))
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.state_path) or ".")
        with os.fdopen(fd, "w") as f:
            f.write("\n".join(all_files) + "\n")
        os.replace(tmp, self.state_path)
        return new

    def table(self, merge_schema: bool = False) -> DataFrame:
        """DataFrame over exactly the registered snapshot of files.

        ``merge_schema=True`` unions schemas across files (parquet
        ``mergeSchema``), so attribute drift — a newly promoted OTLP attr
        column appearing in later files — reads as NULL for older files
        instead of failing or vanishing. Off by default because the footer
        union is a per-file metadata pass; schema-stable readers skip it.
        """
        files = sorted(self.registered())
        if not files:
            raise ValueError(f"no files registered yet under {self.root}; run sync()")
        reader = self.spark.read.option("basePath", self.root)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def register_view(self, name: str = "otel_logs", merge_schema: bool = False) -> DataFrame:
        """Mount the registered snapshot as a queryable view — the analogue of
        the reference's ClickHouse `ice` database mount (docker-compose.yaml:150-159)."""
        df = self.table(merge_schema=merge_schema)
        df.createOrReplaceTempView(name)
        return df


def compact_warehouse(
    spark: SparkSession,
    warehouse_root: str,
    out_root: str,
    target_records_per_file: int = 200_000,
) -> None:
    """OPTIMIZE-style small-file compaction (optional extension; the
    reference accepts small-file buildup — SURVEY.md §4).

    Rewrites the warehouse into one time-sorted file per partition chunk of
    ``target_records_per_file`` rows. Output goes to a NEW root: at scale the
    swap is a catalog pointer flip (or Iceberg rewrite_data_files), never an
    in-place mutation — readers keep a consistent snapshot throughout.
    """
    from demo_otel_parquet_antalya_spark.schema import PARTITION_COLUMNS

    df = spark.read.option("basePath", warehouse_root).parquet(warehouse_root)
    (
        df.repartition(*[F.col(c) for c in PARTITION_COLUMNS])
        .sortWithinPartitions("timestamp")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy(*PARTITION_COLUMNS)
        .parquet(out_root)
    )


def iceberg_register(spark: SparkSession, table: str, parquet_path: str) -> bool:
    """Metadata-only Iceberg append via add_files — used when Iceberg's Spark
    runtime is on the classpath (not in this image); returns False otherwise."""
    try:
        spark.sql(
            f"CALL system.add_files(table => '{table}', source_table => '`parquet`.`{parquet_path}`')"
        )
        return True
    except Exception:
        return False
