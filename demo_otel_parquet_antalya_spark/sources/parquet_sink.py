"""Partitioned Parquet sink for the ``otel.logs`` table.

Reproduces the reference writer's layout contract (SURVEY.md §2.A6-A7):
Hive-style paths ``service_name=/year=/month=/day=/hour=`` (reference path
shape README.md:171) with files capped at 200k rows (docker-compose.yaml:88,
enforced session-wide via spark.sql.files.maxRecordsPerFile).

Scale notes:
- partition columns give Catalyst partition pruning on service + time-range
  predicates — the reference gets the same effect from its path layout;
- rows are sorted within partitions by timestamp before the write so parquet
  row-group min/max stats stay tight (reference relies on natural batch
  time-ordering for this, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.schema import PARTITION_COLUMNS


def with_partition_columns(logs: DataFrame) -> DataFrame:
    """Derive year/month/day/hour from the event timestamp (A7)."""
    return (
        logs.withColumn("year", F.year("timestamp"))
        .withColumn("month", F.month("timestamp"))
        .withColumn("day", F.dayofmonth("timestamp"))
        .withColumn("hour", F.hour("timestamp"))
    )


def write_logs(logs: DataFrame, root: str, mode: str = "append") -> None:
    """Write flat otel.logs rows to the partitioned warehouse layout."""
    (
        with_partition_columns(logs)
        .sortWithinPartitions("timestamp")
        .write.mode(mode)
        .partitionBy(*PARTITION_COLUMNS)
        .parquet(root)
    )


def read_logs(spark: SparkSession, root: str) -> DataFrame:
    """Scan the partitioned warehouse; partition columns come back typed
    (basePath keeps them even for single-partition reads)."""
    return spark.read.option("basePath", root).parquet(root)
