"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a DataFrame out to at least the cluster's default parallelism
    before CPU-heavy per-row work.

    Parquet scans parallelize at row-group granularity; a table written as a
    few huge row groups (or one file per partition at small SF) scans as a
    handful of tasks and then serializes any expensive per-row operator on
    them. When the scan already yields enough partitions (the 100 TB case —
    thousands of files), this is a no-op with zero added shuffle; only
    under-parallelized inputs pay one round-robin exchange, which is always
    worth it ahead of work that costs orders of magnitude more than the I/O.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
