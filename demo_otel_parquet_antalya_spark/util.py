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


def salted_join(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> "DataFrame":
    """Skew-resistant equi-join: salt the (skewed) left side's key into
    ``salt_buckets`` sub-keys and replicate the right side across buckets, so
    one hot key spreads over ``salt_buckets`` tasks instead of one straggler.

    AQE's skew-join split (enabled session-wide) handles most skew at
    runtime by splitting oversized partitions; explicit salting remains the
    tool when a single key exceeds what one task can hold even after
    splitting (the power-law hot key at 100 TB), or when AQE is off.
    Replication multiplies the right side by salt_buckets — use with a
    dimension-sized right side.
    """
    from pyspark.sql import functions as F

    salted_left = left.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    salted_right = right.join(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")
