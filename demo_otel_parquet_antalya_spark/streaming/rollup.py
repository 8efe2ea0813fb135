"""Continuous incremental rollup via ``foreachBatch`` — a materialized
aggregate maintained per micro-batch.

The reference's dashboards recompute their per-bucket aggregations from
raw parquet on every refresh (SURVEY.md §2.B Q5); this maintains the
rollup continuously instead, so dashboard reads are O(buckets), not
O(raw rows) — the "hypertable continuous aggregate" pattern expressed
with Spark primitives:

- each micro-batch computes only ITS increment (partial aggregate over
  arriving rows — map-side combine, one small shuffle);
- the increment merges with the previous snapshot (counts are
  re-aggregable: SUM of partial counts) and lands as a NEW versioned
  snapshot directory ``v=<batch_id>``;
- replayed batches (after a crash) overwrite their own version dir and
  merge from the snapshot BEFORE them — idempotent, exactly-once output
  without a transactional table format (same landing discipline as the
  receiver's atomic-rename writes);
- readers list version dirs and read the max — one atomic-visibility
  listing, no pointer file to corrupt.

Snapshot size is bounded by bucket-key cardinality (minutes x types),
so the merge is broadcast-sized at any traffic volume; raw events are
never re-read.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_SCHEMA = "bucket timestamp, event_type string, n long"


def _versions(spark: SparkSession, target_dir: str) -> list[int]:
    import os

    if not os.path.isdir(target_dir):
        return []
    out = []
    for name in os.listdir(target_dir):
        m = re.fullmatch(r"v=(\d+)", name)
        if m and os.path.exists(os.path.join(target_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_rollup(spark: SparkSession, target_dir: str) -> DataFrame:
    """Latest committed snapshot (empty frame if none yet)."""
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    return spark.read.schema(ROLLUP_SCHEMA).parquet(f"{target_dir}/v={vs[-1]}")


def incremental_rollup(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    bucket: str = "1 minute",
    ts_col: str = "ts",
    dim_col: str = "event_type",
    watermark_delay: str = "10 minutes",
):
    """Start the maintenance stream; returns the StreamingQuery.

    ``events`` is a streaming DataFrame with event-time ``ts_col`` and a
    dimension ``dim_col``.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = (
            batch_df.groupBy(
                F.window(F.col(ts_col), bucket).getField("start").alias("bucket"),
                F.col(dim_col).alias("event_type"),
            )
            .agg(F.count("*").alias("n"))
        )
        # merge with the snapshot strictly BEFORE this batch id, so a
        # replayed batch merges the same base it did the first time
        prior_vs = [v for v in _versions(spark, target_dir) if v < batch_id]
        if prior_vs:
            prior = spark.read.schema(ROLLUP_SCHEMA).parquet(f"{target_dir}/v={prior_vs[-1]}")
            merged = (
                prior.unionByName(inc)
                .groupBy("bucket", "event_type")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        else:
            merged = inc.select("bucket", "event_type", F.col("n").cast("long"))
        merged.coalesce(1).write.mode("overwrite").parquet(f"{target_dir}/v={batch_id}")

    keyed = events.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
