"""Continuously-maintained log-template catalog (Drain-style mining on the
stream).

Batch template mining (plans/registry.py::log_template_mining) re-scans the
corpus; this maintains the catalog incrementally as log batches arrive, the
way a log-analytics backend actually discovers templates: each micro-batch
masks its messages (zero-shuffle scan-stage regexp — functions/text.py::
log_template), aggregates ITS increment, and merges with the prior snapshot.
Every catalog column is re-aggregable (SUM counts, MIN first_seen, MAX
last_seen), so the merge is exact, and snapshot size is bounded by template
cardinality — log streams collapse to a few hundred templates, so the merge
side stays broadcast-sized at any traffic volume.

Crash/replay semantics are the rollup.py discipline: a batch writes snapshot
``v=<batch_id>`` built from the latest snapshot with a SMALLER id, so a
replayed batch re-merges the same base it saw the first time — idempotent,
exactly-once output without a transactional table format.

A brand-new template appearing in a batch is exactly a row whose
first_seen == that batch's data — the "new log pattern" alert observability
teams page on falls out of the catalog diff for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.functions.text import log_template
from demo_otel_parquet_antalya_spark.streaming.rollup import (
    _read_state,
    _refuse_stale_writer,
    _versions,
)

CATALOG_SCHEMA = (
    "template string, n_events long, first_seen timestamp, last_seen timestamp"
)


def read_template_catalog(spark: SparkSession, target_dir: str) -> DataFrame:
    """Latest committed catalog snapshot (empty frame if none yet)."""
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], CATALOG_SCHEMA)
    return _read_state(spark, target_dir, vs[-1], CATALOG_SCHEMA)


def _mine(df: DataFrame, message_col: str, ts_col: str) -> DataFrame:
    return (
        df.select(
            log_template(message_col).alias("template"), F.col(ts_col).alias("__ts")
        )
        .groupBy("template")
        .agg(
            F.count("*").alias("n_events"),
            F.min("__ts").alias("first_seen"),
            F.max("__ts").alias("last_seen"),
        )
    )


def incremental_template_catalog(
    messages: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    message_col: str = "message",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
):
    """Start the catalog-maintenance stream; returns the StreamingQuery.

    ``messages`` is a streaming DataFrame with a text ``message_col`` and an
    event-time ``ts_col``.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = _mine(batch_df, message_col, ts_col)
        vs_all = _versions(spark, target_dir)
        _refuse_stale_writer(target_dir, batch_id, vs_all)
        prior_vs = [v for v in vs_all if v < batch_id]
        if prior_vs:
            prior = _read_state(
                spark, target_dir, prior_vs[-1], CATALOG_SCHEMA
            )
            merged = (
                prior.unionByName(inc)
                .groupBy("template")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.min("first_seen").alias("first_seen"),
                    F.max("last_seen").alias("last_seen"),
                )
            )
        else:
            merged = inc.select(
                "template",
                F.col("n_events").cast("long"),
                "first_seen",
                "last_seen",
            )
        merged.coalesce(1).write.mode("overwrite").parquet(f"{target_dir}/v={batch_id}")

    keyed = messages.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
