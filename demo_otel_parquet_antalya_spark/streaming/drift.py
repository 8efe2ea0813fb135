"""Continuous distribution-drift monitoring (streaming PSI).

The batch form (`drift_psi_event_mix`) compares two static windows; this
maintains the CURRENT window's category counts incrementally — counts are
re-aggregable, so each micro-batch contributes a partial count and the
snapshot merge is the same versioned-dir discipline as
``streaming/rollup.py`` (replay-idempotent, exactly-once on plain parquet).
The PSI read joins the maintained counts against a broadcast reference
distribution: drift is re-evaluated per batch at O(categories), with raw
events never re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.rollup import (
    _read_state,
    _refuse_stale_writer,
    _versions,
)

COUNTS_SCHEMA = "category string, n long"


def reference_distribution(df: DataFrame, cat_col: str) -> DataFrame:
    """(category, p) shares of the reference window — broadcast-sized."""
    counts = df.groupBy(F.col(cat_col).alias("category")).agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    return counts.join(F.broadcast(tot)).select(
        "category", (F.col("n") / F.col("t")).alias("p")
    )


def incremental_category_counts(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    cat_col: str,
):
    """Maintain current-window category counts per micro-batch."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = batch_df.groupBy(F.col(cat_col).alias("category")).agg(
            F.count("*").alias("n")
        )
        vs_all = _versions(spark, target_dir)
        _refuse_stale_writer(target_dir, batch_id, vs_all)
        prior_vs = [v for v in vs_all if v < batch_id]
        if prior_vs:
            prior = _read_state(
                spark, target_dir, prior_vs[-1], COUNTS_SCHEMA
            )
            inc = (
                prior.unionByName(inc)
                .groupBy("category")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        inc.coalesce(1).write.mode("overwrite").parquet(f"{target_dir}/v={batch_id}")

    return (
        events.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_psi(spark: SparkSession, target_dir: str, reference: DataFrame) -> DataFrame:
    """Per-category PSI terms of the maintained counts vs the reference
    distribution -> (category, p_ref, q_cur, psi_term). O(categories)."""
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame(
            [], "category string, p_ref double, q_cur double, psi_term double"
        )
    cur = _read_state(spark, target_dir, vs[-1], COUNTS_SCHEMA)
    tot = cur.agg(F.sum("n").alias("t"))
    q = cur.join(F.broadcast(tot)).select(
        "category", (F.col("n") / F.col("t")).alias("q")
    )
    return (
        reference.join(q, "category")
        .select(
            "category",
            F.round("p", 6).alias("p_ref"),
            F.round("q", 6).alias("q_cur"),
            F.round((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6).alias(
                "psi_term"
            ),
        )
        .orderBy("category")
    )
