"""Continuously-maintained sketch states: distinct-users (HLL) and value
quantiles (KLL) per hour, kept as MERGEABLE BINARY STATES in the versioned
snapshot layout.

The batch queries (approx_hll_rollup_merge, approx_kll_quantile_rollup)
show the read side: daily answers from hourly states without rescanning
raw events. This module is the write side a live pipeline needs: each
micro-batch sketches ITS rows (one map-side-combined aggregate), then the
new states merge with the prior snapshot's states via the sketch-union
aggregates — datasketches states are associative/commutative, so the
merged state equals the state a single pass over all data would have
built (within the sketch's published error), and snapshot size stays
bounded by hour-key cardinality times sketch size, independent of stream
volume.

Replay discipline is rollup.py's: a batch writes snapshot ``v=<batch_id>``
merged from the newest snapshot with a SMALLER id, so crash-replays
converge instead of double-merging. (HLL union is idempotent outright;
KLL merge is not, so the versioned-base rule is what carries exactly-once
semantics for it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.rollup import (
    _check_retain,
    _commit_snapshot,
    _versions,
)

SKETCH_SCHEMA = "hour timestamp, hll binary, kll binary"


def read_sketches(spark: SparkSession, target_dir: str) -> DataFrame:
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], SKETCH_SCHEMA)
    return spark.read.schema(SKETCH_SCHEMA).parquet(f"{target_dir}/v={vs[-1]}")


def sketch_estimates(states: DataFrame) -> DataFrame:
    """Read hourly states out as answers: distinct users + p50/p95."""
    return states.select(
        "hour",
        F.expr("CAST(hll_sketch_estimate(hll) AS BIGINT)").alias("approx_users"),
        F.round(F.expr("kll_sketch_get_quantile_double(kll, 0.5)"), 6).alias("p50"),
        F.round(F.expr("kll_sketch_get_quantile_double(kll, 0.95)"), 6).alias("p95"),
    )


def _sketch_batch(df: DataFrame, ts_col: str, user_col: str, value_col: str) -> DataFrame:
    return df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour")).agg(
        F.expr(f"hll_sketch_agg({user_col})").alias("hll"),
        F.expr(f"kll_sketch_agg_double({value_col}, 256)").alias("kll"),
    )


def incremental_sketches(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
    retain_versions: int | None = 3,
):
    """Start the sketch-maintenance stream; returns the StreamingQuery.
    ``retain_versions`` vacuums all but the newest N snapshot versions
    after each commit (rollup.vacuum_versions' replay-safety rule)."""
    _check_retain(retain_versions)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = _sketch_batch(batch_df, ts_col, user_col, value_col)
        prior_vs = [v for v in _versions(spark, target_dir) if v < batch_id]
        if prior_vs:
            prior = spark.read.schema(SKETCH_SCHEMA).parquet(
                f"{target_dir}/v={prior_vs[-1]}"
            )
            merged = (
                prior.unionByName(inc)
                .groupBy("hour")
                .agg(
                    F.expr("hll_union_agg(hll)").alias("hll"),
                    F.expr("kll_merge_agg_double(kll, 256)").alias("kll"),
                )
            )
        else:
            merged = inc
        _commit_snapshot(merged, target_dir, batch_id, retain_versions)

    keyed = events.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Continuous M4 downsampling state: first/min/max/last per time bucket are
# all re-aggregable (min/max outright; first/last by carrying their
# (ts, tiebreak) argument keys), so the pixel-perfect dashboard reduction
# can be maintained per micro-batch in the same versioned layout — a
# Grafana panel then reads ~2k tiny rows, never raw events.
# ---------------------------------------------------------------------------

M4_SCHEMA = (
    "bucket long, k_first string, v_first double, v_min double, "
    "v_max double, k_last string, v_last double"
)


def _m4_batch(df: DataFrame, ts_col: str, id_col: str, value_col: str) -> DataFrame:
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
    # orderable composite key for first/last: zero-padded epoch-micros + id
    key = F.concat_ws(
        "#",
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )
    return (
        df.select(bucket.alias("bucket"), key.alias("k"), F.col(value_col).alias("v"))
        .groupBy("bucket")
        .agg(
            F.expr("min_by(k, k)").alias("k_first"),
            F.expr("min_by(v, k)").alias("v_first"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.expr("max_by(k, k)").alias("k_last"),
            F.expr("max_by(v, k)").alias("v_last"),
        )
    )


def _m4_merge(states: DataFrame) -> DataFrame:
    return states.groupBy("bucket").agg(
        F.expr("min_by(k_first, k_first)").alias("k_first"),
        F.expr("min_by(v_first, k_first)").alias("v_first"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
        F.expr("max_by(k_last, k_last)").alias("k_last"),
        F.expr("max_by(v_last, k_last)").alias("v_last"),
    )


def read_m4(spark: SparkSession, target_dir: str) -> DataFrame:
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], M4_SCHEMA)
    return spark.read.schema(M4_SCHEMA).parquet(f"{target_dir}/v={vs[-1]}")


def incremental_m4(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
    retain_versions: int | None = 3,
):
    """Maintain the M4 dashboard reduction continuously; returns the
    query. ``retain_versions`` as in ``incremental_sketches``."""
    _check_retain(retain_versions)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = _m4_batch(batch_df, ts_col, id_col, value_col)
        prior_vs = [v for v in _versions(spark, target_dir) if v < batch_id]
        if prior_vs:
            prior = spark.read.schema(M4_SCHEMA).parquet(
                f"{target_dir}/v={prior_vs[-1]}"
            )
            merged = _m4_merge(prior.unionByName(inc))
        else:
            merged = inc
        _commit_snapshot(merged, target_dir, batch_id, retain_versions)

    keyed = events.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
