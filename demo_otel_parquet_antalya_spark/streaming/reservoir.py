"""Continuously-maintained deterministic uniform sample of a stream.

A uniform size-k sample of everything seen so far = the k rows with the
smallest md5(key) — a pure function of the data (the same Efraimidis-
Spirakis-by-hash trick as the batch ``sample_weighted_es``), so it can be
maintained incrementally with NO randomness coordination: each micro-batch
contributes its own top-k candidates, and merging two candidate sets is
just re-taking the k smallest. Associative + commutative + idempotent ⇒
replayed batches cannot corrupt the sample.

State discipline mirrors ``streaming/rollup.py``: the merged sample lands
as a versioned snapshot dir ``v=<batch_id>``; a replayed batch merges the
snapshot strictly BEFORE its id and overwrites its own version — exactly-
once output on plain parquet. Snapshot size is k rows by construction, so
the merge is trivially broadcast-sized at any traffic volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.rollup import (
    _read_state,
    _refuse_stale_writer,
    _versions,
)


def _sample_schema(key_col: str, payload_cols: list[str], weighted: bool = False) -> str:
    cols = ", ".join([f"{key_col} long"] + [f"{c} string" for c in payload_cols])
    return f"{cols}, __sk {'double' if weighted else 'string'}"


def batch_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    payload_cols: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """The batch twin — TakeOrderedAndProject, per-partition heaps, k-row
    driver merge. Uniform (default): the k smallest md5(key) rows. Weighted
    (``weight_col``): the k LARGEST Efraimidis-Spirakis keys
    ln(u)/w with u derived from md5(key) — the same pure-function-of-the-
    data trick as the batch ``sample_weighted_es`` query, so inclusion
    probability tracks the weight with zero RNG coordination."""
    base = [
        F.col(key_col).cast("long").alias(key_col),
        *[F.col(c).cast("string").alias(c) for c in payload_cols],
    ]
    if weight_col is None:
        return (
            df.select(*base, F.md5(F.col(key_col).cast("string")).alias("__sk"))
            .orderBy("__sk", key_col)
            .limit(k)
        )
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("long")
        + 0.5
    ) / 4294967296.0
    es_key = F.log(u) / F.col(weight_col).cast("double")
    # Efraimidis-Spirakis requires w > 0: w = 0 divides to -Inf (row could
    # never be sampled) and w < 0 flips the key positive so the row always
    # wins — both silently corrupt the sample, so such rows are excluded
    # up front (ADVICE r4 #4)
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select(*base, es_key.alias("__sk"))
        .orderBy(F.col("__sk").desc(), key_col)
        .limit(k)
    )


def read_sample(
    spark: SparkSession,
    target_dir: str,
    key_col: str,
    payload_cols: list[str],
    weighted: bool = False,
) -> DataFrame:
    vs = _versions(spark, target_dir)
    schema = _sample_schema(key_col, payload_cols, weighted)
    if not vs:
        return spark.createDataFrame([], schema)
    return _read_state(spark, target_dir, vs[-1], schema)


def incremental_sample(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    k: int = 100,
    key_col: str = "event_id",
    payload_cols: list[str] | None = None,
    weight_col: str | None = None,
):
    """Start the sample-maintenance stream; returns the StreamingQuery.
    With ``weight_col``, maintains the WEIGHTED (Efraimidis-Spirakis)
    sample instead — same associative/idempotent top-k-by-key merge, keys
    ordered descending."""
    payload = payload_cols or []
    schema = _sample_schema(key_col, payload, weighted=weight_col is not None)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cand = batch_sample(batch_df, k, key_col, payload, weight_col)
        vs_all = _versions(spark, target_dir)
        _refuse_stale_writer(target_dir, batch_id, vs_all)
        prior_vs = [v for v in vs_all if v < batch_id]
        if prior_vs:
            prior = _read_state(spark, target_dir, prior_vs[-1], schema)
            order = F.col("__sk").desc() if weight_col is not None else F.col("__sk")
            cand = prior.unionByName(cand).orderBy(order, key_col).limit(k)
        cand.coalesce(1).write.mode("overwrite").parquet(f"{target_dir}/v={batch_id}")

    return (
        events.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
