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

Snapshot size is bounded by key cardinality — buckets × the product of
the maintained dimension cardinalities — so the merge is broadcast-sized
at any traffic volume; raw events are never re-read. One snapshot at the
finest dashboard grain serves EVERY panel that is a re-aggregation of it
(r10, VERDICT r9 #2): maintained at (bucket, service, severity), the
time-series panel sums over severity and the severity-counts panel sums
over buckets — both exact, because counts re-aggregate. The cardinality
bound is the thing to watch when adding dimensions: services × severities
(~tens × ~6) multiplies the per-bucket row count, and the per-batch
snapshot rewrite is a ``coalesce(1)`` overwrite of that whole key space —
fine at dashboard-dimension cardinalities (SCALE.md records the measured
snapshot size and maintenance cost at 100×), wrong for a high-cardinality
key like user_id (that is a different operator: partitioned state, not a
single-file snapshot).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_DIMS = ("event_type",)


def rollup_schema(dim_cols: tuple = DEFAULT_DIMS) -> str:
    """The snapshot schema for a rollup maintained over ``dim_cols``.
    Dimensions are ``string`` BY CONTRACT: the maintenance stream casts
    every dimension to string at write (dashboard dimensions — service,
    severity, event type — already are; an int-ish dimension like an
    http status groups identically through its string form), and
    ``_read_version`` casts stored dimensions to string at read (a no-op
    on contract-written snapshots, a self-healing migration for
    pre-contract ones written from a non-string column), so the
    empty-snapshot frame, the committed snapshots, and every reader
    agree on one typing regardless of the source column's type."""
    dims = ", ".join(f"{d} string" for d in dim_cols)
    return f"bucket timestamp, {dims}, n long"


# the original single-dimension contract (generic ``event_type`` name);
# kept because existing snapshots and callers read through it
ROLLUP_SCHEMA = rollup_schema()


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


def read_rollup(
    spark: SparkSession, target_dir: str, dim_cols: tuple = DEFAULT_DIMS
) -> DataFrame:
    """Latest committed snapshot (empty frame if none yet). ``dim_cols``
    must be the tuple the rollup is MAINTAINED with (the snapshot's own
    column names for a multi-dimension rollup; the generic ``event_type``
    default for the single-dimension form) — VALIDATED against the
    snapshot's actual columns, because schema-on-read would fill a
    mis-claimed dimension with NULLs and the panel would serve silently
    wrong all-null groups instead of the promised error (code-review r10,
    confirmed live with a single-dim snapshot read as two-dim)."""
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], rollup_schema(dim_cols))
    return _read_version(spark, target_dir, vs[-1], dim_cols)


def _read_version(
    spark: SparkSession, target_dir: str, version: int, dim_cols: tuple
) -> DataFrame:
    snap = spark.read.parquet(f"{target_dir}/v={version}")
    want = ["bucket", *dim_cols, "n"]
    if set(snap.columns) != set(want):
        raise ValueError(
            f"rollup snapshot at {target_dir!r} has columns "
            f"{sorted(snap.columns)}, not the claimed {sorted(want)} — "
            "pass the dim_cols the rollup is maintained with"
        )
    # bucket/n types ARE validated — any snapshot this library ever wrote
    # has a timestamp bucket and an integral n, so a mismatch means the
    # directory holds some other tool's parquet, and casting would turn
    # its n into silent NULL counts that the merge writes forward into
    # every later version (code-review r10, pass 4)
    types = {f.name: f.dataType.simpleString() for f in snap.schema.fields}
    # ntz accepted: F.window() yields timestamp_ntz when the event-time
    # column is TIMESTAMP_NTZ, and this library wrote such snapshots
    # (code-review r10, pass 5 — rejecting them would brick the stream)
    if types["bucket"] not in ("timestamp", "timestamp_ntz") or types["n"] not in (
        "tinyint", "smallint", "int", "bigint",
    ):
        raise ValueError(
            f"rollup snapshot at {target_dir!r} has bucket:{types['bucket']}"
            f" / n:{types['n']} — not a snapshot this rollup wrote"
        )
    # DIMS are cast rather than rejected: raising would permanently brick
    # a snapshot written before the string-dim contract (the maintenance
    # merge reads the prior version through here too, so the restarted
    # stream would fail every batch); stringification is total, so the
    # cast is a no-op on contract snapshots and a lossless migration
    # otherwise (code-review r10, pass 3)
    return snap.select(
        "bucket",
        *[F.col(d).cast("string").alias(d) for d in dim_cols],
        F.col("n").cast("long").alias("n"),
    )


def incremental_rollup(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    bucket: str = "1 minute",
    ts_col: str = "ts",
    dim_col: str = "event_type",
    dim_cols: tuple | None = None,
    watermark_delay: str = "10 minutes",
):
    """Start the maintenance stream; returns the StreamingQuery.

    ``events`` is a streaming DataFrame with event-time ``ts_col``.
    Dimensions: pass ``dim_cols`` (a tuple of column names, r10) to
    maintain a multi-dimension snapshot under the columns' OWN names —
    the finest grain serves every coarser panel by exact re-aggregation.
    The single ``dim_col`` form (stored under the generic name
    ``event_type``) is the original contract and stays for existing
    snapshots; readers must pass the matching ``dim_cols`` to
    ``read_rollup``.
    """
    if dim_cols is None:
        dims = DEFAULT_DIMS
        keys = [F.col(dim_col).cast("string").alias("event_type")]
    else:
        dims = tuple(dim_cols)
        # cast, not assume: the snapshot contract types dimensions string
        # (rollup_schema), and the empty-snapshot frame already does — a
        # non-string source column would otherwise commit a snapshot that
        # type-checks differently from the pre-commit empty frame
        keys = [F.col(d).cast("string").alias(d) for d in dims]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = (
            batch_df.groupBy(
                F.window(F.col(ts_col), bucket).getField("start").alias("bucket"),
                *keys,
            )
            .agg(F.count("*").alias("n"))
        )
        # merge with the snapshot strictly BEFORE this batch id, so a
        # replayed batch merges the same base it did the first time;
        # _read_version validates the prior snapshot's columns, so a
        # maintenance stream restarted with DIFFERENT dims over an old
        # target_dir fails loudly instead of merging NULL dimensions
        prior_vs = [v for v in _versions(spark, target_dir) if v < batch_id]
        if prior_vs:
            prior = _read_version(spark, target_dir, prior_vs[-1], dims)
            merged = (
                prior.unionByName(inc)
                .groupBy("bucket", *dims)
                .agg(F.sum("n").cast("long").alias("n"))
            )
        else:
            merged = inc.select("bucket", *dims, F.col("n").cast("long").alias("n"))
        merged.coalesce(1).write.mode("overwrite").parquet(f"{target_dir}/v={batch_id}")

    keyed = events.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
