#!/usr/bin/env python
"""Measure the tail trim's steady-state claim (VERDICT r12 #4): per-batch
maintenance wall time of the incremental rollup at 1x and 100x history,
WITH and WITHOUT the trim trio. The r12 design argument — the trim bounds
the per-batch ``coalesce(1)`` snapshot rewrite at O(horizon buckets) where
the untrimmed stream rewrites O(all history) forever — gets a measured
cell instead of an argued one.

    python tools/bench_trim.py [--hours 24 2400] [--batches 5] [--keep]

Method: seed a real fine-snapshot (30 s buckets x 30 (service, severity)
keys, ``n`` counts) by streaming ONE pre-aggregated history file through
the actual maintenance stream (so the seed is a bona fide ``v=0`` commit,
not a hand-built directory), then:

  untrimmed: resume the SAME stream over K small recent-event files
             (maxFilesPerTrigger=1 -> one micro-batch per file) and read
             per-batch ``triggerExecution`` durations from the query
             progress;
  trimmed:   identical, but the tail below (history end - 1 h horizon) is
             first compacted to a 300 s grain (compact_rollup_grain, grain
             marker and all) and the stream runs with the trim trio — the
             FIRST resumed batch pays the one-time trim, the rest are the
             steady state this tool reports (median of batches 2..K).

Prints ONE JSON line. Only writes under the work dir (default /tmp), and
DELETES it at exit unless --keep: the r12 session measured a 9.5 GB bench
scratch evicting the page cache and skewing every later timing.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = ("service_name", "severity_text")
BASE_EPOCH = 1_700_000_000 - (1_700_000_000 % 300)  # coarse-aligned start
SERVICES = 5
SEVERITIES = 6


def _history_frame(spark, hours: int):
    """One row per (30 s bucket, service, severity): the pre-aggregated
    history the seed batch turns into the fine snapshot. Dims derive from
    the row id (no cross join needed)."""
    from pyspark.sql import functions as F

    keys = SERVICES * SEVERITIES
    n_rows = hours * 120 * keys  # 120 thirty-second buckets per hour
    sev = F.element_at(
        F.array(*[F.lit(s) for s in ("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")]),
        ((F.col("id") % keys) % SEVERITIES + 1).cast("int"),
    )
    return spark.range(n_rows, numPartitions=32).select(
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + (F.col("id") / keys).cast("long") * 30
        ).alias("timestamp"),
        F.concat(F.lit("svc-"), (F.col("id") % SERVICES).cast("string")).alias(
            DIMS[0]
        ),
        sev.alias(DIMS[1]),
    )


def _batch_frame(spark, hist_end: int, i: int, rows: int = 2000):
    """A small micro-batch of recent events just after the history end —
    what a live 30 s ingest cadence delivers."""
    from pyspark.sql import functions as F

    return spark.range(rows).select(
        F.timestamp_seconds(
            F.lit(hist_end) + i * 30 + (F.col("id") % 30)
        ).alias("timestamp"),
        F.concat(F.lit("svc-"), (F.col("id") % SERVICES).cast("string")).alias(
            DIMS[0]
        ),
        F.when(F.col("id") % 3 == 0, "ERROR").otherwise("INFO").alias(DIMS[1]),
    )


def _run_stream(spark, src: str, target: str, ckpt: str, trim: dict | None):
    """One availableNow pass of the real maintenance stream; returns the
    per-batch triggerExecution durations (seconds) it reported."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import incremental_rollup

    schema = f"timestamp timestamp, {DIMS[0]} string, {DIMS[1]} string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        # f* glob: each batch lands as its own subdirectory (the file
        # source does not recurse into non-partition subdirs on its own)
        .parquet(os.path.join(src, "f*"))
    )
    kw = dict(trim or {})
    q = incremental_rollup(
        stream, target, ckpt, bucket="30 seconds", ts_col="timestamp",
        dim_cols=DIMS, **kw,
    )
    q.awaitTermination()
    out = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        if d.get("numInputRows", 0) > 0:
            out.append(round(d["durationMs"]["triggerExecution"] / 1000.0, 3))
    return out


def measure_cell(spark, work: str, hours: int, batches: int, trimmed: bool) -> dict:
    """Seed `hours` of history through the stream, then measure K resumed
    micro-batches (trimmed or not). Returns the cell's numbers."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup,
    )

    tag = f"{hours}h_{'trim' if trimmed else 'notrim'}"
    cell = os.path.join(work, tag)
    src = os.path.join(cell, "src")
    target = os.path.join(cell, "rollup")
    ckpt = os.path.join(cell, "ckpt")
    coarse = os.path.join(cell, "coarse")
    os.makedirs(src, exist_ok=True)

    hist_end = BASE_EPOCH + hours * 3600
    t0 = time.perf_counter()
    # ONE file: the seed must be a single micro-batch (maxFilesPerTrigger=1)
    _history_frame(spark, hours).coalesce(1).write.parquet(
        os.path.join(src, "f000_history")
    )
    gen_s = time.perf_counter() - t0

    # seed batch 0: the history becomes a real v=0 snapshot commit
    t0 = time.perf_counter()
    _run_stream(spark, src, target, ckpt, trim=None)
    seed_s = time.perf_counter() - t0

    trim_kw = None
    compact_s = None
    if trimmed:
        import datetime

        boundary_epoch = ((hist_end - 3600) // 300) * 300
        # session tz is UTC (get_spark), so the UTC-rendered naive literal
        # is the session-clock form compact_rollup_grain expects
        boundary = datetime.datetime.fromtimestamp(
            boundary_epoch, datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        t0 = time.perf_counter()
        compact_rollup_grain(
            spark, target, coarse, 30, 300, dim_cols=DIMS, older_than=boundary,
        )
        compact_s = round(time.perf_counter() - t0, 3)
        trim_kw = {
            "trim_horizon_s": 3600,
            "trim_coarse_dir": coarse,
            "trim_coarse_interval_s": 300,
        }

    for i in range(1, batches + 1):
        _batch_frame(spark, hist_end, i).coalesce(1).write.parquet(
            os.path.join(src, f"f{i:03d}_batch")
        )
    durations = _run_stream(spark, src, target, ckpt, trim=trim_kw)
    snap_rows = read_rollup(spark, target, DIMS).count()
    steady = durations[1:] if len(durations) > 1 else durations
    return {
        "history_hours": hours,
        "trimmed": trimmed,
        "snapshot_rows_after": snap_rows,
        "gen_s": round(gen_s, 3),
        "seed_batch_s": round(seed_s, 3),
        "compact_grain_s": compact_s,
        "batch_s": durations,
        "first_resumed_batch_s": durations[0] if durations else None,
        "steady_median_s": round(statistics.median(steady), 3) if steady else None,
    }


# ---------------------------------------------------------------------------
# M4 cells (r14, VERDICT r13 #1): the same steady-state measurement for the
# M4 maintenance stream. The maintained grain is a realistic PIXEL width
# (10 s — a 2,000-px panel over ~5.5 h), where 100 days of history is
# 864k fine buckets and the untrimmed per-batch coalesce(1) rewrite is the
# measured O(history) class; trimmed, the fine snapshot holds one horizon.
# ---------------------------------------------------------------------------

M4_FINE_S = 10
M4_COARSE_S = 300
M4_HORIZON_S = 3600


def _m4_history_frame(spark, hours: int):
    """One event per 10 s pixel bucket — the minimum that populates every
    fine bucket of the history."""
    from pyspark.sql import functions as F

    n_rows = hours * 360  # 360 ten-second buckets per hour
    return spark.range(n_rows, numPartitions=32).select(
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + F.col("id") * M4_FINE_S
        ).alias("timestamp"),
        F.col("id").alias("event_id"),
        ((F.col("id") * 37) % 1000).cast("double").alias("value"),
    )


def _m4_batch_frame(spark, hist_end: int, i: int, rows: int = 2000):
    from pyspark.sql import functions as F

    return spark.range(rows).select(
        F.timestamp_seconds(
            F.lit(hist_end) + i * 30 + (F.col("id") % 30)
        ).alias("timestamp"),
        (F.lit(hist_end) + i * 10_000 + F.col("id")).alias("event_id"),
        ((F.col("id") * 13) % 997).cast("double").alias("value"),
    )


def _run_m4_stream(spark, src: str, target: str, ckpt: str, trim: dict | None):
    from demo_otel_parquet_antalya_spark.streaming.sketches import incremental_m4

    schema = "timestamp timestamp, event_id bigint, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "f*"))
    )
    q = incremental_m4(
        stream, target, ckpt, ts_col="timestamp", id_col="event_id",
        value_col="value", interval_s=M4_FINE_S, **(trim or {}),
    )
    q.awaitTermination()
    out = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        if d.get("numInputRows", 0) > 0:
            out.append(round(d["durationMs"]["triggerExecution"] / 1000.0, 3))
    return out


def measure_m4_cell(spark, work: str, hours: int, batches: int, trimmed: bool) -> dict:
    """The M4 twin of measure_cell: seed `hours` of 10 s-pixel history
    through the real incremental_m4 stream, optionally compact the tail
    to 300 s pixels and resume with the trim trio, and report the
    steady-state per-batch cost."""
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        compact_m4_grain,
        read_m4,
    )

    tag = f"m4_{hours}h_{'trim' if trimmed else 'notrim'}"
    cell = os.path.join(work, tag)
    src = os.path.join(cell, "src")
    target = os.path.join(cell, "m4")
    ckpt = os.path.join(cell, "ckpt")
    coarse = os.path.join(cell, "coarse")
    os.makedirs(src, exist_ok=True)

    hist_end = BASE_EPOCH + hours * 3600
    t0 = time.perf_counter()
    _m4_history_frame(spark, hours).coalesce(1).write.parquet(
        os.path.join(src, "f000_history")
    )
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    _run_m4_stream(spark, src, target, ckpt, trim=None)
    seed_s = time.perf_counter() - t0

    trim_kw = None
    compact_s = None
    if trimmed:
        boundary_epoch = ((hist_end - M4_HORIZON_S) // M4_COARSE_S) * M4_COARSE_S
        t0 = time.perf_counter()
        compact_m4_grain(
            spark, target, coarse, M4_COARSE_S, src_interval_s=M4_FINE_S,
            older_than_epoch=boundary_epoch,
        )
        compact_s = round(time.perf_counter() - t0, 3)
        trim_kw = {
            "trim_horizon_s": M4_HORIZON_S,
            "trim_coarse_dir": coarse,
            "trim_coarse_interval_s": M4_COARSE_S,
        }

    for i in range(1, batches + 1):
        _m4_batch_frame(spark, hist_end, i).coalesce(1).write.parquet(
            os.path.join(src, f"f{i:03d}_batch")
        )
    durations = _run_m4_stream(spark, src, target, ckpt, trim=trim_kw)
    snap_rows = read_m4(spark, target).count()
    steady = durations[1:] if len(durations) > 1 else durations
    return {
        "kind": "m4",
        "history_hours": hours,
        "trimmed": trimmed,
        "snapshot_rows_after": snap_rows,
        "gen_s": round(gen_s, 3),
        "seed_batch_s": round(seed_s, 3),
        "compact_grain_s": compact_s,
        "batch_s": durations,
        "first_resumed_batch_s": durations[0] if durations else None,
        "steady_median_s": round(statistics.median(steady), 3) if steady else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=int, nargs="+", default=[24, 2400])
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--kind", nargs="+", choices=["rollup", "m4"],
                    default=["rollup", "m4"])
    ap.add_argument("--keep", action="store_true", help="keep the scratch dir")
    ap.add_argument("--work", default="/tmp/bench_trim")
    args = ap.parse_args()

    from demo_otel_parquet_antalya_spark.session import get_spark

    spark = get_spark(app_name="bench_trim")
    os.makedirs(args.work, exist_ok=True)
    cells = []
    try:
        for hours in args.hours:
            for trimmed in (False, True):
                if "rollup" in args.kind:
                    cell = measure_cell(spark, args.work, hours, args.batches, trimmed)
                    cell["kind"] = "rollup"
                    print(json.dumps(cell), file=sys.stderr)
                    cells.append(cell)
                if "m4" in args.kind:
                    cell = measure_m4_cell(
                        spark, args.work, hours, args.batches, trimmed
                    )
                    print(json.dumps(cell), file=sys.stderr)
                    cells.append(cell)
    finally:
        if not args.keep:
            shutil.rmtree(args.work, ignore_errors=True)
    print(json.dumps({
        "metric": "trim_steady_state",
        "batches_per_cell": args.batches,
        "dims_cardinality": SERVICES * SEVERITIES,
        "m4_fine_interval_s": M4_FINE_S,
        "cells": cells,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
