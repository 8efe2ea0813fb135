#!/usr/bin/env python
"""Measure dashboard-panel latency through the SQL-over-HTTP endpoint
against a synthesized logs warehouse of a chosen size (VERDICT r7 item 5:
replace SCALE.md's argued serving posture with measured numbers).

    python tools/bench_serving.py [n_logs] [work_dir]

Builds (or reuses, if work_dir already holds a warehouse for the same
n_logs) an OTLP landing -> exactly-once ingest -> partitioned warehouse,
maintains the 30 s/service_name rollup snapshot, starts the endpoint, and
times each /panels/* route over HTTP (median + p90 of `reps` requests),
plus the rollup-backed Q5 read for the raw-vs-rollup contrast. Prints ONE
JSON line. Only writes under work_dir (default under /tmp).
"""

from __future__ import annotations

import json
import multiprocessing
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORDS_PER_FILE = 4000
# the maintained rollup grain; first dim = the q5 panel's series
ROLLUP_DIMS = ("service_name", "severity_text")


def _gen_shard(args) -> None:
    shard_dir, n_files, records, seed, base_ns = args
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files

    generate_files(shard_dir, n_files=n_files, records_per_file=records,
                   seed=seed, base_ns=base_ns)


def build_warehouse(spark, work: str, n_logs: int) -> tuple[str, str]:
    """landing (parallel generation across CPUs) -> warehouse + rollup."""
    from demo_otel_parquet_antalya_spark.streaming.ingest import run_ingest_once
    from demo_otel_parquet_antalya_spark.streaming.rollup import incremental_rollup

    landing = os.path.join(work, "landing")
    warehouse = os.path.join(work, "warehouse")
    rollup = os.path.join(work, "rollup")
    # _md suffix: r10 switched the maintained rollup to the multi-dim
    # (service, severity) grain — pre-r10 work dirs hold the old snapshot
    # schema and must rebuild
    stamp = os.path.join(work, f"built_{n_logs}_md")
    if os.path.exists(stamp):
        return warehouse, rollup
    n_files = max(1, n_logs // RECORDS_PER_FILE)
    shards = min(multiprocessing.cpu_count(), n_files)
    per_shard = n_files // shards
    extra = n_files % shards
    jobs = []
    start_file = 0
    for s in range(shards):
        cnt = per_shard + (1 if s < extra else 0)
        if not cnt:
            continue
        jobs.append((
            os.path.join(landing, f"shard={s:03d}"), cnt, RECORDS_PER_FILE,
            42 + s, 1_700_000_000_000_000_000 + start_file * 60_000_000_000,
        ))
        start_file += cnt
    t0 = time.perf_counter()
    with multiprocessing.Pool(shards) as pool:
        pool.map(_gen_shard, jobs)
    gen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    # the landing layout is shard=NNN subdirs; the file stream discovers
    # them via the glob
    run_ingest_once(spark, os.path.join(landing, "*"), warehouse,
                    os.path.join(work, "ckpt"))
    ingest_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    # micro-batch ingest leaves ~4k-row files; compact to the target row
    # size BEFORE serving (the repo's own maintenance operator — this also
    # measures compaction at the chosen scale)
    from demo_otel_parquet_antalya_spark.schema import PARTITION_COLUMNS
    from demo_otel_parquet_antalya_spark.sources.compaction import compact

    # this build's single ingest is done writing -> finalize is correct
    rewritten = compact(
        spark, warehouse, list(PARTITION_COLUMNS), finalize_streaming=True
    )
    compact_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    logs_schema = spark.read.parquet(warehouse).schema
    # the finest dashboard grain: (bucket, service, severity) serves BOTH
    # the q5 time-series (severity summed out) and the q3 severity-counts
    # (buckets summed out) rollup routes from one maintained snapshot
    q = incremental_rollup(
        spark.readStream.schema(logs_schema).parquet(warehouse),
        rollup, os.path.join(work, "rollup_ckpt"),
        bucket="30 seconds", ts_col="timestamp",
        dim_cols=ROLLUP_DIMS,
    )
    q.awaitTermination()
    rollup_s = time.perf_counter() - t0
    print(json.dumps({"built": n_logs, "gen_s": round(gen_s, 1),
                      "ingest_s": round(ingest_s, 1),
                      "compacted_partitions": rewritten,
                      "compact_s": round(compact_s, 1),
                      "rollup_s": round(rollup_s, 1)}), file=sys.stderr)
    open(stamp, "w").close()
    return warehouse, rollup


def _time_http(url: str, reps: int) -> dict:
    lat = []
    rows = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        with urllib.request.urlopen(url, timeout=600) as r:
            body = json.load(r)
        lat.append(time.perf_counter() - t0)
        rows = body.get("row_count", 0)
    lat.sort()
    return {
        "median_s": round(statistics.median(lat), 3),
        "p90_s": round(lat[max(0, int(len(lat) * 0.9) - 1)], 3),
        "rows": rows,
    }


def main() -> None:
    n_logs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    work = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/bench_serving_{n_logs}"
    reps = int(os.environ.get("SPARK_GRAFT_SERVING_REPS", "5"))
    os.makedirs(work, exist_ok=True)

    from demo_otel_parquet_antalya_spark.serving import start_sql_endpoint
    from demo_otel_parquet_antalya_spark.session import get_spark

    spark = get_spark(app_name=f"bench_serving_{n_logs}")
    warehouse, rollup = build_warehouse(spark, work, n_logs)

    server = start_sql_endpoint(
        spark, "/root/testdata/sf0.001", port=0, logs_dir=warehouse,
        rollup_dir=rollup, rollup_dims=ROLLUP_DIMS, request_timeout_s=600.0,
    )
    host, port = server.server_address
    base = f"http://{host}:{port}"

    # the Grafana case: a dashboard window over the newest hour — must
    # prune partition DIRECTORIES via facade.time_filter's derived
    # predicates, so its cost tracks the window, not the history
    hi = spark.read.parquet(warehouse).selectExpr("max(timestamp) AS m").first()[0]
    import datetime
    import urllib.parse

    lo = hi - datetime.timedelta(hours=1)
    window = urllib.parse.urlencode(
        {"interval": 30, "start": lo.isoformat(sep=" "), "end": hi.isoformat(sep=" ")}
    )

    # raw rows pin ?source=raw (r11: plain panel requests auto-route to
    # the production path by default, so an unpinned "raw" row would
    # silently measure the rollup/pruned route and the 1x-vs-100x growth
    # comparison would be meaningless)
    panels = {
        "q1_projection": "/panels/q1_projection",
        "q5_windowed_1h": f"/panels/q5_timeseries?{window}&source=raw",
        "q2_recent_logs": "/panels/q2_recent_logs?limit=10&source=raw",
        # tail pruning: newest-N reads the newest hour directories only
        "q2_recent_pruned": "/panels/q2_recent_logs?limit=10&source=pruned",
        "q3_severity_counts": "/panels/q3_severity_counts?source=raw",
        "q5_timeseries_raw": "/panels/q5_timeseries?interval=30&source=raw",
        "q6_log_panel": "/panels/q6_log_panel?limit=1000&source=raw",
        # tail pruning from the OLDEST end: oldest-N reads the oldest
        # hour directories only
        "q6_pruned": "/panels/q6_log_panel?limit=1000&source=pruned",
        "q6_adhoc_filtered": (
            "/panels/q6_log_panel?limit=1000&source=raw"
            "&filter=severity_text=ERROR"
        ),
        # the production routing: panels served from the maintained
        # multi-dim rollup snapshot, over the SAME HTTP paths as raw
        "q5_timeseries_rollup": "/panels/q5_timeseries?source=rollup",
        "q3_severity_rollup": "/panels/q3_severity_counts?source=rollup",
        "q5_rollup_adhoc_sev": (
            "/panels/q5_timeseries?source=rollup&filter=severity_text=ERROR"
        ),
        # what a provisioned Grafana actually sends: no ?source= — the
        # r11 default routing must land these on the flat path
        "q5_default_auto": "/panels/q5_timeseries",
        "q3_default_auto": "/panels/q3_severity_counts",
        "q2_default_auto": "/panels/q2_recent_logs?limit=10",
    }
    results = {}
    for name, path in panels.items():
        results[name] = _time_http(base + path, reps)

    # mixed-grain serving (r12): compact the rollup tail older than one
    # hour before the data's end to a 300 s grain and serve the spanned
    # union from a SECOND endpoint — the first endpoint's rollup rows
    # keep their single-snapshot meaning. The spanned rows measure the
    # steady-state production layout (fine recent + coarse tail).
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup,
    )
    from pyspark.sql import functions as F

    mn, mx = (
        read_rollup(spark, rollup, ROLLUP_DIMS)
        .agg(
            F.min(F.unix_timestamp("bucket")),
            F.max(F.unix_timestamp("bucket")),
        )
        .first()
    )
    # tail = everything older than 1 h before the data's end, but never
    # past the data's start: at spans under ~1 h (the 200k default covers
    # ~49 min) the old mx-3600 boundary predated ALL buckets, the coarse
    # tail compacted to 0 rows, and the "spanned" rows silently measured
    # a fine-only read (code-review r12, third pass) — fall back to the
    # mid-span cut so the union always has both sides
    cut = max(int(mx) - 3600, int(mn) + (int(mx) - int(mn)) // 2)
    boundary_epoch = (cut // 300) * 300
    # session tz is UTC (get_spark), so a UTC-rendered naive literal is
    # the session-clock form compact/serving expect
    boundary = datetime.datetime.fromtimestamp(
        boundary_epoch, datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    coarse_dir = os.path.join(work, "rollup_tail")
    t0 = time.perf_counter()
    coarse_rows = compact_rollup_grain(
        spark, rollup, coarse_dir, 30, 300,
        dim_cols=ROLLUP_DIMS, older_than=boundary,
    )
    compact_grain_s = time.perf_counter() - t0
    spanned_server = start_sql_endpoint(
        spark, "/root/testdata/sf0.001", port=0, logs_dir=warehouse,
        rollup_dir=rollup, rollup_dims=ROLLUP_DIMS,
        rollup_coarse_dir=coarse_dir, rollup_coarse_interval_s=300,
        rollup_boundary=boundary, request_timeout_s=600.0,
    )
    shost, sport = spanned_server.server_address
    sbase = f"http://{shost}:{sport}"
    spanned_panels = {
        # zoomed-out Grafana ask at a coarse multiple: spanned exact
        "q5_spanned_300_auto": "/panels/q5_timeseries?interval=300",
        "q5_spanned_900": "/panels/q5_timeseries?interval=900&source=rollup",
        # full-history severity counts across the grain mix
        "q3_spanned_auto": "/panels/q3_severity_counts",
    }
    for name, path in spanned_panels.items():
        results[name] = _time_http(sbase + path, reps)
    spanned_server.shutdown()

    # maintained-state panels (r13): the M4 downsample and the HLL/KLL
    # approx panel read O(state rows) per refresh by construction — these
    # rows record the measured constant next to the rollup rows above.
    # States are maintained once per work dir (stamped like the warehouse)
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        incremental_m4,
        incremental_sketches,
    )

    m4_dir = os.path.join(work, "m4")
    sk_dir = os.path.join(work, "sketches")
    state_stamp = os.path.join(work, "states_built")
    t0 = time.perf_counter()
    if not os.path.exists(state_stamp):
        logs_schema = spark.read.parquet(warehouse).schema
        incremental_m4(
            spark.readStream.schema(logs_schema).parquet(warehouse),
            m4_dir, os.path.join(work, "m4_ckpt"),
            ts_col="timestamp", id_col="trace_id", value_col="severity_number",
        ).awaitTermination()
        incremental_sketches(
            spark.readStream.schema(logs_schema).parquet(warehouse),
            sk_dir, os.path.join(work, "sk_ckpt"),
            ts_col="timestamp", user_col="trace_id", value_col="severity_number",
        ).awaitTermination()
        open(state_stamp, "w").close()
    m4_build_s = time.perf_counter() - t0
    state_server = start_sql_endpoint(
        spark, "/root/testdata/sf0.001", port=0,
        m4_dir=m4_dir, sketch_dir=sk_dir, request_timeout_s=600.0,
    )
    thost, tport = state_server.server_address
    tbase = f"http://{thost}:{tport}"
    for name, path in {
        "m4_downsample_7200": "/panels/m4_downsample?interval=7200",
        "approx_rollup_3600": "/panels/approx_rollup?interval=3600",
        "approx_rollup_86400": "/panels/approx_rollup?interval=86400",
    }.items():
        results[name] = _time_http(tbase + path, reps)
    state_server.shutdown()

    raw_rows = spark.read.parquet(warehouse).count()
    # snapshot growth check (VERDICT r9 #5): the per-batch rewrite is a
    # coalesce(1) overwrite of the whole key space, so record its size —
    # bounded by buckets x services x severities, NOT by raw volume
    from demo_otel_parquet_antalya_spark.streaming.rollup import read_rollup

    rollup_rows = read_rollup(spark, rollup, ROLLUP_DIMS).count()
    server.shutdown()
    print(json.dumps({
        "metric": "serving_panel_latency",
        "n_logs": raw_rows,
        "rollup_snapshot_rows": rollup_rows,
        "rollup_dims": list(ROLLUP_DIMS),
        "reps": reps,
        "panels": results,
        "spanned_boundary": boundary,
        "coarse_tail_rows": coarse_rows,
        "compact_grain_s": round(compact_grain_s, 2),
        "state_build_s": round(m4_build_s, 2),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
