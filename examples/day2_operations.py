#!/usr/bin/env python
"""Day-2 operations walkthrough: everything that keeps the lake healthy
AFTER ingest works — the maintenance lifecycle the reference leaves to its
operators, run end to end on synthetic traffic.

    python examples/day2_operations.py

1. land traffic -> partitioned warehouse + registry snapshot
2. continuous rollup maintenance + the dashboard read ROUTED through it
3. small-file report -> compaction
4. inject a torn parquet file -> resilient scan + distributed footer audit
5. reprocess one hour with partition-scoped dynamic backfill
6. registry snapshot diff, retention (expire), orphan vacuum
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.plans import facade
from demo_otel_parquet_antalya_spark.session import get_spark
from demo_otel_parquet_antalya_spark.sources import quarantine
from demo_otel_parquet_antalya_spark.sources.compaction import compact, small_file_report
from demo_otel_parquet_antalya_spark.sources.generator import generate_files
from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json
from demo_otel_parquet_antalya_spark.sources.parquet_sink import (
    backfill_logs,
    read_logs,
    write_logs,
)
from demo_otel_parquet_antalya_spark.sources.registry import LogTableRegistry
from demo_otel_parquet_antalya_spark.streaming.rollup import incremental_rollup


def main() -> None:
    spark = get_spark(app_name="day2-operations")
    work = tempfile.mkdtemp(prefix="day2_")
    otlp, wh = f"{work}/otlp", f"{work}/warehouse"

    print("== 1. land traffic ==")
    generate_files(otlp, n_files=6, records_per_file=80)
    logs = ingest_otlp_json(spark, otlp)
    write_logs(logs, wh)
    reg = LogTableRegistry(spark, wh)
    print(f"synced {len(reg.sync())} files; snapshot {reg.current_snapshot_id()}")

    print("\n== 2. rollup maintenance + routed dashboard read ==")
    land = f"{work}/flat"
    logs.write.parquet(land)
    stream = spark.readStream.schema(logs.schema).parquet(land)
    dims = ("service_name", "severity_text")  # finest dashboard grain
    incremental_rollup(
        stream, f"{work}/rollup", f"{work}/ckpt",
        bucket="30 seconds", ts_col="timestamp", dim_cols=dims,
    ).awaitTermination()
    routed = facade.q5_timeseries_from_rollup(spark, f"{work}/rollup", dim_cols=dims)
    raw = facade.q5_timeseries(read_logs(spark, wh), interval_seconds=30)
    assert sorted(map(tuple, routed.collect())) == sorted(map(tuple, raw.collect()))
    routed3 = facade.q3_severity_counts_from_rollup(spark, f"{work}/rollup", dims)
    raw3 = facade.q3_severity_counts(read_logs(spark, wh))
    assert sorted(map(tuple, routed3.collect())) == sorted(map(tuple, raw3.collect()))
    print(f"routed q5+q3 == raw scans ({routed.count()} buckets), no raw rescan")

    print("\n== 2b. snapshot retention + grain compaction + spanned read ==")
    # retention already ran inside the maintenance stream (retain_versions=3
    # vacuums all but the newest snapshot copies after every commit); the
    # year-horizon bound is the GRAIN: compact the tail to 5 m buckets and
    # serve the steady-state layout (fine recent + coarse tail) end-to-end
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _versions,
        compact_rollup_grain,
    )

    kept = _versions(spark, f"{work}/rollup")
    print(f"retention: {len(kept)} snapshot version(s) on disk (<= retain_versions)")
    # generator traffic starts at epoch 1.7e9 and lands 60 s apart; split
    # two minutes in (coarse-aligned: 1_700_000_100 % 300 == 0)
    boundary = "2023-11-14 22:15:00"
    n_coarse = compact_rollup_grain(
        spark, f"{work}/rollup", f"{work}/rollup_tail", 30, 300,
        dim_cols=dims, older_than=boundary,
    )
    spanned5 = facade.q5_timeseries_from_spanned_rollup(
        spark, f"{work}/rollup", f"{work}/rollup_tail", boundary,
        interval_seconds=300, fine_interval_s=30, coarse_interval_s=300,
        dim_cols=dims,
    )
    raw300 = facade.q5_timeseries(read_logs(spark, wh), interval_seconds=300)
    assert sorted(map(tuple, spanned5.collect())) == sorted(map(tuple, raw300.collect()))
    spanned3 = facade.q3_severity_counts_from_spanned_rollup(
        spark, f"{work}/rollup", f"{work}/rollup_tail", boundary, 30, 300, dims
    )
    assert sorted(map(tuple, spanned3.collect())) == sorted(map(tuple, raw3.collect()))
    print(f"compacted tail -> {n_coarse} coarse rows; spanned q5@300s and "
          "q3 == raw scans across the fine/coarse boundary")

    print("\n== 2c. tail trim: the fine snapshot stays bounded ==")
    # fresh traffic arrives; the maintenance stream now TRIMS its tail up
    # to what the coarse snapshot provably covers, recording the boundary
    # with the committed version — serving follows it via boundary="auto",
    # so the split advances without a config flag day
    from demo_otel_parquet_antalya_spark.streaming.rollup import read_trim_boundary

    generate_files(f"{work}/otlp2", n_files=2, records_per_file=40,
                   base_ns=1_700_000_400_000_000_000)
    ingest_otlp_json(spark, f"{work}/otlp2").write.mode("append").parquet(land)
    incremental_rollup(
        spark.readStream.schema(logs.schema).parquet(land),
        f"{work}/rollup", f"{work}/ckpt",
        bucket="30 seconds", ts_col="timestamp", dim_cols=dims,
        trim_horizon_s=120, trim_coarse_dir=f"{work}/rollup_tail",
        trim_coarse_interval_s=300,
    ).awaitTermination()
    tb = read_trim_boundary(spark, f"{work}/rollup")
    spanned_auto = facade.q5_timeseries_from_spanned_rollup(
        spark, f"{work}/rollup", f"{work}/rollup_tail", "auto",
        interval_seconds=300, fine_interval_s=30, coarse_interval_s=300,
        dim_cols=dims,
    )
    flat_all = facade.q5_timeseries(spark.read.parquet(land), interval_seconds=300)
    assert sorted(map(tuple, spanned_auto.collect())) == sorted(map(tuple, flat_all.collect()))
    print(f"trim boundary recorded at epoch {tb[0]} (align {tb[1]}s); "
          "spanned read with boundary='auto' == raw over all traffic")

    # the steady-state CADENCE (r14): compaction runs again after the trim
    # — the destination carries its prior tail forward for the buckets the
    # trimmed fine snapshot no longer holds, so repeated compact->trim
    # cycles never lose history
    compact_rollup_grain(
        spark, f"{work}/rollup", f"{work}/rollup_tail", 30, 300,
        dim_cols=dims,
    )
    spanned_again = facade.q5_timeseries_from_spanned_rollup(
        spark, f"{work}/rollup", f"{work}/rollup_tail", "auto",
        interval_seconds=300, fine_interval_s=30, coarse_interval_s=300,
        dim_cols=dims,
    )
    assert sorted(map(tuple, spanned_again.collect())) == sorted(
        map(tuple, flat_all.collect())
    )
    print("re-compaction after the trim: prior tail carried forward, "
          "spanned read still == raw")

    print("\n== 2d. M4 downsample maintenance + panel read (r13) ==")
    # the pixel-perfect dashboard reduction (first/min/max/last of
    # severity_number per hour bucket) maintained continuously, then
    # served as a panel frame at any multiple of the maintained grain —
    # equal to direct M4 over the raw warehouse, without rescanning it
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        incremental_m4,
        m4_panel,
        m4_remerge,
    )
    from pyspark.sql import functions as F

    incremental_m4(
        spark.readStream.schema(logs.schema).parquet(land),
        f"{work}/m4", f"{work}/m4_ckpt",
        ts_col="timestamp", id_col="trace_id", value_col="severity_number",
    ).awaitTermination()
    panel = m4_panel(spark, f"{work}/m4", interval_s=7200)
    direct = (
        m4_remerge(
            _m4_with_start(
                _m4_batch(spark.read.parquet(land), "timestamp", "trace_id",
                          "severity_number"),
                3600,
            ),
            7200,
        )
        .select(
            F.timestamp_seconds("bucket_start").alias("t"),
            "v_first", "v_min", "v_max", "v_last",
        )
    )
    assert sorted(map(tuple, panel.collect())) == sorted(map(tuple, direct.collect()))
    print(f"m4 panel @7200s: {panel.count()} pixel rows == direct M4 over raw "
          "(serving: /panels/m4_downsample)")

    print("\n== 3. small files -> compaction ==")
    part_cols = ["service_name", "year", "month", "day", "hour"]
    n_parts = small_file_report(spark, wh, part_cols, target_rows_per_file=200).count()
    n = compact(spark, wh, part_cols, target_rows_per_file=200, min_excess_files=1)
    spark.catalog.refreshByPath(wh)  # drop cached file listings of rewritten partitions
    print(f"{n_parts} partitions reported, {n} rewritten")

    print("\n== 3b. raw retention: expire whole hour partitions (r13) ==")
    # the raw warehouse itself gets a horizon: whole-directory deletes at
    # the hour grain, dry-run first, no rewrite; the boundary (partial)
    # hour and any NULL-timestamp partition always survive
    from demo_otel_parquet_antalya_spark.sources.retention import expire_partitions

    # land one batch of two-hours-older traffic so there IS a whole hour
    # beyond the horizon (the demo's main traffic spans a single hour)
    generate_files(f"{work}/otlp_old", n_files=1, records_per_file=20,
                   base_ns=1_700_000_000_000_000_000 - 7_200_000_000_000)
    write_logs(ingest_otlp_json(spark, f"{work}/otlp_old"), wh)
    spark.catalog.refreshByPath(wh)
    hi_ts = spark.read.parquet(wh).agg({"timestamp": "max"}).first()[0]
    cutoff = hi_ts.replace(minute=0, second=0, microsecond=0)
    doomed = expire_partitions(spark, wh, cutoff)  # dry run
    assert doomed  # the old hour qualifies
    before = spark.read.option("basePath", wh).parquet(wh).count()
    gone = expire_partitions(spark, wh, cutoff, dry_run=False)
    assert gone == doomed
    left = spark.read.option("basePath", wh).parquet(wh)
    assert left.count() < before
    assert left.filter(F.col("timestamp") < F.lit(cutoff)).count() == left.filter(
        F.col("timestamp").isNull()
    ).count()  # only the (absent here) NULL rows may predate the cutoff
    print(f"expired {len(gone)} hour partition(s) before {cutoff}; "
          f"{left.count()} rows remain (boundary hour kept whole)")
    spark.catalog.refreshByPath(wh)

    print("\n== 4. corruption quarantine ==")
    svc_dir = next(
        os.path.join(r, d) for r, ds, _ in os.walk(wh) for d in ds if d.startswith("hour=")
    )
    with open(os.path.join(svc_dir, "torn-upload.parquet"), "wb") as f:
        f.write(b"PAR1" + b"\x00" * 64)
    healthy = quarantine.read_parquet_resilient(
        spark, wh, read_logs(spark, wh.rstrip("/")).schema
    )
    bad = quarantine.quarantined_files(spark, f"{wh}/*/*/*/*/*")
    print(f"resilient scan still sees {healthy.count()} rows; "
          f"audit flagged {bad.count()} file(s):")
    bad.select("path", "error").show(truncate=60)

    print("== 5. backfill one hour (dynamic partition overwrite) ==")
    target_hour = logs.select(F.hour("timestamp").alias("h")).first().h
    fixed = logs.filter(F.hour("timestamp") == target_hour).withColumn(
        "body", F.concat(F.col("body"), F.lit(" [reprocessed]"))
    )
    backfill_logs(fixed, wh)
    got = read_logs(spark, wh).filter(F.col("hour") == target_hour)
    print(f"hour={target_hour}: {got.count()} rows reprocessed, other partitions untouched")

    print("\n== 6. registry snapshot lifecycle ==")
    reg.sync()  # registers compaction/backfill outputs as a new snapshot
    snaps = reg.snapshots()
    d = reg.diff_snapshots(snaps[0]["snapshot_id"])
    print(f"{len(snaps)} snapshots; diff vs first: "
          f"+{len(d['added_files'])} files / +{d['added_rows']} rows, "
          f"-{len(d['removed_files'])} files")
    expired = reg.expire_snapshots(keep_last=1)
    orphans = reg.vacuum_orphans(dry_run=True)
    print(f"expired {len(expired)} old snapshots; vacuum would remove {len(orphans)} orphans")

    print("\n== 7. continuous log-template catalog ==")
    from demo_otel_parquet_antalya_spark.streaming.templates import (
        incremental_template_catalog,
        read_template_catalog,
    )

    tstream = spark.readStream.schema(logs.schema).parquet(land)
    incremental_template_catalog(
        tstream, f"{work}/templates", f"{work}/tckpt",
        message_col="body", ts_col="timestamp",
    ).awaitTermination()
    catalog = read_template_catalog(spark, f"{work}/templates")
    print(f"{catalog.count()} templates mined from the body stream; top 5:")
    catalog.orderBy(F.desc("n_events")).select("template", "n_events").show(
        5, truncate=60
    )

    spark.stop()
    print("\ndone")


if __name__ == "__main__":
    main()
