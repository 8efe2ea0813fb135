"""Randomized-schedule sweep of the RAW-WAREHOUSE lifecycle (r14): the
retention integration test drives one fixed op order; this sweeps the
schedule space of the composition {append (hive-partitioned write),
partition-scoped backfill, small-file compaction, hour-partition
retention, registry sync/retire} with a seeded random generator,
asserting after EVERY op that

- the warehouse scan's surviving rows equal an exact in-test model
  (body strings are unique per row, so set equality is row equality),
- the registry HEAD (after sync + retire_missing) reads exactly the
  same rows (catalog == disk at every step).

Same method as the streaming-tier and registry randomized sweeps —
building the M4 variant of these is what surfaced the r14
stale-coverage trim loss."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.schema import PARTITION_COLUMNS
from demo_otel_parquet_antalya_spark.sources.compaction import compact
from demo_otel_parquet_antalya_spark.sources.parquet_sink import (
    backfill_logs,
    read_logs,
    write_logs,
)
from demo_otel_parquet_antalya_spark.sources.registry import LogTableRegistry
from demo_otel_parquet_antalya_spark.sources.retention import expire_partitions

SERVICES = ("api", "web")
ROW_SCHEMA = (
    "ts string, service_name string, severity_text string, "
    "severity_number int, body string"
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, ROW_SCHEMA).select(
        F.col("ts").cast("timestamp").alias("timestamp"),
        "service_name", "severity_text", "severity_number", "body",
    )


def test_warehouse_lifecycle_random_schedules(spark, tmp_path):
    for seed in (5, 19):
        rng = random.Random(seed)
        wh = str(tmp_path / f"s{seed}")
        reg = LogTableRegistry(spark, wh)
        # model: body -> (service, hour); bodies are globally unique
        model: dict[str, tuple[str, int]] = {}
        nrow = 0
        expired_below = 0  # retention floor: hours < this are gone

        def mk_rows(service, hour, n):
            nonlocal nrow
            out = []
            for _ in range(n):
                body = f"b{nrow:05d}"
                nrow += 1
                out.append((
                    f"2024-01-01 {hour:02d}:{rng.randrange(60):02d}:00",
                    service, rng.choice(["INFO", "ERROR"]),
                    rng.choice([9, 17]), body,
                ))
            return out

        def check():
            got = {
                (r.body, r.service_name, r.hour)
                for r in read_logs(spark, wh)
                .select("body", "service_name", "hour").collect()
            } if model else set()
            want = {(b, s, h) for b, (s, h) in model.items()}
            assert got == want
            # catalog == disk after one sync + retire cycle
            reg.sync()
            reg.retire_missing()
            if model:
                cat = {
                    (r.body, r.service_name, r.hour)
                    for r in reg.table()
                    .select("body", "service_name", "hour").collect()
                }
                assert cat == want

        for step in range(8):
            op = rng.choice(
                ["append", "append", "backfill", "compact", "expire"]
            )
            if step == 0 or (not model and op in ("compact", "expire")):
                op = "append"  # a scan-backed op needs a written root
            if op == "append":
                rows = []
                for _ in range(rng.randint(1, 3)):
                    svc = rng.choice(SERVICES)
                    # never write below the retention floor: expired
                    # history must not resurrect (the operators' own
                    # contract — retention deletes, ingest moves forward)
                    hour = rng.randint(expired_below, 5)
                    rows += mk_rows(svc, hour, rng.randint(2, 5))
                write_logs(_frame(spark, rows), wh)
                for ts, svc, _sev, _n, body in rows:
                    model[body] = (svc, int(ts[11:13]))
            elif op == "backfill":
                lived = sorted({(s, h) for s, h in model.values()})
                if not lived:
                    continue
                svc, hour = lived[rng.randrange(len(lived))]
                rows = mk_rows(svc, hour, rng.randint(1, 4))
                backfill_logs(_frame(spark, rows), wh)
                # dynamic overwrite replaces EXACTLY that partition
                for body in [b for b, v in model.items() if v == (svc, hour)]:
                    del model[body]
                for _ts, _svc, _sev, _n, body in rows:
                    model[body] = (svc, hour)
            elif op == "compact":
                # pure rewrite: rows unchanged, file count shrinks
                compact(spark, wh, PARTITION_COLUMNS,
                        target_rows_per_file=1000, min_excess_files=1)
            elif op == "expire":
                cutoff_h = rng.randint(1, 5)
                paths = expire_partitions(
                    spark, wh, f"2024-01-01 {cutoff_h:02d}:00:00",
                    dry_run=False,
                )
                # model: every row strictly below the cutoff hour is gone
                doomed = [b for b, (_s, h) in model.items() if h < cutoff_h]
                assert bool(paths) == bool(doomed)
                for b in doomed:
                    del model[b]
                expired_below = max(expired_below, cutoff_h)
                # idempotent re-run finds nothing left to expire
                assert expire_partitions(
                    spark, wh, f"2024-01-01 {cutoff_h:02d}:00:00",
                    dry_run=False,
                ) == []
            check()
