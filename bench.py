#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is forced with a count() action (full plan execution, no driver
collect of large results). A warmup query amortizes JVM/session start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_otel_parquet_antalya_spark.plans import QUERIES  # noqa: E402
from demo_otel_parquet_antalya_spark.session import get_spark  # noqa: E402


def bench_ingest(spark, n_files: int = 50, records_per_file: int = 4000) -> float:
    """OTLP ingest throughput (logs/s): landing JSON -> flatten -> partitioned
    parquet via the streaming path (Trigger.AvailableNow). The reference
    baseline is 10k logs/s sustained (BASELINE.md)."""
    import shutil
    import tempfile

    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.streaming.ingest import run_ingest_once

    work = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        landing = os.path.join(work, "landing")
        generate_files(landing, n_files=n_files, records_per_file=records_per_file)
        n_logs = n_files * records_per_file
        t0 = time.perf_counter()
        run_ingest_once(spark, landing, os.path.join(work, "warehouse"), os.path.join(work, "ckpt"))
        return round(n_logs / (time.perf_counter() - t0), 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    bench_queries = {name: spec for name, spec in QUERIES.items() if spec.bench}

    # warmup: touch the big tables once so OS page cache / JVM JIT settle
    QUERIES["scan_count"].build(spark, sf_dir).collect()

    # best-of-2 per query: the second run reuses page cache / JIT'd code,
    # which is the steady-state a long-lived cluster session sees; taking
    # the min also removes GC/compilation jitter from round-over-round
    # comparisons
    timings: dict[str, float] = {}
    for name, spec in bench_queries.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    ingest_rate = bench_ingest(spark)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ingest_logs_per_sec": ingest_rate,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
