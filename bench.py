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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    bench_queries = {name: spec for name, spec in QUERIES.items() if spec.bench}

    # warmup: touch the big tables once so OS page cache / JVM JIT settle
    QUERIES["scan_count"].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, spec in bench_queries.items():
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
