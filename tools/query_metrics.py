#!/usr/bin/env python
"""Per-query structural metrics: Spark jobs, stages, tasks, shuffle bytes.

Wall-clock on this box wanders up to ~3x run-to-run (SURVEY §7.13: three
same-tree quiet twins disagreed per-query by up to 178%), so optimization
decisions in the r14 optimization round are grounded in metrics that are
(near-)deterministic functions of the PLAN, not of box state: number of
jobs (scheduling barriers), number of stages (shuffle boundaries + action
count), shuffle read/write bytes and records, input rows. Wall-clock
best-of-N is reported alongside for the ledger, but plan-shape deltas are
the evidence that survives the noise.

Usage:
  python tools/query_metrics.py QUERY [QUERY ...] [--sf DIR] [--runs N]
  python tools/query_metrics.py --bench          # all bench=True queries

Prints one JSON line per query:
  {"query": ..., "jobs": J, "stages": S, "tasks": T,
   "shuffle_write_mb": MB, "shuffle_records": R, "input_records": I,
   "wall_best": sec, "wall_all": [...]}

Metrics come from the UI REST API (the tool's session enables the UI on an
ephemeral port; bench.py's session config is untouched).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_otel_parquet_antalya_spark.plans import QUERIES  # noqa: E402
from demo_otel_parquet_antalya_spark.session import get_spark  # noqa: E402


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def measure(spark, name: str, sf_dir: str, runs: int) -> dict:
    import gc

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    walls = []
    first_range = None
    for i in range(runs):
        spark.catalog.clearCache()
        gc.collect()
        try:
            sc._jvm.System.gc()
        except Exception:
            pass
        before_jobs = {j["jobId"] for j in _rest(base, "/jobs")}
        sc.setJobDescription(f"qm:{name}:{i}")
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        if i == 0:
            jobs = [j for j in _rest(base, "/jobs") if j["jobId"] not in before_jobs]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            first_range = (jobs, stage_ids)

    jobs, stage_ids = first_range
    stages = _rest(base, "/stages")
    by_id = {}
    for s in stages:
        # keep the HIGHEST attempt per stage id (ADVICE r14: the REST
        # /stages ordering is not guaranteed, and setdefault kept whichever
        # attempt came first — after a stage retry that could be the failed
        # attempt's metrics)
        if s["stageId"] in stage_ids and (
            s["stageId"] not in by_id
            or s.get("attemptId", 0) > by_id[s["stageId"]].get("attemptId", 0)
        ):
            by_id[s["stageId"]] = s
    swrite = sum(s.get("shuffleWriteBytes", 0) for s in by_id.values())
    srec = sum(s.get("shuffleWriteRecords", 0) for s in by_id.values())
    inrec = sum(s.get("inputRecords", 0) for s in by_id.values())
    tasks = sum(s.get("numCompleteTasks", 0) for s in by_id.values())
    skipped = sum(1 for s in stage_ids if s not in by_id)  # skipped stages
    return {
        "query": name,
        "jobs": len(jobs),
        "stages": len(stage_ids),
        "stages_skipped": skipped,
        "tasks": tasks,
        "shuffle_write_mb": round(swrite / 1e6, 2),
        "shuffle_records": srec,
        "input_records": inrec,
        "wall_best": min(walls),
        "wall_all": walls,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    names = list(args.queries)
    if args.bench:
        names += [n for n in sorted(QUERIES) if QUERIES[n].bench and n not in names]

    spark = get_spark(
        app_name="query_metrics",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4321"},
    )
    for name in names:
        print(json.dumps(measure(spark, name, args.sf, args.runs)), flush=True)


if __name__ == "__main__":
    main()
