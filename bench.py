#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line on stdout (compact, driver-parsed — its serialized
length is pinned under the driver's 2000-char tail capture by
tests/test_bench_contract.py):
  {"metric": "headline_suite_total", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "calibration_sec": ..., "sf": <sf>}
plus a diagnostics JSON line on stderr (per-run pairs, normalized
per-query view) that the driver never needs to parse.

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


def pinned_order(bench_queries: dict) -> list[str]:
    """The bench suite's EXECUTION order: sorted by name, independent of
    registration/window order (VERDICT r13 #2). The r13 window rotation
    moved one query from 6th to last in the suite and thereby shifted
    every query's predecessor chain (page-cache/JIT state), confounding
    the round-over-round ledger on a box whose dominant wander is
    per-query I/O state. With a pinned order, rotations change the
    ledger's ROW SET only — never the execution neighborhood of the
    queries that stayed."""
    return sorted(bench_queries)


def bench_calibration(spark) -> float:
    """Drift-calibration row (r12, VERDICT r11 #2): a fixed, deterministic,
    CPU-bound reference op with NO I/O and NO code under test — 2B
    xxhash64 values XOR-folded straight off spark.range (bit_xor: order-
    insensitive, deterministic, cannot overflow under ANSI). Timed FIRST
    in every
    bench run (best-of-2; the first run absorbs JIT), so per-query times
    can ALSO be read normalized by the box's same-session throughput:
    three rounds running, the round-over-round ledger has had to arbitrate
    uniform 'untouched rows drifted +27%' box wander by hand — dividing by
    this row makes that drift cancel out of the comparison."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        (
            spark.range(0, 2_000_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.bit_xor("h"))
            .collect()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


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

    # Loadavg gate (VERDICT r5 item 3): the r5 "quiet" ledger's own loadavg
    # field read 8.14 — numbers recorded on a contended box are noise that
    # poisons the round-over-round comparison. If the 1-min loadavg at start
    # exceeds the gate, wait (up to ~3 min) for the box to settle; if it
    # never does, proceed but stamp the run "contended": true so readers
    # KNOW to discount it. Gate is env-tunable; the driver's own run is
    # never refused outright (it must always produce one JSON line).
    gate = float(os.environ.get("SPARK_GRAFT_LOADAVG_GATE", "2.0"))
    load_start = os.getloadavg()[0]
    waited = 0.0
    while load_start > gate and waited < 180.0:
        print(
            f"bench: 1-min loadavg {load_start:.2f} > gate {gate}; "
            "waiting for quiet...",
            file=sys.stderr,
        )
        time.sleep(15.0)
        waited += 15.0
        load_start = os.getloadavg()[0]
    contended = load_start > gate

    spark = get_spark(app_name="bench")

    # calibration FIRST: a pure-CPU reference timing the box itself, before
    # any query state can contend with it (see bench_calibration)
    calibration = bench_calibration(spark)

    bench_queries = {name: spec for name, spec in QUERIES.items() if spec.bench}

    # warmup: touch the big tables once so OS page cache / JVM JIT settle
    QUERIES["scan_count"].build(spark, sf_dir).collect()

    # best-of-2 per query: the second run reuses page cache / JIT'd code,
    # which is the steady-state a long-lived cluster session sees. BOTH runs
    # are reported (plus a relative spread) so a contended benching machine is
    # distinguishable from a code regression in the round-over-round ledger
    # (VERDICT r2: a 24 s recorded artifact stood where a 3 s re-run was true).
    # Per-query state reset (VERDICT r4 #2): heavy chains cache /
    # localCheckpoint blocks inside the shared session; without a reset the
    # leftovers contend with every later query and the ledger drifts
    # uniformly (+29% on the r4 quiet shared-16 with identical plans).
    import gc

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in pinned_order(bench_queries):
        spec = bench_queries[name]
        spark.catalog.clearCache()
        gc.collect()  # drop PyDataFrame refs so ContextCleaner can release
        # localCheckpoint blocks (clearCache alone doesn't touch them)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        pair = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).count()
            pair.append(round(time.perf_counter() - t0, 3))
        runs[name] = pair
        timings[name] = min(pair)

    # core = relational/SQL surface (plans.registry); northstar = the
    # LLM-data-pipeline operators (plans.northstar) — sub-totals let a
    # Python-worker-contention artifact in one family be seen as such
    def _family(spec) -> str:
        # the linkage/dedup chains registered in registry.py carry the
        # "northstar" tag — classify by tag first, module second
        if "northstar" in (spec.tags or ()):
            return "northstar"
        return "northstar" if spec.build.__module__.endswith(".northstar") else "core"

    core_total = round(
        sum(t for n, t in timings.items() if _family(bench_queries[n]) == "core"), 3
    )
    northstar_total = round(
        sum(t for n, t in timings.items() if _family(bench_queries[n]) == "northstar"), 3
    )
    rel_spread_max = round(
        max((max(p) - min(p)) / min(p) for p in runs.values() if min(p) > 0), 3
    )

    # Loadavg gate RE-CHECK before the ingest measurement (VERDICT r6 item
    # 2a / r7 item 4): by this point the query suite itself has loaded the
    # box, and the r6 ingest halving (44k -> 20k logs/s, proved
    # environmental by r7's recovery) happened exactly here. Give the
    # machine a bounded window to settle and stamp the ingest-specific
    # contention state separately from the suite-start gate.
    ingest_load = os.getloadavg()[0]
    waited = 0.0
    ingest_gate = max(gate, 4.0)  # the suite just ran; 2.0 is unreachable
    while ingest_load > ingest_gate and waited < 120.0:
        time.sleep(10.0)
        waited += 10.0
        ingest_load = os.getloadavg()[0]
    ingest_contended = ingest_load > ingest_gate

    ingest_rate = bench_ingest(spark)

    total = round(sum(timings.values()), 3)
    headline, diagnostics = build_output(
        timings=timings,
        runs=runs,
        total=total,
        core_total=core_total,
        northstar_total=northstar_total,
        rel_spread_max=rel_spread_max,
        calibration=calibration,
        loadavg=[round(x, 2) for x in os.getloadavg()],
        loadavg_start=round(load_start, 2),
        contended=contended,
        ingest_rate=ingest_rate,
        ingest_load=round(ingest_load, 2),
        ingest_contended=ingest_contended,
        sf=float(sf) if sf.replace(".", "").isdigit() else sf,
    )
    # diagnostics FIRST and on stderr (flushed): the driver captures the
    # LAST 2000 chars of output and parses the headline JSON line from it,
    # and r12's single fat line (runs + queries_normalized inline) grew to
    # ~2.7k chars — front-truncated, BENCH_r12.json parsed:null (VERDICT
    # r12 #1). The per-run pairs and the normalized per-query view stay
    # available (stderr + BENCH_local twins); the driver-facing stdout
    # line stays compact and LAST.
    print(json.dumps(diagnostics), file=sys.stderr, flush=True)
    print(json.dumps(headline))


def build_output(
    *,
    timings: dict,
    runs: dict,
    total: float,
    core_total: float,
    northstar_total: float,
    rel_spread_max: float,
    calibration: float,
    loadavg: list,
    loadavg_start: float,
    contended: bool,
    ingest_rate: float,
    ingest_load: float,
    ingest_contended: bool,
    sf,
) -> tuple[dict, dict]:
    """(headline, diagnostics): the compact driver-facing final line and
    the bulky per-run/normalized companion. Split out so the line-length
    contract is unit-testable (tests/test_bench_contract.py pins the
    serialized headline under the driver's 2000-char tail capture with
    margin) — the r12 regression was exactly this line outgrowing it."""
    headline = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "core_total": core_total,
        "northstar_total": northstar_total,
        "rel_spread_max": rel_spread_max,
        # drift calibration (r12): a same-session pure-CPU reference row —
        # value / calibration_sec normalizes out box wander that shifts
        # ALL rows (loadavg, thermal), so the round-over-round ledger
        # compares code, not box state
        "calibration_sec": calibration,
        "total_normalized": round(total / calibration, 3)
        if calibration > 0 else None,
        # 1/5/15-min load average at exit + the gated start value:
        # lets the round-over-round ledger distinguish a contended
        # machine from a regression
        "loadavg": loadavg,
        "loadavg_start": loadavg_start,
        "contended": contended,
        "ingest_logs_per_sec": ingest_rate,
        "ingest_loadavg_start": ingest_load,
        "ingest_contended": ingest_contended,
        "sf": sf,
    }
    diagnostics = {
        "metric": "headline_suite_diagnostics",
        "runs": runs,
        "queries_normalized": {
            n: round(t / calibration, 3) for n, t in timings.items()
        }
        if calibration > 0 else {},
    }
    return headline, diagnostics


if __name__ == "__main__":
    main()
