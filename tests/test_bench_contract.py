"""The driver-facing bench output contract (VERDICT r12 #1).

The external driver captures the LAST 2000 characters of bench.py's output
and parses the ``headline_suite_total`` JSON line out of it. In r12 that
single line grew to ~2.7k chars (the per-run pairs and the per-query
normalized map were serialized inline) and the driver's ledger recorded
``parsed: null`` for the round. The fix splits the output: a diagnostics
line (stderr, first) carries the bulk; the stdout headline line stays
compact and LAST. This test pins the contract with realistic data so a
future field addition that would re-break the capture fails HERE, not in
the next round's ledger.
"""

from __future__ import annotations

import json

from bench import build_output

# the r12 driver-run suite (BENCH_r12 tail): realistic names and widths —
# 23 queries, the longest real names in the registry's bench set
_R12_TIMINGS = {
    "scan_count": 0.18,
    "log_template_mining": 0.987,
    "join_revenue_by_region": 0.675,
    "join_theta_late_ship": 0.533,
    "agg_pricing_summary": 0.435,
    "time_bucket_30s_series": 0.473,
    "tpch_q3_shipping_priority": 0.632,
    "dedup_minhash_lsh": 2.562,
    "similarity_cosine_topk": 0.769,
    "er_golden_records": 4.775,
    "text_bm25_topk": 0.664,
    "graph_pagerank_trade": 3.734,
    "graph_triangles_neardup": 5.063,
    "dedup_exact_substr_spans": 1.286,
    "graph_communities_neardup": 6.885,
    "dedup_line_level": 0.682,
    "graph_hits_trade": 6.117,
    "fingerprint_overlap_pairs": 1.58,
    "record_linkage_scores": 2.317,
    "quality_classifier_score": 0.41,
    "tpch_q10_returned_items": 0.67,
    "dedup_repeated_ngram_spans": 1.696,
    "dedup_ngram_jaccard": 2.062,
}


def _realistic(n_queries: int = 32):
    """Build output with MORE queries than today's bench set (23), so the
    length assertion holds headroom for the suite growing, not just the
    current roster."""
    timings = dict(_R12_TIMINGS)
    i = 0
    while len(timings) < n_queries:
        timings[f"future_round_added_query_name_{i:02d}"] = 123.456
        i += 1
    runs = {n: [round(t * 1.75, 3), t] for n, t in timings.items()}
    return build_output(
        timings=timings,
        runs=runs,
        total=round(sum(timings.values()), 3),
        core_total=123.456,
        northstar_total=123.456,
        rel_spread_max=2.667,
        calibration=0.636,
        loadavg=[12.34, 12.34, 12.34],
        loadavg_start=12.34,
        contended=False,
        ingest_rate=45377.3,
        ingest_load=3.84,
        ingest_contended=False,
        sf=0.1,
    )


def test_headline_line_fits_driver_tail_capture():
    headline, _ = _realistic()
    line = json.dumps(headline)
    # 2000 is the driver's capture window; 1800 leaves margin for the
    # trailing newline and a handful of future scalar fields
    assert len(line) < 1800, f"headline line is {len(line)} chars"


def test_headline_has_the_ledger_fields():
    headline, diagnostics = _realistic()
    for k in (
        "metric", "value", "unit", "queries", "core_total",
        "northstar_total", "calibration_sec", "total_normalized",
        "loadavg", "loadavg_start", "contended", "ingest_logs_per_sec",
        "sf",
    ):
        assert k in headline, k
    assert headline["metric"] == "headline_suite_total"
    # the bulk lives in the diagnostics line, NOT the headline
    assert "runs" not in headline
    assert "queries_normalized" not in headline
    assert set(diagnostics["runs"]) == set(headline["queries"])
    assert set(diagnostics["queries_normalized"]) == set(headline["queries"])


def test_normalized_view_divides_by_calibration():
    headline, diagnostics = _realistic()
    cal = headline["calibration_sec"]
    assert headline["total_normalized"] == round(headline["value"] / cal, 3)
    for n, t in headline["queries"].items():
        assert diagnostics["queries_normalized"][n] == round(t / cal, 3)


def test_zero_calibration_yields_null_normalized():
    out, diag = build_output(
        timings={"q": 1.0}, runs={"q": [1.0, 1.0]}, total=1.0,
        core_total=1.0, northstar_total=0.0, rel_spread_max=0.0,
        calibration=0.0, loadavg=[0, 0, 0], loadavg_start=0.0,
        contended=False, ingest_rate=1.0, ingest_load=0.0,
        ingest_contended=False, sf=0.1,
    )
    assert out["total_normalized"] is None
    assert diag["queries_normalized"] == {}


def test_bench_order_is_pinned_and_rotation_independent():
    """VERDICT r13 #2: the suite executes in a PINNED (name-sorted) order,
    decoupled from registration/window order — a window rotation must not
    shift every query's predecessor chain (page-cache/JIT state) in the
    round-over-round ledger."""
    import inspect

    import bench

    # the order function sorts by name regardless of insertion order
    assert bench.pinned_order({"zeta": 1, "alpha": 2, "mid": 3}) == [
        "alpha", "mid", "zeta",
    ]
    assert bench.pinned_order(dict(reversed(list(_R12_TIMINGS.items())))) == sorted(
        _R12_TIMINGS
    )
    # ...and main() actually iterates through it
    assert "for name in pinned_order(bench_queries)" in inspect.getsource(bench.main)
