"""operators/graph.py — weighted fixed-K PageRank.

The registered query (graph_pagerank_trade) is oracle-checked against the
unrolled DuckDB replay by tests/test_queries_oracle.py; these tests pin the
operator's semantics on hand-computable graphs.
"""

from __future__ import annotations

import pytest

from demo_otel_parquet_antalya_spark.operators.graph import pagerank


def _ranks(spark, rows, **kw):
    edges = spark.createDataFrame(rows, "src string, dst string, w double")
    out = pagerank(edges, weight="w", **kw)
    return {r.node: r.rank for r in out.collect()}


def test_two_cycle_is_uniform_fixpoint(spark):
    """A<->B is symmetric: the uniform distribution is exact at every k."""
    for k in (1, 5):
        r = _ranks(spark, [("A", "B", 1.0), ("B", "A", 1.0)], k=k)
        assert r["A"] == pytest.approx(0.5)
        assert r["B"] == pytest.approx(0.5)


def test_one_round_hand_computed(spark):
    """A->C, B->C, k=1: rank(C) = 0.15/3 + 0.85*(1/3 + 1/3); A and B keep
    only the teleport share; total mass short by the dangling drop."""
    r = _ranks(spark, [("A", "C", 1.0), ("B", "C", 1.0)], k=1)
    assert r["A"] == pytest.approx(0.05)
    assert r["B"] == pytest.approx(0.05)
    assert r["C"] == pytest.approx(0.15 / 3 + 0.85 * (2 / 3))
    # C is dangling: its round-0 mass (1/3) left the system, by contract
    assert sum(r.values()) == pytest.approx(1.0 - 0.85 * 1 / 3 + 0.85 * 0.0, abs=1e-9)


def test_weights_split_contribution(spark):
    """A splits 3:1 between B and C: after k=1 B gets 3x C's inflow."""
    r = _ranks(spark, [("A", "B", 3.0), ("A", "C", 1.0)], k=1)
    base = 0.15 / 3
    assert r["B"] == pytest.approx(base + 0.85 * (1 / 3) * 0.75)
    assert r["C"] == pytest.approx(base + 0.85 * (1 / 3) * 0.25)


def test_parallel_edges_collapse_to_weight_sum(spark):
    """Three unit A->B edges behave exactly like one weight-3 edge."""
    many = _ranks(
        spark, [("A", "B", 1.0), ("A", "B", 1.0), ("A", "B", 1.0), ("A", "C", 1.0)], k=2
    )
    one = _ranks(spark, [("A", "B", 3.0), ("A", "C", 1.0)], k=2)
    assert many == pytest.approx(one)


def test_deterministic_across_runs_and_checkpoint_interval(spark):
    """Fixed-k contract: identical results run-to-run AND regardless of how
    often lineage is checkpointed (the interval is perf-only)."""
    rows = [("A", "B", 1.0), ("B", "C", 2.0), ("C", "A", 1.0), ("A", "C", 0.5)]
    r1 = _ranks(spark, rows, k=6, checkpoint_interval=1)
    r2 = _ranks(spark, rows, k=6, checkpoint_interval=3)
    assert r1 == pytest.approx(r2, abs=1e-12)
