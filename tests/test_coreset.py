"""operators/coreset.py — greedy k-center diverse subset selection.

The registered query is oracle-checked against the unrolled DuckDB replay
by tests/test_queries_oracle.py; these pin the geometry on hand vectors.
"""

from __future__ import annotations

import pytest

from demo_otel_parquet_antalya_spark.operators.coreset import k_center_select

SCHEMA = "vec_id long, embedding array<double>"


def test_farthest_point_geometry(spark):
    """Seed = lowest id; round 1 must pick the vector most cosine-distant
    from the seed (the opposite direction), round 2 the orthogonal one."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # near the seed
        (2, [-1.0, 0.0]),  # opposite: distance 2
        (3, [0.0, 1.0]),   # orthogonal: distance 1 to both
    ]
    out = {r.sel_round: r for r in k_center_select(spark.createDataFrame(rows, SCHEMA), k=3).collect()}
    assert out[0].vec_id == 0 and out[0].mind == 0.0
    assert out[1].vec_id == 2 and out[1].mind == pytest.approx(2.0)
    assert out[2].vec_id == 3 and out[2].mind == pytest.approx(1.0)


def test_mind_non_increasing_and_centers_distinct(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(60)]
    sel = k_center_select(spark.createDataFrame(rows, SCHEMA), k=6).collect()
    ids = [r.vec_id for r in sel]
    assert len(set(ids)) == 6
    minds = [r.mind for r in sel if r.sel_round >= 1]
    assert all(a >= b - 1e-9 for a, b in zip(minds, minds[1:]))


def test_partitioning_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=4).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = [tuple(r) for r in k_center_select(df, k=4).collect()]
    b = [tuple(r) for r in k_center_select(df.repartition(13), k=4).collect()]
    assert a == b


def test_string_ids_and_exhaustion_stop(spark):
    """The vec_id output column keeps the input id type (string ids used to
    crash createDataFrame against a hardcoded 'vec_id long' schema), and
    k beyond the distinct vectors stops instead of re-picking centers at
    mind=0 (ADVICE r4 #5)."""
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.0, 1.0]),
        ("c", [1.0, 0.0]),  # duplicate direction of "a"
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = [(r.sel_round, r.vec_id) for r in k_center_select(df, k=5).collect()]
    # seed = lowest id "a"; round 1 = farthest "b"; then every remaining
    # vector ("c") is at distance 0 -> stop at 2 centers, not 5
    assert got == [(0, "a"), (1, "b")]


def test_empty_input_returns_empty_typed_frame(spark):
    df = spark.createDataFrame([], "vec_id string, embedding array<double>")
    out = k_center_select(df, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["sel_round", "vec_id", "mind"]
